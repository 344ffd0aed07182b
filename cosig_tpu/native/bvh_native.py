"""ctypes binding for the C++ BVH builder (src/bvh.cc)."""

from __future__ import annotations

import ctypes

import numpy as np

from cosig_tpu.native.loader import load

_lib = load()
_fn = _lib.cosig_build_bvh
_fn.restype = ctypes.c_int
_FP = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_IP = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_fn.argtypes = [
    _FP, _FP, _FP, _FP,
    ctypes.c_int, ctypes.c_int,
    _FP, _FP, _IP, _IP, _IP,
]


def build(tris, max_leaf: int):
    """Returns a BVH (same dataclass as the Python builder) or None when
    the input is empty (caller handles that case)."""
    from cosig_tpu.accel.bvh import BVH

    n = tris.count
    if n == 0:
        return None

    v0 = np.ascontiguousarray(tris.v0, np.float32)
    v1 = np.ascontiguousarray(tris.v1, np.float32)
    v2 = np.ascontiguousarray(tris.v2, np.float32)
    centers = np.ascontiguousarray(tris.centers, np.float32)

    cap = 2 * n
    node_min = np.empty((cap, 3), np.float32)
    node_max = np.empty((cap, 3), np.float32)
    lof = np.empty((cap,), np.int32)
    cnt = np.empty((cap,), np.int32)
    order = np.empty((n,), np.int32)

    n_nodes = _fn(v0, v1, v2, centers, n, max_leaf, node_min, node_max, lof, cnt, order)
    if n_nodes <= 0:
        return None

    return BVH(
        node_min=node_min[:n_nodes].copy(),
        node_max=node_max[:n_nodes].copy(),
        left_or_first=lof[:n_nodes].copy(),
        count=cnt[:n_nodes].copy(),
        triangles=tris.take(order),
        order=order,
    )

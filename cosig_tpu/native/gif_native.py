"""ctypes binding for the C++ GIF LZW encoder (src/gif_lzw.cc)."""

from __future__ import annotations

import ctypes

import numpy as np

from cosig_tpu.native.loader import load

_lib = load()
_fn = _lib.cosig_lzw_compress
_fn.restype = ctypes.c_int
_fn.argtypes = [
    ctypes.c_char_p,
    ctypes.c_int64,
    ctypes.c_int,
    np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ctypes.c_int64,
]


def compress(data: bytes, min_code_size: int = 8):
    """LZW-compress palette indices; byte-identical to the Python path."""
    # Worst case: no compression ~ 12 bits/symbol + headers.
    cap = len(data) * 2 + 64
    out = np.empty((cap,), np.uint8)
    n = _fn(data, len(data), min_code_size, out, cap)
    if n < 0:
        return None
    return out[:n].tobytes()

"""Hardware numeric probe for the MXU limb-split dot (the mt_mxu primitive).

Three levels, each vs a float64 reference:
  L1  plain bf16 limb-split dot, operands packed on the HOST exactly like
      clusters._pack_mx — isolates the MXU array + f32 accumulation.
  L2  rays limb-split IN-KERNEL and staged through a VMEM scratch with a
      single (64, R) store, then window-sliced per sub-packet before the
      dot — reproduces kernel_core's raysmx staging chain.
  L3  the f32 VPU FMA chain on the same values (the mt() arithmetic) —
      the baseline the images are compared against.

If L1/L2 sit at ~1e-7 of the absolute-value dot, the MXU arithmetic is
faithful on hardware and the image divergence lives in selection/layout;
if they sit at ~1e-3 (bf16 scale), the lowering is dropping limbs or
rounding the accumulator.

Usage: python tools/mxu_dot_probe.py   (runs on whatever jax.devices() is)
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np
import ml_dtypes

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosig_tpu.accel.clusters import MX_COMBOS

F = np.float32
BF = ml_dtypes.bfloat16
K = 32
R = 2048
S = 2  # sub-packets, to exercise window slicing like the kernel
RS = R // S


def limbs_np(a):
    l0 = a.astype(BF).astype(F)
    r = a - l0
    l1 = r.astype(BF).astype(F)
    l2 = (r - l1).astype(BF).astype(F)
    return l0, l1, l2


def main():
    rng = np.random.default_rng(7)
    # MT-like magnitudes: coefficients are edge cross-products (could be
    # O(1e-2..1e2)), rays O(1..30).
    A = (rng.standard_normal((5 * K, 10)) * rng.uniform(0.01, 30)).astype(F)
    x = (rng.standard_normal((10, R)) * 8).astype(F)
    x[9] = 1.0  # the kernel's input 9 is the constant-1 column (exact bf16)
    ref = A.astype(np.float64) @ x.astype(np.float64)
    scale = np.abs(A) @ np.abs(x) + 1e-30

    la = limbs_np(A)
    lx = limbs_np(x)
    op = np.zeros((5 * K, 64), F)
    rx = np.zeros((64, R), F)
    for ci, (j, k) in enumerate(MX_COMBOS):
        op[:, ci * 10:ci * 10 + 10] = la[j]
        rx[ci * 10:ci * 10 + 10] = lx[k]
    op_bf = op.astype(BF)
    rx_bf = rx.astype(BF)

    # ---- L1: host-packed operands, one in-kernel dot ----
    def k1(a_ref, b_ref, o_ref):
        o_ref[...] = jnp.dot(
            a_ref[...], b_ref[...], preferred_element_type=jnp.float32
        )

    out1 = np.asarray(
        pl.pallas_call(
            k1, out_shape=jax.ShapeDtypeStruct((5 * K, R), jnp.float32)
        )(op_bf, rx_bf)
    )
    e1 = (np.abs(out1 - ref) / scale).max()

    # ---- L2: in-kernel limb split + scratch staging + windowed dots ----
    def k2(a_ref, x_ref, o_ref, raysmx):
        planes = [x_ref[i:i + 1] for i in range(9)]
        bf16 = jnp.bfloat16
        lp = {}
        for i, plane in enumerate(planes):
            l0 = plane.astype(bf16)
            r1 = plane - l0.astype(jnp.float32)
            l1 = r1.astype(bf16)
            l2 = (r1 - l1.astype(jnp.float32)).astype(bf16)
            lp[i] = (l0, l1, l2)
        one = x_ref[9:10].astype(bf16)  # row 9 carries the "constant" input
        lp[9] = (one, jnp.zeros((1, R), bf16), jnp.zeros((1, R), bf16))
        rows = [lp[i][kc] for _, kc in MX_COMBOS for i in range(10)] + [
            jnp.zeros((1, R), bf16)
        ] * 4
        raysmx[0:64] = jnp.concatenate(rows, axis=0)
        for sp in range(S):
            win = raysmx[0:64, sp * RS:(sp + 1) * RS]
            o_ref[:, sp * RS:(sp + 1) * RS] = jnp.dot(
                a_ref[...], win, preferred_element_type=jnp.float32
            )

    out2 = np.asarray(
        pl.pallas_call(
            k2,
            out_shape=jax.ShapeDtypeStruct((5 * K, R), jnp.float32),
            scratch_shapes=[pltpu.VMEM((64, R), jnp.bfloat16)],
        )(op_bf, x)
    )
    # L2's reference: the in-kernel limb split of x differs from host
    # limbs only if the cast lowering differs — compare both ways.
    e2_vs_ref = (np.abs(out2 - ref) / scale).max()
    e2_vs_l1 = np.abs(out2 - out1).max()

    # ---- L3: f32 FMA chain (the VPU mt() arithmetic) on device ----
    def k3(a_ref, x_ref, o_ref):
        acc = jnp.zeros((5 * K, R), jnp.float32)
        for i in range(10):
            acc = acc + a_ref[:, i:i + 1] * x_ref[i:i + 1, :]
        o_ref[...] = acc

    out3 = np.asarray(
        pl.pallas_call(
            k3, out_shape=jax.ShapeDtypeStruct((5 * K, R), jnp.float32)
        )(A, x)
    )
    e3 = (np.abs(out3 - ref) / scale).max()

    backend = jax.devices()[0].platform
    print(f"backend={backend} K={K} R={R} S={S}")
    print(f"L1 host-packed limb dot   max rel-to-absdot: {e1:.3e}")
    print(f"L2 staged limb dot        max rel-to-absdot: {e2_vs_ref:.3e} "
          f"(abs vs L1: {e2_vs_l1:.3e})")
    print(f"L3 f32 FMA chain (VPU)    max rel-to-absdot: {e3:.3e}")
    verdict = "FAITHFUL" if max(e1, e2_vs_ref) < 5 * e3 + 1e-6 else "DEGRADED"
    print(f"verdict: {verdict}")


if __name__ == "__main__":
    main()

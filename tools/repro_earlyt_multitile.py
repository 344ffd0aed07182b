"""Standalone repro of the r4 "large-et-on" Mosaic DMA-lowering hazard.

A VMEM->SMEM async copy whose source is a PARTIAL-SUBLANE window of a
buffer spanning >1 lane tile — e.g. ``vmem.at[0:4]`` of an (8, 256) f32
buffer, `memref<4x256xf32, #tpu.tiled<(8,128),[2,1]>>` — has no Mosaic
DMA lowering and fails at compile time. A single-lane-tile window
((8, 128) buffer) lowers fine, which is why the crash only surfaced on
large_mesh (C_pad=256) and not glass (C_pad=128) in the r4 sweep
(tools/r4_sweep_results.jsonl rows "large-et-on-1/2"). Workaround:
copy ALL 8 sublanes and let the consumer ignore the garbage rows.

The early-t machinery that originally hit this was rejected on hardware
and pruned (kernel_core note); this repro is kept self-contained so the
hazard stays documented and checkable. Mosaic lowering runs CLIENT-side,
so it only needs the TPU target registered, not a healthy tunnel:

    python tools/repro_earlyt_multitile.py

Exit 0 when behavior matches the known hazard (partial window fails to
lower, full window compiles) — or when upstream has fixed the partial
case (reported, still exit 0).
"""
from __future__ import annotations

import sys


def build(partial: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x, out, vmem, smem, sem):
        vmem[:, :] = x[:, :] * 2.0
        src = vmem.at[0:4] if partial else vmem
        dst = smem.at[0:4] if partial else smem.at[0:8]
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()
        out[:, :] = vmem[:, :] + smem[0, 0]

    x = jnp.zeros((8, 256), jnp.float32)
    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 256), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, 256), jnp.float32),
            pltpu.SMEM((8, 256), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    jax.jit(f).lower(x).compile()


def main():
    import jax

    if jax.default_backend() == "cpu":
        print("SKIP: needs the TPU target (Mosaic lowering)")
        return 0

    try:
        build(partial=False)
    except Exception as e:  # full-sublane window must always lower
        print(f"FAIL: full-sublane 8x256 DMA no longer lowers: {e}")
        return 1
    print("OK: full-sublane (8, 256) VMEM->SMEM DMA compiles")

    try:
        build(partial=True)
    except Exception as e:
        msg = str(e).splitlines()[0][:120]
        print(f"OK: partial-sublane multi-lane-tile DMA still fails to "
              f"lower (known hazard): {msg}")
        return 0
    print("NOTE: partial-sublane multi-lane-tile DMA now lowers — "
          "upstream fixed; the full-sublane workaround is no longer needed")
    return 0


if __name__ == "__main__":
    sys.exit(main())

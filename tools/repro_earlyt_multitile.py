"""Compile-only repro/gate for the r4 "large-et-on" Mosaic crash.

COSIG_EARLYT=1 on large_mesh (C_pad=256, S=4) failed Mosaic lowering:
the per-(sub-packet, cluster) bounds DMA copied a PARTIAL-SUBLANE window
(`bounds_vmem.at[0:4]` of an (8, 256) f32 buffer) that spans TWO lane
tiles — `memref<4x256xf32, #tpu.tiled<(8,128),[2,1]>>` has no DMA
lowering (tools/r4_sweep_results.jsonl rows "large-et-on-1/2"). Glass
(C_pad=128, single lane tile) lowered fine, which is why the crash
only surfaced on the one config where front-to-back ordering matters
most. Fix (kernel_core bcopy note): copy all 8 sublanes; rows [S, 8)
land in SMEM rows the skip tests never read.

Mosaic lowering runs CLIENT-side, so this gate only needs the TPU
target to be registered, not a healthy tunnel: it traces + lowers +
compiles the large_mesh wavefront executable with EARLYT on and exits
0 on success. Run from /root/repo:

    python tools/repro_earlyt_multitile.py
"""
from __future__ import annotations

import os
import sys

os.environ["COSIG_EARLYT"] = "1"
sys.path.insert(0, os.getcwd())

import numpy as np  # noqa: E402


def main():
    import jax

    if jax.default_backend() == "cpu":
        print("SKIP: needs the TPU target (Mosaic lowering)")
        return 0

    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import (
        compile_scene, frame_params, materials_host, static_config,
    )
    from cosig_tpu.ops import trace_wavefront
    from cosig_tpu.scene.generate import CONFIGS

    scene, settings = CONFIGS["large_mesh"]()
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    # Small frame, SAME kernel shapes: C_pad (the crash dimension) comes
    # from the cluster cut, not the resolution; R=4096 -> S=4 as in the
    # crashing rows.
    import dataclasses

    cfg = dataclasses.replace(cfg, width=128, height=128)
    from cosig_tpu.scene.tessellate import extract_triangles

    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    C_pad = int(cset.aabb_t.shape[1])
    assert C_pad > 128, f"repro needs a multi-lane-tile cut, got C_pad={C_pad}"

    lowered = jax.jit(
        lambda p: trace_wavefront.render_wavefront(cset, p, cfg)
    ).lower(params)
    lowered.compile()  # Mosaic lowering happens here; crash = exception
    print(f"OK: large_mesh earlyt kernel compiled (C_pad={C_pad})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

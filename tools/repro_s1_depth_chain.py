"""Repro: the compiled lax.fori_loop/switch depth chain miscomputes at
S == 1 (tile_rays == 1024) on TPU — bounce stages contribute nothing.

The production guard this makes falsifiable: trace_wavefront forces the
unrolled depth chain at subpackets == 1 (force_unroll). COSIG_WF_LOOP=fori
bypasses the guard so this script can compare the two forms directly.

Run ON TPU from /root/repo (compiles ~2 Mosaic payloads, minutes):
  python tools/repro_s1_depth_chain.py

Prints REPRODUCED when the fori form diverges from the unrolled form at
tile_rays=1024 while agreeing at tile_rays=4096 (the control: if BOTH
tile sizes diverge, the failure is something else — investigate before
trusting the verdict). NOT-REPRODUCED = consider removing the guard
after a full-suite run with COSIG_WF_LOOP=fori.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The guarded fori/switch chain lives in the COMPACTION dispatch path;
# under the selfskip default (COSIG_WF_SELFSKIP=1) both modes run the
# self-skip fori chain and the comparison is vacuous. Pin it off (must
# happen before trace_wavefront is first imported, in render()).
os.environ["COSIG_WF_SELFSKIP"] = "0"

import numpy as np


def render(tile_rays: int, mode: str):
    os.environ.pop("COSIG_WF_LOOP", None)
    if mode == "fori":
        os.environ["COSIG_WF_LOOP"] = "fori"
    import jax

    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import (
        compile_scene, frame_params, materials_host, static_config,
    )
    from cosig_tpu.ops import trace_wavefront
    from cosig_tpu.scene.generate import CONFIGS
    from cosig_tpu.scene.tessellate import extract_triangles

    scene, settings = CONFIGS["mirror_sphere"]()
    settings = settings.replace(resolution_override=(128, 128), max_depth=2)
    arrays = compile_scene(scene)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    interpret = jax.default_backend() == "cpu"
    img, _ = trace_wavefront.render_jit(
        cset, params, cfg, interpret=interpret, tile_rays=tile_rays
    )
    out = np.asarray(img)
    os.environ.pop("COSIG_WF_LOOP", None)
    return out


def main():
    verdicts = {}
    for tr in (1024, 4096):
        base = render(tr, "unrolled")
        fori = render(tr, "fori")
        diff = float(np.abs(base - fori).max())
        verdicts[tr] = diff
        print(f"tile_rays={tr}: max |fori - unrolled| = {diff}")
    hit = verdicts[1024] > 1e-6 and verdicts[4096] <= 1e-6
    if verdicts[4096] > 1e-6:
        print("WARNING: control (tile_rays=4096) diverged too — "
              "not the guarded S==1 bug; investigate separately.")
    print("REPRODUCED" if hit else "NOT-REPRODUCED")


if __name__ == "__main__":
    main()

"""Compiled-TPU A/B gate for the occlusion-saturation skip
(COSIG_EARLYT_OCC): the skip-on image must be BIT-identical to the
COSIG_ETOCC_DBG=noskip diagnostic (same program incl. every cache op,
skip disabled) — the skipped any-hit visits can only max-fold occlusion
flags already saturated at 1.0 (kernel_core.make_traverse earlyt_occ
note). Also reports the off-vs-on delta, which may carry program-shape
fusion ULPs from the added SMEM cache ops (CPU interpret: 19 px at
1 ULP on glass 128x64; same class as the documented oracle-side fusion
story).

Runs one reduced frame per mode in subprocesses (the knobs are read at
import) and compares full readback images. Usage (from /root/repo, TPU
attached):

    python - < tools/etocc_verify.py              # glass-like defaults
    COSIG_SS_CONFIG=large_mesh python - < tools/etocc_verify.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

CHILD = r"""
import os, sys
import numpy as np
sys.path.insert(0, os.getcwd())
from cosig_tpu.accel.clusters import build_clusters
from cosig_tpu.models.soa import (
    compile_scene, frame_params, materials_host, static_config,
)
from cosig_tpu.ops import trace_wavefront
from cosig_tpu.scene.generate import CONFIGS
from cosig_tpu.scene.tessellate import extract_triangles
import dataclasses

name = os.environ.get("COSIG_SS_CONFIG", "glass_sphere")
scene, settings = CONFIGS[name]()
arrays = compile_scene(scene)
params = frame_params(scene, settings)
cfg = static_config(scene, settings)
# Reduce the frame: correctness only, keep multi-bounce + AA.
cfg = dataclasses.replace(cfg, width=512, height=256)
tris = extract_triangles(scene)
mats = np.concatenate(materials_host(scene), axis=1)
cset = build_clusters(arrays, tris=tris, mats_host=mats)
img, rays = trace_wavefront.render_jit(cset, params, cfg)
np.save(sys.argv[1], np.asarray(img))
print("rays", float(rays))
"""


def run(occ: str, dbg: str, out: str) -> str:
    env = dict(os.environ, COSIG_EARLYT_OCC=occ, COSIG_ETOCC_DBG=dbg)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, out],
        capture_output=True, text=True, timeout=6000, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if r.returncode != 0:
        print(f"--- occ={occ} dbg={dbg} FAILED ---\n{r.stderr[-2000:]}")
        sys.exit(1)
    return r.stdout.strip()


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        a = os.path.join(td, "off.npy")
        b = os.path.join(td, "on.npy")
        c = os.path.join(td, "noskip.npy")
        print("occ=0:", run("0", "", a), flush=True)
        print("occ=1:", run("1", "", b), flush=True)
        print("noskip:", run("1", "noskip", c), flush=True)
        ia, ib, ic = np.load(a), np.load(b), np.load(c)
        eq = bool((ib == ic).all())
        d = np.abs(ia - ib)
        print("on==noskip bitwise (the gate):", eq,
              "" if eq else f"(max |d| = {np.abs(ib - ic).max()})")
        print(f"off-vs-on: max |d| = {d.max():.3g}, "
              f"px = {int((d.max(axis=-1) > 0).sum())} (fusion ULPs ok)")
        sys.exit(0 if eq and d.max() < 1e-4 else 2)


if __name__ == "__main__":
    main()

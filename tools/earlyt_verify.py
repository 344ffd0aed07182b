"""Compiled-TPU A/B gate for the early-t cluster skip (COSIG_EARLYT):
the early-t image must be BIT-identical to the base image — the counting
sort only reorders visits (the (t, gid) winner fold is visit-order
invariant) and the strict-> entry-bound skip can only drop clusters that
cannot win even a tie (kernel_core.make_traverse earlyt note).

Runs one reduced frame per mode in subprocesses (the knob is read at
import) and compares full readback images bitwise. Usage (from
/root/repo, TPU attached):

    python - < tools/earlyt_verify.py              # glass-like defaults
    COSIG_SS_CONFIG=large_mesh python - < tools/earlyt_verify.py
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


def run(mode: str, out: str) -> str:
    env = dict(os.environ, COSIG_EARLYT=mode)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, out],
        capture_output=True, text=True, timeout=6000, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if r.returncode != 0:
        print(f"--- mode {mode} FAILED ---\n{r.stderr[-2000:]}")
        sys.exit(1)
    return r.stdout.strip()


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        a, b = os.path.join(td, "off.npy"), os.path.join(td, "on.npy")
        print("earlyt=0:", run("0", a), flush=True)
        print("earlyt=1:", run("1", b), flush=True)
        ia, ib = np.load(a), np.load(b)
        eq = bool((ia == ib).all())
        print("bitwise-equal:", eq,
              "" if eq else f"(max |d| = {np.abs(ia - ib).max()})")
        sys.exit(0 if eq else 2)


if __name__ == "__main__":
    main()

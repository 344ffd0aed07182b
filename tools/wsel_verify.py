"""Compiled-TPU A/B gate for window selection (COSIG_WSEL): the WSEL
image must be BIT-identical to the default dispatch — the selection is
lane-local and the skipped windows are exactly the existing sub-packet
dispatch's skip set (kernel_core use_wsel note). Interpret-mode gate:
tests/test_pallas.py::test_wavefront_wsel_exact; this is the hardware
(Mosaic-compiled) twin, incl. the finest bounce windows (Sb=8).

Runs one reduced frame per mode in subprocesses (knobs are read at
import) and compares full readback images bitwise. Usage (from
/root/repo, TPU attached):

    python tools/wsel_verify.py
    COSIG_SS_CONFIG=large_mesh python tools/wsel_verify.py
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


def run(env_extra: dict, out: str, tag: str) -> str:
    env = dict(os.environ, **env_extra)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, out],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if r.returncode != 0:
        print(f"--- {tag} FAILED ---\n{r.stderr[-2000:]}")
        sys.exit(1)
    return r.stdout.strip()


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "base.npy")
        on = os.path.join(td, "wsel.npy")
        on8 = os.path.join(td, "wsel8.npy")
        print("wsel=0:    ", run({"COSIG_WSEL": "0"}, base, "base"), flush=True)
        print("wsel=1:    ", run({"COSIG_WSEL": "1"}, on, "wsel"), flush=True)
        print("wsel=1 Sb8:", run({"COSIG_WSEL": "1", "COSIG_WF_SB": "8"},
                                 on8, "wsel-Sb8"), flush=True)
        ia = np.load(base)
        ok = True
        for tag, path in (("wsel", on), ("wsel-Sb8", on8)):
            ib = np.load(path)
            eq = bool((ia == ib).all())
            ok &= eq
            print(f"bitwise-equal [{tag}]:", eq,
                  "" if eq else f"(max |d| = {np.abs(ia - ib).max()})")
        sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()

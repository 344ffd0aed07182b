"""Cluster-size x tile-shape perf sweep on the glass_sphere config.

Run in a HEALTHY tunnel window (check tools/tpu_health.py first); each
point uses the slope-timing protocol from bench.py. Results print as TSV.

Usage: python - [K ...] < tools/perf_sweep.py   (from /root/repo)
"""

import sys
import time

import numpy as np

import cosig_tpu
from cosig_tpu.accel.clusters import build_clusters
from cosig_tpu.models.soa import (
    compile_scene,
    frame_params,
    materials_host,
    static_config,
)
from cosig_tpu.ops import trace_pallas
from cosig_tpu.scene.generate import CONFIGS
from cosig_tpu.scene.tessellate import extract_triangles

K_VALUES = [int(a) for a in sys.argv[1:]] or [16, 32, 64]
TILES = [(16, 16), (16, 32), (32, 32), (8, 128)]

scene, settings = CONFIGS["glass_sphere"]()
settings = settings.replace(resolution_override=(512, 512), aa_samples=1)
tris = extract_triangles(scene)
mats = np.concatenate(materials_host(scene), axis=1)
arrays = compile_scene(scene, tris)
params = frame_params(scene, settings)
cfg = static_config(scene, settings)

print("k\ttile\tms_per_frame\tmrays_per_s")
for k in K_VALUES:
    cset = build_clusters(arrays, tris=tris, k=k, mats_host=mats)
    for tile in TILES:
        import functools

        import jax

        @functools.partial(jax.jit, static_argnames=("kk",))
        def chain(cset, params, kk):
            import dataclasses

            def body(carry, _):
                prev_img, acc = carry
                p2 = dataclasses.replace(
                    params,
                    light_intensity=params.light_intensity + prev_img[0, 0, 0] * 0.0,
                )
                img, rays = trace_pallas.render_clusters(cset, p2, cfg, tile=tile)
                return (img, acc + rays), None

            img0, rays0 = trace_pallas.render_clusters(cset, params, cfg, tile=tile)
            (img, total), _ = jax.lax.scan(body, (img0, rays0), None, length=kk - 1)
            return img, total

        try:
            img, _ = chain(cset, params, kk=2)
            img.block_until_ready()
            img, probe = chain(cset, params, kk=8)
            img.block_until_ready()
            _ = float(probe)

            def timed(kk):
                t0 = time.perf_counter()
                img, probe = chain(cset, params, kk=kk)
                p = float(probe)
                return time.perf_counter() - t0, p

            t1, _ = timed(2)
            t2, p2 = timed(8)
            per = max((t2 - t1) / 6, 1e-9)
            rays = p2 / 8
            print(f"{k}\t{tile}\t{per*1e3:.2f}\t{rays/per/1e6:.1f}", flush=True)
        except Exception as e:
            print(f"{k}\t{tile}\tFAILED\t{str(e)[:60]}", flush=True)

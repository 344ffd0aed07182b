"""Profile the wavefront backend per depth: time glass_sphere at
selected max_depth values with slope timing. Depth-1 time = primary
stage cost; each increment = one compaction + one bounce stage.

Run on TPU (via stdin from /root/repo — PYTHONPATH breaks axon):

    python - < tools/profile_depth.py            # depths 1..6 (slow:
                                                 # 12 Mosaic compiles,
                                                 # may exceed 10 min)
    python - 1 3 6 < tools/profile_depth.py      # just these depths
"""
from __future__ import annotations

import dataclasses
import functools
import sys
import time

import jax
import numpy as np

from cosig_tpu.accel.clusters import build_clusters
from cosig_tpu.models.soa import (
    compile_scene, frame_params, materials_host, static_config,
)
from cosig_tpu.ops import trace_wavefront
from cosig_tpu.scene.generate import CONFIGS
from cosig_tpu.scene.tessellate import extract_triangles


def main():
    scene, settings = CONFIGS["glass_sphere"]()
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg0 = static_config(scene, settings)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    interpret = jax.default_backend() == "cpu"

    depths = [int(a) for a in sys.argv[1:]] or list(
        range(1, cfg0.max_depth + 1))

    prev_ms = 0.0
    for depth in depths:
        cfg = dataclasses.replace(cfg0, max_depth=depth)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(k, cfg=cfg):
            def body(carry, _):
                prev, acc = carry
                p2 = dataclasses.replace(
                    params,
                    light_intensity=params.light_intensity + prev[0, 0, 0] * 0.0,
                )
                img, rays = trace_wavefront.render_wavefront(
                    cset, p2, cfg, interpret=interpret)
                return (img, acc + rays), None

            img0, rays0 = trace_wavefront.render_wavefront(
                cset, params, cfg, interpret=interpret)
            (img, total), _ = jax.lax.scan(
                body, (img0, rays0), None, length=k - 1)
            return img, total

        k1, k2 = 2, 6
        img, p = chain(k1); img.block_until_ready()
        img, p = chain(k2); img.block_until_ready(); _ = float(p)
        t0 = time.perf_counter(); img, p = chain(k1); _ = float(p)
        t1 = time.perf_counter(); img, p = chain(k2); pv = float(p)
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (k2 - k1) * 1e3
        rays = pv / k2
        print(f"depth={depth}  {ms:8.2f} ms/frame  (+{ms - prev_ms:7.2f} ms)"
              f"  rays/frame={rays / 1e6:6.2f}M", flush=True)
        prev_ms = ms


if __name__ == "__main__":
    main()

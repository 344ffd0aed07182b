"""Quantify cull efficiency on a bench config (host-side, no TPU).

For every primary ray: how many cluster AABBs does its slab test pass
(= clusters the packet traversal may visit), and how many of those sit
closer than the ray's actual hit (= clusters an ordered front-to-back
traversal with early termination would still visit)? The gap between the
two bounds the win available from ordered traversal; the absolute count
bounds the win from tighter clustering.

Packet-level numbers (any ray in a 1024-ray tile passes -> whole packet
visits) mirror what the wavefront primary kernel actually dispatches.

Usage: JAX_PLATFORMS=cpu python tools/cull_stats.py [config]
"""
from __future__ import annotations

import sys

import numpy as np

from cosig_tpu.accel.clusters import build_clusters
from cosig_tpu.models.soa import (
    compile_scene, frame_params, materials_host, static_config,
)
from cosig_tpu.ops import trace_xla
from cosig_tpu.scene.generate import CONFIGS
from cosig_tpu.scene.tessellate import extract_triangles


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "glass_sphere"
    scene, settings = CONFIGS[name]()
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)

    C = cset.num_clusters
    aabb = np.asarray(cset.aabb_t)[:, :C]  # rows minx,miny,minz,maxx,maxy,maxz
    bmin, bmax = aabb[0:3].T, aabb[3:6].T  # [C, 3]

    # Reduced-res primary rays through the oracle's camera path (the ray
    # distribution matches the kernels; resolution only affects sampling
    # density, not per-ray cull statistics).
    import dataclasses
    import jax.numpy as jnp
    from cosig_tpu.ops import camera
    from cosig_tpu.ops.intersect import closest_hit_brute
    small = dataclasses.replace(cfg, width=128, height=128, aa_samples=1,
                                max_depth=1)
    ys, xs = np.mgrid[0:small.height, 0:small.width].astype(np.float32)
    px, py = jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel())
    ox, oy = camera.sample_offsets(px, py, 0, small.aa_samples)
    o, d = camera.generate_rays(
        px, py, ox, oy, small.width, small.height,
        params.cam_to_obj, params.cam_distance, params.fov_deg,
        params.ortho_size, small.is_orthographic,
    )
    hit = closest_hit_brute(arrays, o, d)
    o = np.asarray(o)
    d = np.asarray(d)
    t_hit = np.asarray(hit.t)
    n = o.shape[0]

    inv = np.where(np.abs(d) > 1e-12, 1.0 / d, np.inf)
    t0 = (bmin[None] - o[:, None]) * inv[:, None]  # [n, C, 3]
    t1 = (bmax[None] - o[:, None]) * inv[:, None]
    tn = np.minimum(t0, t1).max(axis=2)
    tf = np.maximum(t0, t1).min(axis=2)
    pass_slab = (tf >= np.maximum(tn, 0.0)) & (tf >= 0)  # [n, C]
    entry = np.where(pass_slab, np.maximum(tn, 0.0), np.inf)

    visited = pass_slab.sum(axis=1)
    needed = (entry <= t_hit[:, None]).sum(axis=1)  # ordered + early-term

    print(f"{name}: C={C} clusters, K={cset.k}, rays={n}")
    print(f"per-ray   slab-pass clusters: mean {visited.mean():.2f}  "
          f"p90 {np.percentile(visited, 90):.0f}  max {visited.max()}")
    print(f"per-ray   needed (ordered+ET): mean {needed.mean():.2f}  "
          f"p90 {np.percentile(needed, 90):.0f}")

    # Packet level at several square pixel-tile sizes: the union of the
    # tile's per-ray cull sets is what the kernel's packet traversal visits.
    for t in (32, 16, 8, 4):
        g = pass_slab.reshape(small.height // t, t, small.width // t, t, C)
        pkt = g.any(axis=(1, 3))  # [nby, nbx, C]
        ge = entry.reshape(small.height // t, t, small.width // t, t, C)
        pkt_entry = ge.min(axis=(1, 3))
        gt = t_hit.reshape(small.height // t, t, small.width // t, t)
        pkt_thit = gt.max(axis=(1, 3))
        pkt_visited = pkt.sum(axis=2)
        pkt_needed = (pkt_entry <= pkt_thit[..., None]).sum(axis=2)
        print(f"tile {t:2d}x{t:2d} px: visited mean {pkt_visited.mean():6.2f} "
              f" max {pkt_visited.max():3d}  ordered-ET {pkt_needed.mean():6.2f}"
              f"  (pair-work x{pkt_visited.mean() / max(needed.mean(), 1e-9):.1f}"
              f" vs per-ray ideal)")

    # WSEL predictor (kernel_core use_wsel note): lanes enumerated EXACTLY
    # like the kernel (_primary_block / _quad_grid, consecutive-lane AA
    # samples share a pixel, so a w-lane window = w/aa raster-consecutive
    # pixels of a quad). Per tile size R and window count S: cluster
    # visits (union over the tile = the DOT count / today's S=1 dispatch
    # count) vs flagged (window, cluster) pairs (the WSEL SELECTION
    # count; x w lanes = fine-grained pair work).
    from cosig_tpu.ops.trace_wavefront import _primary_block, _quad_grid
    aa = max(1, cfg.aa_samples)
    print(f"\nWSEL window stats (aa={aa}, lane enumeration = kernel's):")
    for R in (1024, 4096):
        bh, bw = _primary_block(aa, R)
        sq = min(8, R // 1024) or 1
        sqh, sqw = _quad_grid(max(1, sq))
        nby, nbx = small.height // bh, small.width // bw
        if nby == 0 or nbx == 0:
            continue
        qh, qw = bh // sqh, bw // sqw
        # pixel index -> (tile, lane) following the kernel enumeration
        ys2, xs2 = np.mgrid[0:nby * bh, 0:nbx * bw]
        tile = (ys2 // bh) * nbx + (xs2 // bw)
        quad = ((ys2 % bh) // qh) * sqw + ((xs2 % bw) // qw)
        q = ((ys2 % bh) % qh) * qw + ((xs2 % bw) % qw)
        lane_px = quad * (qh * qw) + q  # pixel slot in tile (x aa = lane)
        flat = (tile * (bh * bw) + lane_px).ravel()
        order = np.argsort(flat)
        ps = pass_slab[: nby * bh * nbx * bw]  # rays are row-major pixels
        ps = ps.reshape(small.height, small.width, C)[
            : nby * bh, : nbx * bw
        ].reshape(-1, C)[order]
        n_tiles = nby * nbx
        ppt = bh * bw  # pixels per tile
        ps = ps.reshape(n_tiles, ppt, C)
        tile_u = ps.any(axis=1)
        dots = tile_u.sum(axis=1).mean()
        for S in (4, 8, 16, 32):
            wpx = ppt // S  # pixels per window (= R/S lanes / aa)
            if wpx * aa < 128:
                continue
            wu = ps.reshape(n_tiles, S, wpx, C).any(axis=2)
            selw = wu.sum(axis=(1, 2)).mean()
            print(f"  R={R:5d} (tile {bh}x{bw}px): dots/tile {dots:6.2f}  "
                  f"S={S:2d} ({wpx * aa:4d}-lane win): sel-windows/tile "
                  f"{selw:7.2f}  sel-lane-work vs S=1 "
                  f"x{selw / (S * dots):.2f}")


if __name__ == "__main__":
    main()

"""Bounce/shadow-ray coherence + octant-rebinning predictor (host, no TPU).

Sizes the round-5 VERDICT task-1a candidate BEFORE any kernel work: under
selfskip the bounce stages re-trace the tile's rays in PIXEL order, so
deep-bounce tiles mix direction octants and the packet cull (union over
the tile) inflates cluster visits. An occasional re-binning permutation
(the old compaction machinery's gather, re-keyed by direction) would make
tiles direction-coherent — worth building ONLY if the host-simulated work
cut is large, because selfskip won round 4 precisely by deleting that
permutation I/O (+21-22 %).

Simulates the Whitted secondary chain on the oracle (closest_hit_brute +
the kernel_core bounce rules, compute:420-455) and reports, per bounce
depth, the packet-traversal work under several lane orders:

  pixel    — identity (what selfskip dispatches today)
  compact  — alive-first, pixel order within (the rejected old paradigm)
  octant   — alive-first, direction-octant-major
  oct+pos  — alive-first, octant then coarse origin-morton within

Work columns (all summed over live 1024-lane tiles, aa-aware lane model =
cull_stats' WSEL predictor): dots = cluster visits (full-width MXU dot
count = S=1 dispatch count); selw = flagged 128-lane selection windows
(WSEL Sb8 dispatch count); ideal = per-ray slab-pass pairs / R (the
no-packet lower bound in dot units).

Shadow rows: the same packet stats for the depth's any-hit segments
(hit + n*OFFSET -> light, max_t = dist) in pixel order — sizes the shadow
traversal's inflation per depth (VERDICT task 7 evidence).

Usage: JAX_PLATFORMS=cpu python tools/bounce_stats.py [config] [res]
"""
from __future__ import annotations

import dataclasses
import sys

import numpy as np

from cosig_tpu.accel.clusters import build_clusters
from cosig_tpu.models.soa import (
    compile_scene, frame_params, materials_host, static_config,
)
from cosig_tpu.ops import camera
from cosig_tpu.ops.intersect import closest_hit_brute
from cosig_tpu.ops.kernel_core import OFFSET
from cosig_tpu.scene.generate import CONFIGS
from cosig_tpu.scene.tessellate import extract_triangles

EPS = 1e-4  # EPSILON (intersect): min valid hit t


def slab(bmin, bmax, o, d, max_t=None):
    """Per-ray AABB slab pass [n, C] (+ entry bounds), matching the
    kernel's NaN-conservative segment test (kernel_core cull)."""
    with np.errstate(divide="ignore", invalid="ignore"):
        inv = 1.0 / d
        t0 = (bmin[None] - o[:, None]) * inv[:, None]
        t1 = (bmax[None] - o[:, None]) * inv[:, None]
    tn = np.nanmax(np.minimum(t0, t1), axis=2)
    tf = np.nanmin(np.maximum(t0, t1), axis=2)
    ok = (tf >= np.maximum(tn, 0.0)) & (tf >= 0)
    if max_t is not None:
        ok &= np.maximum(tn, 0.0) <= max_t[:, None]
    return ok, np.where(ok, np.maximum(tn, 0.0), np.inf)


def packet_work(ps, alive, order, ppt, S=8):
    """(dots, sel_windows, live_tiles) for rays re-ordered by ``order``
    and packed into ppt-pixel tiles / ppt//S-pixel windows."""
    n, C = ps.shape
    ps = np.where(alive[:, None], ps, False)[order]
    a = alive[order]
    pad = (-n) % ppt
    if pad:
        ps = np.pad(ps, ((0, pad), (0, 0)))
        a = np.pad(a, (0, pad))
    tiles = ps.reshape(-1, ppt, C)
    live = a.reshape(-1, ppt).any(axis=1)
    dots = int(tiles.any(axis=1).sum(axis=1)[live].sum())
    wu = tiles.reshape(-1, S, ppt // S, C).any(axis=2)  # [T, S, C]
    selw = int(wu.sum(axis=(1, 2))[live].sum())
    return dots, selw, int(live.sum())


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "glass_sphere"
    res = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    scene, settings = CONFIGS[name]()
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    tris = extract_triangles(scene)
    mats_c, mats_k = materials_host(scene)
    cset = build_clusters(
        arrays, tris=tris,
        mats_host=np.concatenate([mats_c, mats_k], axis=1),
    )
    C = cset.num_clusters
    aabb = np.asarray(cset.aabb_t)[:, :C]
    bmin, bmax = aabb[0:3].T, aabb[3:6].T

    small = dataclasses.replace(cfg, width=res, height=res, aa_samples=1)
    ys, xs = np.mgrid[0:res, 0:res].astype(np.float32)
    import jax.numpy as jnp
    px, py = jnp.asarray(xs.ravel()), jnp.asarray(ys.ravel())
    oxj, oyj = camera.sample_offsets(px, py, 0, 1)
    o, d = camera.generate_rays(
        px, py, oxj, oyj, res, res, params.cam_to_obj, params.cam_distance,
        params.fov_deg, params.ortho_size, small.is_orthographic,
    )
    o, d = np.asarray(o, np.float64), np.asarray(d, np.float64)
    n = o.shape[0]

    # Lane order = kernel enumeration (cull_stats WSEL predictor). aa>1
    # packs aa consecutive lanes per pixel, so a 1024-lane tile is
    # ppt = 1024//aa pixels; bounce behavior is aa-invariant (subpixel
    # jitter), so pixels stand in for lane groups.
    aa = max(1, cfg.aa_samples)
    ppt = 1024 // aa
    from cosig_tpu.ops.trace_wavefront import _primary_block, _quad_grid
    bh, bw = _primary_block(aa, 1024)
    sqh, sqw = _quad_grid(8)
    nby, nbx = res // bh, res // bw
    qh, qw = bh // sqh, bw // sqw
    ys2, xs2 = np.mgrid[0:nby * bh, 0:nbx * bw]
    tile = (ys2 // bh) * nbx + (xs2 // bw)
    quad = ((ys2 % bh) // qh) * sqw + ((xs2 % bw) // qw)
    q = ((ys2 % bh) % qh) * qw + ((xs2 % bw) % qw)
    lane = (tile * (bh * bw) + quad * (qh * qw) + q).ravel()
    to_lane = np.argsort(lane)  # row-major pixel idx -> lane-order position
    keep = nby * bh * nbx * bw
    sel2d = (np.mgrid[0:res, 0:res][0] < nby * bh) & (
        np.mgrid[0:res, 0:res][1] < nbx * bw
    )
    sel = sel2d.ravel()

    ks = mats_k[:, 2].astype(np.float64)
    krefr = mats_k[:, 3].astype(np.float64)
    ior = mats_k[:, 4].astype(np.float64)
    lp = np.asarray(params.light_pos)[0].astype(np.float64)
    smin = np.asarray(arrays.tri_v0).reshape(-1, 3).min(axis=0)
    smax = np.asarray(arrays.tri_v0).reshape(-1, 3).max(axis=0)
    span = np.maximum(smax - smin, 1e-6)

    alive = np.ones(n, bool)
    at = np.ones((n, 3))
    print(f"{name}: C={C} K={cset.k} aa={aa} ppt={ppt} "
          f"depth={cfg.max_depth} rays={keep} (res {res})")
    hdr = (f"{'stage':>10s} {'alive%':>7s} {'order':>8s} {'dots':>8s} "
           f"{'selw':>8s} {'tiles':>6s} {'ideal':>8s}")
    print(hdr)
    for depth in range(cfg.max_depth):
        hit = closest_hit_brute(arrays, jnp.asarray(o, jnp.float32),
                                jnp.asarray(d, jnp.float32))
        h = np.asarray(hit.hit) & alive
        t = np.asarray(hit.t, np.float64)
        nrm = np.asarray(hit.normal, np.float64)
        mat = np.asarray(hit.material)
        hp = o + t[:, None] * d

        # Shadow segments for this depth's shading (pixel order only —
        # their lanes are frozen like the bounce rays').
        sdir = lp[None] - (hp + nrm * float(OFFSET))
        dist = np.linalg.norm(sdir, axis=1)
        sdir = sdir / np.maximum(dist[:, None], 1e-12)
        ps_s, _ = slab(bmin, bmax, hp + nrm * float(OFFSET), sdir, dist)
        sl = h.copy()
        lo = to_lane  # lane-order gather of row-major pixels
        dots, selw, lt = packet_work(
            ps_s[sel][lo], sl[sel][lo], np.arange(keep), ppt)
        ideal = ps_s[sl].sum() / 1024 * aa
        print(f"{'shadow d' + str(depth):>10s} {100 * sl.mean():6.1f}% "
              f"{'pixel':>8s} {dots:8d} {selw:8d} {lt:6d} {ideal:8.1f}")

        # Secondary ray (kernel_core bounce, compute:420-455).
        m = np.clip(mat, 0, len(ks) - 1)
        refl = ks[m] > 0
        refr = (krefr[m] > 0) if cfg.enable_refraction else np.zeros(n, bool)
        cos_in = (d * nrm).sum(axis=1)
        ex = cos_in > 0
        fn = np.where(ex[:, None], -nrm, nrm)
        eta = np.where(ex, ior[m], 1.0 / np.maximum(ior[m], 1e-12))
        cos = -(d * fn).sum(axis=1)
        kk = 1.0 - eta * eta * (1.0 - cos * cos)
        tir = kk < 0
        coef = eta * cos - np.sqrt(np.maximum(kk, 0.0))
        rf = eta[:, None] * d + coef[:, None] * fn
        tirv = d - 2 * (d * fn).sum(axis=1)[:, None] * fn
        rp = d - 2 * cos_in[:, None] * nrm
        nd = np.where(refr[:, None], np.where(tir[:, None], tirv, rf), rp)
        no = np.where(
            refr[:, None],
            np.where(tir[:, None], hp + fn * float(OFFSET),
                     hp + rf * float(OFFSET)),
            hp + nrm * float(OFFSET),
        )
        amp = np.where(refr, np.where(tir, ks[m], krefr[m]), ks[m])
        at = at * amp[:, None]  # color factor <= 1 ignored (upper bound)
        alive = h & (refl | refr) & (at.max(axis=1) > 0)
        nd = nd / np.maximum(np.linalg.norm(nd, axis=1, keepdims=True),
                             1e-12)
        o, d = no, nd
        if depth == cfg.max_depth - 1 or not alive.any():
            break

        ps, entry = slab(bmin, bmax, o, d)
        al = alive[sel][lo]
        psl = ps[sel][lo]
        ideal = ps[alive].sum() / 1024 * aa
        oct_ = ((d[:, 0] > 0) * 4 + (d[:, 1] > 0) * 2 + (d[:, 2] > 0))
        mort = np.zeros(n, np.int64)
        for b in range(3):  # 3-level coarse morton of the origin
            cell = np.clip(((o - smin) / span * 8).astype(np.int64), 0, 7)
            mort = (mort << 3) | (
                ((cell[:, 0] >> (2 - b)) & 1) << 2
                | ((cell[:, 1] >> (2 - b)) & 1) << 1
                | ((cell[:, 2] >> (2 - b)) & 1)
            )
        octl, mortl = oct_[sel][lo], mort[sel][lo]
        idx = np.arange(keep)
        orders = (
            ("pixel", idx),
            ("compact", np.argsort(~al, kind="stable")),
            ("octant", np.lexsort((idx, octl, ~al))),
            ("oct+pos", np.lexsort((idx, mortl, octl, ~al))),
        )
        for oname, order in orders:
            dots, selw, lt = packet_work(psl, al, order, ppt)
            print(f"{'bounce d' + str(depth + 1):>10s} "
                  f"{100 * alive.mean():6.1f}% {oname:>8s} {dots:8d} "
                  f"{selw:8d} {lt:6d} {ideal:8.1f}")


if __name__ == "__main__":
    main()

"""Sub-AABB cull-refinement predictor (host, no TPU).

Round-4 VERDICT task 2 asks for the two-level sub-AABB visit test at the
MXU defaults. The r4 COSIG_SUBG experiment dispatched per SUBGROUP-tri
slice and lost 4x to per-visit scalar overhead; this sizes the cheap
form instead: keep the visit/dispatch granularity EXACTLY as shipped
(whole clusters) but refine the CULL — a cluster's flag bit is set only
if at least one of its SUBGROUP-triangle sub-AABBs passes the slab test
(the union of sub-boxes covers every triangle, so the refined cull stays
a conservative superset of the per-ray hit set; the winner fold is
visit-set-invariant, hence bitwise-exact images).

Cost model: the slab test widens from (R, C_pad) to G x that — the r3/r4
stage decomps put the cull itself in the noise, and it rides the VPU
fully vectorized (no new dispatch). Win model: packet-union cluster
visits (= full-width MXU dots = the dominant cost) drop wherever the
cluster box is loose but its 8-triangle sub-boxes are tight.

Reports, per traversal stage of the simulated Whitted chain (the
bounce_stats model), packet dots under the shipped cluster-box cull vs
the sub-AABB-refined cull, plus the per-ray ideals for both.

Usage: JAX_PLATFORMS=cpu python tools/subcull_stats.py [config] [res]
"""
from __future__ import annotations

import dataclasses
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # script-path invocation puts tools/ first
    sys.path.insert(0, REPO)

from cosig_tpu.accel.clusters import build_clusters
from cosig_tpu.models.soa import (
    compile_scene, frame_params, materials_host, static_config,
)
from cosig_tpu.ops import camera
from cosig_tpu.ops.intersect import closest_hit_brute
from cosig_tpu.ops.kernel_core import OFFSET
from cosig_tpu.scene.generate import CONFIGS
from cosig_tpu.scene.tessellate import extract_triangles

from bounce_stats import packet_work, slab  # noqa: E402 (tools sibling)


def slab_sub(sub_aabb, C, o, d, max_t=None):
    """Sub-AABB-refined cull: OR of per-subgroup slab passes [n, C].

    ``sub_aabb`` is the ClusterSet.sub_aabb_t array (8G, C_pad); NaN
    sub-boxes (empty slices) contribute False (comparisons with NaN are
    false in the kernel's refined test too — unlike the padding-COLUMN
    NaNs of the top-level cull, which stay conservative-pass and are
    excluded here by the [:C] slice)."""
    g = sub_aabb.shape[0] // 8
    ok = np.zeros((o.shape[0], C), bool)
    for gi in range(g):
        rows = sub_aabb[gi * 8 : gi * 8 + 6, :C]
        bmin, bmax = rows[0:3].T, rows[3:6].T
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / d
            t0 = (bmin[None] - o[:, None]) * inv[:, None]
            t1 = (bmax[None] - o[:, None]) * inv[:, None]
        tn = np.minimum(t0, t1).max(axis=2)
        tf = np.maximum(t0, t1).min(axis=2)
        with np.errstate(invalid="ignore"):
            gok = (tf >= np.maximum(tn, 0.0)) & (tf >= 0)
            if max_t is not None:
                gok &= np.maximum(tn, 0.0) <= max_t[:, None]
        ok |= np.where(np.isnan(tf), False, gok)
    return ok


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
    sub = np.asarray(cset.sub_aabb_t)

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
    to_lane = np.argsort(lane)
    keep = nby * bh * nbx * bw
    sel2d = (np.mgrid[0:res, 0:res][0] < nby * bh) & (
        np.mgrid[0:res, 0:res][1] < nbx * bw
    )
    sel = sel2d.ravel()

    ks = mats_k[:, 2].astype(np.float64)
    krefr = mats_k[:, 3].astype(np.float64)
    ior = mats_k[:, 4].astype(np.float64)
    lp = np.asarray(params.light_pos)[0].astype(np.float64)

    alive = np.ones(n, bool)
    at = np.ones((n, 3))
    print(f"{name}: C={C} K={cset.k} G={cset.subgroups} aa={aa} ppt={ppt} "
          f"depth={cfg.max_depth} rays={keep} (res {res})")
    print(f"{'stage':>10s} {'alive%':>7s} {'dots':>8s} {'subdots':>8s} "
          f"{'cut%':>6s} {'ideal':>8s} {'subideal':>8s}")
    tot = np.zeros(2)
    idx = np.arange(keep)

    def report(tag, live, ps_base, ps_sub, o_, d_):
        lo = to_lane
        d0, _, _ = packet_work(ps_base[sel][lo], live[sel][lo], idx, ppt)
        d1, _, _ = packet_work(ps_sub[sel][lo], live[sel][lo], idx, ppt)
        i0 = ps_base[live].sum() / 1024 * aa
        i1 = ps_sub[live].sum() / 1024 * aa
        cut = 100.0 * (1.0 - d1 / max(d0, 1))
        print(f"{tag:>10s} {100 * live.mean():6.1f}% {d0:8d} {d1:8d} "
              f"{cut:5.1f}% {i0:8.1f} {i1:8.1f}")
        tot[0] += d0
        tot[1] += d1

    for depth in range(cfg.max_depth):
        hit = closest_hit_brute(arrays, jnp.asarray(o, jnp.float32),
                                jnp.asarray(d, jnp.float32))
        h = np.asarray(hit.hit) & alive
        t = np.asarray(hit.t, np.float64)
        nrm = np.asarray(hit.normal, np.float64)
        mat = np.asarray(hit.material)
        hp = o + t[:, None] * d

        if depth == 0:
            ps0, _ = slab(bmin, bmax, o, d)
            pss = slab_sub(sub, C, o, d) & ps0
            report("primary", alive, ps0, pss, o, d)

        so = hp + nrm * float(OFFSET)
        sdir = lp[None] - so
        dist = np.linalg.norm(sdir, axis=1)
        sdir = sdir / np.maximum(dist[:, None], 1e-12)
        ps_s, _ = slab(bmin, bmax, so, sdir, dist)
        pss_s = slab_sub(sub, C, so, sdir, dist) & ps_s
        report(f"shadow d{depth}", h, ps_s, pss_s, so, sdir)

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
        at = at * amp[:, None]
        alive = h & (refl | refr) & (at.max(axis=1) > 0)
        nd = nd / np.maximum(np.linalg.norm(nd, axis=1, keepdims=True),
                             1e-12)
        o, d = no, nd
        if depth == cfg.max_depth - 1 or not alive.any():
            break
        ps, _ = slab(bmin, bmax, o, d)
        pss = slab_sub(sub, C, o, d) & ps
        report(f"bounce d{depth + 1}", alive, ps, pss, o, d)

    print(f"\nTOTAL dots {int(tot[0])} -> {int(tot[1])} "
          f"({100 * (1 - tot[1] / max(tot[0], 1)):.1f}% cut)")


if __name__ == "__main__":
    main()

"""Localize the TPU MXU closest-hit divergence at hit-record granularity.

Runs ONLY the primary trace kernel (fission mode's trace half) twice —
VPU (COSIG_MXU=0) and MXU (COSIG_MXU=1) — on the same frame, reads the
per-ray hit records (state rows trace_wavefront._REC0.._REC0+4:
t, nx, ny, nz, mat), and diffs
them. For a sample of diverging rays, recomputes the winner on the host
in f64 and f32 from the cluster plane coefficients to say which backend
is right and HOW the MXU one is wrong (wrong winner gid? shifted t?
garbage normals?).

Usage: python tools/mxu_hitdiff.py [--config glass_sphere] [--res 128]
"""

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import dataclasses

import numpy as np


def primary_state(cset, params, cfg, mxu_env):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cosig_tpu.ops import trace_wavefront as tw
    from cosig_tpu.ops.kernel_core import (
        COMPILER_PARAMS, build_lights, build_uniforms,
    )

    os.environ["COSIG_MXU"] = mxu_env
    # The fission hit record needs the fission ROWS layout (>= _REC0 + 5);
    # tw.ROWS is 16 in the default layout. Hardcoding 24 here keeps the
    # script independent of the COSIG_WF_FISSION env at import time.
    ROWS = max(tw.ROWS, tw._REC0 + 5 + (8 - (tw._REC0 + 5) % 8) % 8)
    R = tw.R
    subpackets = tw.SUBPACKETS
    width, height = cfg.width, cfg.height
    aa = max(1, cfg.aa_samples)
    bh, bw = tw._primary_block(aa, R)
    nbx = -(-width // bw)
    nby = -(-height // bh)
    n_tiles = nbx * nby
    n_pad = n_tiles * R
    uniforms = build_uniforms(params, jnp.asarray(0.0, jnp.float32))
    lights = build_lights(params, cfg.multi_light)
    L = int(lights.shape[0])
    M = int(cset.mats.shape[0])
    prims = jnp.zeros((1, 22), jnp.float32)
    (C, C_pad, K, n_subg, mxu), stream, geom_ins, scratch, geom_specs = (
        tw._stage_resources(cset, None, R)
    )
    dims7 = (C, C_pad, K, M, L, n_subg, mxu)
    state = pl.pallas_call(
        tw._make_primary_kernel(cfg, dims7, nbx, height, stream, (0, 0),
                                subpackets, R, fission=True),
        grid=(n_tiles,),
        in_specs=geom_specs,
        out_specs=pl.BlockSpec((ROWS, R), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=COMPILER_PARAMS,
    )(uniforms, cset.mats, lights, prims, cset.aabb_t, cset.sb_aabb_t,
      cset.sub_aabb_t, *geom_ins)
    return np.asarray(state), mxu


def host_winner(geom, o, d, dtype):
    """Closest-hit over every cluster row: the kernel's plane arithmetic
    in the given numpy dtype -> (t, gid) with (t, gid) lexicographic
    tie-break. geom: (C, K, 36)."""
    import cosig_tpu.accel.clusters as cl

    g = geom.reshape(-1, 36).astype(dtype)
    o = o.astype(dtype)
    d = d.astype(dtype)
    w = np.cross(o, d)
    dw = np.concatenate([d, w])
    va = g[:, cl.VA:cl.VA + 6] @ dw
    vb = g[:, cl.VB:cl.VB + 6] @ dw
    vc = g[:, cl.VC:cl.VC + 6] @ dw
    s = g[:, cl.GN:cl.GN + 3] @ d
    num = g[:, cl.NDA] - g[:, cl.GN:cl.GN + 3] @ o
    eps = dtype(1e-4)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = num / s
    valid = (
        (np.abs(s) >= eps) & (va * s >= 0) & (vb * s >= 0) & (vc * s >= 0)
        & (t > eps)
    )
    tm = np.where(valid, t, np.inf)
    gid = g[:, cl.GID]
    order = np.lexsort((gid, tm))
    i = order[0]
    return float(tm[i]), float(gid[i]), int(i)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="glass_sphere")
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--nsample", type=int, default=6)
    args = ap.parse_args()

    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import (
        compile_scene, frame_params, materials_host, static_config,
    )
    from cosig_tpu.scene.generate import CONFIGS
    from cosig_tpu.scene.tessellate import extract_triangles

    scene, settings = CONFIGS[args.config]()
    settings = dataclasses.replace(
        settings, resolution_override=(args.res, args.res),
        max_depth=1, aa_samples=1,
    )
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    geom = np.asarray(cset.geom)

    st_vpu, m0 = primary_state(cset, params, cfg, "0")
    st_mxu, m1 = primary_state(cset, params, cfg, "1")
    assert m0 == 0 and m1 in (1, 2), (m0, m1)

    alive = st_vpu[12] > 0.5
    same_rays = np.abs(st_vpu[0:6] - st_mxu[0:6]).max()
    print(f"ray o/d identical: max diff {same_rays:.3e}  alive {alive.sum()}")

    from cosig_tpu.ops.trace_wavefront import _REC0 as REC0
    t_v, t_m = st_vpu[REC0], st_mxu[REC0]
    n_v, n_m = st_vpu[REC0 + 1:REC0 + 4], st_mxu[REC0 + 1:REC0 + 4]
    mat_v, mat_m = st_vpu[REC0 + 4], st_mxu[REC0 + 4]
    INF = np.float32(np.inf)
    hit_v, hit_m = np.isfinite(t_v) & alive, np.isfinite(t_m) & alive
    flip = (hit_v != hit_m)
    both = hit_v & hit_m
    dt = np.where(both, np.abs(t_v - t_m), 0)
    dmat = both & (mat_v != mat_m)
    dn = np.where(both, np.abs(n_v - n_m).max(axis=0), 0)
    print(f"hit/miss flips: {flip.sum()}  (vpu hits {hit_v.sum()}, "
          f"mxu hits {hit_m.sum()})")
    print(f"both-hit: mat diffs {dmat.sum()}  max|dt| {dt.max():.3e}  "
          f"max|dn| {dn.max():.3e}  n(|dt|>1e-3) {(dt > 1e-3).sum()}  "
          f"n(|dn|>1e-3) {(dn > 1e-3).sum()}")

    nan_v = np.isnan(n_v).any(axis=0) & hit_v
    nan_m = np.isnan(n_m).any(axis=0) & hit_m
    print(f"NaN normals: vpu {nan_v.sum()}  mxu {nan_m.sum()}")

    # Sample diverging rays, referee on host.
    bad = np.flatnonzero(
        flip | dmat | (dt > 1e-3) | (dn > 1e-3) | np.isnan(dn) | nan_v | nan_m
    )
    print(f"diverging rays: {bad.size}")
    for i in bad[:: max(1, bad.size // args.nsample)][:args.nsample]:
        o = st_vpu[0:3, i]
        d = st_vpu[3:6, i]
        t64, gid64, _ = host_winner(geom, o, d, np.float64)
        t32, gid32, _ = host_winner(geom, o, d, np.float32)
        print(f"ray {i}: rid={st_vpu[14, i]:.0f}\n"
              f"  vpu t={t_v[i]:.6f} mat={mat_v[i]:.0f} "
              f"n=({n_v[0, i]:.4f},{n_v[1, i]:.4f},{n_v[2, i]:.4f})\n"
              f"  mxu t={t_m[i]:.6f} mat={mat_m[i]:.0f} "
              f"n=({n_m[0, i]:.4f},{n_m[1, i]:.4f},{n_m[2, i]:.4f})\n"
              f"  host f64 t={t64:.6f} gid={gid64:.0f} | "
              f"f32 t={t32:.6f} gid={gid32:.0f}")


if __name__ == "__main__":
    main()

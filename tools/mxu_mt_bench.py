"""MXU-vs-VPU microbench for the MT pair-test visit body.

The traversal's per-visit cost is ~30 broadcast FMAs/pair on the VPU
(va/vb/vc Plücker volumes + s/ndo) plus a ~15-op epilogue
(t/u/v/valid/min-reduce/tie-break).  The five dot planes are a single
matmul  G(5K, 9) @ rays(9, R)  — this bench measures whether Mosaic
lowers that onto the MXU profitably at our shapes:

  vpu-dots   : the 5 dot planes exactly as kernel_core.mt computes them
  mxu-dots   : same planes via one jnp.dot((5K,16),(16,R)) (zero-padded
               contraction), sliced back into five (K, R) grids
  vpu-full   : dots + the full closest-hit epilogue (current kernel)
  mxu-full   : MXU dots + the same epilogue
  mxu-fullK128 : K=128 clusters (4x fewer visits, same total pairs)

All bodies run VL sequential visits per grid step over a (VL, ...) VMEM
geometry array with dynamic first-axis loads, mirroring the real visit
loop's access pattern.  Slope-timed scan chains (bench.py protocol).
Run on TPU from /root/repo:  python tools/mxu_mt_bench.py
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosig_tpu.ops.kernel_core import COMPILER_PARAMS

F = np.float32
R = 1024          # lanes per sub-packet
VL = 64           # visits per grid step
T = 128           # grid steps
EPSILON = F(1e-4)
INF = F(3.402823466e38)
GID_PAD = F(2 ** 24)


def rays_rows():
    rng = np.random.default_rng(0)
    o = rng.normal(size=(3, R)).astype(F)
    d = rng.normal(size=(3, R)).astype(F)
    d /= np.linalg.norm(d, axis=0, keepdims=True)
    w = np.cross(o, d, axis=0).astype(F)
    return np.concatenate([o, d, w], axis=0)  # (9, R)


def geom_vpu(k):
    rng = np.random.default_rng(1)
    return rng.normal(size=(VL, k, 36)).astype(F)


def geom_mxu(k):
    """(VL, 5k, 16): rows [0:k) va, [k:2k) vb, [2k:3k) vc, [3k:4k) s,
    [4k:5k) ndo; cols follow rays9 = (o, d, w) with 7 zero-pad cols."""
    g = geom_vpu(k)
    m = np.zeros((VL, 5 * k, 16), F)
    m[:, 0 * k:1 * k, 3:9] = g[:, :, 7:13]    # va: d,w coeffs
    m[:, 1 * k:2 * k, 3:9] = g[:, :, 13:19]   # vb
    m[:, 2 * k:3 * k, 3:9] = g[:, :, 19:25]   # vc
    m[:, 3 * k:4 * k, 3:6] = g[:, :, 3:6]     # s = d . n
    m[:, 4 * k:5 * k, 0:3] = g[:, :, 3:6]     # ndo = o . n
    return m


def dots_vpu(g, rays, k):
    ox, oy, oz = rays[0:1], rays[1:2], rays[2:3]
    dx, dy, dz = rays[3:4], rays[4:5], rays[5:6]
    wx, wy, wz = rays[6:7], rays[7:8], rays[8:9]
    gnx, gny, gnz = g[:, 3:4], g[:, 4:5], g[:, 5:6]
    va = (dx * g[:, 7:8] + dy * g[:, 8:9] + dz * g[:, 9:10]
          + wx * g[:, 10:11] + wy * g[:, 11:12] + wz * g[:, 12:13])
    vb = (dx * g[:, 13:14] + dy * g[:, 14:15] + dz * g[:, 15:16]
          + wx * g[:, 16:17] + wy * g[:, 17:18] + wz * g[:, 18:19])
    vc = (dx * g[:, 19:20] + dy * g[:, 20:21] + dz * g[:, 21:22]
          + wx * g[:, 22:23] + wy * g[:, 23:24] + wz * g[:, 24:25])
    s = dx * gnx + dy * gny + dz * gnz
    ndo = ox * gnx + oy * gny + oz * gnz
    return va, vb, vc, s, ndo


PRECISION = None  # set per run_case


def dots_mxu(gm, rays16, k):
    out = jnp.dot(gm, rays16, preferred_element_type=jnp.float32,
                  precision=PRECISION)  # (5k, R)
    return (out[0 * k:1 * k], out[1 * k:2 * k], out[2 * k:3 * k],
            out[3 * k:4 * k], out[4 * k:5 * k])


# Limb-split single-pass f32-faithful dot: each f32 operand splits into
# 3 bf16 limbs; the 6 significant limb-product combos (j,k) with j+k<=2
# become extra contraction columns (9+1 inputs x 6 combos = 60, pad 64).
# One DEFAULT-precision bf16 MXU pass then equals HIGHEST-precision
# quality (bf16xbf16 products are exact in f32; f32 accumulation).
COMBOS = [(0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0)]


def _limbs(a):
    import ml_dtypes
    bf = ml_dtypes.bfloat16
    a = a.astype(np.float32)
    l0 = a.astype(bf).astype(np.float32)
    r = a - l0
    l1 = r.astype(bf).astype(np.float32)
    l2 = (r - l1).astype(bf).astype(np.float32)
    return l0, l1, l2


def geom_mx3(k):
    """(VL, 5k, 64) bf16: col c*10+i = limb j_c of coefficient i."""
    import ml_dtypes
    gm = geom_mxu(k)  # (VL, 5k, 16) f32; cols 0:9 inputs, 15 const-nda
    coef = np.concatenate([gm[:, :, 0:9], gm[:, :, 15:16]], axis=2)  # 10
    lim = _limbs(coef)
    out = np.zeros((VL, 5 * k, 64), np.float32)
    for c, (j, _) in enumerate(COMBOS):
        out[:, :, c * 10:c * 10 + 10] = lim[j]
    return out.astype(ml_dtypes.bfloat16)


def rays64():
    """(64, R) bf16: row c*10+i = limb k_c of ray input i (input 9 = 1)."""
    import ml_dtypes
    r9 = rays_rows()
    inp = np.concatenate([r9, np.ones((1, R), np.float32)], axis=0)  # (10, R)
    lim = _limbs(inp)
    out = np.zeros((64, R), np.float32)
    for c, (_, kk) in enumerate(COMBOS):
        out[c * 10:c * 10 + 10] = lim[kk]
    return out.astype(ml_dtypes.bfloat16)


def dots_mxu3(gm3, r64, k):
    out = jnp.dot(gm3, r64, preferred_element_type=jnp.float32)  # (5k, R)
    return (out[0 * k:1 * k], out[1 * k:2 * k], out[2 * k:3 * k],
            out[3 * k:4 * k], out[4 * k:5 * k])


def dots_mxuT(gmT, rays16, k):
    """gmT is (16, 5k): contraction over SUBLANES of both operands —
    physical layout (16, 5k) pads lanes to a multiple of 128 once for the
    whole matrix instead of per-row-block, 5-10x less VMEM than (5k, 16)."""
    out = jax.lax.dot_general(
        gmT, rays16, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (5k, R)
    return (out[0 * k:1 * k], out[1 * k:2 * k], out[2 * k:3 * k],
            out[3 * k:4 * k], out[4 * k:5 * k])


def epilogue(va, vb, vc, s, ndo, g, best, k):
    """Closest-hit epilogue matching kernel_core.mt (nda/gid from g)."""
    nda = g[:, 6:7]
    gid = g[:, 35:36]
    inv_s = F(1.0) / s
    t = (nda - ndo) * inv_s
    u = vb * inv_s
    v = vc * inv_s
    valid = ((jnp.abs(s) >= EPSILON) & (va * s >= F(0.0))
             & (vb * s >= F(0.0)) & (vc * s >= F(0.0)) & (t > EPSILON))
    tm = jnp.where(valid, t, INF)
    tmin = jnp.min(tm, axis=0, keepdims=True)
    cand = jnp.where(tm == tmin, gid, GID_PAD)
    gmin = jnp.min(cand, axis=0, keepdims=True)
    oh = ((tm == tmin) & (gid == gmin)).astype(F)

    def sel(col):
        return jnp.sum(oh * col, axis=0, keepdims=True)

    u_c = jnp.sum(oh * jnp.where(valid, u, F(0.0)), axis=0, keepdims=True)
    v_c = jnp.sum(oh * jnp.where(valid, v, F(0.0)), axis=0, keepdims=True)
    w_c = F(1.0) - u_c - v_c
    nx = w_c * sel(g[:, 25:26]) + u_c * sel(g[:, 28:29]) + v_c * sel(g[:, 31:32])
    ny = w_c * sel(g[:, 26:27]) + u_c * sel(g[:, 29:30]) + v_c * sel(g[:, 32:33])
    nz = w_c * sel(g[:, 27:28]) + u_c * sel(g[:, 30:31]) + v_c * sel(g[:, 33:34])
    mat_c = sel(g[:, 34:35])
    bt = best[0:1]
    better = (tmin < bt) | ((tmin == bt) & (gmin < best[5:6]))
    for row, new in ((0, tmin), (1, nx), (2, ny), (3, nz), (4, mat_c), (5, gmin)):
        best[row:row + 1] = jnp.where(better, new, best[row:row + 1])


def make_body(kind, k):
    use_mxu = kind.startswith("mxu")
    use_t = "T" in kind
    full = "full" in kind

    def body(rays_ref, gv_ref, gm_ref, out_ref, best):
        best[0:1] = jnp.full((1, R), INF, F)
        best[5:6] = jnp.full((1, R), GID_PAD, F)
        rays = rays_ref[0:9]
        rays16 = rays_ref[:]  # (16, R)

        def visit(i, acc):
            g = gv_ref[i]
            if "3" in kind:
                va, vb, vc, s, ndo = dots_mxu3(gm_ref[i], rays16, k)
            elif use_t:
                va, vb, vc, s, ndo = dots_mxuT(gm_ref[i], rays16, k)
            elif use_mxu:
                va, vb, vc, s, ndo = dots_mxu(gm_ref[i], rays16, k)
            else:
                va, vb, vc, s, ndo = dots_vpu(g, rays, k)
            if full:
                epilogue(va, vb, vc, s, ndo, g, best, k)
                return acc
            # keep the dots alive without an epilogue
            return acc + jnp.sum(va, axis=0, keepdims=True) \
                + jnp.sum(vb * vc, axis=0, keepdims=True) \
                + jnp.sum(s * ndo, axis=0, keepdims=True)

        acc = jax.lax.fori_loop(0, VL, visit, jnp.zeros((1, R), F))
        if full:
            out_ref[:] = best[0:1] + best[5:6]
        else:
            out_ref[:] = acc

    return body


def run_case(kind, k, precision=None):
    global PRECISION
    PRECISION = precision
    vl = VL
    body = make_body(kind, k)
    rays16 = np.zeros((16, R), F)
    rays16[0:9] = rays_rows()
    gv = geom_vpu(k)
    gm = geom_mxu(k)
    if "3" in kind:
        rays16 = np.asarray(rays64())  # (64, R) bf16
        gm = geom_mx3(k)
    if "T" in kind:
        gm = np.ascontiguousarray(gm.transpose(0, 2, 1))  # (VL, 16, 5k)

    import ml_dtypes
    ray_shape = (64, R) if "3" in kind else (16, R)
    ray_dtype = jnp.bfloat16 if "3" in kind else jnp.float32
    call = pl.pallas_call(
        body,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(ray_shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gv.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(gm.shape, lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, T * R), jnp.float32),
        scratch_shapes=[pltpu.VMEM((6, R), jnp.float32)],
        compiler_params=COMPILER_PARAMS,
    )

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(r16, a, b, n):
        def step(carry, _):
            out = call(carry, a, b)
            return r16.at[0, 0].add((out[0, 0] * 0.0).astype(r16.dtype)), None

        c, _ = jax.lax.scan(step, r16, None, length=n)
        return c

    r_in = jnp.asarray(rays16, dtype=ray_dtype) if "3" in kind else jnp.asarray(rays16)
    for n in (2, 10):
        chain(r_in, jnp.asarray(gv), jnp.asarray(gm), n=n
              ).block_until_ready()
    t = {}
    for n in (2, 10):
        t0 = time.perf_counter()
        r = chain(r_in, jnp.asarray(gv), jnp.asarray(gm), n=n)
        float(r[0, 0])
        t[n] = time.perf_counter() - t0
    per_call = (t[10] - t[2]) / 8
    visits = T * vl
    pairs = visits * k * R
    print(f"{kind:14s} K={k:<4d} {per_call * 1e3:8.3f} ms/call "
          f"{per_call * 1e9 / visits:8.1f} ns/visit "
          f"{pairs / per_call / 1e9:8.2f} Gpairs/s", flush=True)


def main():
    for rep in range(2):
        run_case("vpu-full", 32)
        run_case("mxu3-full", 32)
        run_case("mxu3-dots", 32)
        run_case("mxu-full", 32)
    run_case("mxu3-full", 128)
    run_case("vpu-full", 128)


if __name__ == "__main__":
    main()

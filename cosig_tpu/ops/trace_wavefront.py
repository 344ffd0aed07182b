"""Wavefront renderer: per-bounce Pallas stages with global ray compaction.

The tile-resident megakernel (trace_pallas.py) pays a fixed per-traversal
cost for every (tile, sample, bounce) triple even when almost all rays have
terminated — its whole-tile early exit only fires when *all* 1024 rays in a
tile are dead. This module restructures the pipeline the wavefront way
(the north-star's "ray-compaction between bounces", docs/wavefront_plan.md):

1. a **primary stage** kernel traces bounce 0 for every (pixel, AA sample)
   ray and writes per-ray state to HBM arrays;
2. between bounces, **XLA compacts** the state: alive rays are gathered to
   a dense prefix, sorted by direction octant for packet coherence;
3. a **bounce stage** kernel traces one bounce for tiles of packed rays —
   tiles past the live prefix skip in one scalar test, so sparse bounces
   cost proportional to the number of *live* rays, not pixels;
4. final scatter: per-ray colors accumulate back to pixels by ray id.

Ray state layout (f32 rows x N rays):
0-2 origin, 3-5 direction, 6-8 attenuation, 9-11 color, 12 alive,
13 px, 14 py, 15 sample index, 16 rays-traced count, 17 ray id,
18-23 pad (8-row tiling).

Shading physics is the same quirk-preserving plane arithmetic as the
megakernel (see trace_pallas.py / ops/shade.py); RNG seeds take px/py/
sample from state rows, so images match the megakernel and the XLA oracle
to fp32 ULPs. Geometry handling reuses the cluster structures; VMEM-
resident only (huge scenes keep using the megakernel's streaming path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosig_tpu.accel import clusters as cl
from cosig_tpu.models.soa import FrameParams, StaticConfig
from cosig_tpu.ops import camera, rng
from cosig_tpu.ops.trace_pallas import (
    EPSILON,
    INF,
    OFFSET,
    U_BG,
    U_CAM,
    U_DIST,
    U_INTENSITY,
    U_LIGHT_SIZE,
    U_ORTHO,
    U_PLANE_H,
    U_ROUGHNESS,
    U_SHUTTER,
    _pow32,
    _rsqrt_planes,
    _ruv_planes,
    build_lights,
    build_uniforms,
)

F = np.float32

R = 1024  # rays per packed tile
ROWS = 24  # state rows (see module docstring)
U_DEPTH = 23  # bounce index, appended to the uniforms vector per stage


def _make_traverse(aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
                   list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K):
    """Packet cluster traversal factory — same three-stage structure as the
    megakernel's (vectorized cull -> SMEM compaction -> visit loop), bound
    to this kernel's refs. See trace_pallas.py for the full commentary."""
    GB = cl.CULL_BLOCK
    n_blocks = max(1, C_pad // GB)
    rowid = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

    def traverse(ox, oy, oz, dx, dy, dz, active, max_t=None):
        best_ref[0:1] = jnp.full((1, R), INF, F)
        best_ref[1:2] = jnp.zeros((1, R), F)
        best_ref[2:3] = jnp.ones((1, R), F)
        best_ref[3:4] = jnp.zeros((1, R), F)
        best_ref[4:5] = jnp.full((1, R), -1.0, F)

        idx = F(1.0) / dx
        idy = F(1.0) / dy
        idz = F(1.0) / dz
        # Ray moment w = o x d for the Plücker edge volumes (canonical
        # component order, see intersect.moller_trumbore).
        wx = oy * dz - oz * dy
        wy = oz * dx - ox * dz
        wz = ox * dy - oy * dx
        oxc = ox.reshape(R, 1)
        oyc = oy.reshape(R, 1)
        ozc = oz.reshape(R, 1)
        idxc = idx.reshape(R, 1)
        idyc = idy.reshape(R, 1)
        idzc = idz.reshape(R, 1)
        act = active.astype(F).reshape(R, 1)
        mt_col = None if max_t is None else max_t.reshape(R, 1)

        def cull(b0, b1, b2, b3, b4, b5):
            t0x = (b0 - oxc) * idxc
            t1x = (b3 - oxc) * idxc
            t0y = (b1 - oyc) * idyc
            t1y = (b4 - oyc) * idyc
            t0z = (b2 - ozc) * idzc
            t1z = (b5 - ozc) * idzc
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            boxhit = (tn <= tf) & (tf >= F(0.0)) & (act > F(0.0))
            if mt_col is not None:
                boxhit = boxhit & (tn <= mt_col)
            return jnp.max(boxhit.astype(jnp.int32), axis=0, keepdims=True)

        if n_blocks == 1:
            flag_vmem[:, :] = cull(
                aabb_t[0:1, :], aabb_t[1:2, :], aabb_t[2:3, :],
                aabb_t[3:4, :], aabb_t[4:5, :], aabb_t[5:6, :],
            )
            copy = pltpu.make_async_copy(flag_vmem, flags_smem, sem)
            copy.start()
            copy.wait()

            def compact(c, n):
                f = flags_smem[0, c]

                @pl.when(f > 0)
                def _():
                    list_smem[0, n] = c

                return n + jnp.where(f > 0, 1, 0)

            n_hit = jax.lax.fori_loop(0, C, compact, 0)
        else:
            sbflag_vmem[:, :] = cull(
                sb_aabb_t[0:1, :], sb_aabb_t[1:2, :], sb_aabb_t[2:3, :],
                sb_aabb_t[3:4, :], sb_aabb_t[4:5, :], sb_aabb_t[5:6, :],
            )
            sb_copy = pltpu.make_async_copy(sbflag_vmem, sb_smem, sem)
            sb_copy.start()
            sb_copy.wait()
            flag_vmem[:, :] = jnp.zeros((1, C_pad), jnp.int32)

            def blk(b, _):
                @pl.when(sb_smem[0, b] > 0)
                def _():
                    off = b * GB
                    flag_vmem[:, pl.ds(off, GB)] = cull(
                        aabb_t[0:1, pl.ds(off, GB)],
                        aabb_t[1:2, pl.ds(off, GB)],
                        aabb_t[2:3, pl.ds(off, GB)],
                        aabb_t[3:4, pl.ds(off, GB)],
                        aabb_t[4:5, pl.ds(off, GB)],
                        aabb_t[5:6, pl.ds(off, GB)],
                    )

                return 0

            jax.lax.fori_loop(0, n_blocks, blk, 0)
            copy = pltpu.make_async_copy(flag_vmem, flags_smem, sem)
            copy.start()
            copy.wait()

            def sb_compact(s, n):
                hi = jnp.minimum((s + 1) * GB, C)

                def inner(c, n2):
                    fc = flags_smem[0, c]

                    @pl.when(fc > 0)
                    def _():
                        list_smem[0, n2] = c

                    return n2 + jnp.where(fc > 0, 1, 0)

                return jax.lax.cond(
                    sb_smem[0, s] > 0,
                    lambda nn: jax.lax.fori_loop(s * GB, hi, inner, nn),
                    lambda nn: nn,
                    n,
                )

            n_hit = jax.lax.fori_loop(0, n_blocks, sb_compact, 0)

        def visit(i, _):
            g = geom[list_smem[0, i]]  # (K, GEOM_COMPS)
            # Plücker/edge-volume intersection on precomputed columns
            # (ops/intersect.plucker_constants_host): ~55 flops/pair vs
            # Möller-Trumbore's ~90, same test and epsilons. The chain
            # order mirrors intersect.moller_trumbore exactly.
            gnx, gny, gnz = g[:, 3:4], g[:, 4:5], g[:, 5:6]
            nda = g[:, 6:7]
            va = (
                dx * g[:, 7:8] + dy * g[:, 8:9] + dz * g[:, 9:10]
                + wx * g[:, 10:11] + wy * g[:, 11:12] + wz * g[:, 12:13]
            )
            vb = (
                dx * g[:, 13:14] + dy * g[:, 14:15] + dz * g[:, 15:16]
                + wx * g[:, 16:17] + wy * g[:, 17:18] + wz * g[:, 18:19]
            )
            vc = (
                dx * g[:, 19:20] + dy * g[:, 20:21] + dz * g[:, 21:22]
                + wx * g[:, 22:23] + wy * g[:, 23:24] + wz * g[:, 24:25]
            )
            s = dx * gnx + dy * gny + dz * gnz
            ndo = ox * gnx + oy * gny + oz * gnz
            inv_s = F(1.0) / s
            t = (nda - ndo) * inv_s
            u = vb * inv_s
            v = vc * inv_s
            valid = (
                (jnp.abs(s) >= EPSILON)
                & (va * s >= F(0.0))
                & (vb * s >= F(0.0))
                & (vc * s >= F(0.0))
                & (t > EPSILON)
            )
            tm = jnp.where(valid, t, INF)
            tmin = jnp.min(tm, axis=0, keepdims=True)
            cand = jnp.where(tm == tmin, rowid, K)
            kmin = jnp.min(cand, axis=0, keepdims=True)
            oh = (rowid == kmin).astype(F)

            def sel(col):
                return jnp.sum(oh * col, axis=0, keepdims=True)

            u_c = jnp.sum(oh * jnp.where(valid, u, F(0.0)), axis=0, keepdims=True)
            v_c = jnp.sum(oh * jnp.where(valid, v, F(0.0)), axis=0, keepdims=True)
            w_c = F(1.0) - u_c - v_c
            nx = w_c * sel(g[:, 25:26]) + u_c * sel(g[:, 28:29]) + v_c * sel(g[:, 31:32])
            ny = w_c * sel(g[:, 26:27]) + u_c * sel(g[:, 29:30]) + v_c * sel(g[:, 32:33])
            nz = w_c * sel(g[:, 27:28]) + u_c * sel(g[:, 30:31]) + v_c * sel(g[:, 33:34])
            mat_c = sel(g[:, 34:35])

            better = tmin < best_ref[0:1]
            best_ref[0:1] = jnp.where(better, tmin, best_ref[0:1])
            best_ref[1:2] = jnp.where(better, nx, best_ref[1:2])
            best_ref[2:3] = jnp.where(better, ny, best_ref[2:3])
            best_ref[3:4] = jnp.where(better, nz, best_ref[3:4])
            best_ref[4:5] = jnp.where(better, mat_c, best_ref[4:5])
            return 0

        jax.lax.fori_loop(0, n_hit, visit, 0)

        t = best_ref[0:1]
        hit = t < INF
        nx, ny, nz = _rsqrt_planes(best_ref[1:2], best_ref[2:3], best_ref[3:4])
        nx = jnp.where(hit, nx, F(0.0))
        ny = jnp.where(hit, ny, F(1.0))
        nz = jnp.where(hit, nz, F(0.0))
        return hit, t, nx, ny, nz, best_ref[4:5]

    return traverse


def _bounce_core(cfg, uniforms, mats, lights, traverse, state, M, L,
                 px, py, s_plane, depth_f, is_last):
    """One Whitted bounce on the state rows (plane arithmetic identical to
    the megakernel's; px/py/sample are planes, depth is a traced scalar)."""
    bg = (uniforms[U_BG], uniforms[U_BG + 1], uniforms[U_BG + 2])
    intensity = uniforms[U_INTENSITY]
    light_size = uniforms[U_LIGHT_SIZE]
    roughness = uniforms[U_ROUGHNESS]

    ox, oy, oz = state[0:1], state[1:2], state[2:3]
    dx, dy, dz = state[3:4], state[4:5], state[5:6]
    at_r, at_g, at_b = state[6:7], state[7:8], state[8:9]
    scol_r, scol_g, scol_b = state[9:10], state[10:11], state[11:12]
    alive = state[12:13] > F(0.0)

    state[16:17] = state[16:17] + alive.astype(F)
    hit, t, nx, ny, nz, mat_c = traverse(ox, oy, oz, dx, dy, dz, alive)

    miss = alive & ~hit
    scol_r = scol_r + jnp.where(miss, at_r * bg[0], F(0.0))
    scol_g = scol_g + jnp.where(miss, at_g * bg[1], F(0.0))
    scol_b = scol_b + jnp.where(miss, at_b * bg[2], F(0.0))
    alive = alive & hit

    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz

    props = [jnp.full((1, R), d, F) for d in (1.0, 1.0, 1.0, 0.1, 0.7, 0.0, 0.0, 1.0)]
    for m in range(M):
        is_m = mat_c == F(m)
        for p in range(8):
            props[p] = jnp.where(is_m, mats[m, p], props[p])
    cr, cg, cb, ka, kd, ks, krefr, ior = props

    loc_r = cr * ka if cfg.enable_ambient else jnp.zeros((1, R), F)
    loc_g = cg * ka if cfg.enable_ambient else jnp.zeros((1, R), F)
    loc_b = cb * ka if cfg.enable_ambient else jnp.zeros((1, R), F)

    for li in range(L):
        lx, ly, lz = lights[li, 0], lights[li, 1], lights[li, 2]
        lpx = jnp.full((1, R), 1.0, F) * lx
        lpy = jnp.full((1, R), 1.0, F) * ly
        lpz = jnp.full((1, R), 1.0, F) * lz
        if cfg.enable_soft_shadows:
            jx_, jy_, jz_ = _ruv_planes(
                px + s_plane * F(9.0),
                py + s_plane * F(4.0) + depth_f,
                s_plane,
            )
            lpx = lpx + jx_ * light_size
            lpy = lpy + jy_ * light_size
            lpz = lpz + jz_ * light_size

        tlx = lpx - hx
        tly = lpy - hy
        tlz = lpz - hz
        dist_l = jnp.sqrt(tlx * tlx + tly * tly + tlz * tlz)
        ldx, ldy, ldz = _rsqrt_planes(tlx, tly, tlz)
        ndl = jnp.maximum(F(0.0), nx * ldx + ny * ldy + nz * ldz)

        if cfg.enable_diffuse:
            shadow_active = alive & (ndl > F(0.0))
            state[16:17] = state[16:17] + shadow_active.astype(F)
            s_hit, s_t, *_ = traverse(
                hx + nx * OFFSET, hy + ny * OFFSET, hz + nz * OFFSET,
                ldx, ldy, ldz, shadow_active, max_t=dist_l,
            )
            lit = (~s_hit) | (s_t > dist_l)

            gate = lit & (ndl > F(0.0)) & alive
            dr = cr * kd * ndl
            dg = cg * kd * ndl
            db = cb * kd * ndl
            if cfg.enable_specular:
                hvx, hvy, hvz = _rsqrt_planes(ldx - dx, ldy - dy, ldz - dz)
                spec = _pow32(jnp.maximum(nx * hvx + ny * hvy + nz * hvz, F(0.0)))
                dr = dr + ks * spec
                dg = dg + ks * spec
                db = db + ks * spec
            if cfg.multi_light:
                lr, lg, lb = lights[li, 3], lights[li, 4], lights[li, 5]
                dr, dg, db = dr * lr, dg * lg, db * lb
            loc_r = loc_r + jnp.where(gate, dr, F(0.0))
            loc_g = loc_g + jnp.where(gate, dg, F(0.0))
            loc_b = loc_b + jnp.where(gate, db, F(0.0))

    scol_r = scol_r + jnp.where(alive, at_r * loc_r * intensity, F(0.0))
    scol_g = scol_g + jnp.where(alive, at_g * loc_g * intensity, F(0.0))
    scol_b = scol_b + jnp.where(alive, at_b * loc_b * intensity, F(0.0))
    state[9:10] = scol_r
    state[10:11] = scol_g
    state[11:12] = scol_b

    if is_last:
        state[12:13] = jnp.zeros((1, R), F)
        return

    should_reflect = ks > F(0.0)
    should_refract = (
        (krefr > F(0.0)) if cfg.enable_refraction else jnp.zeros((1, R), bool)
    )

    cos_in = dx * nx + dy * ny + dz * nz
    exiting = cos_in > F(0.0)
    fnx = jnp.where(exiting, -nx, nx)
    fny = jnp.where(exiting, -ny, ny)
    fnz = jnp.where(exiting, -nz, nz)
    eta = jnp.where(exiting, ior, F(1.0) / ior)
    cos = -(dx * fnx + dy * fny + dz * fnz)
    kk = F(1.0) - eta * eta * (F(1.0) - cos * cos)
    tir = kk < F(0.0)
    coef = eta * cos - jnp.sqrt(jnp.maximum(kk, F(0.0)))
    rfx = eta * dx + coef * fnx
    rfy = eta * dy + coef * fny
    rfz = eta * dz + coef * fnz
    dot_f = dx * fnx + dy * fny + dz * fnz
    tirx = dx - F(2.0) * dot_f * fnx
    tiry = dy - F(2.0) * dot_f * fny
    tirz = dz - F(2.0) * dot_f * fnz
    dot_p = cos_in
    rpx = dx - F(2.0) * dot_p * nx
    rpy = dy - F(2.0) * dot_p * ny
    rpz = dz - F(2.0) * dot_p * nz

    ndx = jnp.where(should_refract, jnp.where(tir, tirx, rfx), rpx)
    ndy = jnp.where(should_refract, jnp.where(tir, tiry, rfy), rpy)
    ndz = jnp.where(should_refract, jnp.where(tir, tirz, rfz), rpz)
    amr = jnp.where(should_refract, jnp.where(tir, cr * ks, cr * krefr), cr * ks)
    amg = jnp.where(should_refract, jnp.where(tir, cg * ks, cg * krefr), cg * ks)
    amb = jnp.where(should_refract, jnp.where(tir, cb * ks, cb * krefr), cb * ks)
    sox = jnp.where(
        should_refract, jnp.where(tir, hx + fnx * OFFSET, hx + rfx * OFFSET),
        hx + nx * OFFSET,
    )
    soy = jnp.where(
        should_refract, jnp.where(tir, hy + fny * OFFSET, hy + rfy * OFFSET),
        hy + ny * OFFSET,
    )
    soz = jnp.where(
        should_refract, jnp.where(tir, hz + fnz * OFFSET, hz + rfz * OFFSET),
        hz + nz * OFFSET,
    )

    if cfg.enable_glossy:
        gx_, gy_, gz_ = _ruv_planes(
            px + s_plane * F(55.0) + depth_f,
            py + s_plane * F(22.0),
            jnp.full((1, R), 13.0, F) * depth_f,
        )
        ndx = ndx + gx_ * roughness
        ndy = ndy + gy_ * roughness
        ndz = ndz + gz_ * roughness

    cont = alive & (should_reflect | should_refract)
    ndx, ndy, ndz = _rsqrt_planes(ndx, ndy, ndz)
    at_r = jnp.where(cont, at_r * amr, at_r)
    at_g = jnp.where(cont, at_g * amg, at_g)
    at_b = jnp.where(cont, at_b * amb, at_b)
    state[6:7] = at_r
    state[7:8] = at_g
    state[8:9] = at_b
    state[0:1] = jnp.where(cont, sox, ox)
    state[1:2] = jnp.where(cont, soy, oy)
    state[2:3] = jnp.where(cont, soz, oz)
    state[3:4] = jnp.where(cont, ndx, dx)
    state[4:5] = jnp.where(cont, ndy, dy)
    state[5:6] = jnp.where(cont, ndz, dz)
    max_at = jnp.maximum(jnp.maximum(at_r, at_g), at_b)
    state[12:13] = (cont & (max_at > F(0.0))).astype(F)


def _primary_block(aa: int):
    """Pixel-block shape (bh, bw) such that bh*bw*aa == R."""
    return {1: (32, 32), 2: (16, 32), 4: (16, 16), 8: (8, 16)}[aa]


def _make_primary_kernel(cfg: StaticConfig, dims, nbx, n_real):
    C, C_pad, K, M, L = dims
    width, height = cfg.width, cfg.height
    aa = max(1, cfg.aa_samples)
    grid_w, grid_h = camera.aa_grid(aa)
    bh, bw = _primary_block(aa)

    def kernel(uniforms, mats, lights, aabb_t, sb_aabb_t, geom, state,
               best_ref, flag_vmem, flags_smem, list_smem, sem,
               sbflag_vmem, sb_smem):
        tile = pl.program_id(0)
        bx = tile % nbx
        by = tile // nbx

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        # lane -> (pixel-in-block, sample): consecutive aa lanes share a pixel.
        s_i = lane % aa
        p_i = lane // aa
        pxi = bx * bw + p_i % bw
        pyi = by * bh + p_i // bw
        px = pxi.astype(F)
        py = pyi.astype(F)
        s_plane = s_i.astype(F)
        in_image = (pxi < width) & (pyi < height)

        cam = [uniforms[U_CAM + i] for i in range(12)]
        dist = uniforms[U_DIST]
        plane_h = uniforms[U_PLANE_H]
        plane_w = plane_h * F(width / height)
        ortho_h = uniforms[U_ORTHO]
        ortho_w = ortho_h * F(width / height)
        shutter = uniforms[U_SHUTTER]

        # ---- AA offsets (compute:300-310), sample index as a plane ----
        if aa == 1:
            off_x = jnp.full((1, R), 0.5, F)
            off_y = jnp.full((1, R), 0.5, F)
        else:
            gx = (s_i % grid_w).astype(F)
            gy = (s_i // grid_w).astype(F)
            jx, jy = rng.hash22(px + s_plane * F(13.0), py + s_plane * F(7.0))
            off_x = (gx + jx) / F(grid_w)
            off_y = (gy + jy) / F(grid_h)

        if cfg.is_orthographic:
            u = ((px + off_x) / F(width) - F(0.5)) * F(2.0) * ortho_w
            v = ((py + off_y) / F(height) - F(0.5)) * F(2.0) * ortho_h
            ocx, ocy, ocz = u, v, jnp.full((1, R), 1.0, F) * dist
            dcx = jnp.zeros((1, R), F)
            dcy = jnp.zeros((1, R), F)
            dcz = jnp.full((1, R), -1.0, F)
        else:
            u = ((px + off_x) / F(width) - F(0.5)) * plane_w
            v = ((py + off_y) / F(height) - F(0.5)) * plane_h
            ocx = jnp.zeros((1, R), F)
            ocy = jnp.zeros((1, R), F)
            ocz = jnp.full((1, R), 1.0, F) * dist
            dcx, dcy, dcz = _rsqrt_planes(u - ocx, v - ocy, -ocz)

        ox = cam[0] * ocx + cam[1] * ocy + cam[2] * ocz + cam[3]
        oy = cam[4] * ocx + cam[5] * ocy + cam[6] * ocz + cam[7]
        oz = cam[8] * ocx + cam[9] * ocy + cam[10] * ocz + cam[11]
        dx = cam[0] * dcx + cam[1] * dcy + cam[2] * dcz
        dy = cam[4] * dcx + cam[5] * dcy + cam[6] * dcz
        dz = cam[8] * dcx + cam[9] * dcy + cam[10] * dcz
        dx, dy, dz = _rsqrt_planes(dx, dy, dz)

        if cfg.enable_motion_blur:
            rx, ry, rz = _ruv_planes(px + s_plane, py, s_plane)
            scale = F(0.2) * shutter
            ox = ox + (rx - F(0.5)) * scale
            oy = oy + (ry - F(0.5)) * scale
            oz = oz + (rz - F(0.5)) * scale

        state[0:1] = ox
        state[1:2] = oy
        state[2:3] = oz
        state[3:4] = dx
        state[4:5] = dy
        state[5:6] = dz
        state[6:9] = jnp.ones((3, R), F)
        state[9:12] = jnp.zeros((3, R), F)
        state[12:13] = in_image.astype(F)
        state[13:14] = px
        state[14:15] = py
        state[15:16] = s_plane
        state[16:17] = jnp.zeros((1, R), F)
        # Ray id: (py*W + px)*aa + s for real rays; dead padding rays get
        # the overflow slot n_real.
        rid = (pyi * width + pxi) * aa + s_i
        state[17:18] = jnp.where(in_image, rid, n_real).astype(F)
        state[18:24] = jnp.zeros((6, R), F)

        traverse = _make_traverse(
            aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
            list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K,
        )
        _bounce_core(
            cfg, uniforms, mats, lights, traverse, state, M, L,
            px, py, s_plane, jnp.float32(0.0), is_last=cfg.max_depth == 1,
        )

    return kernel


def _make_bounce_kernel(cfg: StaticConfig, dims, is_last: bool):
    C, C_pad, K, M, L = dims

    def kernel(uniforms, mats, lights, aabb_t, sb_aabb_t, geom, state_in,
               state_out, best_ref, flag_vmem, flags_smem, list_smem, sem,
               sbflag_vmem, sb_smem, state):
        state[:, :] = state_in[:, :]
        any_alive = jnp.sum(state[12:13]) > F(0.0)

        @pl.when(any_alive)
        def _():
            px = state[13:14]
            py = state[14:15]
            s_plane = state[15:16]
            traverse = _make_traverse(
                aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
                list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K,
            )
            _bounce_core(
                cfg, uniforms, mats, lights, traverse, state, M, L,
                px, py, s_plane, uniforms[U_DEPTH], is_last=is_last,
            )

        state_out[:, :] = state[:, :]

    return kernel


GROUP = 128  # compaction granularity (rays); lane-aligned contiguous blocks


def _compact_prefix(state, group_perm, n_pad: int, eg: int):
    """Group-granular ray compaction over the first ``eg`` groups.

    Per-ray gathers (and scatters) on TPU run at ~3 GB/s (element-indexed);
    gathering 128-ray contiguous blocks instead is ~46x faster (2.8 ms vs
    130 ms for a 400 MB state at 4M rays). Groups are spatially coherent
    pixels, so liveness clusters and group packing stays effective: dead
    groups sort to the tail (their tiles then skip in one scalar test),
    alive groups sort by the leading ray's direction octant for packet
    coherence. ``group_perm`` accumulates the composed permutation so the
    final stage can restore pixel order with one group gather instead of a
    (pathologically slow) per-ray scatter.

    Dead rays never resurrect, so alive groups always sit inside the prefix
    dispatched at the previous depth: sorting/gathering only that ``eg``-group
    extent (the permutation stays within it; the dead tail's final colors are
    left in place) turns the full-state permute into a prefix-sized one.

    Returns ``(state, group_perm, n_alive_groups)``."""
    g = n_pad // GROUP
    s3 = state.reshape(ROWS, g, GROUP)
    p3 = jax.lax.slice(s3, (0, 0, 0), (ROWS, eg, GROUP))
    galive = (p3[12] > F(0.5)).any(axis=1)
    octant = (
        (p3[3, :, 0] > 0).astype(jnp.int32)
        + 2 * (p3[4, :, 0] > 0).astype(jnp.int32)
        + 4 * (p3[5, :, 0] > 0).astype(jnp.int32)
    )
    keys = jnp.where(galive, octant, 8)
    order = jnp.argsort(keys, stable=True)
    n_alive_g = jnp.sum(galive.astype(jnp.int32))
    packed = p3[:, order, :].reshape(ROWS, eg * GROUP)
    state = jax.lax.dynamic_update_slice(state, packed, (0, 0))
    gp_prefix = jax.lax.slice(group_perm, (0,), (eg,))[order]
    group_perm = jax.lax.dynamic_update_slice(group_perm, gp_prefix, (0,))
    return state, group_perm, n_alive_g


def render_wavefront(
    cset: cl.ClusterSet,
    params: FrameParams,
    cfg: StaticConfig,
    interpret: bool = False,
):
    """Render via wavefront stages -> (image [H, W, 3], rays_traced)."""
    width, height = cfg.width, cfg.height
    aa = max(1, cfg.aa_samples)
    bh, bw = _primary_block(aa)
    nbx = -(-width // bw)
    nby = -(-height // bh)
    n_tiles = nbx * nby
    n_pad = n_tiles * R
    n_real = width * height * aa

    C, K = cset.num_clusters, cset.k
    C_pad = int(cset.aabb_t.shape[1])
    uniforms = build_uniforms(params)
    lights = build_lights(params, cfg.multi_light)
    L = int(lights.shape[0])
    M = int(cset.mats.shape[0])
    dims = (C, C_pad, K, M, L)

    scratch = [
        pltpu.VMEM((8, R), jnp.float32),
        pltpu.VMEM((1, C_pad), jnp.int32),
        pltpu.SMEM((1, C_pad), jnp.int32),
        pltpu.SMEM((1, C_pad), jnp.int32),
        pltpu.SemaphoreType.DMA,
        pltpu.VMEM((1, 128), jnp.int32),
        pltpu.SMEM((1, 128), jnp.int32),
    ]
    geom_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # uniforms
        pl.BlockSpec(memory_space=pltpu.SMEM),  # mats
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
        pl.BlockSpec((8, C_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (C, K, cl.GEOM_COMPS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
    ]

    # ---- primary stage ----
    state = pl.pallas_call(
        _make_primary_kernel(cfg, dims, nbx, n_real),
        grid=(n_tiles,),
        in_specs=geom_specs,
        out_specs=pl.BlockSpec((ROWS, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, n_pad), jnp.float32),
        scratch_shapes=scratch,
        interpret=interpret,
    )(uniforms, cset.mats, lights, cset.aabb_t, cset.sb_aabb_t, cset.geom)

    # ---- bounce stages with compaction between ----
    # Alive groups are compacted to a prefix, so the bounce kernel only
    # needs to cover that prefix. The grid must be static under jit, so we
    # precompile a small ladder of prefix sizes (1/16, 1/4, full) and pick
    # the smallest one covering the alive count with lax.switch: at depth
    # >= 3 on the headline scene <5 % of rays survive, and dispatching
    # n_tiles/16 instead of n_tiles removes ~10 ms/bounce of dead-tile
    # grid-step + block-DMA overhead. Dead rays never resurrect, so the
    # compaction itself also shrinks: it only sorts/permutes the extent
    # dispatched at the previous depth (an outer switch over ``ext_idx``),
    # leaving the dead tail — whose colors are final — untouched in HBM.
    levels = sorted({max(1, -(-n_tiles // 16)), max(1, -(-n_tiles // 4)), n_tiles})
    lv_arr = jnp.array(levels, jnp.int32)

    def make_bounce(depth: int, is_last: bool):
        kernel = _make_bounce_kernel(cfg, dims, is_last)
        uni_d = uniforms.at[U_DEPTH].set(jnp.float32(depth))

        def run_prefix(st, pt):
            P = pt * R
            sub = jax.lax.slice(st, (0, 0), (ROWS, P))
            out = pl.pallas_call(
                kernel,
                grid=(pt,),
                in_specs=geom_specs
                + [pl.BlockSpec((ROWS, R), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((ROWS, R), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, P), jnp.float32),
                scratch_shapes=scratch + [pltpu.VMEM((ROWS, R), jnp.float32)],
                interpret=interpret,
            )(uni_d, cset.mats, lights, cset.aabb_t, cset.sb_aabb_t,
              cset.geom, sub)
            return jax.lax.dynamic_update_slice(st, out, (0, 0))

        def at_extent(st, gp, ext_tiles):
            st, gp, n_alive_g = _compact_prefix(
                st, gp, n_pad, ext_tiles * R // GROUP)
            needed_tiles = (n_alive_g * GROUP + (R - 1)) // R
            # Smallest level covering the alive prefix; alive rays sit
            # inside the current extent, so idx <= the extent's own index.
            idx = jnp.sum(lv_arr < needed_tiles)
            st = jax.lax.switch(
                idx, [functools.partial(run_prefix, pt=lvl) for lvl in levels],
                st,
            )
            return st, gp, idx

        return at_extent

    group_perm = jnp.arange(n_pad // GROUP, dtype=jnp.int32)
    ext_idx = None  # depth-1 compaction covers the full primary output
    for depth in range(1, cfg.max_depth):
        at_extent = make_bounce(depth, depth == cfg.max_depth - 1)
        if ext_idx is None:
            state, group_perm, ext_idx = at_extent(state, group_perm, n_tiles)
        else:
            state, group_perm, ext_idx = jax.lax.switch(
                ext_idx,
                [functools.partial(at_extent, ext_tiles=lvl) for lvl in levels],
                state, group_perm,
            )

    # ---- restore pixel order (inverse group permutation, one cheap group
    # gather) and un-tile with pure reshapes; no per-ray scatter ----
    g_total = n_pad // GROUP
    inv = jnp.argsort(group_perm)
    state = state.reshape(ROWS, g_total, GROUP)[:, inv, :].reshape(ROWS, n_pad)
    # Ray enumeration (primary kernel): tile-major (nby, nbx), then pixel
    # row-major within the (bh, bw) block, then AA sample.
    colors = state[9:12].reshape(3, nby, nbx, bh, bw, aa)
    img = (
        colors.transpose(0, 1, 3, 2, 4, 5)
        .reshape(3, nby * bh, nbx * bw, aa)[:, :height, :width, :]
        .mean(axis=3)
        .transpose(1, 2, 0)
    )
    rays = jnp.sum(state[16])  # padding rays never traced -> count 0
    return img, rays


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def render_jit(cset, params, cfg: StaticConfig, interpret: bool = False):
    return render_wavefront(cset, params, cfg, interpret)

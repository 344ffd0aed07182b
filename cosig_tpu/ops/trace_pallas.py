"""Fused Pallas megakernel: the whole Whitted pipeline per pixel tile.

The TPU-native rewrite of the reference's single compute kernel
(``Assets/Shaders/BVHRayTracing.compute:273-511``): one ``pallas_call``
renders the frame; each grid step owns a pixel tile (default 16x16 =
256 rays) and runs ray-gen -> packet cluster traversal -> shading ->
shadow traversal -> secondary rays for every bounce and AA sample.
Geometry is VMEM-resident for small scenes, HBM-streamed (double-buffered
per-cluster DMA) for large ones; culling is hierarchical (superblock
pre-cull) once the cluster count exceeds one cull block.

Data-layout contract (see :mod:`cosig_tpu.accel.clusters`):

* per-ray quantities are planes of shape ``(1, R)`` (R on lanes);
* ray x triangle pair grids are ``(K, R)`` (K on sublanes) — built by
  broadcasting triangle columns ``(K, 1)`` against ray planes ``(1, R)``;
  no transposes/relayouts anywhere in the hot loop;
* materials and frame uniforms are SMEM scalars;
* traversal state (best t / normal / material) and ray state live in VMEM
  scratches; each bounce runs under ``@pl.when(any_ray_alive)`` so dead
  tiles skip whole bounces — the tile-level analog of ray compaction.

Shading semantics are the same quirk-preserving rules as
:mod:`cosig_tpu.ops.shade` (see its docstring), re-expressed on planes.
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

F = np.float32

# Default pixel-tile shape; render_clusters accepts overrides (the tile is
# the packet: bigger tiles amortize per-traversal fixed costs, smaller
# tiles cull tighter). 32x32 won the K/tile sweep on the glass benchmark
# (86.6 vs 63.9 Mrays/s at 16x16); >=2048-ray packets lose to culling.
TILE_W = 32
TILE_H = 32

INF = F(3.402823466e38)
EPSILON = F(1e-4)
OFFSET = F(1e-2)

# Auto-stream geometry through HBM above this clustered-geometry size.
STREAM_THRESHOLD_BYTES = 6 * 1024 * 1024

# uniforms layout (SMEM [UNIFORMS_LEN] f32)
U_CAM = 0  # 12 floats: rows of the 3x4 camera->object matrix
U_DIST = 12
U_PLANE_H = 13
U_ORTHO = 14
U_BG = 15  # 3
U_INTENSITY = 18
U_LIGHT_SIZE = 19
U_ROUGHNESS = 20
U_SHUTTER = 21
U_ROW_OFF = 22  # global row offset of this shard's band (multi-chip)
UNIFORMS_LEN = 24


def _pow32(x):
    x2 = x * x
    x4 = x2 * x2
    x8 = x4 * x4
    x16 = x8 * x8
    return x16 * x16


def _rsqrt_planes(x, y, z):
    # 1/sqrt then multiply (not lax.rsqrt): bit-matches intersect.normalize.
    inv = F(1.0) / jnp.sqrt(x * x + y * y + z * z)
    return x * inv, y * inv, z * inv


def _ruv_planes(sx, sy, sz):
    """random_unit_vector on planes (compute:124-131)."""
    h0, _, h2 = rng.hash33(sx, sy, sz)
    z = h2 * F(2.0) - F(1.0)
    a = h0 * rng.TWO_PI
    r = jnp.sqrt(jnp.maximum(F(0.0), F(1.0) - z * z))
    return r * jnp.cos(a), r * jnp.sin(a), z


def build_uniforms(params: FrameParams, row_offset=0.0) -> jax.Array:
    """Pack dynamic frame parameters into the SMEM uniforms vector."""
    m = params.cam_to_obj
    plane_h = (
        F(2.0) * params.cam_distance * jnp.tan(jnp.deg2rad(params.fov_deg) * F(0.5))
    )
    vals = [
        m[0, 0], m[0, 1], m[0, 2], m[0, 3],
        m[1, 0], m[1, 1], m[1, 2], m[1, 3],
        m[2, 0], m[2, 1], m[2, 2], m[2, 3],
        params.cam_distance,
        plane_h,
        params.ortho_size,
        params.background[0], params.background[1], params.background[2],
        params.light_intensity,
        params.light_size,
        params.surface_roughness,
        params.shutter_speed,
        row_offset, F(0.0),
    ]
    return jnp.stack([jnp.asarray(v, F) for v in vals])


def build_lights(params: FrameParams, multi_light: bool) -> jax.Array:
    """SMEM light table [L, 8]: pos xyz, rgb, pad pad."""
    pos = params.light_pos if multi_light else params.light_pos[:1]
    rgb = params.light_rgb if multi_light else params.light_rgb[:1]
    pad = jnp.zeros((pos.shape[0], 2), F)
    return jnp.concatenate([pos, rgb, pad], axis=1)


def _make_kernel(cfg: StaticConfig, C: int, C_pad: int, K: int, M: int, L: int, nbx: int,
                 tile_w: int, tile_h: int, stream: bool):
    """Build the megakernel body (all static config closed over)."""

    width, height = cfg.width, cfg.height
    aa = max(1, cfg.aa_samples)
    grid_w, grid_h = camera.aa_grid(aa)
    R = tile_w * tile_h
    GB = cl.CULL_BLOCK
    n_blocks = max(1, C_pad // GB)

    def kernel(
        uniforms, mats, lights, aabb_t, sb_aabb_t, geom,
        out_ref, best_ref, state, flag_vmem, flags_smem, list_smem, sem,
        gbuf, gsem, sbflag_vmem, sb_smem,
    ):
        tile = pl.program_id(0)
        bx = tile % nbx
        by = tile // nbx

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        pxi = bx * tile_w + lane % tile_w
        pyi = by * tile_h + lane // tile_w
        px = pxi.astype(F)
        # Global pixel row: the shard's band offset (0 single-chip) keeps
        # the projection plane, RNG seeds and ray directions global.
        py = pyi.astype(F) + uniforms[U_ROW_OFF]

        # ---- camera / frame scalars --------------------------------------
        cam = [uniforms[U_CAM + i] for i in range(12)]
        dist = uniforms[U_DIST]
        plane_h = uniforms[U_PLANE_H]
        plane_w = plane_h * F(width / height)
        ortho_h = uniforms[U_ORTHO]
        ortho_w = ortho_h * F(width / height)
        bg = (uniforms[U_BG], uniforms[U_BG + 1], uniforms[U_BG + 2])
        intensity = uniforms[U_INTENSITY]
        light_size = uniforms[U_LIGHT_SIZE]
        roughness = uniforms[U_ROUGHNESS]
        shutter = uniforms[U_SHUTTER]

        # ------------------------------------------------------------------
        def traverse(ox, oy, oz, dx, dy, dz, active, max_t=None):
            """Packet cluster traversal -> (hit, t, nx, ny, nz, mat).

            Three stages, sized so the scalar unit never stalls the VPU on a
            per-cluster basis (the per-cluster branch pattern costs ~300 ns
            per cluster; this structure costs ~0.4 us per *traversal*):

            1. one vectorized (R, C_pad) slab test, masked by the alive
               lanes (dead rays don't vote -> natural ray compaction);
            2. per-cluster any-hit flags DMA'd VMEM->SMEM, scalar-compacted
               into a hit-cluster index list;
            3. a dynamic-trip fori_loop over only the hit clusters.
            """
            best_ref[0:1] = jnp.full((1, R), INF, F)
            best_ref[1:2] = jnp.zeros((1, R), F)
            best_ref[2:3] = jnp.ones((1, R), F)  # default normal (0,1,0)
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
            rowid = jax.lax.broadcasted_iota(jnp.int32, (K, 1), 0)

            # ---- stage 1: vectorized cull ----
            oxc = ox.reshape(R, 1)
            oyc = oy.reshape(R, 1)
            ozc = oz.reshape(R, 1)
            idxc = idx.reshape(R, 1)
            idyc = idy.reshape(R, 1)
            idzc = idz.reshape(R, 1)
            act = active.astype(F).reshape(R, 1)
            mt_col = None if max_t is None else max_t.reshape(R, 1)

            def cull(b0, b1, b2, b3, b4, b5):
                """Slab test of the tile's rays vs a row of boxes -> flags
                (1, W) i32. Inputs are the six AABB component rows."""
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
                    # Shadow rays: boxes entered beyond the light distance
                    # cannot contain a hit closer than the light (t >= tn);
                    # `lit` treats miss and beyond-light hits identically.
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
                # Hierarchical cull for large scenes: the (R, C_pad) slab
                # test would blow VMEM, so test CULL_BLOCK-cluster
                # superblock unions first and only cull (and later compact)
                # the blocks some ray may enter.
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

            # ---- stage 3: intersect only the hit clusters ----
            if stream:
                # Geometry lives in HBM; double-buffer each visited
                # cluster's (K, GEOM_COMPS) block through VMEM so the DMA
                # for cluster i+1 overlaps the intersection of cluster i
                # (geometry-domain blocking, SURVEY.md section 5).
                def _gdma(i, slot):
                    return pltpu.make_async_copy(
                        geom.at[list_smem[0, i]], gbuf.at[slot], gsem.at[slot]
                    )

                @pl.when(n_hit > 0)
                def _():
                    _gdma(0, 0).start()

            def visit(i, _):
                if stream:
                    slot = jax.lax.rem(i, 2)

                    @pl.when(i + 1 < n_hit)
                    def _():
                        _gdma(i + 1, jax.lax.rem(i + 1, 2)).start()

                    _gdma(i, slot).wait()
                    g = gbuf[slot]  # (K, GEOM_COMPS)
                else:
                    g = geom[list_smem[0, i]]  # (K, GEOM_COMPS)
                # Plücker/edge-volume intersection on precomputed columns
                # (ops/intersect.plucker_constants_host): ~55 flops/pair vs
                # Möller-Trumbore's ~90, same test and epsilons
                # (compute:153-179). Chain order mirrors
                # intersect.moller_trumbore exactly.
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
                tmin = jnp.min(tm, axis=0, keepdims=True)  # (1, R)
                # First-occurrence winner via row-index min.
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
            nx, ny, nz = best_ref[1:2], best_ref[2:3], best_ref[3:4]
            nx, ny, nz = _rsqrt_planes(nx, ny, nz)
            nx = jnp.where(hit, nx, F(0.0))
            ny = jnp.where(hit, ny, F(1.0))
            nz = jnp.where(hit, nz, F(0.0))
            return hit, t, nx, ny, nz, best_ref[4:5]

        # ------------------------------------------------------------------
        def fetch_mat(mat_c):
            """Material select via a static loop over the SMEM table
            (defaults for miss, compute:371-376)."""
            props = [
                jnp.full((1, R), d, F)
                for d in (1.0, 1.0, 1.0, 0.1, 0.7, 0.0, 0.0, 1.0)
            ]
            for m in range(M):
                is_m = mat_c == F(m)
                for p in range(8):
                    props[p] = jnp.where(is_m, mats[m, p], props[p])
            return props  # cr, cg, cb, kA, kD, kS, kRefr, ior

        # ------------------------------------------------------------------
        # Ray state lives in the VMEM scratch `state` so each bounce can be
        # a @pl.when(any_ray_alive) block — dead tiles skip whole bounces
        # (traversal + shadow + shading), the tile-level form of ray
        # compaction. Rows: 0-2 origin, 3-5 direction, 6-8 attenuation,
        # 9-11 sample color, 12 alive flag, 13 ray count (across samples).
        acc_r = jnp.zeros((1, R), F)
        acc_g = jnp.zeros((1, R), F)
        acc_b = jnp.zeros((1, R), F)
        state[13:14] = jnp.zeros((1, R), F)

        for s in range(aa):
            # ---- AA offsets (compute:300-310) ----
            if aa == 1:
                off_x = jnp.full((1, R), 0.5, F)
                off_y = jnp.full((1, R), 0.5, F)
            else:
                gy, gx = divmod(s, grid_w)
                jx, jy = rng.hash22(px + F(s * 13.0), py + F(s * 7.0))
                off_x = (F(gx) + jx) / F(grid_w)
                off_y = (F(gy) + jy) / F(grid_h)

            # ---- ray generation (compute:291-340) ----
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
                ocx, ocy, ocz = (
                    jnp.zeros((1, R), F),
                    jnp.zeros((1, R), F),
                    jnp.full((1, R), 1.0, F) * dist,
                )
                dcx, dcy, dcz = _rsqrt_planes(u - ocx, v - ocy, -ocz)

            ox = cam[0] * ocx + cam[1] * ocy + cam[2] * ocz + cam[3]
            oy = cam[4] * ocx + cam[5] * ocy + cam[6] * ocz + cam[7]
            oz = cam[8] * ocx + cam[9] * ocy + cam[10] * ocz + cam[11]
            dx = cam[0] * dcx + cam[1] * dcy + cam[2] * dcz
            dy = cam[4] * dcx + cam[5] * dcy + cam[6] * dcz
            dz = cam[8] * dcx + cam[9] * dcy + cam[10] * dcz
            dx, dy, dz = _rsqrt_planes(dx, dy, dz)

            if cfg.enable_motion_blur:
                rx, ry, rz = _ruv_planes(px + F(s), py, jnp.full((1, R), s, F))
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
            state[6:9] = jnp.ones((3, R), F)   # attenuation
            state[9:12] = jnp.zeros((3, R), F)  # sample color
            state[12:13] = jnp.ones((1, R), F)  # alive

            for depth in range(cfg.max_depth):
                any_alive = jnp.sum(state[12:13]) > F(0.0)

                @pl.when(any_alive)
                def _(depth=depth, s=s):
                    ox, oy, oz = state[0:1], state[1:2], state[2:3]
                    dx, dy, dz = state[3:4], state[4:5], state[5:6]
                    at_r, at_g, at_b = state[6:7], state[7:8], state[8:9]
                    scol_r, scol_g, scol_b = state[9:10], state[10:11], state[11:12]
                    alive = state[12:13] > F(0.0)

                    state[13:14] = state[13:14] + alive.astype(F)
                    hit, t, nx, ny, nz, mat_c = traverse(ox, oy, oz, dx, dy, dz, alive)

                    miss = alive & ~hit
                    scol_r = scol_r + jnp.where(miss, at_r * bg[0], F(0.0))
                    scol_g = scol_g + jnp.where(miss, at_g * bg[1], F(0.0))
                    scol_b = scol_b + jnp.where(miss, at_b * bg[2], F(0.0))
                    alive = alive & hit

                    hx = ox + t * dx
                    hy = oy + t * dy
                    hz = oz + t * dz
                    cr, cg, cb, ka, kd, ks, krefr, ior = fetch_mat(mat_c)

                    loc_r = cr * ka if cfg.enable_ambient else jnp.zeros((1, R), F)
                    loc_g = cg * ka if cfg.enable_ambient else jnp.zeros((1, R), F)
                    loc_b = cb * ka if cfg.enable_ambient else jnp.zeros((1, R), F)

                    depth_f = F(float(depth))
                    for li in range(L):
                        lx, ly, lz = lights[li, 0], lights[li, 1], lights[li, 2]
                        lpx = jnp.full((1, R), 1.0, F) * lx
                        lpy = jnp.full((1, R), 1.0, F) * ly
                        lpz = jnp.full((1, R), 1.0, F) * lz
                        if cfg.enable_soft_shadows:
                            jx_, jy_, jz_ = _ruv_planes(
                                px + F(s * 9.0),
                                py + F(s * 4.0) + depth_f,
                                jnp.full((1, R), s, F),
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
                            state[13:14] = state[13:14] + shadow_active.astype(F)
                            shx = hx + nx * OFFSET
                            shy = hy + ny * OFFSET
                            shz = hz + nz * OFFSET
                            s_hit, s_t, *_ = traverse(
                                shx, shy, shz, ldx, ldy, ldz, shadow_active,
                                max_t=dist_l,
                            )
                            lit = (~s_hit) | (s_t > dist_l)

                            gate = lit & (ndl > F(0.0)) & alive
                            dr = cr * kd * ndl
                            dg = cg * kd * ndl
                            db = cb * kd * ndl
                            if cfg.enable_specular:
                                hvx, hvy, hvz = _rsqrt_planes(ldx - dx, ldy - dy, ldz - dz)
                                spec = _pow32(
                                    jnp.maximum(nx * hvx + ny * hvy + nz * hvz, F(0.0))
                                )
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

                    if depth == cfg.max_depth - 1:
                        state[12:13] = jnp.zeros((1, R), F)
                        return  # no secondary rays after the final bounce

                    # ---- secondary ray (compute:420-455) ----
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
                    # reflect about flipped normal (TIR) / plain normal
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
                        should_refract,
                        jnp.where(tir, hx + fnx * OFFSET, hx + rfx * OFFSET),
                        hx + nx * OFFSET,
                    )
                    soy = jnp.where(
                        should_refract,
                        jnp.where(tir, hy + fny * OFFSET, hy + rfy * OFFSET),
                        hy + ny * OFFSET,
                    )
                    soz = jnp.where(
                        should_refract,
                        jnp.where(tir, hz + fnz * OFFSET, hz + rfz * OFFSET),
                        hz + nz * OFFSET,
                    )

                    if cfg.enable_glossy:
                        gx_, gy_, gz_ = _ruv_planes(
                            px + F(s * 55.0) + depth_f,
                            py + F(s * 22.0),
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

            acc_r = acc_r + state[9:10]
            acc_g = acc_g + state[10:11]
            acc_b = acc_b + state[11:12]

        inv_aa = F(1.0 / aa)
        out_ref[0:1] = acc_r * inv_aa
        out_ref[1:2] = acc_g * inv_aa
        out_ref[2:3] = acc_b * inv_aa
        out_ref[3:4] = state[13:14]

    return kernel


def render_clusters(
    cset: cl.ClusterSet,
    params: FrameParams,
    cfg: StaticConfig,
    interpret: bool = False,
    tile: tuple = None,
    rows: int = None,
    row_offset=0.0,
    stream: bool = None,
):
    """Render via the megakernel -> (image [rows, W, 3] f32 row-0-bottom,
    rays_traced scalar f32).

    ``tile`` = (rows, cols) pixels per packet (product should be a
    multiple of 128 lanes). ``rows``/``row_offset`` restrict rendering to
    a global row band (framebuffer sharding); the projection plane always
    uses the global cfg dimensions.

    ``stream``: keep geometry in HBM and double-buffer visited clusters
    through VMEM (for scenes beyond the VMEM budget); default: auto by
    geometry size."""
    C_pad_pre = int(cset.aabb_t.shape[1])
    if tile is None:
        # Large packets amortize per-traversal overhead, but multi-block
        # scenes also scale the blocked-cull temporaries by R — 32x32
        # tiles with 512-wide cull blocks exceed the 16 MB VMEM budget.
        tile = (TILE_H, TILE_W) if C_pad_pre <= cl.CULL_BLOCK else (16, 16)
    tile_h, tile_w = tile
    R = tile_w * tile_h
    width, height = cfg.width, cfg.height
    band = height if rows is None else rows
    nbx = -(-width // tile_w)
    nby = -(-band // tile_h)
    n_tiles = nbx * nby

    C, K = cset.num_clusters, cset.k
    C_pad = int(cset.aabb_t.shape[1])
    M = int(cset.mats.shape[0])

    uniforms = build_uniforms(params, jnp.asarray(row_offset, jnp.float32))
    lights = build_lights(params, cfg.multi_light)
    L = int(lights.shape[0])

    if stream is None:
        stream = int(cset.geom.size) * 4 > STREAM_THRESHOLD_BYTES
    kernel = _make_kernel(cfg, C, C_pad, K, M, L, nbx, tile_w, tile_h, stream)
    geom_in = cset.geom
    if stream:
        # HBM slices DMA'd per cluster must have a 128-aligned last dim;
        # pad the component axis (GEOM_COMPS=19 -> 128). HBM-only cost
        # (~6.7x on the geometry bytes); the per-cluster DMA grows by the
        # same factor but stays tiny (16 KB -> ~20 ns at HBM bandwidth).
        geom_in = jnp.pad(
            cset.geom, ((0, 0), (0, 0), (0, 128 - cl.GEOM_COMPS))
        )

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # uniforms
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mats
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec((8, C_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                memory_space=pltpu.HBM
            ) if stream else pl.BlockSpec(
                (C, K, cl.GEOM_COMPS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((4, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * R), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((8, R), jnp.float32),      # best-hit state
            pltpu.VMEM((16, R), jnp.float32),     # ray state (o,d,atten,col,alive,count)
            pltpu.VMEM((1, C_pad), jnp.int32),    # cluster flags (vector)
            pltpu.SMEM((1, C_pad), jnp.int32),    # cluster flags (scalar)
            pltpu.SMEM((1, C_pad), jnp.int32),    # compacted hit list
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, K, 128 if stream else cl.GEOM_COMPS), jnp.float32),  # stream buffers
            pltpu.SemaphoreType.DMA((2,)),        # stream semaphores
            pltpu.VMEM((1, 128), jnp.int32),      # superblock flags (vector)
            pltpu.SMEM((1, 128), jnp.int32),      # superblock flags (scalar)
        ],
        interpret=interpret,
    )(uniforms, cset.mats, lights, cset.aabb_t, cset.sb_aabb_t, geom_in)

    # Un-tile: [4, nby, nbx, tile_h, tile_w] -> [H, W, 4]; rgb + ray count.
    full = (
        out.reshape(4, nby, nbx, tile_h, tile_w)
        .transpose(1, 3, 2, 4, 0)
        .reshape(nby * tile_h, nbx * tile_w, 4)
    )
    img = full[:band, :width, :3]
    rays = jnp.sum(full[:band, :width, 3])
    return img, rays


@functools.partial(jax.jit, static_argnames=("cfg", "interpret", "tile"))
def render_jit(cset, params, cfg: StaticConfig, interpret: bool = False,
               tile: tuple = None):
    return render_clusters(cset, params, cfg, interpret, tile)


@functools.partial(jax.jit, static_argnames=("cfg", "k", "interpret"))
def render_chain(cset, params, cfg: StaticConfig, k: int, interpret: bool = False):
    """Render the same frame k times inside ONE dispatch (lax.scan).

    For benchmarking on tunneled TPUs where per-dispatch overhead is large
    and variable: timing two chain lengths and taking the slope isolates
    pure device time per frame. Returns (last image, total rays)."""

    import dataclasses

    def body(carry, _):
        prev_img, acc = carry
        # Carry-dependent zero prevents loop-invariant hoisting of the
        # render out of the scan.
        p2 = dataclasses.replace(
            params, light_intensity=params.light_intensity + prev_img[0, 0, 0] * 0.0
        )
        img, rays = render_clusters(cset, p2, cfg, interpret)
        return (img, acc + rays), None

    img0, rays0 = render_clusters(cset, params, cfg, interpret)
    (img, total_rays), _ = jax.lax.scan(
        body, (img0, rays0), None, length=k - 1
    )
    return img, total_rays

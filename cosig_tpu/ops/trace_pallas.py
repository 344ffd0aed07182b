"""Fused Pallas megakernel: the whole Whitted pipeline per pixel tile.

The TPU-native rewrite of the reference's single compute kernel
(``Assets/Shaders/BVHRayTracing.compute:273-511``): one ``pallas_call``
renders the frame; each grid step owns a pixel tile (default 32x32 =
1024 rays) and runs ray-gen -> packet cluster traversal -> shading ->
shadow traversal -> secondary rays for every bounce and AA sample.
Geometry is VMEM-resident for small scenes, HBM-streamed (double-buffered
per-cluster DMA) for large ones; culling is hierarchical (superblock
pre-cull) once the cluster count exceeds one cull block.

The traversal and bounce physics live in :mod:`cosig_tpu.ops.kernel_core`
(shared verbatim with the wavefront backend so the two stay bitwise
equal); this module owns the schedule: per-tile ray generation, the
AA-sample x depth loop with whole-tile early exit, and the framebuffer
layout.

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
import os as _os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosig_tpu.accel import clusters as cl
from cosig_tpu.models.soa import FrameParams, StaticConfig
from cosig_tpu.ops import camera, rng
from cosig_tpu.ops.kernel_core import (  # noqa: F401  (re-exported legacy names)
    COMPILER_PARAMS,
    EPSILON,
    INF,
    OFFSET,
    U_BG,
    U_CAM,
    U_DEPTH,
    U_DIST,
    U_INTENSITY,
    U_LIGHT_SIZE,
    U_ORTHO,
    U_PLANE_H,
    U_ROUGHNESS,
    U_ROW_OFF,
    U_SHUTTER,
    UNIFORMS_LEN,
    _pow32,
    _rsqrt_planes,
    _ruv_planes,
    ROW_COUNT,
    bounce_core,
    build_lights,
    build_uniforms,
    make_traverse,
)

F = np.float32

# Default pixel-tile shape; render_clusters accepts overrides (64x64
# super-tiles with 1024-lane sub-packets are supported — the
# trace_wavefront structure — but measured SLOWER here on glass d6: the
# megakernel's only sparse-bounce mechanism is the whole-tile early exit,
# whose granularity degrades at 4096 rays/tile; 32x32 keeps it effective).
TILE_W = 32
TILE_H = 32

from cosig_tpu.ops.kernel_core import STREAM_THRESHOLD_BYTES  # noqa: F401

STATE_ROWS = 16  # shared ray-state layout (kernel_core ROW_* contract)

# MXU pair tests in the megakernel (same rule as the wavefront's
# _stage_resources: compiled-TPU default ON for unstreamed geometry,
# COSIG_MXU=0 reverts, "force" enables under interpret for CPU gates).
# Full mode only — closest-hit AND any-hit ride the MXU; the megakernel
# runs both through one traverse closure with disjoint staging bands.
_MXU_ENV = _os.environ.get("COSIG_MXU", "1")

# (Window selection — COSIG_WSEL / COSIG_MEGA_S — was REJECTED on
# hardware in round 5, in the megakernel too: glass 92.6 -> 71.3 with
# MEGA_S=8, large 78.6 -> 66.6. Pruned; see docs/packet_floor.md.)


def _use_mxu(cset, stream: bool, interpret: bool) -> bool:
    return (
        not stream
        and cset.geom_mx is not None
        and _MXU_ENV != "0"
        and (not interpret or _MXU_ENV == "force")
    )


def _subpacket_grid(tile_h: int, tile_w: int, c_pad: int):
    """Sub-packet layout for a tile -> (S, quad_rows, quad_cols).

    One sub-packet per 1024 lanes (the trace_wavefront super-tile rule:
    finer masks lose to scalar branch costs, coarser ones re-inflate pair
    work). Sub-packets are static lane slices, so R/S must be a 128
    multiple; quads must divide the tile shape evenly.

    """
    del c_pad
    R = tile_h * tile_w
    shapes = {8: (4, 2), 4: (2, 2), 2: (2, 1), 1: (1, 1)}
    for S in (8, 4, 2):
        sqh, sqw = shapes[S]
        if (
            R // S == 1024
            and tile_h % sqh == 0
            and tile_w % sqw == 0
        ):
            return S, sqh, sqw
    return 1, 1, 1


def _make_kernel(cfg: StaticConfig, C: int, C_pad: int, K: int, M: int, L: int, nbx: int,
                 tile_w: int, tile_h: int, stream: bool, prim_counts=(0, 0),
                 n_subg: int = 1, mxu: bool = False):
    """Build the megakernel body (all static config closed over)."""

    width, height = cfg.width, cfg.height
    aa = max(1, cfg.aa_samples)
    grid_w, grid_h = camera.aa_grid(aa)
    R = tile_w * tile_h
    S, sqh, sqw = _subpacket_grid(tile_h, tile_w, C_pad)
    qh, qw = tile_h // sqh, tile_w // sqw
    n_sph, n_box = prim_counts

    def kernel(
        uniforms, mats, lights, prims, aabb_t, sb_aabb_t, sub_aabb_t, geom,
        geom_mx, gatt,
        out_ref, best_ref, state, flag_vmem, flags_smem, list_smem, sem,
        gbuf, gsem, sbflag_vmem, sb_smem, raysmx,
    ):
        tile = pl.program_id(0)
        bx = tile % nbx
        by = tile // nbx

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        # Quad-major pixel order: each R/S-lane sub-packet covers one
        # compact (qh, qw) quad, tightening its cull footprint.
        quad = lane // (qh * qw)
        q = lane % (qh * qw)
        pxi = bx * tile_w + (quad % sqw) * qw + q % qw
        pyi = by * tile_h + (quad // sqw) * qh + q // qw
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
        shutter = uniforms[U_SHUTTER]

        mx_kw = dict(
            geom_mx=geom_mx if mxu else None,
            gatt=gatt if mxu else None,
            raysmx=raysmx, mxu_anyhit=True,
        )
        traverse = make_traverse(
            aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
            list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K, R,
            gbuf=gbuf, gsem=gsem, stream=stream, subpackets=S,
            prims=prims, n_sph=n_sph, n_box=n_box, **mx_kw,
        )
        # Depth 0 traces coherent camera packets: frustum-cull them
        # (kernel_core docstring); bounce rays keep the per-ray cull.
        traverse_frustum = make_traverse(
            aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
            list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K, R,
            gbuf=gbuf, gsem=gsem, stream=stream, subpackets=S,
            prims=prims, n_sph=n_sph, n_box=n_box, frustum=True,
            # The megakernel's frustum and per-ray traversals share ONE
            # geometry ref, so the subgroup-major layout can't apply here;
            # subgroup visits are a wavefront-only optimization.
            sub_aabb_t=sub_aabb_t, subgroups=1, **mx_kw,
        )

        # ------------------------------------------------------------------
        # Ray state lives in the VMEM scratch `state` (kernel_core row
        # layout) so each bounce can be a @pl.when(any_ray_alive) block —
        # dead tiles skip whole bounces (traversal + shadow + shading), the
        # tile-level form of ray compaction.
        acc_r = jnp.zeros((1, R), F)
        acc_g = jnp.zeros((1, R), F)
        acc_b = jnp.zeros((1, R), F)
        state[ROW_COUNT : ROW_COUNT + 1] = jnp.zeros((1, R), F)  # rays-traced count

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

            s_plane = jnp.full((1, R), s, F)
            for depth in range(cfg.max_depth):
                any_alive = jnp.sum(state[12:13]) > F(0.0)

                @pl.when(any_alive)
                def _(depth=depth, s_plane=s_plane):
                    bounce_core(
                        cfg, uniforms, mats, lights,
                        traverse_frustum if depth == 0 else traverse,
                        state, M, L,
                        px, py, s_plane, F(float(depth)),
                        is_last=depth == cfg.max_depth - 1,
                    )

            acc_r = acc_r + state[9:10]
            acc_g = acc_g + state[10:11]
            acc_b = acc_b + state[11:12]

        inv_aa = F(1.0 / aa)
        out_ref[0:1] = acc_r * inv_aa
        out_ref[1:2] = acc_g * inv_aa
        out_ref[2:3] = acc_b * inv_aa
        out_ref[3:4] = state[ROW_COUNT : ROW_COUNT + 1]

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
    prims=None,
    prim_counts=(0, 0),
):
    """Render via the megakernel -> (image [rows, W, 3] f32 row-0-bottom,
    rays_traced scalar f32).

    ``tile`` = (rows, cols) pixels per packet (product should be a
    multiple of 128 lanes). ``rows``/``row_offset`` restrict rendering to
    a global row band (framebuffer sharding); the projection plane always
    uses the global cfg dimensions.

    ``stream``: keep geometry in HBM and double-buffer visited clusters
    through VMEM (for scenes beyond the VMEM budget); default: auto by
    geometry size.

    ``prims``/``prim_counts``: analytic sphere/box instance table
    (ops/analytic.pack_prims_host) folded in-kernel after the cluster
    visits (analytic geometry mode)."""
    C_pad_pre = int(cset.aabb_t.shape[1])
    if tile is None:
        # Large packets amortize per-traversal overhead, but multi-block
        # scenes also scale the blocked-cull temporaries by R — 32x32
        # tiles with 512-wide cull blocks exceed the 16 MB VMEM budget.
        # Sub-packet-chunked culls bound slab temporaries at
        # (1024, CULL_BLOCK), so multi-block scenes use the big tile too
        # (with the raised kernel VMEM limit, kernel_core.COMPILER_PARAMS).
        tile = (TILE_H, TILE_W)
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
    if prims is None:
        prims = jnp.zeros((1, 22), jnp.float32)
    mxu = _use_mxu(cset, stream, interpret)
    kernel = _make_kernel(
        cfg, C, C_pad, K, M, L, nbx, tile_w, tile_h, stream, prim_counts,
        cset.subgroups, mxu=mxu,
    )
    geom_in = cset.geom
    if stream:
        # HBM slices DMA'd per cluster must have a 128-aligned last dim;
        # pad the component axis (GEOM_COMPS=19 -> 128). HBM-only cost
        # (~6.7x on the geometry bytes); the per-cluster DMA grows by the
        # same factor but stays tiny (16 KB -> ~20 ns at HBM bandwidth).
        geom_in = jnp.pad(
            cset.geom, ((0, 0), (0, 0), (0, 128 - cl.GEOM_COMPS))
        )
    # MXU operands (same convention as the wavefront's _stage_resources):
    # full mode replaces the 36-col geometry with an unread dummy.
    if mxu:
        geom_in = jnp.zeros((1, 8, 128), jnp.float32)
        mx_in, att_in = cset.geom_mx, cset.gatt
    else:
        mx_in = jnp.zeros((1, 16, cl.MX_COLS), jnp.bfloat16)
        att_in = jnp.zeros((1, 3 * cl.ATT_ROWS, 8), jnp.bfloat16)

    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # uniforms
            pl.BlockSpec(memory_space=pltpu.SMEM),  # mats
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
            pl.BlockSpec(memory_space=pltpu.SMEM),  # analytic prims
            pl.BlockSpec((8, C_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * cset.subgroups, C_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # sub-AABBs (2nd level)
            pl.BlockSpec(
                memory_space=pltpu.HBM
            ) if stream else pl.BlockSpec(
                tuple(geom_in.shape), lambda i: (0, 0, 0),
                memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(tuple(mx_in.shape), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tuple(att_in.shape), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((4, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * R), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((18, R), jnp.float32),     # best-hit rows + staged rays + p2 bound
            pltpu.VMEM((STATE_ROWS, R), jnp.float32),  # ray state (kernel_core rows)
            pltpu.VMEM((1, C_pad), jnp.int32),    # cluster flags (vector)
            pltpu.SMEM((1, C_pad), jnp.int32),    # cluster flags (scalar)
            pltpu.SMEM((1, C_pad * cset.subgroups), jnp.int32),  # visit list
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, K, 128 if stream else cl.GEOM_COMPS), jnp.float32),  # stream buffers
            pltpu.SemaphoreType.DMA((2,)),        # stream semaphores
            pltpu.VMEM((1, 128), jnp.int32),      # superblock flags (vector)
            pltpu.SMEM((1, 128), jnp.int32),      # superblock flags (scalar)
            # MXU limb staging: disjoint closest/any-hit bands (full mode).
            pltpu.VMEM((128, R) if mxu else (16, 128), jnp.bfloat16),
        ],
        interpret=interpret,
        compiler_params=COMPILER_PARAMS,
    )(uniforms, cset.mats, lights, prims, cset.aabb_t, cset.sb_aabb_t,
      cset.sub_aabb_t, geom_in, mx_in, att_in)

    # Un-tile (quad-major lane order, see _make_kernel):
    # [4, nby, nbx, sqh, sqw, qh, qw] -> [H, W, 4]; rgb + ray count.
    _, sqh, sqw = _subpacket_grid(tile_h, tile_w, C_pad)
    qh, qw = tile_h // sqh, tile_w // sqw
    full = (
        out.reshape(4, nby, nbx, sqh, sqw, qh, qw)
        .transpose(1, 3, 5, 2, 4, 6, 0)
        .reshape(nby * tile_h, nbx * tile_w, 4)
    )
    img = full[:band, :width, :3]
    rays = jnp.sum(full[:band, :width, 3])
    return img, rays


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "tile", "prim_counts")
)
def render_jit(cset, params, cfg: StaticConfig, interpret: bool = False,
               tile: tuple = None, prims=None, prim_counts=(0, 0)):
    return render_clusters(
        cset, params, cfg, interpret, tile, prims=prims, prim_counts=prim_counts
    )


def _make_debug_kernel(cfg: StaticConfig, C, C_pad, K, nbx,
                       tile_w, tile_h, stream, prim_counts, n_subg=1):
    """Debug visualization kernel: one center ray per pixel, one traversal,
    mode 1=depth 2=normals 3=hit (compute:484-508). The reference always
    shoots a *perspective* center ray here regardless of the ortho toggle
    (preserved, like trace_xla.debug_pixels)."""
    width, height = cfg.width, cfg.height
    R = tile_w * tile_h
    S, sqh, sqw = _subpacket_grid(tile_h, tile_w, C_pad)
    qh, qw = tile_h // sqh, tile_w // sqw
    n_sph, n_box = prim_counts

    def kernel(uniforms, mats, lights, prims, aabb_t, sb_aabb_t, sub_aabb_t,
               geom, out_ref, best_ref, flag_vmem, flags_smem, list_smem, sem,
               gbuf, gsem, sbflag_vmem, sb_smem):
        tile = pl.program_id(0)
        bx = tile % nbx
        by = tile // nbx
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        quad = lane // (qh * qw)
        q = lane % (qh * qw)
        pxi = bx * tile_w + (quad % sqw) * qw + q % qw
        pyi = by * tile_h + (quad // sqw) * qh + q // qw
        px = pxi.astype(F)
        py = pyi.astype(F) + uniforms[U_ROW_OFF]

        cam = [uniforms[U_CAM + i] for i in range(12)]
        dist = uniforms[U_DIST]
        plane_h = uniforms[U_PLANE_H]
        plane_w = plane_h * F(width / height)

        half = jnp.full((1, R), 0.5, F)
        u = ((px + half) / F(width) - F(0.5)) * plane_w
        v = ((py + half) / F(height) - F(0.5)) * plane_h
        ocz = jnp.full((1, R), 1.0, F) * dist
        dcx, dcy, dcz = _rsqrt_planes(u, v, -ocz)
        ox = cam[2] * ocz + cam[3]
        oy = cam[6] * ocz + cam[7]
        oz = cam[10] * ocz + cam[11]
        dx = cam[0] * dcx + cam[1] * dcy + cam[2] * dcz
        dy = cam[4] * dcx + cam[5] * dcy + cam[6] * dcz
        dz = cam[8] * dcx + cam[9] * dcy + cam[10] * dcz
        dx, dy, dz = _rsqrt_planes(dx, dy, dz)

        traverse = make_traverse(
            aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
            list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K, R,
            gbuf=gbuf, gsem=gsem, stream=stream, subpackets=S,
            prims=prims, n_sph=n_sph, n_box=n_box, frustum=True,
            # The megakernel's frustum and per-ray traversals share ONE
            # geometry ref, so the subgroup-major layout can't apply here;
            # subgroup visits are a wavefront-only optimization.
            sub_aabb_t=sub_aabb_t, subgroups=1,
        )
        hit, t, nx, ny, nz, _ = traverse(
            ox, oy, oz, dx, dy, dz, jnp.ones((1, R), bool)
        )
        if cfg.debug_mode == 1:
            g = t / F(100.0)
            r_ = jnp.where(hit, g, F(1.0))
            g_ = jnp.where(hit, g, F(0.0))
            b_ = jnp.where(hit, g, F(0.0))
        elif cfg.debug_mode == 2:
            r_ = jnp.where(hit, nx * F(0.5) + F(0.5), F(0.0))
            g_ = jnp.where(hit, ny * F(0.5) + F(0.5), F(0.0))
            b_ = jnp.where(hit, nz * F(0.5) + F(0.5), F(1.0))
        else:
            r_ = jnp.where(hit, F(0.0), F(0.2))
            g_ = jnp.where(hit, F(1.0), F(0.2))
            b_ = jnp.where(hit, F(0.0), F(0.2))
        out_ref[0:1] = r_
        out_ref[1:2] = g_
        out_ref[2:3] = b_
        out_ref[3:4] = jnp.ones((1, R), F)

    return kernel


def render_debug(
    cset: cl.ClusterSet,
    params: FrameParams,
    cfg: StaticConfig,
    interpret: bool = False,
    tile: tuple = None,
    prims=None,
    prim_counts=(0, 0),
):
    """In-kernel debug visualization -> (image [H, W, 3], rays scalar)."""
    C_pad_pre = int(cset.aabb_t.shape[1])
    if tile is None:
        # Sub-packet-chunked culls bound slab temporaries at
        # (1024, CULL_BLOCK), so multi-block scenes use the big tile too
        # (with the raised kernel VMEM limit, kernel_core.COMPILER_PARAMS).
        tile = (TILE_H, TILE_W)
    tile_h, tile_w = tile
    R = tile_w * tile_h
    width, height = cfg.width, cfg.height
    nbx = -(-width // tile_w)
    nby = -(-height // tile_h)
    n_tiles = nbx * nby
    C, K = cset.num_clusters, cset.k
    C_pad = int(cset.aabb_t.shape[1])
    uniforms = build_uniforms(params)
    lights = build_lights(params, cfg.multi_light)
    stream = int(cset.geom.size) * 4 > STREAM_THRESHOLD_BYTES
    if prims is None:
        prims = jnp.zeros((1, 22), jnp.float32)
    geom_in = cset.geom
    if stream:
        geom_in = jnp.pad(
            cset.geom, ((0, 0), (0, 0), (0, 128 - cl.GEOM_COMPS))
        )
    kernel = _make_debug_kernel(
        cfg, C, C_pad, K, nbx, tile_w, tile_h, stream, prim_counts,
        cset.subgroups,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((8, C_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * cset.subgroups, C_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),  # sub-AABBs (2nd level)
            pl.BlockSpec(
                memory_space=pltpu.HBM
            ) if stream else pl.BlockSpec(
                (C, K, cl.GEOM_COMPS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((4, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((4, n_tiles * R), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((18, R), jnp.float32),
            pltpu.VMEM((1, C_pad), jnp.int32),
            pltpu.SMEM((1, C_pad), jnp.int32),
            pltpu.SMEM((1, C_pad * cset.subgroups), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.VMEM((2, K, 128 if stream else cl.GEOM_COMPS), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((1, 128), jnp.int32),
            pltpu.SMEM((1, 128), jnp.int32),
        ],
        interpret=interpret,
        compiler_params=COMPILER_PARAMS,
    )(uniforms, cset.mats, lights, prims, cset.aabb_t, cset.sb_aabb_t,
      cset.sub_aabb_t, geom_in)

    _, sqh, sqw = _subpacket_grid(tile_h, tile_w, C_pad)
    qh, qw = tile_h // sqh, tile_w // sqw
    full = (
        out.reshape(4, nby, nbx, sqh, sqw, qh, qw)
        .transpose(1, 3, 5, 2, 4, 6, 0)
        .reshape(nby * tile_h, nbx * tile_w, 4)
    )
    img = full[:height, :width, :3]
    rays = jnp.sum(full[:height, :width, 3])
    return img, rays


@functools.partial(
    jax.jit, static_argnames=("cfg", "interpret", "tile", "prim_counts")
)
def render_debug_jit(cset, params, cfg: StaticConfig, interpret: bool = False,
                     tile: tuple = None, prims=None, prim_counts=(0, 0)):
    return render_debug(
        cset, params, cfg, interpret, tile, prims=prims, prim_counts=prim_counts
    )


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

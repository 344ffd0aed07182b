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

Steps 2-4 have a zero-copy alternative that is the COMPILED DEFAULT
(COSIG_WF_SELFSKIP=0 reverts; see the _SELFSKIP note): state stays in
pixel order, the bounce grid covers all tiles, and dead tiles skip
their own state DMA off an SMEM alive bitmap — no sort, no gathers, no
prefix ladder, bit-identical images. Interpret mode (CPU tests) always
takes the compaction path above.

Ray state layout (f32 rows x N rays; kernel_core ROW_* contract):
0-2 origin, 3-5 direction, 6-8 attenuation, 9-11 color, 12 alive,
13 rays-traced count, 14 ray id, 15 pad (8-row tiling; fission mode
appends the 5-row hit record at 15-19, padding to 24). The ray id
(f32-exact: n_pad is asserted < 2^24) replaces the old px/py/sample
rows — bounce stages that need RNG seed planes (soft shadows / glossy)
re-derive them from the id with integer ops instead of hauling three
f32 rows through every compaction and state round-trip: the state is
the wavefront's HBM floor, and 24 -> 16 rows cuts that floor by a
third (round-3 VERDICT "non-traversal floor").

Shading physics is the same quirk-preserving plane arithmetic as the
megakernel (see trace_pallas.py / ops/shade.py); RNG seeds take px/py/
sample from state rows, so images match the megakernel and the XLA oracle
to fp32 ULPs. Geometry handling reuses the cluster structures at every
scene size: multi-block scenes go through the shared hierarchical cull
and geometry beyond the VMEM budget streams from HBM (both in
kernel_core.make_traverse), so the wavefront path never demotes to the
megakernel.
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
from cosig_tpu.ops.kernel_core import (
    COMPILER_PARAMS,
    INF,
    STREAM_THRESHOLD_BYTES,
    U_CAM,
    U_DEPTH,
    U_DIST,
    U_LAST,
    U_ORTHO,
    U_PLANE_H,
    U_ROW_OFF,
    U_SHUTTER,
    _rsqrt_planes,
    _ruv_planes,
    bounce_core,
    bounce_trace,
    build_lights,
    build_uniforms,
    make_traverse,
)

F = np.float32

# Rays per packed tile. The stage decomposition (tools/stage_profile.py,
# glass 94 ms/frame: cull+flag-DMA+scalar-compaction ~46 ms at ~5.6 us
# per traversal vs only ~19 ms of pair tests) showed the per-traversal
# overhead — DMA-wait + scalar-unit serialization, NOT vector compute —
# dominates. 4096-ray tiles run that machinery once per 4x the rays,
# while SUBPACKETS of 1024 lanes each keep the intersection granularity
# (and hence pair work) at exactly the old per-1024-ray-tile level: the
# compacted list entry carries per-sub-packet visit bits and each
# sub-packet intersects only its own flagged clusters.
import os as _os

SUB_LANES = 1024  # lanes per sub-packet (the old tile size)


def _validate_tile_rays(r: int) -> int:
    """Tile sizes must be SUB_LANES * {1, 2, 4, 8} or 16384 (8 sub-packets
    of 2048 lanes — the visit-bit mask caps S at 8, so very large tiles
    widen the sub-packet instead): sub-packets are static 128-aligned
    lane slices and the quad grid only supports those S values
    (``_quad_grid``). Reject bad values at the knob instead of deep
    inside kernel construction."""
    if r % SUB_LANES != 0 or r // SUB_LANES not in (1, 2, 4, 8, 16):
        raise ValueError(
            f"wavefront tile size must be {SUB_LANES}*S with S in "
            f"{{1, 2, 4, 8, 16}}; got {r} (COSIG_WF_R or tile_rays)"
        )
    return r


def _subpackets_for(r: int) -> int:
    return min(8, r // SUB_LANES)


# Kernel fission (COSIG_WF_FISSION=1): split every stage into a TRACE
# kernel (closest-hit only) and a SHADE kernel (any-hit shadows +
# shading + secondary-ray gen), the hit record riding state rows 15-19
# between the two pallas_calls of one depth step (t, nx, ny, nz, mat;
# hit is recomputed as t < INF — the traverse epilogue's exact value,
# see kernel_core.bounce_trace). Bit-identical to the fused form; costs
# one extra state round-trip per stage. Why it exists: the (since
# root-caused, see STATUS "MXU traversal — FIXED") round-3 TPU bug
# appeared to need closest-hit + any-hit + secondary blocks to COEXIST
# in one compiled kernel — fission keeps every kernel inside the
# verified two-of-three set. Kept as the structural dodge for future
# fused-kernel hazards and as an A/B lever.
_FISSION = _os.environ.get("COSIG_WF_FISSION") == "1"

# Default tile size; override per call via render_wavefront(tile_rays=...)
# or process-wide via COSIG_WF_R (sweeps).
R = _validate_tile_rays(int(_os.environ.get("COSIG_WF_R", "4096")))
SUBPACKETS = _subpackets_for(R)
# State rows (module docstring): 16 covers the 15 live rows; fission
# appends the 5-row hit record (20 rows, padded to 24 for 8-row tiling).
ROWS = 24 if _FISSION else 16
LIVE_ROWS = 15  # rows 0-14 cross a compaction; 15+ never do

# Hit-record rows (fission): t, nx, ny, nz, mat.
_REC0 = 15

# Measurement-only knobs (images WRONG; floor attribution, see
# tools/stage_profile.py floor): NOCOMPACT keeps the compaction's key sort /
# alive-extent logic (so the bounce dispatch ladder behaves identically)
# but skips the state gather — the full-vs-this delta is the pure gather
# cost; NOUNT replaces the final pixel-order untranspose with a cheap
# contiguous reshape — the delta is the untranspose cost.
_NOCOMPACT = _os.environ.get("COSIG_WF_NOCOMPACT") == "1"
_NOUNT = _os.environ.get("COSIG_WF_NOUNT") == "1"

# Self-skipping bounce dispatch (default ON compiled; COSIG_WF_SELFSKIP=0
# reverts to the compaction path, interpret always compacts):
# instead of compacting alive rays to a dense prefix (octant sort +
# group gather + prefix-ladder dispatch + final inverse gather), leave
# the state in pixel order forever and dispatch the bounce grid over ALL
# tiles every depth. The state rides in HBM (unblocked operands); each
# grid step reads one bit of a per-tile alive bitmap (computed by one
# cheap XLA reduction over the alive row) from SMEM and DEAD TILES SKIP
# THEIR ENTIRE STATE DMA — a dead tile costs one scalar test instead of
# a 2x(SROWS, R) block round-trip. Removes the whole compaction floor
# (sort + LIVE_ROWS-row gather + inverse gather, ~7-9 ms on glass) and
# collapses the prefix ladder to ONE Mosaic payload (compile time).
# Bit-identical to the compaction path: per-lane arithmetic never
# depends on tile order, culls are conservative supersets, and the
# (t, gid) winner fold is visit-order/partition invariant (same
# argument as the tile_rays/cset-granularity gates).
# Default ON (round-4 decision): hardware bitwise gate green
# (tools/selfskip_verify.py, glass + large_mesh) and same-window ABAB
# +21 % glass (42.1 -> 34.9 ms) / +22 % large_mesh (176.9 -> 144.8 ms)
# over the compaction path (tools/r4_sweep_results.jsonl "selfskip").
# "force" additionally enables it UNDER INTERPRET (CPU test coverage of
# the shipped dispatch path, round-4 VERDICT weak #2) — the depth chain
# is then unrolled in Python, which sidesteps the interpret-pallas-in-
# while miscompute (the _SELFSKIP-path fori_loop is exactly the shape
# that bug hits; see tools/repro_interpret_while_shardmap.py).
_SELFSKIP_ENV = _os.environ.get("COSIG_WF_SELFSKIP", "1")
_SELFSKIP = _SELFSKIP_ENV != "0"
_SELFSKIP_FORCE = _SELFSKIP_ENV == "force"

# (Depth-hybrid dispatch — COSIG_WF_HYBRID_D, selfskip for depths < T
# then compaction — was REJECTED on hardware on both configs in round 5
# (glass T2/T3 43.1/41.2 vs 33.4/33.7 ms; large 163.9/158.1 vs 145.1):
# at the collapsed depths the compaction permutation I/O + split-chain
# dispatch exceed the dot savings the host predictor counted. Machinery
# + bitwise gates in git history; see docs/packet_floor.md.)

# (Early-t cluster skip — COSIG_EARLYT — and its any-hit twin
# COSIG_EARLYT_OCC were REJECTED on hardware (glass r4, large r5
# etlarge/occlarge) and pruned; see kernel_core's note and
# docs/packet_floor.md.)

# (Window selection — COSIG_WSEL — was REJECTED on hardware in round 5
# and pruned; see kernel_core's note and docs/packet_floor.md.)

# Mean-first finalization (default on; COSIG_WF_MEANFIRST=0 reverts):
# average the AA samples INSIDE each compaction group BEFORE the inverse
# group gather. aa divides GROUP, so a pixel's samples never straddle a
# group boundary and the gather moves bitwise the same numbers — just
# aa x fewer of them (tools/perm_bench.py asserts bitwise equality;
# tests/test_pallas.py::test_wavefront_meanfirst_exact gates it
# end-to-end).
_MEANFIRST = _os.environ.get("COSIG_WF_MEANFIRST", "1") != "0"


def _rec_store(state, rec):
    hit, t, nx, ny, nz, mat_c = rec
    state[_REC0 : _REC0 + 1] = t
    state[_REC0 + 1 : _REC0 + 2] = nx
    state[_REC0 + 2 : _REC0 + 3] = ny
    state[_REC0 + 3 : _REC0 + 4] = nz
    state[_REC0 + 4 : _REC0 + 5] = mat_c


def _rec_load(state):
    t = state[_REC0 : _REC0 + 1]
    return (
        t < INF, t,
        state[_REC0 + 1 : _REC0 + 2],
        state[_REC0 + 2 : _REC0 + 3],
        state[_REC0 + 3 : _REC0 + 4],
        state[_REC0 + 4 : _REC0 + 5],
    )


def _decode_rid(rid_plane, uniforms, decode):
    """Reconstruct the (px, py, sample) RNG seed planes from the absolute
    ray id row — the exact inverse of the primary kernel's lane -> pixel
    enumeration, all in exact small-integer arithmetic, so the planes are
    BITWISE equal to the ones the primary computed (px/py are integer
    values cast to f32; py adds the same U_ROW_OFF uniform)."""
    aa, nbx, bh, bw, sqh, sqw, Rp = decode
    rid = rid_plane.astype(jnp.int32)
    tile_i = rid // Rp
    lane_i = rid % Rp
    s_i = lane_i % aa
    p_i = lane_i // aa
    qh, qw = bh // sqh, bw // sqw
    ppq = qh * qw
    quad = p_i // ppq
    q = p_i % ppq
    pxi = (tile_i % nbx) * bw + (quad % sqw) * qw + q % qw
    pyi = (tile_i // nbx) * bh + (quad // sqw) * qh + q // qw
    px = pxi.astype(F)
    py = pyi.astype(F) + uniforms[U_ROW_OFF]
    return px, py, s_i.astype(F)


def _make_shadow_traverse(sh_dims, sh_aabb_t, sh_sb_aabb_t, sh_sub_aabb_t,
                          sh_geom, best_ref, sh_flag_vmem, sh_flags_smem,
                          sh_list_smem, sem, sbflag_vmem, sb_smem, R,
                          subpackets, prims, n_sph, n_box, frustum):
    """Traversal closure over the SHADOW cluster set (cset_shadow) —
    any-hit queries on a coarser cut of the same triangle soup, VPU pair
    tests, single cull block (enforced by _shadow_resources). Returns
    None when no shadow set is wired (bounce_core then uses the main
    traversal). best_ref / sem / superblock scratch are shared with the
    main traversal — uses are strictly sequential within a bounce."""
    if sh_dims is None:
        return None
    shC, shC_pad, shK = sh_dims
    return make_traverse(
        sh_aabb_t, sh_sb_aabb_t, sh_geom, best_ref, sh_flag_vmem,
        sh_flags_smem, sh_list_smem, sem, sbflag_vmem, sb_smem,
        shC, shC_pad, shK, R,
        subpackets=subpackets, prims=prims, n_sph=n_sph, n_box=n_box,
        sub_aabb_t=sh_sub_aabb_t, subgroups=1, frustum=frustum,
    )


def _quad_grid(S: int):
    """Sub-packet arrangement inside a pixel block: (rows, cols).

    S=8 is (2, 4), not (4, 2): _primary_block returns (h, w) with h <= w
    (w = 2h at non-square ray counts), so splitting the WIDE axis more
    keeps quads square — e.g. R=8192 aa=4 gives a (32, 64)-pixel block
    whose (2, 4) grid yields square 16x16-pixel sub-packet footprints
    (the (4, 2) grid's 8x32 stretch is what regressed the round-2
    R=8192 experiment)."""
    return {1: (1, 1), 2: (2, 1), 4: (2, 2), 8: (2, 4)}[S]


def _primary_block(aa: int, tile_rays: int = None):
    """Pixel-block shape (bh, bw) such that bh*bw*aa == tile_rays.

    Blocks split into a grid of quads (one per sub-packet), so each
    sub-packet's cull footprint is spatially compact."""
    pixels = (tile_rays or R) // aa
    h = 1
    while h * h * 4 <= pixels:
        h *= 2
    return h, pixels // h  # h <= w, both powers of two


def _make_primary_kernel(cfg: StaticConfig, dims, nbx, band, stream,
                         prim_counts=(0, 0), subpackets=1, R=R,
                         fission=False, sh_dims=None):
    """``fission=True`` stops after the closest-hit trace and stores the
    hit record in rows 15-19; the shared shade kernel finishes the
    bounce (see the _FISSION note). ``sh_dims``: (C, C_pad, K) of the
    shadow cluster set when any-hit traversals run on their own coarser
    cut (cset_shadow — see _shadow_resources)."""
    C, C_pad, K, M, L, n_subg, mxu = dims
    width, height = cfg.width, cfg.height
    aa = max(1, cfg.aa_samples)
    grid_w, grid_h = camera.aa_grid(aa)
    bh, bw = _primary_block(aa, R)
    n_sph, n_box = prim_counts

    def kernel(uniforms, mats, lights, prims, aabb_t, sb_aabb_t, sub_aabb_t,
               geom, geom_mx, gatt, sh_aabb_t, sh_sb_aabb_t, sh_sub_aabb_t,
               sh_geom, state, best_ref, flag_vmem, flags_smem,
               list_smem, sem, sbflag_vmem, sb_smem, gbuf, gsem, raysmx,
               sh_flag_vmem, sh_flags_smem, sh_list_smem):
        tile = pl.program_id(0)
        bx = tile % nbx
        by = tile // nbx

        lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
        # lane -> (pixel-in-block, sample): consecutive aa lanes share a
        # pixel; pixels are quad-major (one quad per 1024-lane sub-packet)
        # so sub-packet cull footprints are compact.
        s_i = lane % aa
        p_i = lane // aa
        sqh, sqw = _quad_grid(subpackets)
        qh, qw = bh // sqh, bw // sqw
        ppq = qh * qw  # pixels per quad
        quad = p_i // ppq
        q = p_i % ppq
        pxi = bx * bw + (quad % sqw) * qw + q % qw
        pyi = by * bh + (quad // sqw) * qh + q // qw
        px = pxi.astype(F)
        # Global pixel row: the shard's band offset (0 single-chip) keeps
        # the projection plane and RNG seeds global (multi-chip row bands).
        py = pyi.astype(F) + uniforms[U_ROW_OFF]
        s_plane = s_i.astype(F)
        in_image = (pxi < width) & (pyi < band) & (py < F(height))

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
        # Row 13: rays-traced count; row 14: absolute ray id (f32-exact,
        # render_wavefront asserts n_pad < 2^24) — bounce stages re-derive
        # px/py/sample from it when the RNG needs them (see _decode_rid).
        state[13:14] = jnp.zeros((1, R), F)
        state[14:15] = (tile * R + lane).astype(F)
        n_rows = 24 if fission else 16  # matches the caller's block rows
        state[15:n_rows] = jnp.zeros((n_rows - 15, R), F)

        traverse = make_traverse(
            aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
            list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K, R,
            gbuf=gbuf, gsem=gsem, stream=stream, subpackets=subpackets,
            prims=prims, n_sph=n_sph, n_box=n_box,
            sub_aabb_t=sub_aabb_t, subgroups=n_subg,
            geom_mx=geom_mx if mxu else None,
            gatt=gatt if mxu else None, raysmx=raysmx,
            mxu_anyhit=mxu != 2,
            # Camera rays (and their shadow rays) are coherent pixel
            # quads: cull by sub-packet bounding frustum instead of the
            # per-ray slab grid (~R/S x less cull arithmetic; identical
            # results — conservative superset). At any scene size: multi-
            # block scenes keep the hierarchy only for its block-scoped
            # scalar compaction.
            frustum=True,
        )
        traverse_shadow = _make_shadow_traverse(
            sh_dims, sh_aabb_t, sh_sb_aabb_t, sh_sub_aabb_t, sh_geom,
            best_ref, sh_flag_vmem, sh_flags_smem, sh_list_smem, sem,
            sbflag_vmem, sb_smem, R, subpackets, prims, n_sph, n_box,
            frustum=True,
        )
        if fission:
            _rec_store(state, bounce_trace(traverse, state))
        else:
            bounce_core(
                cfg, uniforms, mats, lights, traverse, state, M, L,
                px, py, s_plane, jnp.float32(0.0),
                is_last=cfg.max_depth == 1,
                traverse_shadow=traverse_shadow,
            )

    return kernel


def _make_bounce_kernel(cfg: StaticConfig, dims, stream,
                        prim_counts=(0, 0), subpackets=1, R=R,
                        mode="fused", decode=None, sh_dims=None,
                        selfskip=False):
    """ONE bounce executable for every depth: the bounce index and the
    final-bounce flag are SMEM uniforms (U_DEPTH / U_LAST), not trace-time
    constants — cutting the wavefront compile ladder from
    (max_depth-1) x levels Mosaic payloads to just levels.

    ``mode`` (see the _FISSION note): "fused" = trace + shade in one
    kernel (default); "trace" = closest-hit only, hit record stored in
    rows 15-19; "shade" = read the record, shadow-trace + shade +
    secondary rays. The shade executable also serves the primary stage
    (the record format is stage-agnostic).

    ``decode``: the primary-stage enumeration constants for _decode_rid,
    required (and read) only when the RNG needs per-ray seed planes
    (soft shadows / glossy)."""
    C, C_pad, K, M, L, n_subg, mxu = dims
    n_sph, n_box = prim_counts
    # Bounce stages never frustum-cull (primary stages do, line ~426):
    # COSIG_BOUNCE_FRUSTUM was REJECTED on hardware on every config —
    # glass 249.5 vs 262.6/264.5 ms (r5 bfrust), large 258.0/258.1 vs
    # 145.1/144.8 (r5 bflarge): bounce direction hulls are fully
    # diverged, so the hull culls nothing and the build is pure cost.
    # Implementation + bitwise gate in git history (604bcc9^..).

    def body(state, uniforms, mats, lights, prims, aabb_t, sb_aabb_t,
             sub_aabb_t, geom, geom_mx, gatt, sh_aabb_t, sh_sb_aabb_t,
             sh_sub_aabb_t, sh_geom, best_ref, flag_vmem, flags_smem,
             list_smem, sem, sbflag_vmem, sb_smem, gbuf, gsem, raysmx,
             sh_flag_vmem, sh_flags_smem, sh_list_smem):
        """One bounce on ``state`` (a (SROWS, R) VMEM ref), shared by the
        blocked and self-skip kernel forms below."""
        if cfg.enable_soft_shadows or cfg.enable_glossy:
            # The RNG needs per-ray seed planes: re-derive them from
            # the ray-id row (bitwise-equal to the primary's values).
            px, py, s_plane = _decode_rid(state[14:15], uniforms, decode)
        else:
            # Unused by bounce_core when both DRT effects are off —
            # dead operands, eliminated at compile.
            px = py = s_plane = jnp.zeros((1, R), F)
        traverse = make_traverse(
            aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem,
            list_smem, sem, sbflag_vmem, sb_smem, C, C_pad, K, R,
            gbuf=gbuf, gsem=gsem, stream=stream, subpackets=subpackets,
            prims=prims, n_sph=n_sph, n_box=n_box,
            sub_aabb_t=sub_aabb_t, subgroups=n_subg,
            geom_mx=geom_mx if mxu else None,
            gatt=gatt if mxu else None, raysmx=raysmx,
            mxu_anyhit=mxu != 2,
            frustum=False,
        )
        traverse_shadow = _make_shadow_traverse(
            sh_dims, sh_aabb_t, sh_sb_aabb_t, sh_sub_aabb_t, sh_geom,
            best_ref, sh_flag_vmem, sh_flags_smem, sh_list_smem, sem,
            sbflag_vmem, sb_smem, R, subpackets, prims, n_sph, n_box,
            frustum=False,
        )
        if mode == "trace":
            _rec_store(state, bounce_trace(traverse, state))
        else:
            bounce_core(
                cfg, uniforms, mats, lights, traverse, state, M, L,
                px, py, s_plane, uniforms[U_DEPTH],
                is_last=uniforms[U_LAST],
                rec=_rec_load(state) if mode == "shade" else None,
                traverse_shadow=traverse_shadow,
            )

    if selfskip:
        def kernel(uniforms, mats, lights, prims, aabb_t, sb_aabb_t,
                   sub_aabb_t, geom, geom_mx, gatt, sh_aabb_t, sh_sb_aabb_t,
                   sh_sub_aabb_t, sh_geom, alive_bm, state_in, state_out,
                   best_ref, flag_vmem, flags_smem, list_smem, sem,
                   sbflag_vmem, sb_smem, gbuf, gsem, raysmx,
                   sh_flag_vmem, sh_flags_smem, sh_list_smem, st_vmem, ssem):
            # Self-skip form (_SELFSKIP note): state_in/state_out are the
            # FULL (SROWS, n_pad) array as unblocked HBM operands (aliased
            # in place); ``alive_bm`` is the per-tile alive bitmap in
            # SMEM. A dead tile's bytes are never moved — one scalar test
            # and the grid step is over.
            tile = pl.program_id(0)

            @pl.when(alive_bm[0, tile] > 0)
            def _():
                cp = pltpu.make_async_copy(
                    state_in.at[:, pl.ds(tile * R, R)], st_vmem, ssem
                )
                cp.start()
                cp.wait()
                body(st_vmem, uniforms, mats, lights, prims, aabb_t,
                     sb_aabb_t, sub_aabb_t, geom, geom_mx, gatt, sh_aabb_t,
                     sh_sb_aabb_t, sh_sub_aabb_t, sh_geom, best_ref,
                     flag_vmem, flags_smem, list_smem, sem, sbflag_vmem,
                     sb_smem, gbuf, gsem, raysmx, sh_flag_vmem,
                     sh_flags_smem, sh_list_smem)
                cpo = pltpu.make_async_copy(
                    st_vmem, state_out.at[:, pl.ds(tile * R, R)], ssem
                )
                cpo.start()
                cpo.wait()

        return kernel

    def kernel(uniforms, mats, lights, prims, aabb_t, sb_aabb_t, sub_aabb_t,
               geom, geom_mx, gatt, sh_aabb_t, sh_sb_aabb_t, sh_sub_aabb_t,
               sh_geom, state_in, state_out, best_ref, flag_vmem,
               flags_smem, list_smem, sem, sbflag_vmem, sb_smem, gbuf, gsem,
               raysmx, sh_flag_vmem, sh_flags_smem, sh_list_smem):
        # The output block is the working ref (readable after write in
        # Pallas VMEM); one copy-in replaces the old in -> scratch -> out
        # double copy.
        state = state_out
        state[:, :] = state_in[:, :]
        any_alive = jnp.sum(state[12:13]) > F(0.0)

        @pl.when(any_alive)
        def _():
            body(state, uniforms, mats, lights, prims, aabb_t, sb_aabb_t,
                 sub_aabb_t, geom, geom_mx, gatt, sh_aabb_t, sh_sb_aabb_t,
                 sh_sub_aabb_t, sh_geom, best_ref, flag_vmem, flags_smem,
                 list_smem, sem, sbflag_vmem, sb_smem, gbuf, gsem, raysmx,
                 sh_flag_vmem, sh_flags_smem, sh_list_smem)

    return kernel


# Compaction granularity (rays): lane-aligned contiguous blocks. Bigger
# groups mean a cheaper sort/gather (fewer, larger blocks) but coarser
# liveness (a group stays "alive" while ANY ray in it is) — COSIG_WF_GROUP
# is the measurement knob; bit-exact at any value (the inverse gather
# restores pixel order exactly).
GROUP = int(_os.environ.get("COSIG_WF_GROUP", "128"))
assert GROUP % 128 == 0 and SUB_LANES % GROUP == 0, GROUP


def _compact_prefix(state, group_perm, n_pad: int, eg: int, n_rows: int = ROWS):
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
    # Only the LIVE_ROWS state rows cross a compaction (row 15+ is pad,
    # or a fission hit record consumed within the SAME depth step —
    # always overwritten before the next read): permuting just the live
    # rows cuts the gather traffic.
    s3 = state.reshape(n_rows, g, GROUP)
    p3 = jax.lax.slice(s3, (0, 0, 0), (LIVE_ROWS, eg, GROUP))
    galive = (p3[12] > F(0.5)).any(axis=1)
    octant = (
        (p3[3, :, 0] > 0).astype(jnp.int32)
        + 2 * (p3[4, :, 0] > 0).astype(jnp.int32)
        + 4 * (p3[5, :, 0] > 0).astype(jnp.int32)
    )
    keys = jnp.where(galive, octant, 8)
    order = jnp.argsort(keys, stable=True)
    n_alive_g = jnp.sum(galive.astype(jnp.int32))
    if _NOCOMPACT:  # measurement stub: skip the gather, keep the extent
        return state, group_perm, n_alive_g
    packed = p3[:, order, :].reshape(LIVE_ROWS, eg * GROUP)
    state = jax.lax.dynamic_update_slice(state, packed, (0, 0))
    gp_prefix = jax.lax.slice(group_perm, (0,), (eg,))[order]
    group_perm = jax.lax.dynamic_update_slice(group_perm, gp_prefix, (0,))
    return state, group_perm, n_alive_g


def _stage_resources(cset: cl.ClusterSet, stream, R: int, frustum=True,
                     interpret=False):
    """Per-stage kernel resources for one cluster set -> (dims[:3]+(mxu,),
    stream, geom_inputs, scratch, geom_specs). Stages may traverse
    DIFFERENT cluster granularities over the same triangle soup: the
    (t, gid) lexicographic winner fold is clustering-invariant (an
    associative/commutative min over the identical pair set), so mixing
    cluster sizes across stages is exact.

    ``mxu`` (default on, COSIG_MXU=0 disables): compiled-on-TPU stages
    route the pair tests through the MXU (kernel_core mt_mxu) using the
    packed matmul operands; the 36-col geometry is then replaced by a
    tiny dummy block (the kernel never reads it). Interpret mode keeps
    the VPU path — XLA:CPU dots reassociate f32 sums, which would break
    the bitwise backend-equality gates.

    ``COSIG_MXU_SHADOW=0`` (mixed mode): any-hit shadow traversals keep
    the VPU pair test while closest-hit traversals use the MXU; the real
    geometry stays resident next to the matmul operands. The dims tuple
    then carries mxu=2 (1 = MXU everywhere, 0 = off)."""
    C, K = cset.num_clusters, cset.k
    C_pad = int(cset.aabb_t.shape[1])
    n_subg = cset.subgroups
    if stream is None:
        stream = int(cset.geom.size) * 4 > STREAM_THRESHOLD_BYTES
    # MXU traversal is correct on hardware (STATUS "MXU traversal —
    # FIXED") and measured faster on BOTH bench configs in the round-4
    # same-window sweeps (large_mesh K64: 236.6 -> 176.7 ms, +34 %;
    # glass K32: 42.6 -> 41.8 ms, ~+2 %), so it is now the compiled-TPU
    # default for unstreamed stages. COSIG_MXU=0 reverts to the VPU pair
    # test (images differ by dot-accumulation ULPs only).
    mxu_env = _os.environ.get("COSIG_MXU", "1")
    mxu = (
        not stream
        and cset.geom_mx is not None
        and mxu_env != "0"
        # "force" enables under interpret for CPU validation of the MXU
        # code path (tests); results then differ from the VPU path by
        # dot-reassociation ULPs.
        and (not interpret or mxu_env == "force")
    )
    if mxu and _os.environ.get("COSIG_MXU_SHADOW", "1") == "0":
        mxu = 2  # mixed: closest-hit on MXU, any-hit shadows on VPU
    geom_in = cset.geom
    if stream:
        # HBM slices DMA'd per cluster need a 128-aligned last dim.
        geom_in = jnp.pad(cset.geom, ((0, 0), (0, 0), (0, 128 - cl.GEOM_COMPS)))
    if mxu == 1:
        geom_in = jnp.zeros((1, 8, 128), jnp.float32)  # unread dummy
        mx_in, att_in = cset.geom_mx, cset.gatt
    elif mxu == 2:
        mx_in, att_in = cset.geom_mx, cset.gatt
    else:
        mx_in = jnp.zeros((1, 16, cl.MX_COLS), jnp.bfloat16)
        att_in = jnp.zeros((1, 3 * cl.ATT_ROWS, 8), jnp.bfloat16)
    scratch = [
        pltpu.VMEM((18, R), jnp.float32),  # best-hit rows + staged rays + p2 bound
        pltpu.VMEM((1, C_pad), jnp.int32),
        pltpu.SMEM((1, C_pad), jnp.int32),
        # Visit list: one entry per flagged cluster.
        pltpu.SMEM((1, C_pad), jnp.int32),
        pltpu.SemaphoreType.DMA,
        pltpu.VMEM((1, 128), jnp.int32),
        pltpu.SMEM((1, 128), jnp.int32),
        pltpu.VMEM((2, K, 128 if stream else cl.GEOM_COMPS), jnp.float32),
        pltpu.SemaphoreType.DMA((2,)),
        # raysmx (MXU limb staging): full mode needs disjoint closest/
        # any-hit row bands (128); mixed mode stages closest-hit only
        # (64); VPU-only kernels get a dummy allocation.
        pltpu.VMEM(
            (128, R) if mxu == 1 else (64, R) if mxu == 2 else (16, 128),
            jnp.bfloat16,
        ),
    ]
    geom_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # uniforms
        pl.BlockSpec(memory_space=pltpu.SMEM),  # mats
        pl.BlockSpec(memory_space=pltpu.SMEM),  # lights
        pl.BlockSpec(memory_space=pltpu.SMEM),  # analytic prims
        pl.BlockSpec((8, C_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8 * max(1, n_subg), C_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),  # sub-AABBs (2nd level)
        pl.BlockSpec(
            memory_space=pltpu.HBM
        ) if stream else pl.BlockSpec(
            tuple(geom_in.shape), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        pl.BlockSpec(tuple(mx_in.shape), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(att_in.shape), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return ((C, C_pad, K, n_subg, mxu), stream, (geom_in, mx_in, att_in),
            scratch, geom_specs)


def _shadow_resources(cset_sh: cl.ClusterSet | None):
    """Kernel resources for the SHADOW cluster set (cset_shadow) ->
    (sh_dims, inputs(4), specs(4), scratch(3)). VPU pair tests only and
    a single cull block (the set exists to SHRINK the any-hit cull
    width, so a multi-block shadow cut defeats its purpose). When no set
    is wired, tiny unread dummies keep the kernel signatures static."""
    if cset_sh is None:
        dummy8 = jnp.zeros((8, 128), jnp.float32)
        dummy_g = jnp.zeros((1, 8, cl.GEOM_COMPS), jnp.float32)
        inputs = (dummy8, dummy8, dummy8, dummy_g)
        sh_dims = None
    else:
        C2, K2 = cset_sh.num_clusters, cset_sh.k
        C_pad2 = int(cset_sh.aabb_t.shape[1])
        assert C_pad2 <= cl.CULL_BLOCK, (
            f"shadow cluster cut too wide ({C_pad2} > {cl.CULL_BLOCK}); "
            "use a larger COSIG_K_SHADOW"
        )
        inputs = (cset_sh.aabb_t, cset_sh.sb_aabb_t, cset_sh.sub_aabb_t,
                  cset_sh.geom)
        sh_dims = (C2, C_pad2, K2)
    specs = [
        pl.BlockSpec((8, inputs[0].shape[1]), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((8, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(inputs[2].shape), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(tuple(inputs[3].shape), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    w = inputs[0].shape[1]
    scratch = [
        pltpu.VMEM((1, w), jnp.int32),
        pltpu.SMEM((1, w), jnp.int32),
        pltpu.SMEM((1, w), jnp.int32),
    ]
    return sh_dims, inputs, specs, scratch


def render_wavefront(
    cset: cl.ClusterSet,
    params: FrameParams,
    cfg: StaticConfig,
    interpret: bool = False,
    stream: bool = None,
    rows: int = None,
    row_offset=0.0,
    prims=None,
    prim_counts=(0, 0),
    tile_rays: int = None,
    cset_primary: cl.ClusterSet = None,
    cset_shadow: cl.ClusterSet = None,
):
    """Render via wavefront stages -> (image [rows, W, 3], rays_traced).

    ``stream``: keep geometry in HBM and double-buffer visited clusters
    through VMEM (scenes beyond the VMEM budget); default: auto by
    geometry size. Multi-block scenes use the shared hierarchical cull
    (kernel_core.make_traverse), so arbitrary scene sizes run wavefront.

    ``rows``/``row_offset`` restrict rendering to a global row band
    (framebuffer sharding); the projection plane and RNG seeds always use
    the global cfg dimensions.

    ``tile_rays``: rays per packed tile (SUB_LANES * S, S in {1,2,4,8});
    default: module default (COSIG_WF_R env or 4096).

    ``cset_primary``: optional FINER cluster set (same triangle soup,
    smaller k) used by the primary stage only — its coherent frusta make
    fine-grained culling nearly free while cutting pair tests per visit;
    bounce stages keep the coarse set (their per-ray slab culls scale
    with cluster count). Exact: the winner fold is clustering-invariant
    (see ``_stage_resources``).

    ``cset_shadow``: optional COARSER cluster set used by every any-hit
    shadow traversal (all stages) — shadow queries re-traverse the full
    cut once per bounce, so halving the cull width (fewer, bigger
    clusters) attacks the shadow cull cost directly; occlusion needs no
    winner selection, so the extra pairs per visit are cheap. Exact:
    occlusion is a clustering-invariant boolean (bit-identical images,
    gated by tests)."""
    R = _validate_tile_rays(tile_rays) if tile_rays is not None else globals()["R"]
    subpackets = _subpackets_for(R)
    width, height = cfg.width, cfg.height
    band = height if rows is None else rows
    aa = max(1, cfg.aa_samples)
    bh, bw = _primary_block(aa, R)
    nbx = -(-width // bw)
    nby = -(-band // bh)
    n_tiles = nbx * nby
    n_pad = n_tiles * R
    # Ray ids ride state row 14 as exact f32 integers (module docstring).
    assert n_pad < 2 ** 24, (
        f"{n_pad} rays exceed f32-exact ray ids; shard the frame "
        "(parallel/sharding row bands) or render chunked"
    )
    sqh_p, sqw_p = _quad_grid(subpackets)
    decode = (aa, nbx, bh, bw, sqh_p, sqw_p, R)

    uniforms = build_uniforms(params, jnp.asarray(row_offset, jnp.float32))
    lights = build_lights(params, cfg.multi_light)
    L = int(lights.shape[0])
    M = int(cset.mats.shape[0])
    if prims is None:
        prims = jnp.zeros((1, 22), jnp.float32)

    (C, C_pad, K, n_subg, mxu), stream, geom_ins, scratch, geom_specs = (
        _stage_resources(cset, stream, R, frustum=False,
                         interpret=interpret)
    )
    dims = (C, C_pad, K, M, L, n_subg, mxu)

    # ---- primary stage (optionally on a finer cluster set) ----
    pcs = cset_primary if cset_primary is not None else cset
    ((pC, pC_pad, pK, p_subg, p_mxu), p_stream, p_geom_ins, p_scratch,
     p_geom_specs) = (
        _stage_resources(pcs, None if cset_primary is not None else stream, R,
                         interpret=interpret)
    )
    fission = _FISSION
    # Per-call state row count: module ROWS is the import-time default,
    # but fission (and hence the hit-record rows) may be toggled per run
    # (tests monkeypatch _FISSION).
    SROWS = 24 if fission else 16
    p_dims7 = (pC, pC_pad, pK, M, L, p_subg, p_mxu)
    # Shadow cluster set (dummies when unused; the kernel signatures are
    # static). Appended AFTER the main geometry operands, BEFORE state.
    sh_dims, sh_inputs, sh_specs, sh_scratch = _shadow_resources(cset_shadow)
    geom_specs = geom_specs + sh_specs
    scratch = scratch + sh_scratch
    p_geom_specs = p_geom_specs + sh_specs
    p_scratch = p_scratch + sh_scratch
    state = pl.pallas_call(
        _make_primary_kernel(cfg, p_dims7,
                             nbx, band, p_stream, prim_counts, subpackets, R,
                             fission=fission, sh_dims=sh_dims),
        grid=(n_tiles,),
        in_specs=p_geom_specs,
        out_specs=pl.BlockSpec((SROWS, R), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((SROWS, n_pad), jnp.float32),
        scratch_shapes=p_scratch,
        interpret=interpret,
        compiler_params=COMPILER_PARAMS,
    )(uniforms, pcs.mats, lights, prims, pcs.aabb_t, pcs.sb_aabb_t,
      pcs.sub_aabb_t, *p_geom_ins, *sh_inputs)

    if fission:
        # Shade half of the primary stage (the record format is
        # stage-agnostic, so this is the same shade executable the bounce
        # ladder uses whenever the primary traverses the same cluster
        # set and tile size). The fused primary passes depth 0 / is_last
        # statically; set the uniforms to the same values here.
        uni0 = (
            uniforms.at[U_DEPTH].set(jnp.float32(0.0))
            .at[U_LAST].set(jnp.float32(1.0 if cfg.max_depth == 1 else 0.0))
        )
        state = pl.pallas_call(
            _make_bounce_kernel(cfg, p_dims7, p_stream, prim_counts,
                                subpackets, R, mode="shade", decode=decode,
                                sh_dims=sh_dims),
            grid=(n_tiles,),
            in_specs=p_geom_specs
            + [pl.BlockSpec((SROWS, R), lambda i: (0, i),
                            memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((SROWS, R), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((SROWS, n_pad), jnp.float32),
            scratch_shapes=p_scratch,
            interpret=interpret,
            compiler_params=COMPILER_PARAMS,
        )(uni0, pcs.mats, lights, prims, pcs.aabb_t, pcs.sb_aabb_t,
          pcs.sub_aabb_t, *p_geom_ins, *sh_inputs, state)

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
    #
    # Compile-time economy: the bounce index / final-bounce flag are SMEM
    # uniforms and the depth chain is a lax.fori_loop, so the whole ladder
    # is ONE bounce executable per prefix level (<= 3 Mosaic payloads)
    # regardless of max_depth — vs (max_depth-1) x levels when each depth
    # was its own trace (glass d6 compiled 897 s at round 2).
    levels = sorted({max(1, -(-n_tiles // 16)), max(1, -(-n_tiles // 4)), n_tiles})
    lv_arr = jnp.array(levels, jnp.int32)
    group_perm = jnp.arange(n_pad // GROUP, dtype=jnp.int32)

    selfskip = _SELFSKIP and (not interpret or _SELFSKIP_FORCE)
    if cfg.max_depth > 1:
        # Bounce-stage tile/sub-packet experiment knobs: COSIG_WF_RB sets
        # the bounce tile size (must divide the primary tile; default =
        # primary R), COSIG_WF_SB its sub-packet count. Compacted bounce
        # rays are octant-sorted in GROUP(=128)-ray blocks, so Rb/Sb ==
        # GROUP gives SINGLE-OCTANT sub-packets with sign-uniform
        # direction hulls (bounce frustum culling built on that was
        # rejected on hardware; see the note above `body`).
        # Auto rule (r4 ssRb/ssSb sweep, 07:25-07:53 window): narrow cuts
        # (C_pad <= 128, e.g. glass K32) win at Rb=1024 — finer dead-tile
        # skip granularity beats per-tile fixed cost when the slab cull is
        # only one 128-lane block (glass 34.9 -> 33.3-33.9 ms, 3 rows) —
        # while wide cuts lose there (large_mesh C_pad=256: 144 -> 161 ms),
        # so they keep the full tile. Sub-packet width never won (Sb2 flat,
        # Sb4/Rb512 lose); Sb stays _subpackets_for. Image bits are
        # Rb-invariant (identical image_mean across all sweep rows).
        Rb_auto = min(R, SUB_LANES) if C_pad <= 128 else R
        Rb = int(_os.environ.get("COSIG_WF_RB", "0")) or Rb_auto
        if Rb < SUB_LANES:
            raise ValueError(
                f"COSIG_WF_RB must be >= SUB_LANES ({SUB_LANES}); got {Rb}"
            )
        assert R % Rb == 0 and Rb % 128 == 0, Rb
        Sb = int(_os.environ.get("COSIG_WF_SB", "0")) or _subpackets_for(Rb)
        assert Sb <= 8 and Rb % Sb == 0 and (Rb // Sb) % 128 == 0, (Rb, Sb)
        def _mk_kernels(ss):
            return (
                [_make_bounce_kernel(cfg, dims, stream, prim_counts, Sb, Rb,
                                     mode=m, decode=decode, sh_dims=sh_dims,
                                     selfskip=ss)
                 for m in ("trace", "shade")]
                if fission
                else [_make_bounce_kernel(cfg, dims, stream, prim_counts,
                                          Sb, Rb, decode=decode,
                                          sh_dims=sh_dims, selfskip=ss)]
            )

        b_scratch = (
            scratch if Rb == R
            else _stage_resources(cset, stream, Rb, frustum=False,
                                  interpret=interpret)[3] + sh_scratch
        )

        if selfskip:
            # ---- self-skip dispatch (_SELFSKIP note): no compaction, no
            # prefix ladder — ONE executable per bounce kernel, grid over
            # all tiles, dead tiles skip their state DMA via the SMEM
            # alive bitmap. group_perm stays identity (state never moves),
            # so the final inverse gather is skipped too. ----
            kernels_ss = _mk_kernels(True)
            nbk = n_pad // Rb
            ss_scratch = b_scratch + [
                pltpu.VMEM((SROWS, Rb), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ]

            def one_bounce_ss(st, uni_d):
                alive_bm = (
                    (st[12].reshape(nbk, Rb) > F(0.5)).any(axis=1)
                    .astype(jnp.int32).reshape(1, nbk)
                )
                for kn in kernels_ss:
                    st = pl.pallas_call(
                        kn,
                        grid=(nbk,),
                        in_specs=geom_specs + [
                            pl.BlockSpec(memory_space=pltpu.SMEM),
                            pl.BlockSpec(memory_space=pltpu.HBM),
                        ],
                        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
                        out_shape=jax.ShapeDtypeStruct(
                            (SROWS, n_pad), jnp.float32
                        ),
                        scratch_shapes=ss_scratch,
                        input_output_aliases={len(geom_specs) + 1: 0},
                        interpret=interpret,
                        compiler_params=COMPILER_PARAMS,
                    )(uni_d, cset.mats, lights, prims, cset.aabb_t,
                      cset.sb_aabb_t, cset.sub_aabb_t, *geom_ins,
                      *sh_inputs, alive_bm, st)
                return st

            def depth_body_ss(depth, st):
                uni_d = (
                    uniforms.at[U_DEPTH].set(depth.astype(jnp.float32))
                    .at[U_LAST].set(
                        (depth == cfg.max_depth - 1).astype(jnp.float32)
                    )
                )
                return one_bounce_ss(st, uni_d)

            # Interpret always unrolls: interpret-mode pallas_call inside a
            # lax loop miscomputes (the guard the compaction path documents
            # below); unrolling costs nothing without Mosaic compiles.
            if _os.environ.get("COSIG_WF_LOOP") == "py" or interpret:
                for depth in range(1, cfg.max_depth):
                    state = depth_body_ss(jnp.int32(depth), state)
            else:
                state = jax.lax.fori_loop(
                    1, cfg.max_depth, depth_body_ss, state
                )
        else:
            kernels = _mk_kernels(False)

            def run_prefix(st, uni_d, pt):
                # Compiled: the full state array is passed through with the
                # state input ALIASED to the output (index len(geom_specs) =
                # the state operand) and the grid covering only the prefix
                # tiles — tiles beyond the prefix keep their bytes in place
                # (it is literally the same buffer). The old form sliced the
                # prefix out and dynamic_update_slice'd it back: two extra
                # full-prefix HBM copy passes per bounce, pure floor.
                # Interpret mode keeps the slice/update form (its aliasing
                # semantics for grid-uncovered output regions are not
                # trustworthy; perf is irrelevant there) — the math is
                # identical either way.
                if interpret:
                    P = pt * R
                    sub = jax.lax.slice(st, (0, 0), (SROWS, P))
                    for kn in kernels:
                        sub = pl.pallas_call(
                            kn,
                            grid=(pt * (R // Rb),),
                            in_specs=geom_specs
                            + [pl.BlockSpec((SROWS, Rb), lambda i: (0, i),
                                            memory_space=pltpu.VMEM)],
                            out_specs=pl.BlockSpec((SROWS, Rb), lambda i: (0, i),
                                                   memory_space=pltpu.VMEM),
                            out_shape=jax.ShapeDtypeStruct((SROWS, P), jnp.float32),
                            scratch_shapes=b_scratch,
                            interpret=interpret,
                            compiler_params=COMPILER_PARAMS,
                        )(uni_d, cset.mats, lights, prims, cset.aabb_t,
                          cset.sb_aabb_t, cset.sub_aabb_t, *geom_ins,
                          *sh_inputs, sub)
                    return jax.lax.dynamic_update_slice(st, sub, (0, 0))
                for kn in kernels:
                    st = pl.pallas_call(
                        kn,
                        grid=(pt * (R // Rb),),
                        in_specs=geom_specs
                        + [pl.BlockSpec((SROWS, Rb), lambda i: (0, i),
                                        memory_space=pltpu.VMEM)],
                        out_specs=pl.BlockSpec((SROWS, Rb), lambda i: (0, i),
                                               memory_space=pltpu.VMEM),
                        out_shape=jax.ShapeDtypeStruct((SROWS, n_pad), jnp.float32),
                        scratch_shapes=b_scratch,
                        input_output_aliases={len(geom_specs): 0},
                        compiler_params=COMPILER_PARAMS,
                    )(uni_d, cset.mats, lights, prims, cset.aabb_t,
                      cset.sb_aabb_t, cset.sub_aabb_t, *geom_ins,
                      *sh_inputs, st)
                return st

            def at_extent(st, gp, uni_d, ext_tiles):
                st, gp, n_alive_g = _compact_prefix(
                    st, gp, n_pad, ext_tiles * R // GROUP, SROWS)
                needed_tiles = (n_alive_g * GROUP + (R - 1)) // R
                # Smallest level covering the alive prefix; alive rays sit
                # inside the current extent, so idx <= the extent's own index.
                idx = jnp.sum(lv_arr < needed_tiles)
                st = jax.lax.switch(
                    idx,
                    [functools.partial(run_prefix, pt=lvl) for lvl in levels],
                    st, uni_d,
                )
                return st, gp, idx

            def depth_body(depth, carry):
                st, gp, ext_idx = carry
                uni_d = (
                    uniforms.at[U_DEPTH].set(depth.astype(jnp.float32))
                    .at[U_LAST].set((depth == cfg.max_depth - 1).astype(jnp.float32))
                )
                return jax.lax.switch(
                    ext_idx,
                    [functools.partial(at_extent, ext_tiles=lvl) for lvl in levels],
                    st, gp, uni_d,
                )

            # Depth-1 compaction covers the full primary output (last level).
            #
            # The depth chain is a lax.fori_loop when compiled (one Mosaic
            # payload per prefix level regardless of max_depth) but UNROLLED in
            # interpret mode: interpret-mode pallas_call inside a while loop
            # under shard_map miscomputes (the bounce kernel sees state
            # inconsistent with the compaction permutation — reproduced at
            # round 3 on the multichip dryrun; identity-permutation or
            # no-bounce variants are unaffected, pointing at buffer aliasing
            # in the interpret machinery, which compiled Mosaic never uses).
            # Interpret mode has no Mosaic compiles, so unrolling costs
            # nothing there. COSIG_WF_LOOP=py forces the unrolled form when
            # compiled (escape hatch).
            # S == 1 (tile_rays == 1024): the compiled fori/switch chain
            # miscomputes on TPU (bounce stages contribute nothing; depth-2
            # reproduced on hardware, interpret clean) — the unrolled chain is
            # correct, so force it for this non-default tile size until the
            # Mosaic/XLA interaction is root-caused.
            # COSIG_WF_LOOP=fori overrides BOTH unroll guards (including the
            # interpret one) — the falsifiability escape used by
            # tools/repro_s1_depth_chain.py and
            # tools/repro_interpret_while_shardmap.py to demonstrate the bugs
            # the guards protect against; never set it in production runs.
            force_unroll = subpackets == 1
            wf_loop = _os.environ.get("COSIG_WF_LOOP")
            if wf_loop == "fori":
                interpret_unroll = force_unroll = False
            else:
                interpret_unroll = interpret
            carry = (state, group_perm, jnp.int32(len(levels) - 1))
            if interpret_unroll or force_unroll or wf_loop == "py":
                for depth in range(1, cfg.max_depth):
                    carry = depth_body(jnp.int32(depth), carry)
                state, group_perm, _ = carry
            else:
                state, group_perm, _ = jax.lax.fori_loop(
                    1, cfg.max_depth, depth_body, carry,
                )

    # ---- restore pixel order (inverse group permutation, one cheap group
    # gather) and un-tile with pure reshapes; no per-ray scatter. Only the
    # color rows need restoring (the rays-traced sum is permutation-
    # invariant); at max_depth == 1 no compaction ran, so skip the
    # identity gather entirely ----
    rays = jnp.sum(state[13])  # padding rays never traced -> count 0
    colors = state[9:12]
    if _NOUNT:  # measurement stub: cheap contiguous reshape, wrong image
        img = (
            colors[:, : band * width].reshape(3, band, width).transpose(1, 2, 0)
        )
        return img, rays
    # Ray enumeration (primary kernel): tile-major (nby, nbx), then quad-
    # major pixels within the block (one quad per sub-packet), row-major
    # within a quad, then AA sample. Average the AA samples (consecutive
    # lanes) BEFORE the big untranspose: the awkward 8-D transpose lowers
    # to slow copies on TPU (~6.4 ms at 4M rays measured), so shrink its
    # input aa x first — and (mean-first, _MEANFIRST) before the inverse
    # group gather too, shrinking THAT aa x as well.
    sqh, sqw = _quad_grid(subpackets)
    qh, qw = bh // sqh, bw // sqw
    meanfirst = _MEANFIRST and GROUP % aa == 0
    if cfg.max_depth > 1 and not selfskip:
        g_total = n_pad // GROUP
        inv = jnp.argsort(group_perm)
        if meanfirst:
            colors = colors.reshape(3, g_total, GROUP // aa, aa).mean(axis=3)
            colors = colors[:, inv, :].reshape(
                3, nby, nbx, sqh, sqw, qh, qw)
        else:
            colors = (
                colors.reshape(3, g_total, GROUP)[:, inv, :]
                .reshape(3, nby, nbx, sqh, sqw, qh, qw, aa).mean(axis=7)
            )
    else:
        colors = colors.reshape(3, nby, nbx, sqh, sqw, qh, qw, aa).mean(axis=7)
    img = (
        colors.transpose(0, 1, 3, 5, 2, 4, 6)
        .reshape(3, nby * bh, nbx * bw)[:, :band, :width]
        .transpose(1, 2, 0)
    )
    return img, rays


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "interpret", "stream", "prim_counts", "tile_rays"),
)
def render_jit(cset, params, cfg: StaticConfig, interpret: bool = False,
               stream: bool = None, prims=None, prim_counts=(0, 0),
               tile_rays: int = None, cset_primary=None, cset_shadow=None):
    return render_wavefront(
        cset, params, cfg, interpret, stream,
        prims=prims, prim_counts=prim_counts, tile_rays=tile_rays,
        cset_primary=cset_primary, cset_shadow=cset_shadow,
    )

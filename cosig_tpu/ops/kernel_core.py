"""Shared Pallas kernel core: packet cluster traversal + Whitted bounce.

Both Pallas backends — the tile-resident megakernel
(:mod:`cosig_tpu.ops.trace_pallas`) and the wavefront backend
(:mod:`cosig_tpu.ops.trace_wavefront`) — execute the exact same physics:
packet cluster traversal (vectorized slab cull -> SMEM flag compaction ->
dynamic visit loop) and one Whitted bounce (shade + shadow traversal +
secondary ray). This module is the single definition of that arithmetic;
the backends differ only in how rays are scheduled around it (fused
per-tile depth loop vs per-bounce stages with global ray compaction).

Keeping one definition is a correctness property, not just hygiene: the
backends are required to be *bitwise equal* to each other and ULP-equal to
the XLA oracle (tests/test_pallas.py), which only survives if every
arithmetic change lands in all paths at once.

Parity reference for the physics: ``Assets/Shaders/BVHRayTracing.compute``
(`CSMain` :273-511, `TraverseBVH` :225-267, `IntersectTriangle` :153-190);
see :mod:`cosig_tpu.ops.shade` for the quirk-preserving shading contract.

Layout contract (see accel/clusters.py): per-ray quantities are planes of
shape (1, R) with R on lanes; ray x triangle pair grids are (K, R) built
from (K, 1) x (1, R) broadcasts; geometry [C, K, GEOM_COMPS] so slicing a
cluster lands in its natural layout with zero relayouts.

Mosaic lessons baked in (CLAUDE.md): in-kernel float constants must be
np.float32 (jnp scalars become captured ArrayImpl constants); per-cluster
`jnp.any` + `pl.when` costs ~300 ns each, so the cull is one vectorized
slab test whose flag row is DMA'd to SMEM and scalar-compacted; DMA slices
need 128-lane alignment.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measurement-only stage stubs (tools/stage_profile.py), comma-separable
# (e.g. COSIG_STUB=trav,shade): "mt" skips the pair tests inside the
# visit loop (keeps cull/DMA/compaction/loop), "mt_anyhit" only in
# any-hit (shadow) traversals, "visit" skips the visit loop entirely,
# "visit_anyhit" only in any-hit traversals, "trav" skips the whole
# traversal (immediate miss), "shadow" skips only shadow traversals
# (everything lit; primary aliveness preserved), "shade" skips the
# local-shading block (ambient/diffuse/specular + shadow rays; aliveness
# and secondary rays preserved). Images are WRONG under a stub — never
# set outside profiling runs.
_STUB = frozenset(filter(None, os.environ.get("COSIG_STUB", "").split(",")))


def _stub_mt(any_hit: bool) -> bool:
    return "mt" in _STUB or (any_hit and "mt_anyhit" in _STUB)


def _stub_sel(any_hit: bool) -> bool:
    """"sel": run the pair-test dot but skip the winner selection (MXU
    path only; images WRONG). Splits the visit cost into its two halves
    — bf16 MXU dot vs VPU selection arithmetic — for the depth-1
    attribution runs (tools/depth_profile.py), where liveness cannot
    confound (no bounce stages exist at max_depth == 1)."""
    return "sel" in _STUB or (any_hit and "sel_anyhit" in _STUB)


def _stub_visit(any_hit: bool) -> bool:
    return "visit" in _STUB or (any_hit and "visit_anyhit" in _STUB)

# Pruned experiment levers (round 4; full implementations in git history
# and measurements in STATUS/PROGRESS): COSIG_PHASE2 two-phase
# progressive cull (flat on every config), COSIG_SUBG sub-AABB visit
# granularity (4x regression — per-visit scalar overhead), and
# COSIG_MXU_BATCH/_CSEL chunked MXU visits (lost 17-47 % on both bench
# configs). The sub-AABB cluster data (clusters.subgroups /
# sub_aabb_t) is retained: kernel operand signatures and the cluster
# build stay unchanged, and it remains available to future
# visit-granularity experiments.

from cosig_tpu.accel import clusters as cl
from cosig_tpu.models.soa import FrameParams
from cosig_tpu.ops import rng

F = np.float32

# Auto-stream geometry through HBM above this clustered-geometry size
# (double-buffered per-cluster DMA; geometry-domain blocking).
STREAM_THRESHOLD_BYTES = 6 * 1024 * 1024

# Mosaic's default scoped-VMEM limit is 16 MB; large scenes (VMEM-resident
# geometry + hierarchical-cull temporaries + ray state) legitimately need
# more of the physical 128 MB (large_mesh bounce stage: 17.3 MB).
COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024)

INF = F(3.402823466e38)
EPSILON = F(1e-4)
OFFSET = F(1e-2)

# Shared ray-state row layout (bounce_core/bounce_trace contract): rows
# 0-2 origin, 3-5 direction, 6-8 attenuation, 9-11 accumulated color,
# 12 alive, 13 rays-traced count. Rows >= 14 belong to the caller
# (trace_wavefront: 14 = ray id; fission hit record above that).
ROW_ALIVE = 12
ROW_COUNT = 13

# Tie-break ids for analytic primitives: above every triangle gid (< 2^24),
# so primitives lose equal-t ties to triangles — the oracle's strict-< fold
# (ops/analytic.py) — and spaced by 2 to stay f32-exact above 2^24.
GID_SPH = F(2.0 ** 24 + 2)

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
U_DEPTH = 23  # bounce index (wavefront stages); unused by the megakernel
U_LAST = 24  # 1.0 on the final bounce (wavefront stages; see bounce_core)
UNIFORMS_LEN = 25


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
        row_offset, F(0.0), F(0.0),
    ]
    return jnp.stack([jnp.asarray(v, F) for v in vals])


def build_lights(params: FrameParams, multi_light: bool) -> jax.Array:
    """SMEM light table [L, 8]: pos xyz, rgb, pad pad."""
    pos = params.light_pos if multi_light else params.light_pos[:1]
    rgb = params.light_rgb if multi_light else params.light_rgb[:1]
    pad = jnp.zeros((pos.shape[0], 2), F)
    return jnp.concatenate([pos, rgb, pad], axis=1)


# ---------------------------------------------------------------------------
# Packet cluster traversal


# (Early-t cluster skip — COSIG_EARLYT, the TPU analog of the
# reference's pop-time best-t early-out (compute:255-258) via a
# counting-sort front-to-back visit order + per-sub-packet bound tests,
# and its any-hit twin COSIG_EARLYT_OCC — were REJECTED on hardware:
# glass 37.4 vs 33.5/34.2 ms (r4), large 148.6/148.8 vs 144.85/144.85
# (r5 etlarge, after fixing the r4 Mosaic partial-sublane DMA crash —
# tools/repro_earlyt_multitile.py documents the hazard); OCC flat on
# both configs (r5 occlarge, clean window). The per-sub-packet max
# best-t bound stays loose under bounce divergence at packet
# granularity. Implementation + bitwise gates in git history; numbers
# in docs/packet_floor.md.)


def make_traverse(
    aabb_t, sb_aabb_t, geom, best_ref, flag_vmem, flags_smem, list_smem, sem,
    sbflag_vmem, sb_smem, C, C_pad, K, R,
    gbuf=None, gsem=None, stream=False, subpackets=1,
    prims=None, n_sph=0, n_box=0, frustum=False,
    sub_aabb_t=None, subgroups=1,
    geom_mx=None, gatt=None, raysmx=None, mxu_anyhit=True,
):
    """Build ``traverse(ox..dz, active, max_t=None) -> (hit, t, n, mat)``.

    Packet cluster traversal in three stages, sized so the scalar unit
    never stalls the VPU on a per-cluster basis (a per-cluster
    ``any + pl.when`` pattern costs ~300 ns per cluster; this structure
    costs ~0.4 us per *traversal*):

    1. one vectorized (R, C_pad) slab test, masked by the alive lanes
       (dead rays don't vote -> natural ray compaction); hierarchical for
       multi-block scenes (superblock union pre-cull, then per-block);
    2. per-cluster any-hit flags DMA'd VMEM->SMEM, scalar-compacted into a
       hit-cluster index list;
    3. a dynamic-trip ``fori_loop`` over only the hit clusters, each
       intersecting its (K, R) pair grid with the Plücker/edge-volume
       formulation (ops/intersect.plucker_constants_host; same test and
       epsilons as the reference's Möller-Trumbore, compute:153-179).

    ``subpackets=S`` (S > 1) is the TPU-shaped analog of the reference's
    per-ray traversal granularity (``TraverseBVH``, compute:225-267, where
    each ray visits only its own nodes): the tile's R rays are split into
    S contiguous-lane sub-packets and the cull packs a *per-sub-packet*
    visit bit into the flag row (same single flag DMA; the compacted list
    entry becomes ``(cluster << 8) | mask``). The visit loop then runs the
    intersection on each sub-packet's (K, R/S) lane slice only when its
    bit is set — recovering the measured 1.5-2.3x pair-work inflation of
    whole-packet culling (docs/subpacket_plan.md) at the cost of S scalar
    branches per visited cluster. Results are bitwise identical to S=1 by
    construction: skipped (ray, cluster) pairs are exactly those whose
    inflated slab test fails for every ray in the sub-packet. The cull
    also processes rays per sub-packet, cutting its largest temporaries
    from (R, block) to (R/S, block).

    ``stream=True`` keeps geometry in HBM and double-buffers each visited
    cluster's (K, comps) block through ``gbuf``/``gsem`` (geometry-domain
    blocking, SURVEY.md section 5).

    ``prims``/``n_sph``/``n_box``: analytic sphere/box instances (SMEM
    table [P, 22]: 12 inverse-matrix + 9 inverse-transpose + 1 material
    floats per primitive, spheres first) folded into the best-hit state
    after the cluster visits — the in-kernel form of the reference's dead
    CPU analytic path (HittableObjects.cs:83-108,182-224; see
    ops/analytic.py for the XLA oracle). Primitives get tie-break ids
    above every triangle gid, so they lose equal-t ties to triangles
    exactly like the oracle's strict-less-than fold.

    ``frustum=True`` replaces the per-ray (R, C_pad) slab cull with a
    per-sub-packet interval (bounding-frustum) test on (1, C_pad) rows —
    ~R/S times less cull arithmetic. The hull test is a conservative
    superset of the per-ray culls (interval arithmetic over the
    sub-packet's origin/direction bounds; axes whose direction interval
    straddles zero are unconstrained), so the extra visited clusters only
    add non-winning candidates: results are identical, MT work grows by
    the frustum looseness. Right only for COHERENT packets — the primary
    stage's camera rays and their shadow rays (tight pixel-quad frusta);
    bounce stages keep per-ray culls. Works at any scene size: multi-block
    scenes run the frustum test per block, keeping the hierarchy only for
    its block-scoped scalar compaction.
    """
    GB = cl.CULL_BLOCK
    n_blocks = max(1, C_pad // GB)
    S = subpackets
    assert R % S == 0 and S <= 8
    RS = R // S
    assert RS % 8 == 0  # sublane-aligned cull slices; lane-aligned MT needs
    LANE_OK = RS % 128 == 0  # static lane slices must be 128-aligned
    assert S == 1 or LANE_OK

    # Second cluster level (sub-AABB visit granularity): the cull tests
    # G sub-boxes per cluster and the visit loop intersects only the
    # surviving 8-triangle geometry slices — the reference's
    # <=4-tris-per-leaf pair economy (BVHBuilder.cs:58) without growing
    # the scalar compaction loop past C. Coherent (frustum) packets only;
    # streamed geometry keeps whole-cluster visits (a (c, g) list would
    # re-DMA the cluster per subgroup).
    # MXU traversal (mt_mxu): the caller passes the packed matmul
    # operands (clusters._pack_mx) to route the pair tests through the
    # systolic array — one (5K, 16) @ (16, R/S) dot per visit for the
    # five MT planes (~9x the VPU dot throughput, tools/mxu_mt_bench.py)
    # plus a (16, K) @ (K, R/S) dot contracting the per-triangle
    # attribute rows against the one-hot winner mask (the sel() fold).
    # Compiled-TPU only: in interpret mode XLA's dot reassociates the
    # f32 sums, breaking the bitwise backend-equality gates; on hardware
    # the divergence is ULP-scale and bounded by the bench RMSE gate.
    # Requires unstreamed geometry (the mx operands live in VMEM).
    mxu = geom_mx is not None
    if mxu:
        assert gatt is not None and raysmx is not None
        assert not stream
        if not mxu_anyhit:
            # Mixed mode (COSIG_MXU_SHADOW=0): any-hit shadow traversals
            # keep the VPU pair test, so the REAL 36-col geometry must be
            # resident alongside the matmul operands.
            assert geom.shape[1:] == (K, cl.GEOM_COMPS), geom.shape

    def traverse(ox, oy, oz, dx, dy, dz, active, max_t=None, any_hit=False):
        """``any_hit=True`` (shadow rays): only "is some hit at t <= max_t"
        is tracked — no winner selection, normal interpolation or
        tie-break. Provably equal to the closest-hit form: closest-t >
        max_t iff no hit has t <= max_t. Returns occlusion in the ``hit``
        slot (t/normal/material are placeholders)."""
        if "trav" in _STUB or ("shadow" in _STUB and any_hit):
            ones = jnp.ones((1, R), F)
            return (
                jnp.zeros((1, R), bool), ones * INF,
                ones * F(0.0), ones, ones * F(0.0), ones * F(-1.0),
            )
        use_mxu = mxu and (mxu_anyhit or not any_hit)
        if any_hit:
            assert max_t is not None
            best_ref[0:1] = jnp.zeros((1, R), F)  # occlusion flag row
        else:
            best_ref[0:1] = jnp.full((1, R), INF, F)
            best_ref[1:2] = jnp.zeros((1, R), F)
            best_ref[2:3] = jnp.ones((1, R), F)  # default normal (0,1,0)
            best_ref[3:4] = jnp.zeros((1, R), F)
            best_ref[4:5] = jnp.full((1, R), -1.0, F)
            best_ref[5:6] = jnp.full((1, R), cl.GID_PAD, F)  # best global tri id

        idx = F(1.0) / dx
        idy = F(1.0) / dy
        idz = F(1.0) / dz
        # Ray moment w = o x d for the Plücker edge volumes (canonical
        # component order, see intersect.moller_trumbore).
        wx = oy * dz - oz * dy
        wy = oz * dx - ox * dz
        wz = ox * dy - oy * dx

        # Staging-band base row for MXU operands (disjoint closest/any-hit
        # bands, see stage_rays); read by both stage_rays and the stage-3
        # window loads below, so it lives at this scope.
        mxb = 64 if any_hit else 0

        def stage_rays():
            """Stage the per-ray planes for the visit loop. Called between
            the flag DMA's start() and wait() so the VMEM->SMEM flag
            transfer rides under these stores instead of serializing at
            the top of every traversal (nothing before the wait reads the
            staged rows — the cull works on the live traced planes)."""
            if use_mxu:
                # MXU operand staging (clusters.MX_COMBOS layout): raysmx
                # row c*10 + i = bf16 limb k_c of ray input i, inputs =
                # (o, d, w, const 1). The limb split x = x0 + x1 + x2
                # (exact residual subtractions) lets ONE bf16 MXU pass
                # reproduce fp32-contract precision — see the layout note
                # in accel/clusters.py. Same Mosaic staging rule as
                # sub_rays: windows must be fresh aligned ref loads of
                # VMEM rows, not traced-vector slices. Closest-hit and
                # any-hit traversals stage DISJOINT row bands (any_hit:
                # rows 64-127): one shared band means the shadow
                # traversal's re-staging clobbers rows whose derived
                # values (winner normals) the compiled kernel may still
                # be consuming afterward.
                bf16 = jnp.bfloat16
                planes = {}
                for i, plane in enumerate(
                    (ox, oy, oz, dx, dy, dz, wx, wy, wz)
                ):
                    l0 = plane.astype(bf16)
                    r1 = plane - l0.astype(F)
                    l1 = r1.astype(bf16)
                    l2 = (r1 - l1.astype(F)).astype(bf16)
                    planes[i] = (l0, l1, l2)
                one = jnp.ones((1, R), bf16)
                zero = jnp.zeros((1, R), bf16)
                planes[9] = (one, zero, zero)
                rows = [
                    planes[i][kc]
                    for _, kc in cl.MX_COMBOS
                    for i in range(10)
                ] + [zero] * 4
                if os.environ.get("COSIG_MXU_STAGE") == "rows":
                    for r_i, row in enumerate(rows):
                        raysmx[mxb + r_i : mxb + r_i + 1] = row
                else:
                    # Single (64, R) store (default): fewer stores for
                    # Mosaic to schedule than 64 row writes, and the
                    # staged block is one value — also an A/B lever for
                    # the miscompile hunt.
                    raysmx[mxb : mxb + 64] = jnp.concatenate(rows, axis=0)
                if any_hit and S > 1:
                    best_ref[15:16] = max_t  # sub-packet-sliceable bound
            elif S > 1:
                # Stage the per-ray planes in VMEM rows: the sub-packet MT
                # reads 128-aligned lane windows of these rows as fresh ref
                # loads. Slicing the live traced vectors instead produces
                # lane-offset layouts Mosaic's broadcast rejects ("Invalid
                # input layout" on vector<1xW> -> vector<KxW>).
                for row, plane in enumerate((ox, oy, oz, dx, dy, dz, wx, wy, wz)):
                    best_ref[6 + row : 7 + row] = plane
                if any_hit:
                    best_ref[15:16] = max_t  # sub-packet-sliceable bound

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
            (1, W) i32: bit ``s`` set iff some ray of sub-packet ``s`` may
            enter the box (S=1: plain 0/1). Inputs are the six AABB
            component rows. Rays are processed one sub-packet (R/S
            sublanes) at a time, which both produces the per-sub-packet
            bits and bounds the slab temporaries at (R/S, W).

            NaN-conservative: comparisons are inverted (``~(tn > tf)``)
            so any NaN slab — a zero direction component with the origin
            exactly on a box plane (0 * inf, jittered AA rays hit this),
            or NaN padding columns — PASSES and lets the exact pair test
            decide. A conservative superset visit costs nothing but a
            candidate; culling on NaN (the reference IntersectAABB's own
            failure mode, compute:199-216) silently drops oracle hits.
            Padding columns passing is harmless: scalar compaction is
            bounded by the real cluster count C."""
            m = None
            for sp in range(S):
                rows = slice(sp * RS, (sp + 1) * RS)
                t0x = (b0 - oxc[rows]) * idxc[rows]
                t1x = (b3 - oxc[rows]) * idxc[rows]
                t0y = (b1 - oyc[rows]) * idyc[rows]
                t1y = (b4 - oyc[rows]) * idyc[rows]
                t0z = (b2 - ozc[rows]) * idzc[rows]
                t1z = (b5 - ozc[rows]) * idzc[rows]
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                    jnp.minimum(t0z, t1z),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.maximum(t0z, t1z),
                )
                boxhit = ~(tn > tf) & ~(tf < F(0.0)) & (act[rows] > F(0.0))
                if mt_col is not None:
                    # Shadow rays: boxes entered beyond the light distance
                    # cannot contain a hit closer than the light (t >= tn);
                    # `lit` treats miss and beyond-light hits identically.
                    boxhit = boxhit & ~(tn > mt_col[rows])
                bit = jnp.max(boxhit.astype(jnp.int32), axis=0, keepdims=True)
                mb = bit if sp == 0 else bit << sp
                m = mb if m is None else m | mb
            return m

        # ---- per-sub-packet ray hulls (frustum mode), hoisted so both
        # the full-row and per-block frustum tests share them ----
        if frustum:
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
            act_row = active.reshape(1, R)
            hulls = []
            for sp in range(S):
                in_sp = act_row & (lane // RS == sp)

                def hull(p, in_sp=in_sp):
                    lo = jnp.min(jnp.where(in_sp, p, INF), axis=1, keepdims=True)
                    hi = jnp.max(jnp.where(in_sp, p, -INF), axis=1, keepdims=True)
                    return lo, hi  # (1, 1) vector values

                axes = [
                    (hull(o_p), hull(d_p))
                    for o_p, d_p in ((ox, dx), (oy, dy), (oz, dz))
                ]
                mt_hi = hull(max_t)[1] if max_t is not None else None
                hulls.append((axes, mt_hi))

        def frustum_flags(b0, b1, b2, b3, b4, b5):
            """Per-sub-packet bounding frustum vs a row of boxes -> packed
            (1, W) bits. Interval arithmetic over the sub-packet's
            origin/direction hulls; see the frustum note in the module
            docstring. NaN-conservative like ``cull``: NaN intervals (and
            NaN AABB padding) pass; compaction is bounded by C."""
            box = ((b0, b3), (b1, b4), (b2, b5))
            W = b0.shape[1]
            m = None
            for sp in range(S):
                axes, mt_hi = hulls[sp]
                entry = jnp.zeros((1, W), F)
                exit_ = jnp.full((1, W), INF, F)
                for ax in range(3):
                    (olo, ohi), (dlo, dhi) = axes[ax]
                    bmin, bmax = box[ax]
                    s_lo = bmin - ohi
                    s_hi = bmax - olo
                    # 1/d interval (valid only when sign-uniform).
                    r_lo = F(1.0) / dhi
                    r_hi = F(1.0) / dlo
                    p1 = s_lo * r_lo
                    p2 = s_lo * r_hi
                    p3 = s_hi * r_lo
                    p4 = s_hi * r_hi
                    t_lo = jnp.minimum(jnp.minimum(p1, p2), jnp.minimum(p3, p4))
                    t_hi = jnp.maximum(jnp.maximum(p1, p2), jnp.maximum(p3, p4))
                    # Direction interval straddles 0 -> axis unconstrained
                    # (whether the box sits fully on the unreachable side
                    # is unknowable cheaply; stay conservative).
                    uni = (dlo > F(0.0)) | (dhi < F(0.0))
                    t_lo = jnp.where(uni, t_lo, -INF)
                    t_hi = jnp.where(uni, t_hi, INF)
                    entry = jnp.maximum(entry, t_lo)
                    exit_ = jnp.minimum(exit_, t_hi)
                if mt_hi is not None:
                    exit_ = jnp.minimum(exit_, mt_hi)
                hit_b = ~(entry > exit_)
                bit = hit_b.astype(jnp.int32)
                mb = bit if sp == 0 else bit << sp
                m = mb if m is None else m | mb
            return m

        flags_of = frustum_flags if frustum else cull

        def detail_flags(cols):
            """Per-sub-packet visit bits for cluster columns ``cols``:
            entry = c (S == 1) or (c << 8) | bits."""
            rows6 = (aabb_t[r : r + 1, cols] for r in range(6))
            return flags_of(*rows6)

        def compact_entry(c, n):
            """Scalar compaction of cluster ``c``'s flag word into the
            visit list: entry = c (S == 1) or (c << 8) | bits."""
            f = flags_smem[0, c]

            @pl.when(f != 0)
            def _():
                list_smem[0, n] = c if S == 1 else (c << 8) | f

            return n + jnp.where(f != 0, 1, 0)

        if n_blocks == 1:
            flag_vmem[:, :] = detail_flags(slice(None))
            copy = pltpu.make_async_copy(flag_vmem, flags_smem, sem)
            copy.start()
            stage_rays()
            copy.wait()
            n_hit = jax.lax.fori_loop(0, C, compact_entry, 0)
        else:
            # Hierarchical cull for large scenes: the (R, C_pad) slab test
            # would blow VMEM, so test CULL_BLOCK-cluster superblock unions
            # first and only cull (and later compact) the blocks some ray
            # may enter. (In frustum mode the flags are (1, W) rows at any
            # scale; the hierarchy is kept for the block-scoped scalar
            # compaction, which skips dead blocks.)
            sbflag_vmem[:, :] = flags_of(
                sb_aabb_t[0:1, :], sb_aabb_t[1:2, :], sb_aabb_t[2:3, :],
                sb_aabb_t[3:4, :], sb_aabb_t[4:5, :], sb_aabb_t[5:6, :],
            )
            sb_copy = pltpu.make_async_copy(sbflag_vmem, sb_smem, sem)
            sb_copy.start()
            stage_rays()  # ride under the superblock-flag DMA
            sb_copy.wait()

            flag_vmem[:, :] = jnp.zeros((1, C_pad), jnp.int32)

            def blk(b, _):
                @pl.when(sb_smem[0, b] > 0)
                def _():
                    off = b * GB
                    flag_vmem[:, pl.ds(off, GB)] = detail_flags(pl.ds(off, GB))

                return 0

            jax.lax.fori_loop(0, n_blocks, blk, 0)

            copy = pltpu.make_async_copy(flag_vmem, flags_smem, sem)
            copy.start()
            copy.wait()

            def block_pass(body):
                def sb_pass(s, n):
                    hi = jnp.minimum((s + 1) * GB, C)

                    return jax.lax.cond(
                        sb_smem[0, s] > 0,
                        lambda nn: jax.lax.fori_loop(s * GB, hi, body, nn),
                        lambda nn: nn,
                        n,
                    )

                return jax.lax.fori_loop(0, n_blocks, sb_pass, 0)

            n_hit = block_pass(compact_entry)

        # ---- stage 3: intersect only the hit clusters ----
        def _cid(entry):
            return entry >> 8 if S > 1 else entry

        def disp_cond(entry, sp):
            """Visit-dispatch condition for sub-packet ``sp``: its cull
            bit (S > 1 packing: entry = (c << 8) | bits)."""
            return (((entry & 0xFF) >> sp) & 1) > 0

        # (Window selection — COSIG_WSEL, one full-width dot + per-
        # flagged-window VPU selection — was REJECTED on hardware in
        # round 5: glass 247 vs 262, large 72 vs 94, every K/R/Sb/mega
        # variant also losing; per-window scalar dispatch + non-
        # contiguous window addressing cost more than the 2-4x lane cut
        # saved. Implementation + bitwise gates in git history; numbers
        # in docs/packet_floor.md.)

        # Per-sub-packet ray-plane windows, loaded ONCE per traversal
        # (loop-invariant across cluster visits; loading inside the visit
        # body would re-issue 9 loads per cluster).
        sub_rays = sub_mx = riota = None
        if use_mxu:
            sub_mx = (
                [
                    raysmx[mxb : mxb + 64, sp * RS : (sp + 1) * RS]
                    for sp in range(S)
                ]
                if S > 1 else [raysmx[mxb : mxb + 64, :]]
            )
            # Row-index tie-break operand: rows are gid-sorted at
            # build time (clusters), so lowest tied ROW == lowest
            # tied gid — no per-pair gid column needed. Materialized
            # at FULL (K, R/S) shape: a (K, 1) iota broadcast against
            # (K, w) comparisons miscompiles in larger kernel bodies
            # (all-zero one-hot -> NaN normals; compiled-only, the
            # same Mosaic broadcast-layout hazard class as the
            # staged-rows rule above). Integer iota, f32 cast.
            riota = jax.lax.broadcasted_iota(
                jnp.int32, (K, R // S), 0
            ).astype(F)

            def mxu_sel(out, gac_c, off, w):
                """Winner selection over a precomputed pair-test dot
                ``out`` (5K, w) for ONE cluster block — the selection
                half of ``mt_mxu`` (see its docstring for the full
                contract)."""
                va, vb, vc = out[0:K], out[K : 2 * K], out[2 * K : 3 * K]
                s, num = out[3 * K : 4 * K], out[4 * K : 5 * K]
                inv_s = F(1.0) / s
                t = num * inv_s
                valid = (
                    (jnp.abs(s) >= EPSILON)
                    & (va * s >= F(0.0))
                    & (vb * s >= F(0.0))
                    & (vc * s >= F(0.0))
                    & (t > EPSILON)
                )
                if any_hit:
                    if w == R:
                        mts = max_t
                        cur = best_ref[0:1]
                    else:
                        mts = best_ref[15:16, off : off + w]
                        cur = best_ref[0:1, off : off + w]
                    occ = jnp.max(
                        (valid & (t <= mts)).astype(F), axis=0, keepdims=True
                    )
                    merged = jnp.maximum(cur, occ)
                    if w == R:
                        best_ref[0:1] = merged
                    else:
                        best_ref[0:1, off : off + w] = merged
                    return
                tm = jnp.where(valid, t, INF)
                tmin = jnp.min(tm, axis=0, keepdims=True)
                if os.environ.get("COSIG_MXU_OH") == "le":
                    # A/B lever for the TPU miscompile hunt: <= is the
                    # same boolean set as == when tmin = min(tm), but a
                    # different compare op for Mosaic to lower.
                    ist = tm <= tmin
                else:
                    ist = tm == tmin
                cand = jnp.where(ist, riota, F(K))
                rmin = jnp.min(cand, axis=0, keepdims=True)
                oh = (ist & (riota == rmin)).astype(F)
                so3 = jnp.dot(
                    gac_c, oh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                )  # (48, w): 3 limb blocks of the 16 attribute rows
                so = so3[0:16] + so3[16:32] + so3[32:48]
                gmin = so[0:1]
                # Factored winner u/v: sel(vb*inv_s) == sel(vb) *
                # sel(inv_s) for a one-hot mask (same two floats
                # multiply). inv_s MUST be zeroed on invalid rows
                # before the fold: s == 0 exactly (all-zero padded
                # slots, perpendicular triangles) — or a tiny s whose
                # TPU reciprocal overflows — gives inv_s = inf, and
                # oh * inf = NaN on the NON-winner rows poisons the
                # sum (the VPU path's where(valid) guard, mt() above;
                # this was the round-3 "NaN normals" hardware bug).
                # A tmin==INF "winner" (oh hot on an invalid row) then
                # yields u = v = 0 like the VPU path — downstream
                # identical either way: normal rows are only read
                # where hit = t < INF.
                inv_sv = jnp.where(valid, inv_s, F(0.0))
                inv_w = jnp.sum(oh * inv_sv, axis=0, keepdims=True)
                u_c = jnp.sum(oh * vb, axis=0, keepdims=True) * inv_w
                v_c = jnp.sum(oh * vc, axis=0, keepdims=True) * inv_w
                w_c = F(1.0) - u_c - v_c
                nx = w_c * so[2:3] + u_c * so[5:6] + v_c * so[8:9]
                ny = w_c * so[3:4] + u_c * so[6:7] + v_c * so[9:10]
                nz = w_c * so[4:5] + u_c * so[7:8] + v_c * so[10:11]
                mat_c = so[1:2]

                def bref(row):
                    if w == R:
                        return best_ref[row : row + 1]
                    return best_ref[row : row + 1, off : off + w]

                def bset(row, val):
                    if w == R:
                        best_ref[row : row + 1] = val
                    else:
                        best_ref[row : row + 1, off : off + w] = val

                bt = bref(0)
                better = (tmin < bt) | ((tmin == bt) & (gmin < bref(5)))
                for row, new in (
                    (0, tmin), (1, nx), (2, ny), (3, nz), (4, mat_c), (5, gmin),
                ):
                    bset(row, jnp.where(better, new, bref(row)))

        elif S > 1:
            sub_rays = [
                tuple(
                    best_ref[r : r + 1, sp * RS : (sp + 1) * RS]
                    for r in range(6, 15)
                )
                for sp in range(S)
            ]

        if stream:
            # Geometry lives in HBM; double-buffer each visited cluster's
            # (K, comps) block through VMEM so the DMA for cluster i+1
            # overlaps the intersection of cluster i.
            def _gdma(i, slot):
                return pltpu.make_async_copy(
                    geom.at[_cid(list_smem[0, i])], gbuf.at[slot], gsem.at[slot]
                )

            # Under the "mt" measurement stub the visit body returns before
            # any wait; starting the warm-up DMA then would leave it
            # forever outstanding (Mosaic rejects un-awaited DMAs).
            if not _stub_mt(any_hit):
                @pl.when(n_hit > 0)
                def _():
                    _gdma(0, 0).start()

        def visit(i, _):
            if _stub_mt(any_hit):
                return 0
            entry = list_smem[0, i]
            if use_mxu:
                gmc = geom_mx[_cid(entry)]  # (5K, 64)
                gac = gatt[_cid(entry)]  # (48, K)
            elif stream:
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < n_hit)
                def _():
                    _gdma(i + 1, jax.lax.rem(i + 1, 2)).start()

                _gdma(i, slot).wait()
                g = gbuf[slot]  # (K, comps)
            else:
                # (KG, comps) when G > 1 (subgroup-major geometry),
                # (K, comps) otherwise — a plain first-axis load in
                # both cases.
                g = geom[_cid(entry)]
            if not use_mxu:
                gnx, gny, gnz = g[:, 3:4], g[:, 4:5], g[:, 5:6]
                nda = g[:, 6:7]
                gid = g[:, 35:36]

            def mt_mxu(off, w, mxwin):
                """MXU form of ``mt``: one bf16 (5K, 64) @ (64, w)
                limb-split dot for the five MT planes (>= fp32-
                faithful, see clusters.MX_COMBOS), row-index
                tie-break (rows are gid-sorted), and winner-attribute
                selection as a (48, K) @ (K, w) one-hot contraction
                (exact: 0/1 mask x bf16 limbs, f32 accumulate). Same
                (t, gid) winner as ``mt`` for identical plane values;
                plane values differ from the FMA chain by dot-
                accumulation ULPs (compiled-TPU only, see the mxu
                note at the top of make_traverse). Rows [5K, 6K)
                (the gid plane, chunk-level selection only) are
                sliced off."""
                out = jnp.dot(
                    gmc[0 : 5 * K], mxwin,
                    preferred_element_type=jnp.float32,
                )
                if _stub_sel(any_hit):
                    # Attribution stub: keep the dot alive (zero-scaled
                    # fold into the best row), skip the selection.
                    if w == R:
                        best_ref[0:1] = best_ref[0:1] + out[0:1] * F(0.0)
                    else:
                        best_ref[0:1, off : off + w] = (
                            best_ref[0:1, off : off + w] + out[0:1] * F(0.0)
                        )
                    return
                mxu_sel(out, gac, off, w)

            def mt(off, w, rays9=None):
                """Plücker/edge-volume intersection of this cluster's
                (K, w) pair grid on the lane slice [off, off+w); updates
                the best-hit rows on the same slice. The chain order
                mirrors intersect.moller_trumbore exactly. ``rays9`` is
                the sub-packet's pre-loaded ray-plane window tuple (see
                the staging note in traverse)."""
                if w == R:
                    oxs, oys, ozs = ox, oy, oz
                    dxs, dys, dzs = dx, dy, dz
                    wxs, wys, wzs = wx, wy, wz
                else:
                    oxs, oys, ozs, dxs, dys, dzs, wxs, wys, wzs = rays9
                va = (
                    dxs * g[:, 7:8] + dys * g[:, 8:9] + dzs * g[:, 9:10]
                    + wxs * g[:, 10:11] + wys * g[:, 11:12] + wzs * g[:, 12:13]
                )
                vb = (
                    dxs * g[:, 13:14] + dys * g[:, 14:15] + dzs * g[:, 15:16]
                    + wxs * g[:, 16:17] + wys * g[:, 17:18] + wzs * g[:, 18:19]
                )
                vc = (
                    dxs * g[:, 19:20] + dys * g[:, 20:21] + dzs * g[:, 21:22]
                    + wxs * g[:, 22:23] + wys * g[:, 23:24] + wzs * g[:, 24:25]
                )
                s = dxs * gnx + dys * gny + dzs * gnz
                ndo = oxs * gnx + oys * gny + ozs * gnz
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
                if any_hit:
                    # Occlusion only: any valid hit at t <= max_t. No
                    # winner selection / interpolation / tie-break.
                    if w == R:
                        mts = max_t
                        cur = best_ref[0:1]
                    else:
                        mts = best_ref[15:16, off : off + w]
                        cur = best_ref[0:1, off : off + w]
                    occ = jnp.max(
                        (valid & (t <= mts)).astype(F), axis=0, keepdims=True
                    )
                    merged = jnp.maximum(cur, occ)
                    if w == R:
                        best_ref[0:1] = merged
                    else:
                        best_ref[0:1, off : off + w] = merged
                    return
                tm = jnp.where(valid, t, INF)
                tmin = jnp.min(tm, axis=0, keepdims=True)  # (1, w)
                # Winner among equal-t rows: lowest global (soup) index —
                # the deterministic lexicographic (t, gid) tie-break
                # matching the XLA oracle's reduction order (first-
                # occurrence argmin over soup blocks + strict < across
                # blocks).
                cand = jnp.where(tm == tmin, gid, cl.GID_PAD)
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

                # Lexicographic (t, gid) winner across clusters: the same
                # triangle pair straddling two clusters (or two triangles
                # sharing an edge) resolves identically in every backend.
                def bref(row):
                    if w == R:
                        return best_ref[row : row + 1]
                    return best_ref[row : row + 1, off : off + w]

                def bset(row, val):
                    if w == R:
                        best_ref[row : row + 1] = val
                    else:
                        best_ref[row : row + 1, off : off + w] = val

                bt = bref(0)
                better = (tmin < bt) | ((tmin == bt) & (gmin < bref(5)))
                for row, new in (
                    (0, tmin), (1, nx), (2, ny), (3, nz), (4, mat_c), (5, gmin),
                ):
                    bset(row, jnp.where(better, new, bref(row)))

            if use_mxu:
                if S == 1:
                    mt_mxu(0, R, sub_mx[0])
                else:
                    for sp in range(S):
                        @pl.when(disp_cond(entry, sp))
                        def _(sp=sp):
                            mt_mxu(sp * RS, RS, sub_mx[sp])
            elif S == 1:
                mt(0, R)
            else:
                # Per-sub-packet visit bits: skip the intersection for
                # sub-packets whose every ray already failed the
                # (inflated) box test — the reference's per-ray
                # traversal granularity, packet-shaped
                # (compute:225-267). The low 8 entry bits are the
                # sp bits in both packings.
                for sp in range(S):
                    @pl.when(disp_cond(entry, sp))
                    def _(sp=sp):
                        mt(sp * RS, RS, sub_rays[sp])
            return 0

        if not _stub_visit(any_hit):
            jax.lax.fori_loop(0, n_hit, visit, 0)

        # ---- analytic primitive fold (optional) ----
        def _prim_fold(p, gid_val, tp, nxw, nyw, nzw, valid):
            """Fold one primitive's hits into the best-hit rows. World
            normal = inverse-transpose x object normal (unnormalized; the
            shared epilogue normalizes). Lexicographic (t, gid) with gid
            above all triangles == the oracle's strict-< fold order."""
            if any_hit:
                occ = (valid & (tp <= max_t)).astype(F)
                best_ref[0:1] = jnp.maximum(best_ref[0:1], occ)
                return
            w = [prims[p, 12 + j] for j in range(9)]
            wx_ = w[0] * nxw + w[1] * nyw + w[2] * nzw
            wy_ = w[3] * nxw + w[4] * nyw + w[5] * nzw
            wz_ = w[6] * nxw + w[7] * nyw + w[8] * nzw
            tm = jnp.where(valid, tp, INF)
            gid_p = jnp.full((1, R), gid_val, F)
            bt = best_ref[0:1]
            better = (tm < bt) | ((tm == bt) & (gid_p < best_ref[5:6]))
            best_ref[0:1] = jnp.where(better, tm, bt)
            best_ref[1:2] = jnp.where(better, wx_, best_ref[1:2])
            best_ref[2:3] = jnp.where(better, wy_, best_ref[2:3])
            best_ref[3:4] = jnp.where(better, wz_, best_ref[3:4])
            best_ref[4:5] = jnp.where(better, prims[p, 21], best_ref[4:5])
            best_ref[5:6] = jnp.where(better, gid_p, best_ref[5:6])

        def _obj_ray(p):
            m = [prims[p, j] for j in range(12)]
            oxo = m[0] * ox + m[1] * oy + m[2] * oz + m[3]
            oyo = m[4] * ox + m[5] * oy + m[6] * oz + m[7]
            ozo = m[8] * ox + m[9] * oy + m[10] * oz + m[11]
            dxo = m[0] * dx + m[1] * dy + m[2] * dz
            dyo = m[4] * dx + m[5] * dy + m[6] * dz
            dzo = m[8] * dx + m[9] * dy + m[10] * dz
            return oxo, oyo, ozo, dxo, dyo, dzo

        for p in range(n_sph):
            # Unit sphere in object space (HittableObjects.cs:83-108;
            # arithmetic mirrors intersect.intersect_unit_sphere). The
            # object-space direction is NOT normalized, so t stays in
            # world parameterization.
            oxo, oyo, ozo, dxo, dyo, dzo = _obj_ray(p)
            a = dxo * dxo + dyo * dyo + dzo * dzo
            b = F(2.0) * (oxo * dxo + oyo * dyo + ozo * dzo)
            c = oxo * oxo + oyo * oyo + ozo * ozo - F(1.0)
            disc = b * b - F(4.0) * a * c
            sq = jnp.sqrt(jnp.maximum(disc, F(0.0)))
            t0 = (-b - sq) / (F(2.0) * a)
            t1 = (-b + sq) / (F(2.0) * a)
            tp = jnp.where(t0 > EPSILON, t0, t1)
            valid = (disc >= F(0.0)) & (tp > EPSILON)
            # Object normal = hit point on the unit sphere.
            _prim_fold(
                p, GID_SPH + 2.0 * p,
                tp, oxo + tp * dxo, oyo + tp * dyo, ozo + tp * dzo, valid,
            )

        for q in range(n_box):
            # Unit cube [-0.5, 0.5]^3 (HittableObjects.cs:182-224;
            # mirrors intersect.intersect_unit_box incl. the argmax
            # first-occurrence face pick).
            p = n_sph + q
            oxo, oyo, ozo, dxo, dyo, dzo = _obj_ray(p)
            ix, iy, iz = F(1.0) / dxo, F(1.0) / dyo, F(1.0) / dzo
            t0x = (F(-0.5) - oxo) * ix
            t1x = (F(0.5) - oxo) * ix
            t0y = (F(-0.5) - oyo) * iy
            t1y = (F(0.5) - oyo) * iy
            t0z = (F(-0.5) - ozo) * iz
            t1z = (F(0.5) - ozo) * iz
            t_en = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.minimum(t0z, t1z),
            )
            t_ex = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z),
            )
            tp = jnp.where(t_en > EPSILON, t_en, t_ex)
            valid = (t_en <= t_ex) & (t_ex > EPSILON) & (tp > EPSILON)
            pxo = oxo + tp * dxo
            pyo = oyo + tp * dyo
            pzo = ozo + tp * dzo
            ax, ay, az = jnp.abs(pxo), jnp.abs(pyo), jnp.abs(pzo)
            is_x = (ax >= ay) & (ax >= az)
            is_y = (~is_x) & (ay >= az)
            nxo = jnp.where(is_x, jnp.sign(pxo), F(0.0))
            nyo = jnp.where(is_y, jnp.sign(pyo), F(0.0))
            nzo = jnp.where(is_x | is_y, F(0.0), jnp.sign(pzo))
            _prim_fold(p, GID_SPH + 2.0 * p, tp, nxo, nyo, nzo, valid)

        if any_hit:
            # hit slot = occluded; t/normal/material are placeholders
            # (callers of any_hit use only the occlusion bit).
            occ = best_ref[0:1] > F(0.0)
            ones = jnp.ones((1, R), F)
            return occ, ones * INF, ones * F(0.0), ones, ones * F(0.0), ones * F(-1.0)

        t = best_ref[0:1]
        hit = t < INF
        nx, ny, nz = _rsqrt_planes(best_ref[1:2], best_ref[2:3], best_ref[3:4])
        nx = jnp.where(hit, nx, F(0.0))
        ny = jnp.where(hit, ny, F(1.0))
        nz = jnp.where(hit, nz, F(0.0))
        return hit, t, nx, ny, nz, best_ref[4:5]

    return traverse


# ---------------------------------------------------------------------------
# One Whitted bounce on the shared ray-state rows


def bounce_trace(traverse, state):
    """The closest-hit half of a bounce: count live rays, trace them,
    return the hit record ``(hit, t, nx, ny, nz, mat_c)``. Split out so
    the wavefront's fission mode (COSIG_WF_FISSION, trace_wavefront) can
    run it in its OWN kernel — the record round-trips losslessly through
    f32 state rows (t/normals/material are f32 planes; ``hit`` is
    recomputed as ``t < INF``, exactly the traverse epilogue's value)."""
    ox, oy, oz = state[0:1], state[1:2], state[2:3]
    dx, dy, dz = state[3:4], state[4:5], state[5:6]
    alive = state[ROW_ALIVE : ROW_ALIVE + 1] > F(0.0)
    state[ROW_COUNT : ROW_COUNT + 1] = (
        state[ROW_COUNT : ROW_COUNT + 1] + alive.astype(F)
    )
    return traverse(ox, oy, oz, dx, dy, dz, alive)


def bounce_core(cfg, uniforms, mats, lights, traverse, state, M, L,
                px, py, s_plane, depth_f, is_last, rec=None,
                traverse_shadow=None):
    """One Whitted bounce on the ray-state rows (compute:356-473).

    ``state`` rows (f32 x R lanes): 0-2 origin, 3-5 direction,
    6-8 attenuation, 9-11 accumulated color, 12 alive, 13 rays-traced
    count (rows >= 14 belong to the caller — see the ROW_* constants).
    ``px``/``py``/``s_plane`` are RNG seed planes (only read when soft
    shadows / glossy are enabled); ``depth_f`` the bounce index (static
    f32 in the megakernel, traced SMEM scalar in the wavefront stages) —
    both produce the same seed values, so backends stay bitwise-equal.

    ``is_last`` may be a static bool (megakernel: the final bounce skips
    the secondary-ray block entirely) or a traced f32 scalar (wavefront:
    ONE bounce executable for every depth — compile-time economy). The
    traced form computes the secondary ray and masks ``cont`` to False on
    the final bounce; every state write is ``where(cont, ...)``-guarded,
    so the resulting state is bit-identical to the static-True early
    return (alive := cont & ... == 0, origin/direction/attenuation
    unchanged).

    ``rec``: a precomputed ``bounce_trace`` hit record (fission mode —
    this call is then the SHADE half and ``traverse`` is used only for
    the any-hit shadow queries); default: trace inline (fused form).

    ``traverse_shadow``: optional separate traversal for the any-hit
    shadow queries (a coarser cluster cut of the SAME triangle soup —
    the cset_shadow lever). Exact: occlusion is a clustering-invariant
    boolean over the identical pair set. Default: ``traverse``.
    """
    R = state.shape[-1]
    bg = (uniforms[U_BG], uniforms[U_BG + 1], uniforms[U_BG + 2])
    intensity = uniforms[U_INTENSITY]
    light_size = uniforms[U_LIGHT_SIZE]
    roughness = uniforms[U_ROUGHNESS]

    ox, oy, oz = state[0:1], state[1:2], state[2:3]
    dx, dy, dz = state[3:4], state[4:5], state[5:6]
    at_r, at_g, at_b = state[6:7], state[7:8], state[8:9]
    scol_r, scol_g, scol_b = state[9:10], state[10:11], state[11:12]
    alive = state[12:13] > F(0.0)

    if rec is None:
        rec = bounce_trace(traverse, state)
    hit, t, nx, ny, nz, mat_c = rec

    miss = alive & ~hit
    scol_r = scol_r + jnp.where(miss, at_r * bg[0], F(0.0))
    scol_g = scol_g + jnp.where(miss, at_g * bg[1], F(0.0))
    scol_b = scol_b + jnp.where(miss, at_b * bg[2], F(0.0))
    alive = alive & hit

    hx = ox + t * dx
    hy = oy + t * dy
    hz = oz + t * dz

    # Material select via a static loop over the SMEM table (defaults for
    # miss, compute:371-376).
    props = [jnp.full((1, R), d, F) for d in (1.0, 1.0, 1.0, 0.1, 0.7, 0.0, 0.0, 1.0)]
    for m in range(M):
        is_m = mat_c == F(m)
        for p in range(8):
            props[p] = jnp.where(is_m, mats[m, p], props[p])
    cr, cg, cb, ka, kd, ks, krefr, ior = props

    loc_r = cr * ka if cfg.enable_ambient else jnp.zeros((1, R), F)
    loc_g = cg * ka if cfg.enable_ambient else jnp.zeros((1, R), F)
    loc_b = cb * ka if cfg.enable_ambient else jnp.zeros((1, R), F)

    for li in range(0 if "shade" in _STUB else L):
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
            state[ROW_COUNT : ROW_COUNT + 1] = (
                state[ROW_COUNT : ROW_COUNT + 1] + shadow_active.astype(F)
            )
            # Any-hit shadow query: occluded iff some hit at t <= dist_l —
            # identical to the closest-hit form's (~hit) | (t > dist)
            # (closest t > dist iff no hit has t <= dist), but the visit
            # loop skips all winner selection/interpolation.
            s_occ, *_ = (traverse_shadow or traverse)(
                hx + nx * OFFSET, hy + ny * OFFSET, hz + nz * OFFSET,
                ldx, ldy, ldz, shadow_active, max_t=dist_l, any_hit=True,
            )
            lit = ~s_occ

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

    if is_last is True:
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
    if not isinstance(is_last, bool):
        # Traced final-bounce flag: kill continuation instead of skipping
        # the block (see docstring — bit-identical, one executable).
        cont = cont & (is_last <= F(0.0))
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

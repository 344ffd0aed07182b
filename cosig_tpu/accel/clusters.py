"""Flat two-level acceleration structure for the Pallas megakernel.

TPU traversal wants wide, shallow, fixed-shape structures, not per-ray
stack walks (SURVEY.md section 7, hard part #1). We cut the reference-style
median-split BVH (:mod:`cosig_tpu.accel.bvh`) at ``K`` triangles per node:
the leaves become *clusters* — spatially coherent, padded to exactly ``K``
triangles. The megakernel then does packet traversal: per pixel-tile, test
each cluster AABB against all rays at once and intersect the cluster's
triangle block only when any ray may hit it.

Device layout (chosen so every in-kernel slice lands in its natural Mosaic
layout, no relayouts):

* ``geom [C, K, GEOM_COMPS]`` f32 in VMEM — slicing ``[c]`` gives (K, comps)
  with K on sublanes; each component column broadcasts against ray planes
  (1, R) to form (K, R) pair grids.
* ``aabb_t [8, C_pad]`` f32 in VMEM — rows min.xyz / max.xyz, transposed and
  lane-padded to a multiple of 128 so the whole cluster-cull for a ray tile
  is one vectorized (R, C_pad) slab test; padding columns are NaN. The
  NaN-conservative cull (kernel_core) lets NaN columns PASS — harmless,
  because the scalar compaction is bounded by the real cluster count C
  (an inverted min>max box would not help either way: the min/max-
  normalizing slab test treats it as its mirror box).
* ``mats [M, 8]`` f32 in SMEM — color rgb + ambient/diffuse/specular/
  refraction/ior.
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cosig_tpu.accel.bvh import build_bvh
from cosig_tpu.models.soa import SceneArrays
from cosig_tpu.scene.tessellate import TriangleSoA

log = logging.getLogger("cosig_tpu.clusters")

F32 = np.float32

# Geometry component columns (Plücker constants precomputed per triangle;
# see ops/intersect.plucker_constants_host for the math):
# 0:3 v0 | 3:6 n | 6 n.A | 7:13 VA d/w coeffs | 13:19 VB | 19:25 VC |
# 25:28 n0 | 28:31 n1 | 31:34 n2 | 34 material | 35 global tri index
V0 = 0
GN = 3
NDA = 6
VA = 7
VB = 13
VC = 19
N0, N1, N2 = 25, 28, 31
MAT = 34
GID = 35  # original (pre-BVH-reorder) soup index, f32 (exact below 2^24)
GEOM_COMPS = 36

# GID of padding rows / the no-hit state: above every real index, so the
# lexicographic (t, gid) tie-break never picks padding. f32-exact.
GID_PAD = F32(2 ** 24)

DEFAULT_K = 32
# Auto cluster-size rule (build_clusters k=None): double k while the cut
# has more clusters than this (TPU-measured crossover, see the docstring).
AUTO_K_MAX_C = 256

# MXU operand layout (geom_mx / ClusterSet docstring).
#
# The MXU's fp32 contract precision costs ~6x its native bf16 pass, so
# the kernel runs ONE bf16 (DEFAULT-precision) pass over LIMB-SPLIT
# operands instead: every f32 value a = a0 + a1 + a2 with aj = bf16
# limbs (8 mantissa bits each), and the 6 significant limb-product
# combinations (j, k) with j + k <= 2 become extra contraction columns.
# bf16 x bf16 products are exact in f32 and the MXU accumulates in f32,
# so the single pass carries >= fp32-faithful precision (measured ~4e-8
# of the absolute-value dot vs ~2e-7 for plain f32 FMA chains) at ~1/5
# the fp32-contract cost (tools/mxu_mt_bench.py).
#
# Inputs (matching the kernel's raysmx staging): 0:3 origin,
# 3:6 direction, 6:9 ray moment w, 9 constant 1. Column c*10+i of
# geom_mx[c] holds limb j_c of coefficient i; the kernel stages limb k_c
# of ray input i in raysmx row c*10+i.
# Row groups of geom_mx[c] (6K, 64): [0,K) va, [K,2K) vb, [2K,3K) vc,
# [3K,4K) s = d.n, [4K,5K) num = nda - o.n (the t numerator; nda rides
# the constant-1 input so t = num / s needs no extra subtract),
# [5K,6K) gid (also on the constant-1 input — the dot materializes the
# per-row gid at FULL (K, w) shape, giving the chunk-level selection a
# cross-block tie key with no (K, 1) broadcast and no riota; exact:
# gid < 2^24 splits into 3 bf16 limbs and the dot sums 3 exact products
# in f32). Per-visit/per-block paths slice rows [0, 5K) — gid costs
# them nothing.
MX_COMBOS = ((0, 0), (0, 1), (1, 0), (0, 2), (1, 1), (2, 0))
MX_COLS = 64  # 10 inputs x 6 limb combos, zero-padded
MX_PLANES = 6
# gatt (48, K) bf16: row j*16 + a = limb j of attribute a, so the kernel
# reconstructs exact f32 attributes as so3[0:16] + so3[16:32] + so3[32:48]
# after the one-hot contraction (products with a 0/1 mask are exact).
# Attributes: 0 gid, 1 material, 2:5 n0, 5:8 n1, 8:11 n2, 11:16 zero.
ATT_ROWS = 16


def _limbs(a: np.ndarray):
    """Split f32 into 3 bf16 limbs: a == l0 + l1 + l2 exactly (24 = 3x8
    mantissa bits; each residual subtraction is exact in f32)."""
    import ml_dtypes

    bf = ml_dtypes.bfloat16
    a = a.astype(F32)
    l0 = a.astype(bf).astype(F32)
    r = a - l0
    l1 = r.astype(bf).astype(F32)
    l2 = (r - l1).astype(bf).astype(F32)
    return l0, l1, l2


def _pack_mx(geom: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Pack the MXU traversal operands from the finished geometry block.

    Requires cluster rows sorted ascending by GID (build_clusters does
    this): the kernel's row-index tie-break then equals the gid
    tie-break, so per-pair gid columns are never needed on the MXU path.
    """
    import ml_dtypes

    c, k, _ = geom.shape
    coef = np.zeros((c, MX_PLANES * k, 10), F32)
    coef[:, 0 * k:1 * k, 3:9] = geom[:, :, VA:VA + 6]
    coef[:, 1 * k:2 * k, 3:9] = geom[:, :, VB:VB + 6]
    coef[:, 2 * k:3 * k, 3:9] = geom[:, :, VC:VC + 6]
    coef[:, 3 * k:4 * k, 3:6] = geom[:, :, GN:GN + 3]
    coef[:, 4 * k:5 * k, 0:3] = -geom[:, :, GN:GN + 3]
    coef[:, 4 * k:5 * k, 9] = geom[:, :, NDA]
    coef[:, 5 * k:6 * k, 9] = geom[:, :, GID]
    lim = _limbs(coef)
    mx = np.zeros((c, MX_PLANES * k, MX_COLS), F32)
    for ci, (j, _) in enumerate(MX_COMBOS):
        mx[:, :, ci * 10:ci * 10 + 10] = lim[j]
    attf = np.zeros((c, ATT_ROWS, k), F32)
    attf[:, 0] = geom[:, :, GID]
    attf[:, 1] = geom[:, :, MAT]
    attf[:, 2:5] = geom[:, :, N0:N0 + 3].transpose(0, 2, 1)
    attf[:, 5:8] = geom[:, :, N1:N1 + 3].transpose(0, 2, 1)
    attf[:, 8:11] = geom[:, :, N2:N2 + 3].transpose(0, 2, 1)
    att = np.concatenate(_limbs(attf), axis=1)  # (c, 48, k)
    bf = ml_dtypes.bfloat16
    return mx.astype(bf), att.astype(bf)


CULL_BLOCK = 512  # clusters per cull block (lane-aligned; see trace_pallas)
MAX_SUPERBLOCKS = 128  # sb_aabb_t lane width -> up to 64k clusters


SUBGROUP = 8  # triangles per sub-AABB (second cluster level)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class ClusterSet:
    geom: jax.Array  # [C, K, GEOM_COMPS] f32
    aabb_t: jax.Array  # [8, C_pad] f32: rows minx,miny,minz,maxx,maxy,maxz
    sb_aabb_t: jax.Array  # [8, 128] f32: superblock (CULL_BLOCK clusters) unions
    mats: jax.Array  # [M, 8] f32
    num_triangles: int  # real (unpadded) triangle count
    # [G*8, C_pad] f32: per-cluster SUBGROUP-triangle sub-AABBs (second
    # cluster level): rows [g*8, g*8+8) are the six box components (+2 pad
    # rows) of sub-box g, covering geometry rows [g*8, (g+1)*8). Finer
    # boxes over the SAME geometry: the visit loop intersects only
    # surviving 8-triangle slices (the reference's <=4-tris-per-leaf
    # economy at packet granularity, BVHBuilder.cs:58).
    sub_aabb_t: jax.Array = None
    # MXU traversal operands (kernel_core mt_mxu; see MX_COLS below):
    # geom_mx [C, 5K, 16] — per-cluster matmul matrix: out = geom_mx[c] @
    # rays16 gives the five (K, R) MT planes (va, vb, vc, s, nda-ndo) in
    # one MXU dot. gatt [C, 16, K] — per-triangle attribute rows
    # (gid, mat, n0, n1, n2) contracted against the one-hot winner mask:
    # winner attribute selection as a second small matmul.
    geom_mx: jax.Array = None
    gatt: jax.Array = None

    @property
    def num_clusters(self) -> int:
        return int(self.geom.shape[0])

    @property
    def k(self) -> int:
        return int(self.geom.shape[1])

    @property
    def subgroups(self) -> int:
        return 1 if self.sub_aabb_t is None else self.sub_aabb_t.shape[0] // 8

    def tree_flatten(self):
        return (
            (self.geom, self.aabb_t, self.sb_aabb_t, self.mats,
             self.sub_aabb_t, self.geom_mx, self.gatt),
            (self.num_triangles,),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:4], aux[0], *children[4:])


def _superblock_aabbs(aabb_t: np.ndarray) -> np.ndarray:
    """Union AABBs of CULL_BLOCK-cluster superblocks -> [8, 128] (NaN pad).

    Lets the kernel's blocked cull skip whole 512-cluster blocks with one
    test when the scene is large (hierarchical culling)."""
    c_pad = aabb_t.shape[1]
    n_sb = -(-c_pad // CULL_BLOCK)
    sb = np.full((8, MAX_SUPERBLOCKS), np.nan, F32)
    with np.errstate(all="ignore"):
        for s in range(min(n_sb, MAX_SUPERBLOCKS)):
            blk = aabb_t[:, s * CULL_BLOCK : (s + 1) * CULL_BLOCK]
            if np.isnan(blk).all():
                continue
            sb[0:3, s] = np.nanmin(blk[0:3], axis=1)
            sb[3:6, s] = np.nanmax(blk[3:6], axis=1)
    return sb


def _pack_materials(arrays: SceneArrays, mats_host: np.ndarray | None) -> np.ndarray:
    if mats_host is not None:
        return mats_host.astype(F32)
    # Fallback: read back from device. AVOID on the axon tunnel — a
    # device->host transfer permanently degrades dispatch latency there;
    # callers with host-side scene data should pass mats_host.
    color = np.asarray(arrays.mat_color, F32)
    coeff = np.asarray(arrays.mat_coeff, F32)
    return np.concatenate([color, coeff], axis=1).astype(F32)


def build_clusters(
    arrays: SceneArrays,
    tris: TriangleSoA | None = None,
    k: int | None = None,
    mats_host: np.ndarray | None = None,
) -> ClusterSet:
    """Build the cluster structure from the compiled scene.

    ``k`` (cluster size): ``None`` (default) picks automatically — start
    at ``DEFAULT_K`` and double while the cut exceeds ``AUTO_K_MAX_C``
    clusters (cap ``k == 128``). Rationale (TPU sweep 2026-08-18,
    tools/r3_sweep_results.jsonl): the bounce stages pay a per-ray
    (R_sub, C_pad) slab cull per sub-packet, so wide cuts make the cull
    grid itself the frame floor — large_mesh (11,970 tris, C 439 /
    C_pad 512 at k=32) measured 247 -> 184 ms at k=64 (C_pad 256),
    while k=64 on glass (C 82 / C_pad 128 at k=32) LOST 47.7 -> 69.8 ms
    (double the pair tests per visit with no cull width to win back)
    and k=128 on large_mesh lost vs k=64 (237 vs 189 ms — pair work
    doubles faster than visits shrink). Hence: halve the cull width
    while the cut is wider than 256 clusters, never below it.

    Pass host-side ``tris`` and ``mats_host`` whenever available —
    reconstructing them from device arrays costs device->host readbacks
    (which also poison dispatch latency on tunneled TPU setups)."""
    if k is not None and (not isinstance(k, int) or k <= 0):
        raise ValueError(
            f"cluster size k must be a positive int or None (auto); got {k!r}"
            " (check the COSIG_K override)"
        )
    if tris is None:
        tris = TriangleSoA(
            v0=np.asarray(arrays.tri_v0, F32),
            v1=np.asarray(arrays.tri_v1, F32),
            v2=np.asarray(arrays.tri_v2, F32),
            n0=np.asarray(arrays.tri_n0, F32),
            n1=np.asarray(arrays.tri_n1, F32),
            n2=np.asarray(arrays.tri_n2, F32),
            material=np.asarray(arrays.tri_mat, np.int32),
        )

    t = tris.count
    auto_k = k is None
    if auto_k:
        k = DEFAULT_K
    n_sub = k // SUBGROUP if (k % SUBGROUP == 0 and k > SUBGROUP) else 1
    if t == 0:
        geom = np.zeros((1, k, GEOM_COMPS), F32)
        geom[:, :, GID] = GID_PAD
        # NaN padding; the NaN-conservative cull may pass these, but
        # compaction stops at the real cluster count (here the one
        # all-padding cluster, whose rows can never win: S == 0 -> invalid).
        aabb_t = np.full((8, 128), np.nan, F32)
        mx, att = _pack_mx(geom)
        return ClusterSet(
            geom=jnp.asarray(geom),
            aabb_t=jnp.asarray(aabb_t),
            sb_aabb_t=jnp.asarray(_superblock_aabbs(aabb_t)),
            mats=jnp.asarray(_pack_materials(arrays, mats_host)),
            num_triangles=0,
            sub_aabb_t=jnp.asarray(np.full((8 * n_sub, 128), np.nan, F32)),
            geom_mx=jnp.asarray(mx),
            gatt=jnp.asarray(att),
        )

    # COSIG_LEAF_MULT > 1 (default 4): stop the median split at mult*k
    # triangles and emit BALANCED near-full k-chunks over each leaf's
    # DFS range — median leaves land in (k/2, k], capping fill at ~70 %
    # even after packing, while chunking a <= mult*k leaf yields
    # uniformly ~87 %-full chunks whose boxes stay tight (the chunk
    # boundary cuts DFS order inside a small subtree). Host cull model
    # at k=32, mult=4 + packing: pair slots/ray -27 % glass / -19 %
    # large_mesh / -26 % walls on primary packets AND per-ray visits
    # 2.28 -> 1.30 glass, 2.67 -> 1.79 large_mesh (bounce culls) with
    # C down ~25 % (narrower culls, fewer per-visit overheads).
    leaf_mult = int(os.environ.get("COSIG_LEAF_MULT", "4"))

    def _cut(k):
        bvh = build_bvh(tris, max_leaf=k * leaf_mult)

        # Leaves of the BVH are the clusters; their triangle ranges are
        # contiguous in the reordered soup.
        leaf_idx = np.nonzero(bvh.count > 0)[0]
        ranges = [
            (int(bvh.left_or_first[i]), int(bvh.count[i]), i) for i in leaf_idx
        ]
        # Leaves above k (leaf_mult, or degenerate partitions) split into
        # balanced <= k chunks over the leaf's DFS order.
        chunks = []
        for first, count, node in ranges:
            n_ch = -(-count // k)
            lo = count // n_ch
            extra = count - lo * n_ch  # first `extra` chunks get lo+1
            off = 0
            for i in range(n_ch):
                sz = lo + (1 if i < extra else 0)
                chunks.append((first + off, sz, node))
                off += sz

        # Leaf packing (COSIG_CLUSTER_PACK, default on): the median-split
        # leaves average ~65 % fill at k=32, and padding rows cost full pair
        # tests in every visit. DFS-ordered leaves partition the reordered
        # soup contiguously, so greedily merging CONSECUTIVE leaves up to k
        # (guarded: the merged AABB's surface area must not exceed PACK_SA x
        # the parts' sum — sibling leaves merge, distant subtree boundaries
        # don't) lifts fill toward 1 and shrinks C, cutting both pair slots
        # per visit set and cull width. Exact by construction: the winner
        # fold is clustering-invariant (gated by
        # test_wavefront_mixed_granularity_exact and the packing tests).
        if os.environ.get("COSIG_CLUSTER_PACK", "1") != "0" and len(chunks) > 1:
            sa_cap = float(os.environ.get("COSIG_PACK_SA", "2.0"))
            tri_min = np.minimum(np.minimum(tris.v0, tris.v1), tris.v2)
            tri_max = np.maximum(np.maximum(tris.v0, tris.v1), tris.v2)
            order = bvh.order

            def _range_box(first, count):
                sl = order[first:first + count]
                return tri_min[sl].min(axis=0), tri_max[sl].max(axis=0)

            def _sa(lo, hi):
                d = hi - lo
                return float(d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

            chunks.sort(key=lambda ch: ch[0])
            packed = []
            cf, cc, cn = chunks[0]
            clo, chi = _range_box(cf, cc)
            for first, count, node in chunks[1:]:
                if cc + count <= k:
                    lo, hi = _range_box(first, count)
                    mlo = np.minimum(clo, lo)
                    mhi = np.maximum(chi, hi)
                    if _sa(mlo, mhi) <= sa_cap * (_sa(clo, chi) + _sa(lo, hi)):
                        cc += count
                        clo, chi = mlo, mhi
                        continue
                packed.append((cf, cc, cn))
                cf, cc, cn = first, count, node
                clo, chi = _range_box(cf, cc)
            packed.append((cf, cc, cn))
            chunks = packed
        return bvh, chunks

    bvh, chunks = _cut(k)
    # Auto k: double while the cut is wider than AUTO_K_MAX_C (docstring).
    while auto_k and len(chunks) > AUTO_K_MAX_C and k < 128:
        k *= 2
        bvh, chunks = _cut(k)
    n_sub = k // SUBGROUP if (k % SUBGROUP == 0 and k > SUBGROUP) else 1
    # The chosen size is perf-critical and depends on ambient COSIG_*
    # knobs (leaf mult, packing); log it so sweep-polluted shells are
    # visible in any run's output.
    log.info(
        "clusters: k=%d%s cut=%d (tris=%d, leaf_mult=%s, pack=%s)",
        k, " (auto)" if auto_k else "", len(chunks), t,
        os.environ.get("COSIG_LEAF_MULT", "4"),
        os.environ.get("COSIG_CLUSTER_PACK", "1"),
    )

    c = len(chunks)
    # Lane-pad; large cluster counts pad to whole cull blocks so the
    # kernel's blocked cull uses equal-sized slices.
    c_pad = -(-c // 128) * 128
    if c_pad > CULL_BLOCK:
        c_pad = -(-c // CULL_BLOCK) * CULL_BLOCK
    assert t < 2 ** 24, "global tri index must stay f32-exact"
    geom = np.zeros((c, k, GEOM_COMPS), F32)
    # Padding rows can never win (S == 0 -> invalid), but give them the
    # above-everything GID anyway so tie-break reductions stay trivial.
    geom[:, :, GID] = GID_PAD
    # Padding columns are NaN. The NaN-conservative cull (kernel_core)
    # passes them, and the compaction loop stops at the real cluster
    # count C, so they are never visited.
    aabb_t = np.full((8, c_pad), np.nan, F32)
    sub_aabb_t = np.full((8 * n_sub, c_pad), np.nan, F32)
    rt = bvh.triangles
    from cosig_tpu.ops.intersect import plucker_constants_host

    for ci, (first, count, node) in enumerate(chunks):
        # Rows sorted ascending by original soup index: the MXU path's
        # row-index tie-break then equals the gid tie-break (_pack_mx).
        # Bit-exact for the VPU path too — its winner fold keys on the
        # gid VALUES, so row order inside a cluster is free to choose.
        sl = first + np.argsort(bvh.order[first:first + count], kind="stable")
        pk = plucker_constants_host(rt.v0[sl], rt.v1[sl], rt.v2[sl])
        geom[ci, :count, V0 : V0 + 3] = rt.v0[sl]
        geom[ci, :count, GN : GN + 3] = pk["n"]
        geom[ci, :count, NDA] = pk["n_dot_a"]
        geom[ci, :count, VA : VA + 3] = pk["va_d"]
        geom[ci, :count, VA + 3 : VA + 6] = pk["va_w"]
        geom[ci, :count, VB : VB + 3] = pk["vb_d"]
        geom[ci, :count, VB + 3 : VB + 6] = pk["vb_w"]
        geom[ci, :count, VC : VC + 3] = pk["vc_d"]
        geom[ci, :count, VC + 3 : VC + 6] = pk["vc_w"]
        geom[ci, :count, N0 : N0 + 3] = rt.n0[sl]
        geom[ci, :count, N1 : N1 + 3] = rt.n1[sl]
        geom[ci, :count, N2 : N2 + 3] = rt.n2[sl]
        geom[ci, :count, MAT] = rt.material[sl].astype(F32)
        # Original soup index: the deterministic intersection tie-break.
        # The XLA oracle's reduction (first-occurrence argmin over soup
        # blocks + strict < across blocks) is lexicographic (t, soup
        # index); carrying the pre-reorder index lets the kernels resolve
        # exact-t ties identically (silhouette edge pixels).
        geom[ci, :count, GID] = bvh.order[sl].astype(F32)
        # Padding rows are all zero -> S == 0 -> never valid.
        v = np.concatenate([rt.v0[sl], rt.v1[sl], rt.v2[sl]], axis=0)
        vmin = v.min(axis=0)
        vmax = v.max(axis=0)
        # Conservative inflation: the kernel's fp slab test can reject a
        # grazing ray whose triangle intersection is still fp-valid
        # (tn > tf by rounding ULPs at the box surface). That makes a
        # ray's hit set depend on which *packet* culled the cluster —
        # breaking backend-exactness at silhouettes. A margin orders of
        # magnitude above the slab's rounding error makes the cull a true
        # superset of the intersection test at negligible over-visit cost.
        pad = F32(1e-4) + F32(1e-5) * (vmax - vmin)
        aabb_t[0:3, ci] = vmin - pad
        aabb_t[3:6, ci] = vmax + pad
        # Second level: sub-AABBs over SUBGROUP-triangle slices of this
        # cluster (BVH order keeps them spatially coherent). Same
        # conservative inflation; empty slices stay NaN (conservatively
        # passed by the cull but their rows can never win).
        if n_sub > 1:
            for gi in range(n_sub):
                s0 = gi * SUBGROUP
                cnt = min(SUBGROUP, count - s0)
                if cnt <= 0:
                    continue
                ssl = sl[s0:s0 + cnt]  # sub-box over the SORTED rows
                sv = np.concatenate(
                    [rt.v0[ssl], rt.v1[ssl], rt.v2[ssl]], axis=0
                )
                smin = sv.min(axis=0)
                smax = sv.max(axis=0)
                spad = F32(1e-4) + F32(1e-5) * (smax - smin)
                sub_aabb_t[gi * 8 : gi * 8 + 3, ci] = smin - spad
                sub_aabb_t[gi * 8 + 3 : gi * 8 + 6, ci] = smax + spad

    mx, att = _pack_mx(geom)
    return ClusterSet(
        geom=jnp.asarray(geom),
        aabb_t=jnp.asarray(aabb_t),
        sb_aabb_t=jnp.asarray(_superblock_aabbs(aabb_t)),
        mats=jnp.asarray(_pack_materials(arrays, mats_host)),
        num_triangles=t,
        sub_aabb_t=jnp.asarray(sub_aabb_t),
        geom_mx=jnp.asarray(mx),
        gatt=jnp.asarray(att),
    )

"""BVH and cluster structure tests: structural invariants + traversal
equivalence (any hit findable through clusters == brute force)."""

import numpy as np
import pytest

from cosig_tpu.accel.bvh import build_bvh, validate_bvh
from cosig_tpu.accel.clusters import build_clusters, GEOM_COMPS
from cosig_tpu.models.scene import (
    BoxDescription,
    CompositeTransformation,
    SceneData,
    SphereDescription,
)
from cosig_tpu.models.soa import compile_scene
from cosig_tpu.scene.parser import load_scene
from cosig_tpu.scene.tessellate import extract_triangles


def _scene_tris():
    s = SceneData(transformations=[CompositeTransformation()])
    s.spheres.append(SphereDescription(0, 0))
    s.boxes.append(BoxDescription(0, 1))
    return s, extract_triangles(s)


def test_bvh_invariants_synthetic():
    _, tris = _scene_tris()
    bvh = build_bvh(tris)
    validate_bvh(bvh, tris)
    assert bvh.num_nodes >= 1
    # Most leaves obey the <=4 threshold; degenerate partitions (identical
    # centroids, e.g. sphere-pole fans) legally exceed it, exactly like the
    # reference's mid==start bail-out (BVHBuilder.cs:142-145).
    leaf_counts = bvh.count[bvh.count > 0]
    assert (leaf_counts <= 4).mean() > 0.9
    assert leaf_counts.max() <= 32
    assert bvh.depth() <= 32  # fits the reference's traversal stack


def test_bvh_invariants_reference_scene(reference_scene_dir):
    tris = extract_triangles(load_scene(str(reference_scene_dir / "test_scene_1.txt")))
    bvh = build_bvh(tris)
    validate_bvh(bvh, tris)
    assert tris.count == 1426
    assert bvh.triangles.count == 1426


def test_bvh_empty():
    from cosig_tpu.scene.tessellate import TriangleSoA

    bvh = build_bvh(TriangleSoA.empty())
    assert bvh.num_nodes == 1
    assert bvh.count[0] == 0


def test_clusters_cover_all_triangles():
    s, tris = _scene_tris()
    arrays = compile_scene(s, tris)
    cs = build_clusters(arrays, tris, k=32)
    assert cs.num_triangles == tris.count
    geom = np.asarray(cs.geom)
    assert geom.shape[1:] == (32, GEOM_COMPS)
    # Padding rows are all-zero except the GID column, which carries
    # GID_PAD so the lexicographic tie-break never picks them.
    from cosig_tpu.accel.clusters import GID, GID_PAD

    is_pad = np.abs(geom[:, :, :GID]).sum(axis=2) == 0
    real = (~is_pad).sum()
    assert real == tris.count
    assert (geom[:, :, GID][is_pad] == GID_PAD).all()
    # Every cluster's real triangles lie inside its AABB. Vertices are
    # reconstructed from the Plücker edge w-coefficients:
    # vc_w = B - A, va_w = C - B (see clusters.py column layout).
    aabb = np.asarray(cs.aabb_t)
    from cosig_tpu.accel.clusters import V0, VA, VC

    for c in range(cs.num_clusters):
        rows = ~is_pad[c]
        if not rows.any():
            continue
        v0 = geom[c, rows, V0 : V0 + 3]
        v1 = v0 + geom[c, rows, VC + 3 : VC + 6]
        v2 = v1 + geom[c, rows, VA + 3 : VA + 6]
        pts = np.concatenate([v0, v1, v2])
        assert (pts >= aabb[0:3, c] - 1e-4).all()
        assert (pts <= aabb[3:6, c] + 1e-4).all()
    # Padded AABB columns are NaN: the slab comparisons reject them for
    # every ray (an inverted box would NOT be rejected by the
    # min/max-normalizing slab test).
    c_pad = aabb.shape[1]
    for c in range(cs.num_clusters, c_pad):
        assert np.isnan(aabb[0:6, c]).all()


def test_clusters_empty_scene():
    s = SceneData()
    arrays = compile_scene(s)
    cs = build_clusters(arrays)
    assert cs.num_triangles == 0
    assert np.isnan(np.asarray(cs.aabb_t)).all()

"""Tessellation tests: triangle counts, winding, normals, reference-scene
totals (SURVEY.md section 0: ~1,426 tris per bundled scene)."""

import numpy as np
import pytest

from cosig_tpu.models.scene import (
    BoxDescription,
    CompositeTransformation,
    SceneData,
    SphereDescription,
    TransformElement,
    Triangle,
    TrianglesMesh,
)
from cosig_tpu.scene.parser import load_scene
from cosig_tpu.scene.tessellate import extract_triangles


def _identity_scene():
    return SceneData(transformations=[CompositeTransformation()])


def test_box_is_12_triangles_outward_normals():
    s = _identity_scene()
    s.boxes.append(BoxDescription(transformation_index=0, material_index=3))
    t = extract_triangles(s)
    assert t.count == 12
    assert (t.material == 3).all()
    # Flat normals: n0 == n1 == n2 per face, unit length.
    np.testing.assert_allclose(t.n0, t.n1)
    np.testing.assert_allclose(np.linalg.norm(t.n0, axis=1), 1.0, atol=1e-6)
    # Reference quirk preserved bit-for-bit: AddCube's winding is
    # inconsistent — front/top/bottom faces wind outward, back/left/right
    # wind inward (SceneGeometryConverter.cs:138-154; harmless because the
    # intersector uses abs(det), compute:161). Assert the exact pattern.
    centers = (t.v0 + t.v1 + t.v2) / 3.0
    outward = np.sign(np.sum(centers * t.n0, axis=1))
    expected = [+1, +1, -1, -1, +1, +1, +1, +1, -1, -1, -1, -1]
    np.testing.assert_array_equal(outward, expected)
    # Axis-aligned unit cube: all vertices at +-0.5.
    assert np.abs(t.v0).max() == pytest.approx(0.5)


def test_sphere_is_768_triangles_smooth_normals():
    s = _identity_scene()
    s.spheres.append(SphereDescription(transformation_index=0, material_index=1))
    t = extract_triangles(s)
    assert t.count == 768  # 24 top + 15*24*2 band + 24 bottom
    # Unit sphere with identity transform: normal == vertex position.
    np.testing.assert_allclose(t.n0, t.v0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(t.v0, axis=1), 1.0, atol=1e-6)
    # All vertices within the unit sphere.
    assert np.abs(np.linalg.norm(t.v1, axis=1) - 1.0).max() < 1e-5


def test_sphere_scaled_normals_use_inverse_transpose():
    s = SceneData(
        transformations=[CompositeTransformation([TransformElement.scale((2.0, 1.0, 1.0))])]
    )
    s.spheres.append(SphereDescription(0, 0))
    t = extract_triangles(s)
    # Vertices scale by (2,1,1); normals must NOT simply scale — pick a vertex
    # near (1,0,0)*2: normal stays (1,0,0); near diagonal, normal tilts.
    lens = np.linalg.norm(t.n0, axis=1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    # For ellipsoid x^2/4+y^2+z^2=1, gradient=(x/4, y, z)*2: at object-space
    # vertex p (unit), world normal ∝ (px/2, py, pz).
    p = t.v0 / np.array([2.0, 1.0, 1.0], dtype=np.float32)  # object-space vertex
    expected = p / np.array([2.0, 1.0, 1.0], dtype=np.float32)
    expected /= np.linalg.norm(expected, axis=1, keepdims=True)
    np.testing.assert_allclose(t.n0, expected, atol=1e-5)


def test_mesh_flat_normals_and_transform():
    s = SceneData(
        transformations=[
            CompositeTransformation([TransformElement.translation((0, 0, 5))])
        ]
    )
    s.triangle_meshes.append(
        TrianglesMesh(
            transformation_index=0,
            triangles=[Triangle(2, (0, 0, 0), (1, 0, 0), (0, 1, 0))],
        )
    )
    t = extract_triangles(s)
    assert t.count == 1
    np.testing.assert_allclose(t.v0[0], (0, 0, 5), atol=1e-6)
    # CCW in xy-plane -> +z face normal.
    np.testing.assert_allclose(t.n0[0], (0, 0, 1), atol=1e-6)
    assert t.material[0] == 2


def test_emit_order_meshes_boxes_spheres():
    s = _identity_scene()
    s.spheres.append(SphereDescription(0, 30))
    s.boxes.append(BoxDescription(0, 20))
    s.triangle_meshes.append(
        TrianglesMesh(0, [Triangle(10, (0, 0, 0), (1, 0, 0), (0, 1, 0))])
    )
    t = extract_triangles(s)
    assert t.count == 1 + 12 + 768
    assert t.material[0] == 10
    assert (t.material[1:13] == 20).all()
    assert (t.material[13:] == 30).all()


def test_reference_scene_triangle_totals(reference_scene_dir):
    s1 = extract_triangles(load_scene(str(reference_scene_dir / "test_scene_1.txt")))
    # 128 floor + 6 pyramid + 512 torus + 12 box + 768 sphere = 1426
    assert s1.count == 1426
    ev = extract_triangles(load_scene(str(reference_scene_dir / "eval_scene.txt")))
    # eval scene: extra 12-tri mesh + 2 boxes
    assert ev.count == 128 + 6 + 512 + 12 + 2 * 12 + 768

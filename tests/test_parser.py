"""Parser tests: grammar features + hand-counted facts from the reference's
bundled scenes (counts documented in SURVEY.md section 2, 'Scene assets')."""

import numpy as np
import pytest

from cosig_tpu.scene.parser import load_scene, parse_scene

MINI_SCENE = """
// comment line
Image
{
    64 32   // inline comment
    0.1 0.2 0.3
}

transformation   // case-insensitive segment name
{
    T 1 2 3
    Rx -60
    S 2 2 2
}

Transformation
{
}

Camera
{
    1
    30.0
    45.0
}

Light
{
    0
    1 0.5 0.25
}

Material
{
    1 0 0
    0.1 0.3 0 1 1.2
}

Triangles
{
    0
    0
    -1 0 0
    1 0 0
    0 1 0
    0
    0 0 1
    1 0 1
    0 1 1
}

Sphere
{
    1
    0
}

Box
{
    0
    0
}
"""


def test_mini_scene_roundtrip():
    s = parse_scene(MINI_SCENE)
    assert s.image.horizontal == 64 and s.image.vertical == 32
    assert s.image.background == pytest.approx((0.1, 0.2, 0.3))
    assert len(s.transformations) == 2
    t = s.transformations[0]
    assert [e.kind for e in t.elements] == ["T", "Rx", "S"]
    assert t.elements[0].xyz == (1.0, 2.0, 3.0)
    assert t.elements[1].angle_deg == -60.0
    assert len(s.transformations[1].elements) == 0
    assert s.camera.transformation_index == 1
    assert s.camera.distance == 30.0
    assert s.camera.vertical_fov_deg == 45.0
    assert len(s.lights) == 1 and s.lights[0].rgb == (1.0, 0.5, 0.25)
    assert len(s.materials) == 1
    m = s.materials[0]
    assert (m.ambient, m.diffuse, m.specular, m.refraction, m.ior) == (
        0.1, 0.3, 0.0, 1.0, 1.2,
    )
    assert len(s.triangle_meshes) == 1
    assert len(s.triangle_meshes[0].triangles) == 2
    assert s.triangle_meshes[0].triangles[1].v2 == (0.0, 1.0, 1.0)
    assert len(s.spheres) == 1 and s.spheres[0].transformation_index == 1
    assert len(s.boxes) == 1


def test_missing_file_returns_empty_scene():
    s = load_scene("/nonexistent/path.txt")
    assert s.image is None
    assert s.transformations == [] and s.lights == []


def test_scientific_notation_and_tabs():
    s = parse_scene("Image\n{\n\t1e2\t2E2\n\t0.5 0.5 0.5\n}\n")
    assert s.image.horizontal == 100 and s.image.vertical == 200


# ---- reference scene facts (SURVEY.md section 2, row 'Scene assets') ----


def test_reference_test_scene_1(reference_scene_dir):
    s = load_scene(str(reference_scene_dir / "test_scene_1.txt"))
    assert s.image.horizontal == 200 and s.image.vertical == 200
    assert s.image.background == pytest.approx((0.2, 0.2, 0.2))
    assert len(s.transformations) == 5
    assert len(s.materials) == 7
    assert len(s.lights) == 1
    assert s.camera.transformation_index == 1
    assert s.camera.distance == 30.0
    assert s.camera.vertical_fov_deg == 30.0
    # floor mesh 128 tris + pyramid 6 + torus 512
    mesh_sizes = sorted(len(m.triangles) for m in s.triangle_meshes)
    assert mesh_sizes == [6, 128, 512]
    assert len(s.spheres) == 1 and len(s.boxes) == 1
    # camera transform chain: T 0 0 -74, Rx -60, Rz 45
    cam_t = s.transformations[1]
    assert [e.kind for e in cam_t.elements] == ["T", "Rx", "Rz"]
    assert cam_t.elements[0].xyz == (0.0, 0.0, -74.0)


def test_reference_test_scene_2(reference_scene_dir):
    s = load_scene(str(reference_scene_dir / "test_scene_2.txt"))
    assert s.image.horizontal == 300
    assert len(s.lights) == 2
    assert len(s.transformations) == 8


def test_reference_eval_scene(reference_scene_dir):
    s = load_scene(str(reference_scene_dir / "eval_scene.txt"))
    assert len(s.transformations) == 9
    assert len(s.materials) == 9
    assert len(s.boxes) == 2
    assert len(s.triangle_meshes) == 4

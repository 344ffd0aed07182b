"""PNG/GIF/preset round-trip tests + native-vs-Python parity."""

import numpy as np
import pytest

from cosig_tpu.models.preset import ScenePreset
from cosig_tpu.models.settings import RenderSettings
from cosig_tpu.utils.gif import (
    color_table,
    decode_gif_frame_count,
    lzw_compress_py,
    quantize,
    save_gif,
)
from cosig_tpu.utils.png import read_png, write_png


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((33, 47, 3)).astype(np.float32)
    path = str(tmp_path / "x.png")
    write_png(path, img)
    back = read_png(path).astype(np.float32) / 255.0
    assert back.shape == (33, 47, 3)
    np.testing.assert_allclose(back, img, atol=1 / 255.0 + 1e-6)


def test_png_flip_convention(tmp_path):
    # Row 0 is the image bottom; the PNG on disk stores top-down.
    img = np.zeros((4, 4, 3), np.float32)
    img[0, :, 0] = 1.0  # bottom row red
    path = str(tmp_path / "f.png")
    write_png(path, img)
    back = read_png(path).astype(np.float32) / 255.0
    np.testing.assert_allclose(back[0, :, 0], 1.0)  # still bottom after read


def test_gif_structure(tmp_path):
    rng = np.random.default_rng(1)
    frames = [rng.random((24, 32, 3)).astype(np.float32) for _ in range(5)]
    path = str(tmp_path / "a.gif")
    save_gif(frames, path, delay_cs=10)
    assert decode_gif_frame_count(path) == 5
    blob = open(path, "rb").read()
    assert blob[:6] == b"GIF89a"
    assert blob[-1] == 0x3B
    assert b"NETSCAPE2.0" in blob


def test_palette_layout():
    table = color_table()
    assert len(table) == 768
    # color 0 = black, color 215 = white-ish (5,5,5) cube corner
    assert table[0:3] == b"\x00\x00\x00"
    assert table[215 * 3 : 215 * 3 + 3] == bytes((255, 255, 255))


def test_quantize_cube_indexing():
    img = np.zeros((1, 3, 3), np.float32)
    img[0, 0] = (1.0, 0.0, 0.0)  # -> r=5 -> index 180
    img[0, 1] = (0.0, 1.0, 0.0)  # -> g=5 -> index 30
    img[0, 2] = (1.0, 1.0, 1.0)  # -> 215
    idx = quantize(img, flip_vertical=False)
    assert list(idx[0]) == [180, 30, 215]


def test_lzw_known_sequence():
    # All-same bytes compress well and decode length sanity holds.
    data = bytes([7]) * 1000
    comp = lzw_compress_py(data)
    assert len(comp) < 100


@pytest.mark.parametrize("size", [0, 1, 17, 4096, 100_000])
def test_lzw_native_parity(size):
    try:
        from cosig_tpu.native import gif_native
    except ImportError:
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(size)
    data = rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    assert gif_native.compress(data) == lzw_compress_py(data)


def test_bvh_native_parity(reference_scene_dir):
    try:
        from cosig_tpu.native import bvh_native
    except ImportError:
        pytest.skip("native library unavailable")
    from cosig_tpu.accel.bvh import _build_python
    from cosig_tpu.scene.parser import load_scene
    from cosig_tpu.scene.tessellate import extract_triangles

    tris = extract_triangles(load_scene(str(reference_scene_dir / "test_scene_1.txt")))
    for leaf in (4, 32):
        b_c = bvh_native.build(tris, leaf)
        b_py = _build_python(tris, leaf)
        assert b_c.num_nodes == b_py.num_nodes
        np.testing.assert_array_equal(b_c.order, b_py.order)
        np.testing.assert_array_equal(b_c.left_or_first, b_py.left_or_first)
        np.testing.assert_array_equal(b_c.count, b_py.count)
        np.testing.assert_allclose(b_c.node_min, b_py.node_min)
        np.testing.assert_allclose(b_c.node_max, b_py.node_max)


def test_preset_roundtrip(tmp_path):
    settings = RenderSettings(
        resolution_override=(320, 240),
        background_color_override=(0.1, 0.2, 0.3),
        light_intensity_scale=1.5,
        camera_fov_override=42.0,
        max_depth=5,
        enable_specular=False,
        is_orthographic=True,
    )
    preset = ScenePreset.from_render_settings(settings, "/tmp/scene.txt")
    # Top-bar fields are set by the caller, like the reference
    # (SceneBuilder.cs:1085-1088).
    preset.AASamples = 4
    preset.ShadowMode = 2
    path = str(tmp_path / "p.json")
    preset.save(path)
    back = ScenePreset.load(path)
    assert back.ResolutionX == 320 and back.ResolutionY == 240
    assert back.CameraFov == 42.0
    assert back.RecursionDepth == 5
    assert back.EnableSpecular is False
    assert back.IsOrthographic is True
    s2 = back.to_render_settings()
    assert s2.aa_samples == 4
    assert s2.enable_soft_shadows and s2.light_size == 10.0  # ShadowMode 2
    assert s2.max_depth == 5

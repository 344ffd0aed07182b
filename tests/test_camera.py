"""Camera ray-generation tests (compute:283-340 semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cosig_tpu.ops import camera

I4 = jnp.eye(4, dtype=jnp.float32)


def _gen(px, py, w, h, fov=90.0, dist=10.0, ortho=False, ortho_size=5.0, m=I4):
    px = jnp.asarray(np.atleast_1d(px), jnp.float32)
    py = jnp.asarray(np.atleast_1d(py), jnp.float32)
    half = jnp.full_like(px, 0.5)
    o, d = camera.generate_rays(
        px, py, half, half, w, h,
        m, jnp.float32(dist), jnp.float32(fov), jnp.float32(ortho_size), ortho,
    )
    return np.asarray(o), np.asarray(d)


def test_center_ray_points_down_negative_z():
    # Center pixel of an odd grid: (px+0.5)/W == 0.5 -> u = v = 0.
    o, d = _gen(49.5 - 0.5 + 0.5, 49.5, 100, 100)  # px=49.5 is exact center
    o, d = _gen(np.float32(49.5), np.float32(49.5), 100, 100)
    np.testing.assert_allclose(o[0], (0, 0, 10), atol=1e-6)
    np.testing.assert_allclose(d[0], (0, 0, -1), atol=1e-6)


def test_plane_geometry_fov90():
    # fov=90, dist=10 -> half-height = 10. Top-center pixel edge v -> +10.
    # Pixel py = H-1 with offset 0.5 -> v = ((H-0.5)/H - 0.5) * 20 ~ 9.9
    o, d = _gen(np.float32(49.5), np.float32(99.0), 100, 100)
    # direction toward (0, ~9.9, 0) from (0,0,10)
    target = np.array([0.0, 9.9, 0.0])
    expect = target - np.array([0, 0, 10.0])
    expect /= np.linalg.norm(expect)
    np.testing.assert_allclose(d[0], expect, atol=1e-5)


def test_aspect_ratio_wide():
    # W=200, H=100 -> plane width doubles; horizontal edge u ~ +-planeW/2.
    o, d = _gen(np.float32(199.0), np.float32(49.5), 200, 100)
    # u = ((199.5)/200 - .5)*2*10*2 = (0.4975)*40 = 19.9
    t = np.array([19.9, 0, 0]) - np.array([0, 0, 10.0])
    t /= np.linalg.norm(t)
    np.testing.assert_allclose(d[0], t, atol=1e-5)


def test_orthographic_parallel_rays():
    o, d = _gen([10.0, 90.0], [10.0, 90.0], 100, 100, ortho=True, ortho_size=5.0)
    np.testing.assert_allclose(d, [[0, 0, -1], [0, 0, -1]], atol=1e-7)
    # Origins spread over the ortho viewport, at z = distance.
    assert o[0][0] < 0 < o[1][0]
    np.testing.assert_allclose(o[:, 2], 10.0, atol=1e-6)


def test_camera_matrix_transform():
    # Move the camera frame +5x: rays shift by +5 in x.
    m = jnp.asarray(np.array(
        [[1, 0, 0, 5], [0, 1, 0, 0], [0, 0, 1, 0], [0, 0, 0, 1]], np.float32
    ))
    o, d = _gen(np.float32(49.5), np.float32(49.5), 100, 100, m=m)
    np.testing.assert_allclose(o[0], (5, 0, 10), atol=1e-6)
    np.testing.assert_allclose(d[0], (0, 0, -1), atol=1e-6)


def test_aa_grid_shapes():
    assert camera.aa_grid(1) == (1, 1)
    assert camera.aa_grid(2) == (2, 1)
    assert camera.aa_grid(4) == (2, 2)
    assert camera.aa_grid(8) == (3, 3)  # gridW=ceil(2.83)=3, gridH=ceil(8/3)=3


def test_sample_offsets_stratified():
    px = jnp.zeros((16,), jnp.float32)
    py = jnp.zeros((16,), jnp.float32)
    ox, oy = camera.sample_offsets(px, py, 0, 4)
    # sample 0 of 4: cell (0,0) of a 2x2 grid -> offsets in [0, 0.5)
    assert (np.asarray(ox) < 0.5).all() and (np.asarray(ox) >= 0).all()
    ox3, oy3 = camera.sample_offsets(px, py, 3, 4)
    # sample 3: cell (1,1) -> offsets in [0.5, 1)
    assert (np.asarray(ox3) >= 0.5).all() and (np.asarray(oy3) >= 0.5).all()


def test_direction_normalized_under_scaled_camera():
    m = jnp.asarray(np.diag([3.0, 3.0, 3.0, 1.0]).astype(np.float32))
    o, d = _gen(np.float32(7.0), np.float32(3.0), 64, 64, m=m)
    np.testing.assert_allclose(np.linalg.norm(d[0]), 1.0, atol=1e-6)

"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
render must equal the single-device render bit-for-bit."""

import numpy as np
import jax
import pytest

import cosig_tpu
from cosig_tpu.models.soa import compile_scene, frame_params, static_config
from cosig_tpu.ops import trace_xla
from cosig_tpu.parallel.sharding import make_mesh, render_sharded
from cosig_tpu.scene.parser import load_scene


@pytest.fixture(scope="module")
def scene(reference_scene_dir):
    return load_scene(str(reference_scene_dir / "test_scene_1.txt"))


def _both(scene, settings, n_devices):
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    ref = np.asarray(trace_xla.render_jit(arrays, params, cfg))
    mesh = make_mesh(n_devices)
    img = np.asarray(render_sharded(arrays, params, cfg, mesh))
    return img, ref


def test_requires_devices():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"


@pytest.mark.parametrize("n", [2, 8])
def test_sharded_equals_single(scene, n):
    st = cosig_tpu.RenderSettings(resolution_override=(64, 48), max_depth=2)
    img, ref = _both(scene, st, n)
    np.testing.assert_array_equal(img, ref)


def test_sharded_height_not_divisible(scene):
    # 50 rows over 8 devices: padding path.
    st = cosig_tpu.RenderSettings(resolution_override=(32, 50), max_depth=1)
    img, ref = _both(scene, st, 8)
    assert img.shape == (50, 32, 3)
    np.testing.assert_array_equal(img, ref)


def test_sharded_with_effects(scene):
    st = cosig_tpu.RenderSettings(
        resolution_override=(32, 32), max_depth=2, aa_samples=2,
        enable_soft_shadows=True, light_size=5.0,
    )
    img, ref = _both(scene, st, 4)
    # Different per-shard batch shapes let XLA:CPU vectorize reductions in a
    # different order; tolerate ULP-scale drift (observed max ~3e-4 on the
    # pow-32 specular term).
    np.testing.assert_allclose(img, ref, atol=5e-4)


@pytest.mark.parametrize("n", [2, 4])
@pytest.mark.slow
def test_wavefront_sharded_matches_single(scene, n):
    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import materials_host
    from cosig_tpu.ops import trace_wavefront
    from cosig_tpu.parallel.sharding import render_sharded_wavefront
    from cosig_tpu.scene.tessellate import extract_triangles

    st = cosig_tpu.RenderSettings(
        resolution_override=(48, 50), max_depth=3, aa_samples=2
    )
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    arrays = compile_scene(scene, tris)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    params = frame_params(scene, st)
    cfg = static_config(scene, st)
    single, single_rays = trace_wavefront.render_jit(
        cset, params, cfg, interpret=True
    )
    img, rays = render_sharded_wavefront(
        cset, params, cfg, make_mesh(n), interpret=True
    )
    img = np.asarray(img)
    assert img.shape == (50, 48, 3)
    # Same kernels, same global pixel coordinates per shard. Different
    # per-shard grid shapes let XLA:CPU (interpret mode) fuse the glue
    # around the kernels differently -> ULP-scale drift (observed max
    # ~1e-6); on TPU the Mosaic kernels are shape-identical.
    np.testing.assert_allclose(img, np.asarray(single), atol=2e-6)
    assert abs(float(rays) - float(single_rays)) <= 8


@pytest.mark.slow
def test_pallas_sharded_matches_oracle(scene):
    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import materials_host
    from cosig_tpu.parallel.sharding import render_sharded_pallas
    from cosig_tpu.scene.tessellate import extract_triangles

    st = cosig_tpu.RenderSettings(resolution_override=(48, 50), max_depth=2)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    arrays = compile_scene(scene, tris)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    params = frame_params(scene, st)
    cfg = static_config(scene, st)
    ref = np.asarray(trace_xla.render_jit(arrays, params, cfg))
    img, rays = render_sharded_pallas(
        cset, params, cfg, make_mesh(4), interpret=True
    )
    img = np.asarray(img)
    assert img.shape == (50, 48, 3)
    assert np.abs(img - ref).max() < 1e-4
    assert float(rays) >= 48 * 50  # at least one primary ray per pixel

"""Benchmark-config scene construction tests (cosig_tpu/scene/generate.py)."""

import numpy as np
import pytest

import cosig_tpu
from cosig_tpu.models.soa import compile_scene, frame_params, static_config
from cosig_tpu.ops import trace_xla
from cosig_tpu.scene.generate import CONFIGS


@pytest.mark.parametrize("name", list(CONFIGS))
def test_config_builds_and_renders(name):
    scene, settings = CONFIGS[name]()
    # Tiny render (override resolution) through the oracle path.
    st = settings.replace(resolution_override=(24, 24), max_depth=min(settings.max_depth, 2), aa_samples=1)
    arrays = compile_scene(scene)
    params = frame_params(scene, st)
    cfg = static_config(scene, st)
    img = np.asarray(trace_xla.render_jit(arrays, params, cfg))
    assert img.shape == (24, 24, 3)
    assert np.isfinite(img).all()
    assert img.std() > 0.01  # non-degenerate content


def test_config_requirements():
    # BASELINE.json config requirements encoded as assertions.
    s, st = CONFIGS["diffuse_sphere"]()
    assert s.image.horizontal == 256 and st.max_depth == 1 and len(s.lights) == 1
    s, st = CONFIGS["cosig_walls"]()
    assert s.image.horizontal == 512 and len(s.lights) == 2 and len(s.spheres) == 3
    s, st = CONFIGS["mirror_sphere"]()
    assert st.max_depth == 3 and any(m.specular > 0.5 for m in s.materials)
    s, st = CONFIGS["glass_sphere"]()
    assert s.image.horizontal == 1024 and st.max_depth == 6 and st.aa_samples == 4
    assert any(m.refraction > 0.5 and m.ior > 1.0 for m in s.materials)
    s, st = CONFIGS["large_mesh"]()
    assert s.image.horizontal == 2048
    assert sum(len(m.triangles) for m in s.triangle_meshes) > 10000

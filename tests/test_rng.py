"""RNG parity tests: the jnp hash functions must match an independent
scalar fp32 evaluation of the reference formulas (compute:108-131)."""

import numpy as np
import pytest

from cosig_tpu.ops import rng


def _scalar_hash22(px, py):
    """Independent numpy-fp32 transcription of Hash22 (compute:108-113)."""
    f = np.float32
    def frac(x):
        return f(x - np.floor(x))
    p3 = np.array([frac(f(px) * f(0.1031)), frac(f(py) * f(0.1030)), frac(f(px) * f(0.0973))], f)
    yzx = np.array([p3[1], p3[2], p3[0]], f)
    d = f(np.sum(p3 * (yzx + f(33.33)), dtype=f))
    p3 = p3 + d
    return frac((p3[0] + p3[1]) * p3[2]), frac((p3[0] + p3[2]) * p3[1])


def _scalar_hash33(px, py, pz):
    f = np.float32
    def frac(x):
        return f(x - np.floor(x))
    p = np.array([frac(f(px) * f(0.1031)), frac(f(py) * f(0.1030)), frac(f(pz) * f(0.0973))], f)
    yxz = np.array([p[1], p[0], p[2]], f)
    d = f(np.sum(p * (yxz + f(33.33)), dtype=f))
    p = p + d
    return (
        frac((p[0] + p[1]) * p[2]),
        frac((p[0] + p[0]) * p[1]),
        frac((p[1] + p[0]) * p[0]),
    )


SEEDS = [(0.0, 0.0), (1.0, 2.0), (100.0, 57.0), (13.0, 199.0), (255.5, 3.25)]


@pytest.mark.parametrize("px,py", SEEDS)
def test_hash22_matches_scalar_reference(px, py):
    h0, h1 = rng.hash22(np.float32(px), np.float32(py))
    e0, e1 = _scalar_hash22(px, py)
    # fp32 summation-order differences only
    assert abs(float(h0) - float(e0)) < 2e-5
    assert abs(float(h1) - float(e1)) < 2e-5


@pytest.mark.parametrize("p", [(0.0, 0.0, 0.0), (5.0, 7.0, 1.0), (64.0, 32.0, 2.0)])
def test_hash33_matches_scalar_reference(p):
    h = rng.hash33(*[np.float32(v) for v in p])
    e = _scalar_hash33(*p)
    for a, b in zip(h, e):
        assert abs(float(a) - float(b)) < 2e-5


def test_hash_outputs_in_unit_interval():
    xs = np.arange(0, 512, dtype=np.float32)
    ys = xs * np.float32(1.7)
    h0, h1 = rng.hash22(xs, ys)
    assert (np.asarray(h0) >= 0).all() and (np.asarray(h0) < 1).all()
    assert (np.asarray(h1) >= 0).all() and (np.asarray(h1) < 1).all()
    # not constant / degenerate
    assert np.asarray(h0).std() > 0.1


def test_random_unit_vector_on_sphere():
    xs = np.arange(1, 257, dtype=np.float32)
    v = np.asarray(rng.random_unit_vector(xs, xs * 2, xs * 3))
    norms = np.linalg.norm(v, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # Roughly isotropic: mean should be near zero.
    assert np.abs(v.mean(axis=0)).max() < 0.2


def test_determinism():
    a = np.asarray(rng.hash22(np.float32(42.0), np.float32(17.0)))
    b = np.asarray(rng.hash22(np.float32(42.0), np.float32(17.0)))
    np.testing.assert_array_equal(a, b)

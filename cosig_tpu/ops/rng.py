"""Deterministic hash RNG with fp32 parity to the reference shader.

Parity reference: ``Assets/Shaders/BVHRayTracing.compute:108-131``
(Hash22, Hash33, RandomUnitVector). These drive AA jitter, soft shadows,
glossy perturbation and motion blur; implementing them bit-compatibly in
float32 makes the stochastic effects comparable pixel-for-pixel
(SURVEY.md section 7, hard part #4).

All functions take/return ``jnp.float32`` arrays; inputs may be any
broadcastable shape with the vector dimension last.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

F = np.float32

TWO_PI = F(6.2831853)


def _frac(x):
    """HLSL frac: x - floor(x) (works for negatives: frac(-0.1) = 0.9)."""
    return x - jnp.floor(x)


def hash22(px, py):
    """compute:108-113. Returns (h0, h1), each the shape of ``px``."""
    px = jnp.asarray(px, F)
    py = jnp.asarray(py, F)
    # p3 = frac(p.xyx * (.1031, .1030, .0973))
    p3x = _frac(px * F(0.1031))
    p3y = _frac(py * F(0.1030))
    p3z = _frac(px * F(0.0973))
    # p3 += dot(p3, p3.yzx + 33.33)
    d = p3x * (p3y + F(33.33)) + p3y * (p3z + F(33.33)) + p3z * (p3x + F(33.33))
    p3x = p3x + d
    p3y = p3y + d
    p3z = p3z + d
    # frac((p3.xx + p3.yz) * p3.zy)
    return _frac((p3x + p3y) * p3z), _frac((p3x + p3z) * p3y)


def hash33(px, py, pz):
    """compute:116-121. Returns (h0, h1, h2)."""
    px = jnp.asarray(px, F)
    py = jnp.asarray(py, F)
    pz = jnp.asarray(pz, F)
    x = _frac(px * F(0.1031))
    y = _frac(py * F(0.1030))
    z = _frac(pz * F(0.0973))
    # p += dot(p, p.yxz + 33.33)
    d = x * (y + F(33.33)) + y * (x + F(33.33)) + z * (z + F(33.33))
    x = x + d
    y = y + d
    z = z + d
    # frac((p.xxy + p.yxx) * p.zyx)
    return _frac((x + y) * z), _frac((x + x) * y), _frac((y + x) * x)


def random_unit_vector(sx, sy, sz):
    """compute:124-131 — point on the unit sphere from a 3D seed.

    Returns an array shaped ``(*seed_shape, 3)``."""
    h0, h1, h2 = hash33(sx, sy, sz)
    z = h2 * F(2.0) - F(1.0)
    a = h0 * TWO_PI
    r = jnp.sqrt(jnp.maximum(F(0.0), F(1.0) - z * z))
    return jnp.stack([r * jnp.cos(a), r * jnp.sin(a), z], axis=-1)

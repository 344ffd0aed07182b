"""Blinn-Phong shading + secondary-ray policy (Whitted step).

Parity reference: ``Assets/Shaders/BVHRayTracing.compute:360-473``. All the
reference's quirks are preserved and documented inline:

* only the shadow-tested diffuse branch contains the specular highlight
  (``_EnableSpecular`` gates the highlight but NOT recursive reflection —
  compute:409 vs :421);
* refraction wins over reflection when both apply (compute:430);
* TIR falls back to reflection with ``matColor * kSpecular`` attenuation —
  even when kSpecular == 0, which zeroes the attenuation but keeps the ray
  alive (compute:443-448);
* specular highlight is white, exponent 32 (compute:412-413);
* shadow bias ``normal * 1e-2``; secondary offsets ``1e-2`` along the
  refraction direction / normal (Epsilon * 100, compute:396,442,447,454).

Functions are shape-generic: rays may be [N] or [tiles, N]; vectors have the
component axis last.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from cosig_tpu.ops.intersect import normalize, reflect, _dot

F = jnp.float32

OFFSET = F(1e-2)  # Epsilon * 100
SPECULAR_EXP = F(32.0)
WHITE = (1.0, 1.0, 1.0)


class Material(NamedTuple):
    color: jnp.ndarray  # [..., 3]
    ambient: jnp.ndarray  # [...]
    diffuse: jnp.ndarray
    specular: jnp.ndarray
    refraction: jnp.ndarray
    ior: jnp.ndarray


def fetch_material(scene, mat_idx):
    """Gather material properties; index -1 (miss) yields the shader's
    defaults color=(1,1,1), kA=.1, kD=.7, kS=kR=0, ior=1 (compute:371-376)."""
    invalid = mat_idx < 0
    safe = jnp.clip(mat_idx, 0, scene.mat_color.shape[0] - 1)
    color = jnp.where(invalid[..., None], F(1.0), scene.mat_color[safe])
    coeff = scene.mat_coeff[safe]
    defaults = jnp.array([0.1, 0.7, 0.0, 0.0, 1.0], F)
    coeff = jnp.where(invalid[..., None], defaults, coeff)
    return Material(
        color=color,
        ambient=coeff[..., 0],
        diffuse=coeff[..., 1],
        specular=coeff[..., 2],
        refraction=coeff[..., 3],
        ior=coeff[..., 4],
    )


def lambert_blinn_phong(
    mat: Material,
    normal,
    light_dir,
    view_dir,
    n_dot_l,
    lit,
    light_rgb,
    enable_diffuse: bool,
    enable_specular: bool,
):
    """The shadow-tested diffuse+highlight term (compute:393-416).

    ``lit`` must already encode the shadow test; this adds the NdotL > 0
    gate. ``light_rgb`` is (1,1,1) in faithful mode (the shader ignores
    light color)."""
    if not enable_diffuse:
        return jnp.zeros_like(mat.color)
    contrib = mat.color * mat.diffuse[..., None] * n_dot_l[..., None]
    if enable_specular:
        half = normalize(light_dir + view_dir)
        spec = jnp.power(
            jnp.maximum(_dot(normal, half), F(0.0)), SPECULAR_EXP
        )
        contrib = contrib + (mat.specular * spec)[..., None]  # white * kS * spec
    gate = (lit & (n_dot_l > F(0.0)))[..., None]
    return jnp.where(gate, contrib * light_rgb, F(0.0))


class Secondary(NamedTuple):
    next_origin: jnp.ndarray  # [..., 3]
    next_dir: jnp.ndarray  # [..., 3] (normalized)
    atten_mult: jnp.ndarray  # [..., 3]
    continue_ray: jnp.ndarray  # [...] bool


def secondary_ray(
    mat: Material,
    position,
    normal,
    ray_dir,
    enable_refraction: bool,
):
    """Spawn the reflection/refraction continuation (compute:420-455).

    ``ray_dir`` must be normalized (it is: CreateRay always normalizes)."""
    should_reflect = mat.specular > F(0.0)
    should_refract = enable_refraction & (mat.refraction > F(0.0))

    i = ray_dir  # normalize(ray.direction) — already unit length
    cos_in = _dot(i, normal)
    exiting = cos_in > F(0.0)
    n = jnp.where(exiting[..., None], -normal, normal)
    eta = jnp.where(exiting, mat.ior, F(1.0) / mat.ior)
    cos = _dot(-i, n)
    k = F(1.0) - eta * eta * (F(1.0) - cos * cos)
    tir = k < F(0.0)
    refr_dir = eta[..., None] * i + (eta * cos - jnp.sqrt(jnp.maximum(k, F(0.0))))[
        ..., None
    ] * n
    refl_flipped = reflect(i, n)  # TIR branch reflects about the flipped normal
    refl_plain = reflect(i, normal)  # plain mirror uses hit.normal

    ks_mult = mat.color * mat.specular[..., None]
    kr_mult = mat.color * mat.refraction[..., None]

    use_refract = should_refract[..., None]
    tir3 = tir[..., None]
    next_dir = jnp.where(
        use_refract,
        jnp.where(tir3, refl_flipped, refr_dir),
        refl_plain,
    )
    atten_mult = jnp.where(use_refract, jnp.where(tir3, ks_mult, kr_mult), ks_mult)
    start = jnp.where(
        use_refract,
        jnp.where(tir3, position + n * OFFSET, position + refr_dir * OFFSET),
        position + normal * OFFSET,
    )
    return Secondary(
        next_origin=start,
        next_dir=next_dir,
        atten_mult=atten_mult,
        continue_ray=should_reflect | should_refract,
    )

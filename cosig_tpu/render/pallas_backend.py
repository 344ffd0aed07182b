"""Pallas backend glue: interpret-mode fallback off-TPU, stats plumbing."""

from __future__ import annotations

import jax

from cosig_tpu.ops import trace_pallas


def render_jit(cset, params, cfg):
    """Render via the megakernel; returns (image, rays_traced).

    On non-TPU backends (tests, dryruns) the kernel runs in interpreter
    mode — same semantics, no Mosaic compile."""
    interpret = jax.default_backend() == "cpu"
    return trace_pallas.render_jit(cset, params, cfg, interpret=interpret)

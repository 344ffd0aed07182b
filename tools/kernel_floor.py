"""Primary-stage floor microbench: what does an (almost) empty Pallas
kernel cost over the wavefront primary grid?

Mirrors the primary stage's shapes exactly — (1024,) grid, SMEM uniform
inputs, VMEM-resident geometry blocks with constant index maps, a
(24, 4096) state block written per step — with three kernel bodies:

  write   : fill the state block with constants (block-DMA + grid floor)
  raygen  : + the full ray-generation arithmetic
  chain   : the real primary kernel for comparison (COSIG_STUB=trav)

Slope-timed scan chains per bench.py's protocol. Run on TPU from
/root/repo: ``python - < tools/kernel_floor.py``.
"""
from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cosig_tpu.ops.kernel_core import COMPILER_PARAMS

F = np.float32
R = 4096
ROWS = 16  # mirrors the round-4 16-row state layout
N_TILES = 1024
C, K, COMPS = 70, 32, 36
C_PAD = 128


def make_call(body):
    def kernel(uniforms, aabb_t, geom, state):
        body(uniforms, aabb_t, geom, state)

    def run(uniforms, aabb_t, geom):
        return pl.pallas_call(
            kernel,
            grid=(N_TILES,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((8, C_PAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((C, K, COMPS), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((ROWS, R), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, N_TILES * R), jnp.float32),
            compiler_params=COMPILER_PARAMS,
        )(uniforms, aabb_t, geom)

    return run


def body_write(uniforms, aabb_t, geom, state):
    state[:, :] = jnp.full((ROWS, R), uniforms[0], F)


def body_raygen(uniforms, aabb_t, geom, state):
    i = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    px = (i * 32 + lane % 32).astype(F)
    py = (lane // 32).astype(F)
    cam = [uniforms[j] for j in range(12)]
    u = (px / F(1024.0) - F(0.5)) * uniforms[13]
    v = (py / F(1024.0) - F(0.5)) * uniforms[13]
    ocz = jnp.full((1, R), 1.0, F) * uniforms[12]
    inv = F(1.0) / jnp.sqrt(u * u + v * v + ocz * ocz)
    dcx, dcy, dcz = u * inv, v * inv, -ocz * inv
    ox = cam[2] * ocz + cam[3]
    oy = cam[6] * ocz + cam[7]
    oz = cam[10] * ocz + cam[11]
    dx = cam[0] * dcx + cam[1] * dcy + cam[2] * dcz
    dy = cam[4] * dcx + cam[5] * dcy + cam[6] * dcz
    dz = cam[8] * dcx + cam[9] * dcy + cam[10] * dcz
    state[0:1] = ox + jnp.zeros((1, R), F)
    state[1:2] = oy + jnp.zeros((1, R), F)
    state[2:3] = oz + jnp.zeros((1, R), F)
    state[3:4] = dx
    state[4:5] = dy
    state[5:6] = dz
    state[6:16] = jnp.zeros((10, R), F)


def timed(run, uniforms, aabb_t, geom, label):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(u, a, g, k):
        def step(carry, _):
            out = run(carry, a, g)
            return u.at[0].add(out[0, 0] * 0.0), None

        c, _ = jax.lax.scan(step, u, None, length=k)
        return c

    for k in (2, 16):
        chain(uniforms, aabb_t, geom, k=k).block_until_ready()
    t = {}
    for k in (2, 16):
        t0 = time.perf_counter()
        r = chain(uniforms, aabb_t, geom, k=k)
        float(r[0])
        t[k] = time.perf_counter() - t0
    per = (t[16] - t[2]) / 14
    print(f"{label}\t{per * 1e3:.2f} ms/frame\t{per * 1e9 / N_TILES:.1f} ns/tile-step")


def main():
    uniforms = jnp.arange(24, dtype=jnp.float32) / 7.0
    aabb_t = jnp.ones((8, C_PAD), jnp.float32)
    geom = jnp.ones((C, K, COMPS), jnp.float32)
    timed(make_call(body_write), uniforms, aabb_t, geom, "write")
    timed(make_call(body_raygen), uniforms, aabb_t, geom, "raygen")


if __name__ == "__main__":
    main()

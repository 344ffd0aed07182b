"""Quick TPU health probe: measures per-grid-step cost of a trivial Pallas
kernel. Healthy tunnel: ~0.1 us/tile (total ~0.03 ms/call). Degraded pool
windows have shown up to ~21,000 us/tile. Run before benchmarking.

Usage: python - < tools/tpu_health.py   (from /root/repo; see CLAUDE.md)
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = np.float32
R = 256
N_TILES = 256

uniforms = jnp.arange(24, dtype=jnp.float32)


def kernel(uni, out_ref):
    tile = pl.program_id(0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1)
    px = (tile % 16 * 16 + lane % 16).astype(F)
    acc = px * uni[0]
    out_ref[0:1] = acc
    out_ref[1:2] = acc
    out_ref[2:3] = acc
    out_ref[3:4] = acc


fn = pl.pallas_call(
    kernel,
    grid=(N_TILES,),
    in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec((4, R), lambda i: (0, i), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((4, N_TILES * R), jnp.float32),
)
f = jax.jit(lambda u: fn(u))

t0 = time.perf_counter()
out = f(uniforms)
out.block_until_ready()
compile_s = time.perf_counter() - t0

t0 = time.perf_counter()
for _ in range(20):
    out = f(uniforms)
_ = float(out[0, 0])
dt = (time.perf_counter() - t0) / 20
us_per_tile = dt / N_TILES * 1e6
state = "HEALTHY" if us_per_tile < 2.0 else ("SLOW" if us_per_tile < 100 else "DEGRADED")
print(
    f"{state}: {dt*1e3:.3f} ms/call, {us_per_tile:.2f} us/tile "
    f"(compile {compile_s:.1f}s, backend {jax.default_backend()})"
)

"""Minimal repro: interpret-mode pallas_call inside lax.fori_loop under
shard_map miscomputes (upstream JAX interpret machinery).

The production guard this makes falsifiable: trace_wavefront unrolls the
depth chain in interpret mode (see the force_unroll note there). Round-3
observation: under shard_map, an interpret pallas_call inside a loop sees
state inconsistent with the inter-iteration permutation — identity
permutations or loop-free variants are unaffected, pointing at buffer
aliasing in the interpret machinery (compiled Mosaic never uses it).

Two repro levels:

1. ``minimal``: a toy kernel (+1 on row 0) with a gather permutation
   between iterations, fori_loop vs unrolled, under an 8-device shard_map.
2. ``renderer``: the real wavefront path, interpret, 8-device mesh,
   COSIG_WF_LOOP=fori (the escape that bypasses the interpret unroll
   guard) vs the default unrolled chain.

Run on CPU:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python - < tools/repro_interpret_while_shardmap.py

Exit status: prints REPRODUCED when the loop form diverges from the
unrolled form (the bug is still live upstream -> keep the guard), or
NOT-REPRODUCED (consider removing the guard after running the full
suite with COSIG_WF_LOOP=fori).
"""
from __future__ import annotations

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# Script-path invocation: make the repo importable (mxu_verify's fix).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

ROWS, N, R = 8, 4096, 1024


def _step_kernel(x_ref, o_ref):
    o_ref[:, :] = x_ref[:, :]
    o_ref[0:1, :] = x_ref[0:1, :] + np.float32(1.0)


def _bounce(state):
    return pl.pallas_call(
        _step_kernel,
        grid=(N // R,),
        in_specs=[pl.BlockSpec((ROWS, R), lambda i: (0, i))],
        out_specs=pl.BlockSpec((ROWS, R), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.float32),
        interpret=True,
    )(state)


def _permute(state, i):
    # A non-identity, iteration-dependent gather — the wavefront's
    # compaction analog. Identity permutations do not trigger the bug.
    g = N // 128
    perm = jnp.roll(jnp.arange(g), i + 1)
    return state.reshape(ROWS, g, 128)[:, perm, :].reshape(ROWS, N)


def minimal():
    devs = jax.devices()
    mesh = Mesh(np.array(devs), ("d",))

    def body_loop(state):
        def it(i, st):
            return _permute(_bounce(st), i)

        return jax.lax.fori_loop(0, 3, it, state)

    def body_unrolled(state):
        for i in range(3):
            state = _permute(_bounce(state), jnp.int32(i))
        return state

    x = (
        jnp.arange(ROWS * N * len(devs), dtype=jnp.float32)
        .reshape(ROWS, N * len(devs))
    )
    outs = []
    for body in (body_loop, body_unrolled):
        f = shard_map(
            body, mesh=mesh, in_specs=P(None, "d"), out_specs=P(None, "d"),
            check_vma=False,
        )
        outs.append(np.asarray(jax.jit(f)(x)))
    diff = np.abs(outs[0] - outs[1]).max()
    print(f"minimal: max |loop - unrolled| = {diff}")
    return diff > 0


def renderer():
    from jax.sharding import Mesh

    from cosig_tpu.parallel import sharding as sh
    from cosig_tpu.models.soa import compile_scene, frame_params, static_config
    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.scene.tessellate import extract_triangles
    from cosig_tpu.models.soa import materials_host

    # The exact shapes under which round 3 observed the miscompute: the
    # multichip dryrun's tiny scene (32x24, depth 2, 8 CPU devices).
    import __graft_entry__ as ge
    from cosig_tpu.models.settings import RenderSettings

    scene = ge._tiny_scene()
    settings = RenderSettings(resolution_override=(32, 24), max_depth=2)
    arrays = compile_scene(scene)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(arrays, tris=tris, mats_host=mats)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    mesh = Mesh(np.array(jax.devices()), ("band",))

    imgs = {}
    for mode in ("", "fori"):
        if mode:
            os.environ["COSIG_WF_LOOP"] = mode
        else:
            os.environ.pop("COSIG_WF_LOOP", None)
        # trace_wavefront reads COSIG_WF_LOOP at call time (module level
        # only fixes the tile size), so no reload is needed.
        img, _ = sh.render_sharded_wavefront(
            cset, params, cfg, mesh, interpret=True
        )
        imgs[mode or "unrolled"] = np.asarray(img)
    os.environ.pop("COSIG_WF_LOOP", None)
    diff = np.abs(imgs["unrolled"] - imgs["fori"]).max()
    print(f"renderer: max |fori - unrolled| = {diff}")
    return diff > 1e-6


def main():
    hit_min = minimal()
    try:
        hit_ren = renderer()
    except Exception as e:  # keep the minimal verdict useful on API drift
        print(f"renderer-level repro errored: {e!r}")
        hit_ren = None
    verdict = hit_min or hit_ren
    print("REPRODUCED" if verdict else "NOT-REPRODUCED")


if __name__ == "__main__":
    main()

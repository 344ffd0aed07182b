"""Microbench the wavefront's XLA-side data movement at glass shapes:
the per-depth compaction gather and the final inverse-gather +
AA-mean + untranspose. Pure XLA (compiles in seconds) — run ON TPU to
decide the floor levers (round-4 floor attribution: compaction 6.8 ms,
untranspose 6.8 ms of a 42.5 ms frame).

Timing: one scan chain per variant, slope of two lengths (bench.py's
protocol). Run from /root/repo: python tools/perm_bench.py
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# Glass shapes: 1024x1024, aa=4 -> n_pad 4.19M; R=4096, GROUP=128.
N_PAD = 1024 * 1024 * 4
LIVE_ROWS = 15
GROUP = 128
AA = 4
NBY, NBX = 64, 16  # 1024/16-high blocks... (bh, bw) = (16, 64) at aa=4
BH, BW = 16, 64
SQH, SQW = 2, 2  # quad grid at S=4
QH, QW = BH // SQH, BW // SQW


def timed(fn, *args, label=""):
    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(a0, k):
        def step(carry, _):
            out = fn(*((carry,) + args[1:]))
            # keep shape: fold back to carry dtype/shape via dynamic slice
            return carry + out.reshape(-1)[0] * 0.0, None

        c, _ = jax.lax.scan(step, a0, None, length=k)
        return c

    a0 = args[0]
    for k in (2, 12):
        chain(a0, k=k).block_until_ready()
    t = {}
    for k in (2, 12):
        t0 = time.perf_counter()
        r = chain(a0, k=k)
        float(r.reshape(-1)[0])
        t[k] = time.perf_counter() - t0
    per = (t[12] - t[2]) / 10
    print(f"{label:34s} {per * 1e3:8.3f} ms")
    return per


def main():
    key = jax.random.PRNGKey(0)
    g = N_PAD // GROUP
    state = jax.random.normal(key, (LIVE_ROWS, N_PAD), jnp.float32)
    colors = state[0:3]
    perm = jax.random.permutation(key, g)

    # --- compaction pieces (depth-1 extent = full) ---
    keys8 = jax.random.randint(key, (g,), 0, 9)

    def sort_only(st, ks):
        order = jnp.argsort(ks, stable=True)
        return order.astype(jnp.float32)

    def gather_full(st, pm):
        s3 = st.reshape(LIVE_ROWS, g, GROUP)
        return s3[:, pm, :].reshape(LIVE_ROWS, N_PAD)

    def gather_axis0(st, pm):
        # group-major layout alternative: contiguous (LIVE_ROWS*GROUP)
        # blocks gathered on axis 0.
        s3 = st.reshape(g, LIVE_ROWS * GROUP)
        return s3[pm].reshape(LIVE_ROWS, N_PAD)

    def take_impl(st, pm):
        s3 = st.reshape(LIVE_ROWS, g, GROUP)
        return jnp.take(s3, pm, axis=1, indices_are_sorted=False).reshape(
            LIVE_ROWS, N_PAD)

    timed(sort_only, state, keys8, label="argsort(32k keys)")
    timed(gather_full, state, perm, label="compact gather (15,g,128) axis1")
    timed(take_impl, state, perm, label="  same via jnp.take")
    state_gm = jnp.asarray(
        np.asarray(state).reshape(LIVE_ROWS, g, GROUP).transpose(1, 0, 2)
        .reshape(g, LIVE_ROWS * GROUP))
    timed(gather_axis0, state_gm, perm, label="  group-major axis0 gather")

    # --- final untranspose pieces ---
    def inv_gather(c, pm):
        c3 = c.reshape(3, g, GROUP)
        return c3[:, pm, :].reshape(3, N_PAD)

    def mean_only(c, pm):
        return c.reshape(3, N_PAD // AA, AA).mean(axis=2)

    def transpose8d(cp, pm):
        return (
            cp.reshape(3, NBY, NBX, SQH, SQW, QH, QW)
            .transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(3, NBY * BH, NBX * BW)
            .transpose(1, 2, 0)
        )

    def full_untranspose(c, pm):
        c2 = c.reshape(3, g, GROUP)[:, pm, :].reshape(3, N_PAD)
        cp = (
            c2.reshape(3, NBY, NBX, SQH, SQW, QH, QW, AA).mean(axis=7)
        )
        return (
            cp.transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(3, NBY * BH, NBX * BW)
            .transpose(1, 2, 0)
        )

    def meanfirst_untranspose(c, pm):
        cp = c.reshape(3, g, GROUP // AA, AA).mean(axis=3)
        cp = cp[:, pm, :].reshape(3, N_PAD // AA)
        return (
            cp.reshape(3, NBY, NBX, SQH, SQW, QH, QW)
            .transpose(0, 1, 3, 5, 2, 4, 6)
            .reshape(3, NBY * BH, NBX * BW)
            .transpose(1, 2, 0)
        )

    timed(inv_gather, colors, perm, label="inverse color gather (3,g,128)")
    pix = colors.reshape(3, N_PAD // AA, AA).mean(axis=2)
    timed(mean_only, colors, perm, label="aa mean (3,N/4)")
    timed(transpose8d, pix, perm, label="8D untranspose (pixels)")
    timed(full_untranspose, colors, perm, label="FULL current untranspose")
    timed(meanfirst_untranspose, colors, perm, label="FULL mean-first variant")

    # bit-exactness of the mean-first variant
    a = jax.jit(full_untranspose)(colors, perm)
    b = jax.jit(meanfirst_untranspose)(colors, perm)
    print("mean-first bitwise-equal:", bool(jnp.all(a == b)))


if __name__ == "__main__":
    main()

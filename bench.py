"""Benchmark harness — prints ONE JSON line for the driver.

Headline metric (BASELINE.md): Mrays/s on a single chip at 1024x1024,
depth-6 Whitted (glass-sphere config 4 from BASELINE.json), target 500.
Rays are counted honestly: the megakernel emits per-ray traversal counts
(primary/secondary + shadow rays actually alive), not the W*H*depth upper
bound.

Usage: python bench.py [--config NAME] [--backend pallas|xla] [--all]
"""

from __future__ import annotations

import argparse
import os
import functools
import json
import sys
import time

import numpy as np

TARGET_MRAYS = 500.0  # BASELINE.md north-star for v5e single chip


def _enable_jax_cache():
    """Persistent compilation cache (COSIG_JAX_CACHE=0 disables).

    Through a degraded axon tunnel a single compile can take 100-700 s
    (CLAUDE.md hazard #3), and every bench/sweep row is a fresh process,
    so repeated configs re-pay it. The persistent cache serializes the
    compiled executable to disk keyed by HLO+flags; if the backend
    doesn't support serialization JAX logs and skips — harmless."""
    if os.environ.get("COSIG_JAX_CACHE", "1") == "0":
        return
    import jax

    d = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:
        pass  # older jax: knob names differ; cache is an optimization only


def bench_config(name: str, backend: str, repeats: int = 5, quiet: bool = True):
    import jax

    _enable_jax_cache()

    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import compile_scene, frame_params, static_config
    from cosig_tpu.ops import trace_pallas, trace_xla
    from cosig_tpu.scene.generate import CONFIGS

    scene, settings = CONFIGS[name]()
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)

    # COSIG_DEPTH: max-depth override for attribution sweeps (the r4
    # COSIG_STUB=mt decomposition was liveness-confounded — stubbed pair
    # tests make every ray miss, killing all bounce stages; depth-1
    # frames with stubs + full-frame depth increments attribute cleanly).
    _ed = os.environ.get("COSIG_DEPTH")
    if _ed:
        import dataclasses

        cfg = dataclasses.replace(cfg, max_depth=int(_ed))

    interpret = jax.default_backend() == "cpu"

    from cosig_tpu.models.soa import materials_host
    from cosig_tpu.scene.tessellate import extract_triangles

    # Timing protocol for tunneled TPUs (axon), where (a) a device->host
    # transfer permanently degrades dispatch latency (~30 ms/call) and
    # (b) block_until_ready acknowledges the *enqueue*, not completion:
    # enqueue N frames back-to-back, then force completion of the whole
    # chain with ONE scalar readback (device executes in launch order),
    # and amortize the single round-trip over N.
    import jax.numpy as jnp

    # K renders execute inside ONE dispatch (lax.scan); timing two chain
    # lengths and taking the slope cancels ALL per-dispatch overhead —
    # which on tunneled TPUs is large, variable, and mode-dependent.
    if backend in ("pallas", "wavefront"):


        tris = extract_triangles(scene)
        mats = np.concatenate(materials_host(scene), axis=1)
        # COSIG_K: cluster-size override for sweeps (tools/stage_profile.py);
        # unset -> build_clusters' auto rule (cut must fit one cull block).
        _ek = os.environ.get("COSIG_K")
        try:
            k_override = int(_ek) if _ek else None
        except ValueError:
            raise SystemExit(f"COSIG_K must be a positive int, got {_ek!r}")
        cset = build_clusters(
            arrays, tris=tris, mats_host=mats, k=k_override,
        )  # build_clusters rejects k <= 0 with a clear message
        # COSIG_K_PRIMARY: finer primary-stage cluster set (wavefront only).
        kp = os.environ.get("COSIG_K_PRIMARY")
        cset_p = (
            build_clusters(arrays, tris=tris, mats_host=mats, k=int(kp))
            if kp else None
        )
        # COSIG_K_SHADOW: coarser any-hit shadow cluster set (wavefront).
        ksh = os.environ.get("COSIG_K_SHADOW")
        cset_sh = (
            build_clusters(arrays, tris=tris, mats_host=mats, k=int(ksh))
            if ksh else None
        )

        if backend == "wavefront":
            from cosig_tpu.ops import trace_wavefront
            import dataclasses

            @functools.partial(jax.jit, static_argnames=("k",))
            def chain(k):
                def body(carry, _):
                    prev, acc = carry
                    p2 = dataclasses.replace(
                        params,
                        light_intensity=params.light_intensity + prev[0, 0, 0] * 0.0,
                    )
                    img, rays = trace_wavefront.render_wavefront(
                        cset, p2, cfg, interpret=interpret,
                        cset_primary=cset_p, cset_shadow=cset_sh,
                    )
                    return (img, acc + rays), None

                img0, rays0 = trace_wavefront.render_wavefront(
                    cset, params, cfg, interpret=interpret,
                    cset_primary=cset_p, cset_shadow=cset_sh,
                )
                (img, total), _ = jax.lax.scan(body, (img0, rays0), None, length=k - 1)
                return img, total

        else:

            def chain(k):
                img, rays = trace_pallas.render_chain(
                    cset, params, cfg, k, interpret=interpret
                )
                return img, rays

    else:

        def chain(k):
            import dataclasses

            def body(carry, _):
                prev, acc = carry
                # Carry-dependent zero keeps the render inside the loop
                # (defeats while-loop invariant code motion).
                p2 = dataclasses.replace(
                    params,
                    light_intensity=params.light_intensity + prev[0, 0, 0] * 0.0,
                )
                img, rays = trace_xla.render_image(arrays, p2, cfg, with_rays=True)
                return (img, acc + rays), None

            img0, rays0 = trace_xla.render_image(arrays, params, cfg, with_rays=True)
            (img, total), _ = jax.lax.scan(body, (img0, rays0), None, length=k - 1)
            return img, total

        chain = jax.jit(chain, static_argnames=("k",))

    # Pick chain lengths so the slope span (t_k2 - t_k1) covers >= ~150 ms
    # of frame work — comfortably above dispatch jitter (~10 ms on the
    # tunnel). Sizing is by TARGET TIME, not pixels: frame time is roughly
    # 5-12 ns/ray across configs, so k2 ~ 0.15 s / (10 ns * rays). The old
    # pixel-heuristic cap (24) left diffuse_sphere's 0.35 ms frame with a
    # ~8 ms span under ~10 ms jitter — not measurement-grade (round-3
    # VERDICT weak #8).
    rays_est = cfg.width * cfg.height * max(1, cfg.aa_samples) * (
        1 + min(2, cfg.max_depth)
    )
    k1 = 2
    k2 = max(repeats, min(512, int(6e7 / max(rays_est, 1)) + 3))

    # Warm/compile BOTH chain lengths before timing (each k is a separate
    # executable; Mosaic compiles run 0.6-200 s and must not be timed).
    t0 = time.perf_counter()
    img, probe = chain(k1)
    img.block_until_ready()
    img, probe = chain(k2)
    img.block_until_ready()
    _ = float(probe)
    compile_s = time.perf_counter() - t0  # includes both compiles

    def timed(k):
        t0 = time.perf_counter()
        img, probe = chain(k)
        p = float(probe)
        return time.perf_counter() - t0, img, p

    t_k1, img, _ = timed(k1)
    t_k2, img, probe_val = timed(k2)
    per_frame = max((t_k2 - t_k1) / (k2 - k1), 1e-9)
    total = t_k2
    n_frames = k2

    # All backends count live rays honestly (chain sums across k frames):
    # primary/secondary rays alive at each bounce + shadow rays cast.
    rays = float(probe_val) / k2
    best = per_frame
    mrays = rays / best / 1e6

    # Accuracy gate (BASELINE: <=1e-3 RMSE): pallas vs the XLA oracle at a
    # reduced resolution (full-res brute force would dwarf the bench).
    # COSIG_BENCH_NO_RMSE=1 skips it (A/B sweeps on degraded tunnels,
    # where the oracle compile+readback dominates the run; bit-exactness
    # of the knob configs is separately gated by tests).
    rmse = None
    if os.environ.get("COSIG_BENCH_NO_RMSE") == "1":
        pass
    elif backend in ("pallas", "wavefront"):
        import dataclasses

        scale = max(1, max(cfg.width, cfg.height) // 256)
        small = dataclasses.replace(
            cfg, width=cfg.width // scale, height=cfg.height // scale
        )
        ref = np.asarray(trace_xla.render_jit(arrays, params, small))
        if backend == "wavefront":
            from cosig_tpu.ops import trace_wavefront

            got, _ = trace_wavefront.render_jit(cset, params, small, interpret=interpret)
        else:
            got, _ = trace_pallas.render_jit(cset, params, small, interpret=interpret)
        rmse = float(np.sqrt(((np.asarray(got) - ref) ** 2).mean()))
    result = {
        "config": name,
        "frames_timed": n_frames,
        "chain_total_s": total,
        "backend": backend,
        "resolution": [cfg.width, cfg.height],
        "max_depth": cfg.max_depth,
        "aa": cfg.aa_samples,
        "triangles": arrays.num_triangles,
        "ms_per_frame": best * 1e3,
        "rays_traced": rays,
        "mrays_per_s": mrays,
        "compile_s": compile_s,
        "rmse_vs_oracle": rmse,
        "image_mean": float(np.asarray(img).mean()),
    }
    if not quiet:
        print(json.dumps(result, indent=2), file=sys.stderr)
    return result


def _tunnel_probe(timeout_s: float = 300.0):
    """Post-timing tunnel-health annotation -> us/tile or None.

    The axon tunnel's throughput is non-stationary (CLAUDE.md hazard #3;
    the round-5 pool sat at ~21,000-60,000 us/tile vs the ~200 workable
    baseline for days). A headline taken in such a window collapses
    ~100x with nothing in the output saying why — so after timing, probe
    the tunnel in a SUBPROCESS (no readback contamination of this
    process) and annotate the metric when the window is degraded."""
    import subprocess

    probe_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools", "tpu_health.py"
    )
    if not os.path.exists(probe_path):
        return None
    try:
        out = subprocess.run(
            [sys.executable, probe_path],
            capture_output=True, text=True, timeout=timeout_s,
        ).stdout
    except Exception:
        return None
    import re

    m = re.search(r"([\d.]+) us/tile", out or "")
    return float(m.group(1)) if m else None


def _device_watchdog(timeout_s: float = 600.0):
    """Fail fast (one JSON error line) if device enumeration hangs.

    The axon tunnel has been observed to hang indefinitely inside
    jax.devices() while the plugin initializes fine — an uninterruptible
    C call, so the watchdog emits the contract line and hard-exits
    rather than letting the driver's bench run hang silently. Generous
    timeout: healthy first contact is < 30 s."""
    import threading

    done = threading.Event()
    info = {}

    def probe():
        import jax

        info["n"] = len(jax.devices())
        done.set()

    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(timeout_s):
        print(
            json.dumps(
                {
                    "metric": "Mrays/s glass_sphere (TPU unreachable: "
                              "device enumeration hung)",
                    "value": 0.0,
                    "unit": "Mrays/s",
                    "vs_baseline": 0.0,
                }
            ),
            flush=True,
        )
        os._exit(2)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="glass_sphere")
    ap.add_argument("--backend", default="wavefront",
                    choices=["pallas", "wavefront", "xla"])
    ap.add_argument("--all", action="store_true", help="run all 5 configs (details to stderr)")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--emit-details", action="store_true", help=argparse.SUPPRESS)
    args = ap.parse_args()

    _device_watchdog()

    if args.all:
        # One subprocess per config: a device->host readback poisons
        # dispatch latency for the rest of the process on tunneled TPUs,
        # so cross-config contamination must be avoided.
        import subprocess

        results = {}
        for name in ("diffuse_sphere", "cosig_walls", "mirror_sphere", "glass_sphere", "large_mesh"):
            cmd = [
                sys.executable, __file__,
                "--config", name,
                "--backend", args.backend,
                "--repeats", str(args.repeats),
                "--emit-details",
            ]
            try:
                # Degraded-tunnel compiles alone have hit ~1,500 s
                # (r5 etlarge rows); leave room for compile + chains.
                out = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=3600, check=True
                )
                results[name] = json.loads(out.stdout.strip().splitlines()[-1])
                print(json.dumps(results[name], indent=2), file=sys.stderr)
            except Exception as e:  # keep the sweep alive
                print(f"{name}: FAILED {e}", file=sys.stderr)
        with open("bench_details.json", "w") as f:
            json.dump(results, f, indent=2)
        headline = results.get("glass_sphere")
    elif args.emit_details:
        print(json.dumps(bench_config(args.config, args.backend, args.repeats)))
        return
    else:
        headline = bench_config(args.config, args.backend, args.repeats)

    if headline:
        metric = (
            f"Mrays/s {headline['config']} {headline['resolution'][0]}x"
            f"{headline['resolution'][1]} depth{headline['max_depth']} "
            f"aa{headline['aa']} ({headline['backend']})"
        )
        value = headline["mrays_per_s"]
    else:
        metric = "Mrays/s glass_sphere (FAILED)"
        value = 0.0
    rec = {
        "metric": metric,
        "value": round(value, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(value / TARGET_MRAYS, 4),
    }
    if value > 0.0:
        tunnel_us = _tunnel_probe()
        if tunnel_us is not None:
            rec["tunnel_us_per_tile"] = round(tunnel_us, 1)
        if tunnel_us is None or tunnel_us > 2000.0:
            state = ("unreachable" if tunnel_us is None
                     else f"{tunnel_us:.0f} us/tile")
            rec["metric"] += (
                f" [tunnel degraded at measurement time: {state}; "
                "healthy-window reference in bench_details.json]"
            )
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

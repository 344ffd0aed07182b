"""TPU correctness matrix for the MXU traversal (STATUS: "MXU traversal
(in flight)").

The open miscompile: with closest-hit + any-hit shadow + secondary-ray
blocks all compiled in ONE kernel (any bounce stage at depth >= 2), the
closest-hit winner one-hot collapses to all-zero -> NaN normals -> no
shadows/bounces. Interpret/CPU is clean; any two of the three blocks are
clean. This tool runs the queued experiment levers as subprocesses (env
knobs are read at import) on a SMALL compiled frame and compares each
image against the VPU baseline — the go/no-go gate before COSIG_MXU can
default on.

Usage (parent): python tools/mxu_verify.py [--config glass_sphere]
                    [--res 256] [--depth 3] [--modes mixed,full,...]
Child (internal): python tools/mxu_verify.py --child OUT.npy ...

Verdicts per mode: OK (ULP-scale drift vs VPU), SUSPECT (above ULP but
image-shaped), BROKEN (NaNs or gross divergence — the miscompile).
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:  # script-path invocation puts tools/ first, not REPO
    sys.path.insert(0, REPO)

# label -> env knobs (on top of the inherited env)
MODES = {
    "base": {"COSIG_MXU": "0"},
    "mixed": {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"},
    "full": {"COSIG_MXU": "1"},
    "full-oh": {"COSIG_MXU": "1", "COSIG_MXU_OH": "le"},
    "full-rows": {"COSIG_MXU": "1", "COSIG_MXU_STAGE": "rows"},
    # (batched-visit modes removed with the COSIG_MXU_BATCH prune.)
    # Kernel fission: every kernel stays in the verified two-of-three
    # block set — the designed dodge for the fused-kernel miscompile.
    "fission-full": {"COSIG_WF_FISSION": "1", "COSIG_MXU": "1"},
    "fission-base": {"COSIG_WF_FISSION": "1", "COSIG_MXU": "0"},
    # (Window-selection modes removed with the round-5 COSIG_WSEL prune.)
}
DEFAULT_MODES = ("base", "mixed", "full", "fission-full")


def child(args):
    import numpy as np

    from cosig_tpu.accel.clusters import build_clusters
    from cosig_tpu.models.soa import (
        compile_scene, frame_params, materials_host, static_config,
    )
    from cosig_tpu.ops import trace_wavefront
    from cosig_tpu.scene.generate import CONFIGS
    from cosig_tpu.scene.tessellate import extract_triangles
    import dataclasses

    scene, settings = CONFIGS[args.config]()
    settings = dataclasses.replace(
        settings, resolution_override=(args.res, args.res),
        max_depth=args.depth, aa_samples=args.aa,
    )
    arrays = compile_scene(scene)
    params = frame_params(scene, settings)
    cfg = static_config(scene, settings)
    tris = extract_triangles(scene)
    mats = np.concatenate(materials_host(scene), axis=1)
    cset = build_clusters(
        arrays, tris=tris, mats_host=mats,
        k=int(os.environ.get("COSIG_K", "32")),
    )
    t0 = time.time()
    img, rays = trace_wavefront.render_wavefront(cset, params, cfg)
    img = np.asarray(img)  # the one readback of this process
    wall = time.time() - t0
    np.save(args.child, img)
    print(json.dumps({
        "rays": float(rays), "wall_s": round(wall, 1),
        "nan": int(np.isnan(img).sum()),
        "mean": float(np.nanmean(img)),
    }))


def parent(args):
    import numpy as np

    modes = [m.strip() for m in args.modes.split(",")] if args.modes else list(
        DEFAULT_MODES)
    if "base" not in modes:
        modes.insert(0, "base")
    imgs, stats = {}, {}
    for m in modes:
        out = f"/tmp/mxu_verify_{m}.npy"
        env = dict(os.environ, **MODES[m])
        cmd = [sys.executable, os.path.abspath(__file__), "--child", out,
               "--config", args.config, "--res", str(args.res),
               "--depth", str(args.depth), "--aa", str(args.aa)]
        t0 = time.time()
        r = subprocess.run(cmd, capture_output=True, text=True, env=env,
                           cwd=REPO, timeout=args.timeout)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            stats[m] = json.loads(line)
            if not stats[m]:
                raise json.JSONDecodeError("empty", line, 0)
        except json.JSONDecodeError:
            print(f"{m}: CHILD FAILED rc={r.returncode} "
                  f"stderr={r.stderr[-300:]}", flush=True)
            continue
        stats[m]["subproc_s"] = round(time.time() - t0, 1)
        imgs[m] = np.load(out)
        print(f"{m}: {stats[m]}", flush=True)

    if "base" not in imgs:
        print("NO BASELINE — aborting comparisons")
        return
    base = imgs["base"]
    print("\n--- verdicts vs base (VPU) ---")
    for m in modes:
        if m == "base" or m not in imgs:
            continue
        d = np.abs(imgs[m] - base)
        rmse = float(np.sqrt(np.nanmean(d ** 2)))
        mx = float(np.nanmax(d))
        nan = stats[m]["nan"]
        if nan or rmse > 1e-2 or not np.isfinite(rmse):
            v = "BROKEN"
        elif rmse < 1e-4 and mx < 0.05:
            v = "OK"
        else:
            v = "SUSPECT"
        print(f"{m}: {v} rmse={rmse:.3e} max={mx:.3e} nan={nan} "
              f"rays={stats[m]['rays']:.0f} vs {stats['base']['rays']:.0f}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", default=None, help="internal: output npy path")
    ap.add_argument("--config", default="glass_sphere")
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--depth", type=int, default=3)
    ap.add_argument("--aa", type=int, default=1)
    ap.add_argument("--modes", default=None,
                    help=f"comma list from {sorted(MODES)}")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()
    if args.child:
        child(args)
    else:
        parent(args)


if __name__ == "__main__":
    main()

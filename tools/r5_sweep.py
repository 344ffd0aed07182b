"""Round-5 same-window experiment sweep.

Runs bench.py in subprocesses (env knobs are read at import) and appends
one JSON line per run to tools/r5_sweep_results.jsonl. Rows within a
stage run back-to-back so comparisons stay same-window (CLAUDE.md tunnel
hazard #3); anchors are interleaved ABAB where the comparison matters.

Concurrency guard (round-4 VERDICT weak #4: two raced sweep processes
produced a corrupted 79.8 ms row): an exclusive flock on the results
file's .lock twin is held for the WHOLE run — a second runner exits
immediately with a clear message instead of contaminating the chip.

Rows run from a frozen snapshot worktree when present (live edits broke
a round-4 stage):  git worktree add .r5snap HEAD --detach

Stages:
  health   — tpu_health probe row (run before trusting any stage).
  wsel     — window-selection ABAB (COSIG_WSEL; kernel_core use_wsel
             note) on glass + large, incl. finer bounce windows
             (Sb8 / Rb1024+Sb8). Gate first: test_wavefront_wsel_exact
             is in the fast suite; hardware bits via wsel_verify.
  wselK    — cluster-size re-test UNDER wsel (selection cost is ∝ K per
             flagged window, so wsel shifts the K optimum down).
  etlarge  — early-t on large_mesh (the r4 Mosaic crash is fixed:
             tools/repro_earlyt_multitile.py); front-to-back + best-t
             skip should bite hardest at 12k tris.
  occlarge — clean EARLYT_OCC ABAB on large (r4 rows adjudicated as a
             raced artifact; expectation: flat).
  d1       — depth-1 stub attribution (no bounce stages -> no liveness
             confound): full / no-mt / sel-only / no-visit / no-trav /
             no-shadow per config.
  depths   — full frames at d=1..max: per-depth increments = true
             per-bounce cost at real liveness.
  bench    — one-window bench --all refresh (updates bench_details.json
             at the repo root; run LAST, needs RMSE, no stubs).

Usage: python tools/r5_sweep.py [health|wsel|wselK|etlarge|occlarge|d1|depths|bench ...]
"""

import fcntl
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(os.path.dirname(__file__), "r5_sweep_results.jsonl")
LOCK = OUT + ".lock"
SNAP = os.path.join(REPO, ".r5snap")
NEW_CWD = SNAP if os.path.isdir(SNAP) else REPO

W = {"COSIG_WSEL": "1"}
W8 = {"COSIG_WSEL": "1", "COSIG_WF_SB": "8"}

# (label, config, env, cwd) — cwd None = snapshot/new code.
STAGES = {
    "wsel": [
        ("glass-base-1", "glass_sphere", {}, None),
        ("glass-wsel", "glass_sphere", dict(W), None),
        ("glass-base-2", "glass_sphere", {}, None),
        ("glass-wsel-Sb8", "glass_sphere", dict(W8), None),
        ("large-base-1", "large_mesh", {}, None),
        ("large-wsel", "large_mesh", dict(W), None),
        ("large-base-2", "large_mesh", {}, None),
        ("large-wsel-Sb8", "large_mesh", dict(W8), None),
        ("large-wsel-Rb1024-Sb8", "large_mesh",
         dict(W8, COSIG_WF_RB="1024"), None),
        ("large-base-3", "large_mesh", {}, None),
    ],
    # Finer PRIMARY tile under WSEL: selection is per-128-lane window at
    # R=1024+S8 (vs 512-lane at the default R=4096), halving large's
    # selection lanes at equal dot economy (cull_stats: 49.19x128 vs
    # 94.25x512/4 per Kray) — affordable only now that WSEL decouples
    # dot width from selection width. Costs 4x grid programs; the ABAB
    # decides whether fixed per-program costs eat the win.
    "wselR": [
        ("large-wsel-R4096-1", "large_mesh", dict(W8), None),
        ("large-wsel-R1024", "large_mesh",
         dict(W8, COSIG_WF_R="1024"), None),
        ("large-wsel-R4096-2", "large_mesh", dict(W8), None),
        ("glass-wsel-R1024", "glass_sphere",
         dict(W8, COSIG_WF_R="1024"), None),
        ("glass-wsel-R4096", "glass_sphere", dict(W8), None),
    ],
    "wselK": [
        ("large-wsel-K64-1", "large_mesh", dict(W8), None),
        ("large-wsel-K32", "large_mesh", dict(W8, COSIG_K="32"), None),
        ("large-wsel-K64-2", "large_mesh", dict(W8), None),
        ("glass-wsel-K32-1", "glass_sphere", dict(W8), None),
        ("glass-wsel-K16", "glass_sphere",
         dict(W8, COSIG_K="16", COSIG_WF_RB="1024"), None),
        ("glass-wsel-K32-2", "glass_sphere", dict(W8), None),
    ],
    # Bounce-stage frustum culling retest UNDER SELFSKIP: the knob was
    # built (and shelved) when bounce packets were octant-sorted
    # compaction groups with mixed origins; selfskip keeps bounce tiles
    # in PIXEL order, so their origin hulls are raster quads again —
    # the regime where frustum culls are tight. Exact (conservative
    # superset; the env var only changes cull width).
    "bfrust": [
        ("glass-bf-off-1", "glass_sphere", {}, None),
        ("glass-bf-on", "glass_sphere", {"COSIG_BOUNCE_FRUSTUM": "1"}, None),
        ("glass-bf-off-2", "glass_sphere", {}, None),
        ("glass-bf-wsel8", "glass_sphere",
         dict(W8, COSIG_BOUNCE_FRUSTUM="1"), None),
        ("large-bf-off-1", "large_mesh", {}, None),
        ("large-bf-on", "large_mesh", {"COSIG_BOUNCE_FRUSTUM": "1"}, None),
        ("large-bf-off-2", "large_mesh", {}, None),
    ],
    # The large half of `bfrust` — the tunnel died mid-stage (02:20)
    # before these rows ran; glass half already adjudicated (rejected).
    "bflarge": [
        ("large-bf-off-1b", "large_mesh", {}, None),
        ("large-bf-on-1", "large_mesh", {"COSIG_BOUNCE_FRUSTUM": "1"}, None),
        ("large-bf-off-2b", "large_mesh", {}, None),
        ("large-bf-on-2", "large_mesh", {"COSIG_BOUNCE_FRUSTUM": "1"}, None),
    ],
    # Depth-hybrid dispatch (COSIG_WF_HYBRID_D=T: selfskip depths < T,
    # compaction from T on; trace_wavefront _HYBRID_D note). Host
    # predictor (tools/bounce_stats.py): large d2+ has 9.5 % liveness
    # scattered over every pixel-order tile (d3 dots 796 pixel-order vs
    # 433 compacted), so compacting ONLY the collapsed depths buys the
    # prefix dispatch without selfskip's d1 win being given back.
    # Glass's bounce tail (d2-5, 3.8 % alive) sizes the same idea on the
    # headline config.
    "hybrid": [
        ("large-hyb-off-1", "large_mesh", {}, None),
        ("large-hyb2", "large_mesh", {"COSIG_WF_HYBRID_D": "2"}, None),
        ("large-hyb-off-2", "large_mesh", {}, None),
        ("large-hyb3", "large_mesh", {"COSIG_WF_HYBRID_D": "3"}, None),
        ("large-hyb-off-3", "large_mesh", {}, None),
        ("glass-hyb-off-1", "glass_sphere", {}, None),
        ("glass-hyb2", "glass_sphere", {"COSIG_WF_HYBRID_D": "2"}, None),
        ("glass-hyb-off-2", "glass_sphere", {}, None),
        ("glass-hyb3", "glass_sphere", {"COSIG_WF_HYBRID_D": "3"}, None),
        # Bounce-frustum composition: the bfrust glass rejection was
        # measured under selfskip (pixel-order bounce tiles, mixed
        # octants). Hybrid's compacted depths are octant-major groups —
        # the regime the frustum hull was built for.
        ("large-hyb2-bf", "large_mesh",
         {"COSIG_WF_HYBRID_D": "2", "COSIG_BOUNCE_FRUSTUM": "1"}, None),
        ("glass-hyb2-bf", "glass_sphere",
         {"COSIG_WF_HYBRID_D": "2", "COSIG_BOUNCE_FRUSTUM": "1"}, None),
    ],
    "etlarge": [
        ("large-et-off-1", "large_mesh", {}, None),
        ("large-et-on-1", "large_mesh", {"COSIG_EARLYT": "1"}, None),
        ("large-et-off-2", "large_mesh", {}, None),
        ("large-et-on-2", "large_mesh", {"COSIG_EARLYT": "1"}, None),
    ],
    "occlarge": [
        ("large-occ-off-1", "large_mesh", {}, None),
        ("large-occ-on-1", "large_mesh", {"COSIG_EARLYT_OCC": "1"}, None),
        ("large-occ-off-2", "large_mesh", {}, None),
        ("large-occ-on-2", "large_mesh", {"COSIG_EARLYT_OCC": "1"}, None),
    ],
    # Megakernel with MXU (round-5 wiring) vs the wavefront flagship:
    # zero inter-stage HBM state traffic, tile-level dead skip. The r4
    # "mega" stage never ran (tunnel died); this is its MXU-era debut.
    "mega": [
        ("glass-wf-1", "glass_sphere", {}, None),
        ("glass-mega", "glass_sphere",
         {"COSIG_SWEEP_BACKEND": "pallas"}, None),
        ("glass-mega-wsel8", "glass_sphere",
         {"COSIG_SWEEP_BACKEND": "pallas", "COSIG_WSEL": "1",
          "COSIG_MEGA_S": "8"}, None),
        ("glass-wf-2", "glass_sphere", {}, None),
        ("large-mega", "large_mesh",
         {"COSIG_SWEEP_BACKEND": "pallas"}, None),
        ("large-mega-wsel8", "large_mesh",
         {"COSIG_SWEEP_BACKEND": "pallas", "COSIG_WSEL": "1",
          "COSIG_MEGA_S": "8"}, None),
        ("large-wf-1", "large_mesh", {}, None),
    ],
    "d1": [
        ("glass-d1-full", "glass_sphere", {"COSIG_DEPTH": "1"}, None),
        ("glass-d1-nomt", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "mt"}, None),
        ("glass-d1-dotonly", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "sel"}, None),
        ("glass-d1-novisit", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "visit"}, None),
        ("glass-d1-notrav", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "trav"}, None),
        ("glass-d1-noshadow", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "shadow"}, None),
        ("glass-d1-full-2", "glass_sphere", {"COSIG_DEPTH": "1"}, None),
        ("large-d1-full", "large_mesh", {"COSIG_DEPTH": "1"}, None),
        ("large-d1-nomt", "large_mesh",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "mt"}, None),
        ("large-d1-dotonly", "large_mesh",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "sel"}, None),
        ("large-d1-novisit", "large_mesh",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "visit"}, None),
        ("large-d1-noshadow", "large_mesh",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "shadow"}, None),
        ("large-d1-full-2", "large_mesh", {"COSIG_DEPTH": "1"}, None),
    ],
    # Non-traversal floor decomposition at depth 1 on the headline
    # config (the d1 stage put it at ~8.2 ms of the 22.9 ms frame; at a
    # post-hybrid ~27 ms d6 frame the floor is the next biggest term).
    # notrav-nount isolates the finalize untranspose inside the floor;
    # shade isolates the local-shading block; noshadow-trav bounds the
    # primary-kernel-only floor (camera + state write + dispatch).
    "floor": [
        ("glass-fl-full", "glass_sphere", {"COSIG_DEPTH": "1"}, None),
        ("glass-fl-notrav", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "trav"}, None),
        ("glass-fl-notrav-nount", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "trav", "COSIG_WF_NOUNT": "1"},
         None),
        ("glass-fl-notrav-noshade", "glass_sphere",
         {"COSIG_DEPTH": "1", "COSIG_STUB": "trav,shade"}, None),
        ("glass-fl-full-2", "glass_sphere", {"COSIG_DEPTH": "1"}, None),
    ],
    # The large half of `depths` after the stage was cut short to run
    # the bench refresh first (21:30): d1 is already measured by the d1
    # stage (31.71/31.97) and d4 is the default config (144.96 in the
    # same-window bench refresh), so only d2/d3 remain.
    "depthsL": [
        ("large-d2", "large_mesh", {"COSIG_DEPTH": "2"}, None),
        ("large-d3", "large_mesh", {"COSIG_DEPTH": "3"}, None),
    ],
    # Trimmed to 8 rows (each COSIG_DEPTH is its own executable — a
    # fresh ~300 s tunnel compile per row): glass interpolates d3/d5.
    "depths": (
        [(f"glass-d{d}", "glass_sphere", {"COSIG_DEPTH": str(d)}, None)
         for d in (1, 2, 4, 6)]
        + [(f"large-d{d}", "large_mesh", {"COSIG_DEPTH": str(d)}, None)
           for d in range(1, 5)]
    ),
}


def run_one(label: str, config: str, env_extra: dict, cwd=None) -> dict:
    env = dict(os.environ, COSIG_BENCH_NO_RMSE="1", **env_extra)
    backend = env.pop("COSIG_SWEEP_BACKEND", "wavefront")
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py", "--config", config,
         "--backend", backend, "--emit-details"],
        capture_output=True, text=True, timeout=2400, env=env,
        cwd=cwd or NEW_CWD,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        rec = {"error": (out.stderr or out.stdout)[-400:]}
    if "ms_per_frame" not in rec and "error" not in rec:
        rec["error"] = (out.stderr or out.stdout)[-400:] or "empty output"
    rec.update(label=label, env=env_extra, wall_s=round(time.time() - t0, 1),
               ts=time.strftime("%H:%M:%S"), code="r5")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    keys = ("ms_per_frame", "mrays_per_s", "compile_s", "image_mean")
    print(label, {k: rec.get(k) for k in keys}, flush=True)
    return rec


def main():
    lock = open(LOCK, "w")
    try:
        fcntl.flock(lock, fcntl.LOCK_EX | fcntl.LOCK_NB)
    except OSError:
        print("another sweep holds the lock — refusing to race the chip "
              "(r4 'large-occ-on' artifact); wait or kill it first",
              file=sys.stderr)
        sys.exit(3)
    for stage in sys.argv[1:] or ["wsel"]:
        if stage == "health":
            subprocess.run(
                [sys.executable, os.path.join("tools", "tpu_health.py")],
                cwd=REPO,
            )
            continue
        if stage == "hybverify":
            # Hardware bitwise gate for the depth-hybrid dispatch (runs
            # before the hybrid ABAB stage; bit-equality is timing-
            # independent, so any window quality is fine — it sits in
            # this queue only to serialize chip access with the sweeps).
            for cfg_name in ("glass_sphere", "large_mesh"):
                r = subprocess.run(
                    [sys.executable, os.path.join("tools", "hybrid_verify.py")],
                    env=dict(os.environ, COSIG_SS_CONFIG=cfg_name),
                    cwd=NEW_CWD,
                )
                with open(OUT, "a") as f:
                    f.write(json.dumps({
                        "label": f"hybverify-{cfg_name}", "rc": r.returncode,
                        "ts": time.strftime("%H:%M:%S"), "code": "r5",
                    }) + "\n")
                if r.returncode != 0:
                    sys.exit(r.returncode)
            continue
        if stage == "bench":
            subprocess.run(
                [sys.executable, "bench.py", "--all"], cwd=NEW_CWD,
            )
            # --all writes bench_details.json relative to its cwd; when
            # running from the frozen snapshot, publish it at the live
            # repo root (where BENCH_rN/the judge look for it).
            snap_details = os.path.join(NEW_CWD, "bench_details.json")
            if NEW_CWD != REPO and os.path.exists(snap_details):
                import shutil

                shutil.copy(snap_details,
                            os.path.join(REPO, "bench_details.json"))
            continue
        print(f"=== {stage} ===", flush=True)
        for label, config, env, cwd in STAGES[stage]:
            run_one(label, config, env, cwd)


if __name__ == "__main__":
    main()

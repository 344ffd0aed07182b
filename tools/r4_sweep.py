"""Round-4 same-window experiment sweep.

Runs bench.py in subprocesses (env knobs are read at import) and appends
one JSON line per run to tools/r4_sweep_results.jsonl. Rows within a
stage run back-to-back so comparisons stay same-window (CLAUDE.md tunnel
hazard #3); anchors are interleaved ABAB where the comparison matters.

Stages:
  anchor  — old (round-3 close, the .r3 worktree) vs new, interleaved
            ABAB on glass + large_mesh: the floor-cut verdict.
  floor   — fine floor attribution (delegates to stage_profile floor).
  group   — compaction GROUP sweep on glass (128/256/1024).
  largeK  — large_mesh: K64 anchor re-confirmation (round-3 decision 1
            caveat), VPU K128, MXU K64/K128 with the packed cut, and
            the Rb/Sb bounce-granularity rows (VERDICT #3).
  glassmx — full-MXU vs VPU re-confirmation on glass at shipped k
            (VERDICT #4b).

Usage: python tools/r4_sweep.py [anchor|floor|group|largeK|glassmx ...]
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(os.path.dirname(__file__), "r4_sweep_results.jsonl")
R3 = os.path.join(REPO, ".r3")  # round-3 close worktree (817ca4c)
# Frozen snapshot worktree for "new code" rows: live edits to the repo
# while a sweep is running broke a whole stage once (the bench
# subprocesses import whatever is on disk at row start). Create with
#   git worktree add .r4snap HEAD --detach   (refresh: git -C .r4snap
#   checkout --detach <commit>)
# and rows run there when it exists; REPO is the fallback.
SNAP = os.path.join(REPO, ".r4snap")
NEW_CWD = SNAP if os.path.isdir(SNAP) else REPO

# (label, config, env, cwd) — cwd None = repo (new code), R3 = old code.
STAGES = {
    "anchor": [
        ("glass-new-1", "glass_sphere", {}, None),
        ("glass-old-1", "glass_sphere", {}, R3),
        ("glass-new-2", "glass_sphere", {}, None),
        ("glass-old-2", "glass_sphere", {}, R3),
        ("large-new-1", "large_mesh", {}, None),
        ("large-old-1", "large_mesh", {}, R3),
        ("large-new-2", "large_mesh", {}, None),
        ("large-old-2", "large_mesh", {}, R3),
    ],
    "anchor-mirror": [
        ("mirror-new-1", "mirror_sphere", {}, None),
        ("mirror-old-1", "mirror_sphere", {}, R3),
        ("mirror-new-2", "mirror_sphere", {}, None),
        ("mirror-old-2", "mirror_sphere", {}, R3),
    ],
    "group": [
        ("glass-G128-1", "glass_sphere", {}, None),
        ("glass-G256", "glass_sphere", {"COSIG_WF_GROUP": "256"}, None),
        ("glass-G1024", "glass_sphere", {"COSIG_WF_GROUP": "1024"}, None),
        ("glass-G128-2", "glass_sphere", {}, None),
    ],
    "largeK": [
        ("large-K64-1", "large_mesh", {}, None),  # auto-k lands on 64
        ("large-K32", "large_mesh", {"COSIG_K": "32"}, None),
        ("large-K64-2", "large_mesh", {}, None),
        ("large-K128-vpu", "large_mesh", {"COSIG_K": "128"}, None),
        ("large-K128-mxu", "large_mesh",
         {"COSIG_K": "128", "COSIG_MXU": "1"}, None),
        ("large-K64-mxu", "large_mesh", {"COSIG_MXU": "1"}, None),
        ("large-K64-3", "large_mesh", {}, None),
        ("large-RbSb", "large_mesh",
         {"COSIG_WF_RB": "1024", "COSIG_WF_SB": "8"}, None),
        ("large-RbSb-frustum", "large_mesh",
         {"COSIG_WF_RB": "1024", "COSIG_WF_SB": "8",
          "COSIG_BOUNCE_FRUSTUM": "1"}, None),
        ("large-K64-4", "large_mesh", {}, None),
    ],
    # Tile-size sweep: fewer, bigger tiles amortize the per-traversal
    # fixed cost (flag DMA + scalar compaction, ~5.6 us each). R=8192's
    # round-2 regression was the (4,2) quad stretch, fixed by _quad_grid;
    # R=16384 widens sub-packets to 2048 lanes (S stays 8).
    "bigR": [
        ("glass-R4096-1", "glass_sphere", {}, None),
        ("glass-R8192", "glass_sphere", {"COSIG_WF_R": "8192"}, None),
        ("glass-R16384", "glass_sphere", {"COSIG_WF_R": "16384"}, None),
        ("glass-R4096-2", "glass_sphere", {}, None),
        ("large-R8192", "large_mesh", {"COSIG_WF_R": "8192"}, None),
        ("large-R16384", "large_mesh", {"COSIG_WF_R": "16384"}, None),
        ("large-R4096", "large_mesh", {}, None),
    ],
    # Shadow cluster set (cset_shadow): coarser any-hit cut.
    "shadowK": [
        ("glass-base-1", "glass_sphere", {}, None),
        ("glass-sh64", "glass_sphere", {"COSIG_K_SHADOW": "64"}, None),
        ("glass-sh128", "glass_sphere", {"COSIG_K_SHADOW": "128"}, None),
        ("glass-base-2", "glass_sphere", {}, None),
        ("large-base-1", "large_mesh", {}, None),
        ("large-sh128", "large_mesh", {"COSIG_K_SHADOW": "128"}, None),
        ("large-sh256", "large_mesh", {"COSIG_K_SHADOW": "256"}, None),
        ("large-base-2", "large_mesh", {}, None),
    ],
    "glassmx": [
        ("glass-vpu-1", "glass_sphere", {}, None),
        ("glass-mxu", "glass_sphere", {"COSIG_MXU": "1"}, None),
        ("glass-vpu-2", "glass_sphere", {}, None),
        ("glass-mxu-mixed", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}, None),
    ],
    # Bounce tile size under the selfskip default (snapshot >= 42ccdc3):
    # smaller Rb = finer dead-tile skip granularity (the SMEM alive
    # bitmap is per-Rb-tile) vs less per-traversal fixed-cost
    # amortization. Sb follows _subpackets_for (2048->4, 1024->2,
    # 512->1; sub-packet lanes stay >= 512).
    "ssRb": [
        ("glass-Rb4096-1", "glass_sphere", {}, None),
        ("glass-Rb2048", "glass_sphere", {"COSIG_WF_RB": "2048"}, None),
        ("glass-Rb1024", "glass_sphere", {"COSIG_WF_RB": "1024"}, None),
        ("glass-Rb512", "glass_sphere", {"COSIG_WF_RB": "512"}, None),
        ("glass-Rb4096-2", "glass_sphere", {}, None),
        ("large-Rb2048", "large_mesh", {"COSIG_WF_RB": "2048"}, None),
        ("large-Rb1024", "large_mesh", {"COSIG_WF_RB": "1024"}, None),
        ("large-Rb4096", "large_mesh", {}, None),
    ],
    # Bounce sub-packet width under selfskip+MXU (follow-up to ssRb):
    # Rb//Sb lanes per sub-packet — narrower sub-packets visit fewer
    # clusters per ray (less pair-test inflation) at more scalar
    # branches per visit. Round-3's Rb1024/Sb8 rejection predates the
    # MXU default and selfskip; re-test the middle of the range.
    "ssSb": [
        ("glass-Rb1024-Sb1-1", "glass_sphere", {"COSIG_WF_RB": "1024"}, None),
        ("glass-Rb1024-Sb2", "glass_sphere",
         {"COSIG_WF_RB": "1024", "COSIG_WF_SB": "2"}, None),
        ("glass-Rb1024-Sb4", "glass_sphere",
         {"COSIG_WF_RB": "1024", "COSIG_WF_SB": "4"}, None),
        ("glass-Rb512-Sb1", "glass_sphere",
         {"COSIG_WF_RB": "512", "COSIG_WF_SB": "1"}, None),
        ("glass-Rb1024-Sb1-2", "glass_sphere", {"COSIG_WF_RB": "1024"}, None),
        ("large-Rb1024-Sb1-1", "large_mesh", {"COSIG_WF_RB": "1024"}, None),
        ("large-Rb1024-Sb2", "large_mesh",
         {"COSIG_WF_RB": "1024", "COSIG_WF_SB": "2"}, None),
        ("large-Rb512-Sb1", "large_mesh",
         {"COSIG_WF_RB": "512", "COSIG_WF_SB": "1"}, None),
        ("large-Rb1024-Sb1-2", "large_mesh", {"COSIG_WF_RB": "1024"}, None),
    ],
    # Early-t cluster skip (COSIG_EARLYT; needs a snapshot at >= d9ac441):
    # front-to-back visit order + best-t dispatch skip — the reference's
    # pop-time early-out analog. Run tools/earlyt_verify.py (bitwise
    # gate) FIRST.
    "earlyt": [
        ("glass-et-off-1", "glass_sphere", {}, None),
        ("glass-et-on-1", "glass_sphere", {"COSIG_EARLYT": "1"}, None),
        ("glass-et-off-2", "glass_sphere", {}, None),
        ("glass-et-on-2", "glass_sphere", {"COSIG_EARLYT": "1"}, None),
        ("large-et-off-1", "large_mesh", {}, None),
        ("large-et-on-1", "large_mesh", {"COSIG_EARLYT": "1"}, None),
        ("large-et-on-2", "large_mesh", {"COSIG_EARLYT": "1"}, None),
        ("large-et-off-2", "large_mesh", {}, None),
    ],
    # Occlusion-saturation skip (COSIG_EARLYT_OCC; needs a snapshot with
    # the earlyt_occ kernel support): any-hit shadow visits skipped once
    # a sub-packet's active rays are all occluded. Run
    # tools/etocc_verify.py (bitwise gate) FIRST.
    "etocc": [
        ("glass-occ-off-1", "glass_sphere", {}, None),
        ("glass-occ-on-1", "glass_sphere", {"COSIG_EARLYT_OCC": "1"}, None),
        ("glass-occ-off-2", "glass_sphere", {}, None),
        ("glass-occ-on-2", "glass_sphere", {"COSIG_EARLYT_OCC": "1"}, None),
        ("large-occ-off-1", "large_mesh", {}, None),
        ("large-occ-on-1", "large_mesh", {"COSIG_EARLYT_OCC": "1"}, None),
        ("large-occ-on-2", "large_mesh", {"COSIG_EARLYT_OCC": "1"}, None),
        ("large-occ-off-2", "large_mesh", {}, None),
    ],
    # Self-skip bounce dispatch (COSIG_WF_SELFSKIP; needs a snapshot at
    # >= ac304d9): interleaved ABAB vs the compaction path on both
    # configs. Run tools/selfskip_verify.py (bitwise gate) FIRST.
    "selfskip": [
        ("glass-ss-off-1", "glass_sphere", {}, None),
        ("glass-ss-on-1", "glass_sphere", {"COSIG_WF_SELFSKIP": "1"}, None),
        ("glass-ss-off-2", "glass_sphere", {}, None),
        ("glass-ss-on-2", "glass_sphere", {"COSIG_WF_SELFSKIP": "1"}, None),
        ("large-ss-off-1", "large_mesh", {}, None),
        ("large-ss-on-1", "large_mesh", {"COSIG_WF_SELFSKIP": "1"}, None),
        ("large-ss-on-2", "large_mesh", {"COSIG_WF_SELFSKIP": "1"}, None),
        ("large-ss-off-2", "large_mesh", {}, None),
    ],
    # Megakernel (pallas backend) vs the wavefront flagship under the
    # round-4 defaults. Selfskip closed the sparsity gap between them
    # (both now skip dead work at ~1024-ray tile granularity), so the
    # megakernel's zero inter-stage HBM traffic could matter again —
    # but it has no MXU/early-t wiring yet, so this is its VPU floor.
    "mega": [
        ("glass-wf-1", "glass_sphere", {}, None),
        ("glass-mega-1", "glass_sphere", {"COSIG_SWEEP_BACKEND": "pallas"}, None),
        ("glass-wf-2", "glass_sphere", {}, None),
        ("large-wf-1", "large_mesh", {}, None),
        ("large-mega-1", "large_mesh", {"COSIG_SWEEP_BACKEND": "pallas"}, None),
        ("large-wf-2", "large_mesh", {}, None),
    ],
    # Stage decomposition of the glass frame under the round-4 defaults
    # (selfskip + MXU + auto-Rb): stub rows render WRONG images
    # (COSIG_BENCH_NO_RMSE is always set by run_one). cost(stage) =
    # full - row; "floor" = non-traversal non-shading remainder.
    "decomp": [
        ("glass-full-1", "glass_sphere", {}, None),
        ("glass-no-mt", "glass_sphere", {"COSIG_STUB": "mt"}, None),
        ("glass-no-trav", "glass_sphere", {"COSIG_STUB": "trav"}, None),
        ("glass-no-shadow", "glass_sphere", {"COSIG_STUB": "shadow"}, None),
        ("glass-no-shade", "glass_sphere", {"COSIG_STUB": "shade"}, None),
        ("glass-no-shvis", "glass_sphere", {"COSIG_STUB": "visit_anyhit"}, None),
        ("glass-floor", "glass_sphere", {"COSIG_STUB": "trav,shade"}, None),
        ("glass-full-2", "glass_sphere", {}, None),
        ("large-full-1", "large_mesh", {}, None),
        ("large-no-mt", "large_mesh", {"COSIG_STUB": "mt"}, None),
        ("large-no-trav", "large_mesh", {"COSIG_STUB": "trav"}, None),
        ("large-no-shadow", "large_mesh", {"COSIG_STUB": "shadow"}, None),
        ("large-full-2", "large_mesh", {}, None),
    ],
    # Remainder of etocc after a mid-stage interruption (glass rows +
    # large-occ-off-1 already recorded: occ LOSES on glass ~2.5 %).
    "etocc-large": [
        ("large-occ-on-1", "large_mesh", {"COSIG_EARLYT_OCC": "1"}, None),
        ("large-occ-off-2", "large_mesh", {}, None),
        ("large-occ-on-2", "large_mesh", {"COSIG_EARLYT_OCC": "1"}, None),
    ],
    # Cluster size re-test under the round-4 defaults: MXU pair tests
    # (4x VPU dot throughput) shrink the marginal cost of pair-work
    # inflation, and selfskip removed the compaction overhead — both
    # shift the K balance measured in rounds 2-3. COSIG_WF_RB pinned at
    # the shipped glass granularity where C_pad would otherwise flip the
    # auto-Rb rule and confound the comparison.
    "kmx": [
        ("glass-K32-1", "glass_sphere", {}, None),
        ("glass-K16", "glass_sphere", {"COSIG_K": "16", "COSIG_WF_RB": "1024"}, None),
        ("glass-K64", "glass_sphere", {"COSIG_K": "64"}, None),
        ("glass-K32-2", "glass_sphere", {}, None),
        ("large-K64-1", "large_mesh", {}, None),
        ("large-K32", "large_mesh", {"COSIG_K": "32"}, None),
        ("large-K64-2", "large_mesh", {}, None),
    ],
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
               ts=time.strftime("%H:%M:%S"),
               code="r3" if cwd == R3 else "r4")
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    keys = ("ms_per_frame", "mrays_per_s", "compile_s", "image_mean")
    print(label, {k: rec.get(k) for k in keys}, flush=True)
    return rec


def main():
    for stage in sys.argv[1:] or ["anchor"]:
        if stage == "floor":
            subprocess.run(
                [sys.executable, os.path.join("tools", "stage_profile.py"),
                 "floor", "glass_sphere"], cwd=REPO,
            )
            continue
        print(f"=== {stage} ===", flush=True)
        for label, config, env, cwd in STAGES[stage]:
            run_one(label, config, env, cwd)


if __name__ == "__main__":
    main()

"""Round-3 same-window experiment sweep.

Runs bench.py in subprocesses (one per setting — env knobs are read at
import) and appends one JSON line per run to tools/r3_sweep_results.jsonl.
Order within a stage is back-to-back so comparisons stay same-window
(CLAUDE.md tunnel hazard #3). Run only in a HEALTHY window
(tools/tpu_health.py).

Usage: python tools/r3_sweep.py [stageA|stageB|stageC|stageD|...]
"""

import json
import os
import subprocess
import sys
import time

OUT = os.path.join(os.path.dirname(__file__), "r3_sweep_results.jsonl")

# (label, config, env)
STAGES = {
    # Validation: compile-time drop + no perf regression on the new code.
    "stageA": [
        ("mirror-base", "mirror_sphere", {}),
        ("glass-base", "glass_sphere", {}),
    ],
    # Direction sweep on the cheapest multi-bounce config.
    # (mirror-base2 already recorded: 4.105 ms/frame, 11:40 window.)
    "stageB": [
        ("mirror-K16", "mirror_sphere", {"COSIG_K": "16"}),
        ("mirror-K8", "mirror_sphere", {"COSIG_K": "8"}),
        ("mirror-KP8", "mirror_sphere", {"COSIG_K_PRIMARY": "8"}),
        ("mirror-KP16", "mirror_sphere", {"COSIG_K_PRIMARY": "16"}),
        ("mirror-P2", "mirror_sphere", {"COSIG_PHASE2": "1"}),
        ("mirror-P2sh", "mirror_sphere", {"COSIG_PHASE2": "shadow"}),
        ("mirror-R8192", "mirror_sphere", {"COSIG_WF_R": "8192"}),
        ("mirror-SUBG", "mirror_sphere", {"COSIG_SUBG": "1"}),
        (
            "mirror-SUBG-RB",
            "mirror_sphere",
            {"COSIG_SUBG": "1", "COSIG_WF_RB": "1024", "COSIG_WF_SB": "8",
             "COSIG_BOUNCE_FRUSTUM": "1"},
        ),
    ],
    # Combinations of stageB winners (R8192 quads + subgroup/K16 + P2sh).
    "stageB2": [
        ("mirror-SUBG2", "mirror_sphere", {"COSIG_SUBG": "1"}),
        ("mirror-R8-K16", "mirror_sphere",
         {"COSIG_WF_R": "8192", "COSIG_K": "16"}),
        ("mirror-R8-SUBG", "mirror_sphere",
         {"COSIG_WF_R": "8192", "COSIG_SUBG": "1"}),
        ("mirror-R8-SUBG-P2sh", "mirror_sphere",
         {"COSIG_WF_R": "8192", "COSIG_SUBG": "1", "COSIG_PHASE2": "shadow"}),
        ("mirror-R8-K16-P2sh", "mirror_sphere",
         {"COSIG_WF_R": "8192", "COSIG_K": "16", "COSIG_PHASE2": "shadow"}),
        ("mirror-base3", "mirror_sphere", {}),
    ],
    "stageB3": [
        ("mirror-R8-P2sh", "mirror_sphere",
         {"COSIG_WF_R": "8192", "COSIG_PHASE2": "shadow"}),
        ("mirror-R8192b", "mirror_sphere", {"COSIG_WF_R": "8192"}),
    ],
    # large_mesh: bounce-stage granularity + cluster size (ABAB to cancel
    # tunnel drift).  (Renamed from stageC: the packed-cut stage below
    # shadowed this dict key — already-run rows are in the jsonl.)
    "stageC0": [
        ("large-base", "large_mesh", {}),
        (
            "large-RB1024",
            "large_mesh",
            {"COSIG_WF_RB": "1024", "COSIG_WF_SB": "8",
             "COSIG_BOUNCE_FRUSTUM": "1"},
        ),
        ("large-base2", "large_mesh", {}),
        ("large-K16", "large_mesh", {"COSIG_K": "16"}),
        ("large-base3", "large_mesh", {}),
    ],
    # Hardware stage decomposition at the current design point.
    "stageP": [
        ("glass-full", "glass_sphere", {}),
        ("glass-nomt", "glass_sphere", {"COSIG_STUB": "mt"}),
        ("glass-novisit", "glass_sphere", {"COSIG_STUB": "visit"}),
        ("glass-notrav", "glass_sphere", {"COSIG_STUB": "trav"}),
        ("glass-noshadow", "glass_sphere", {"COSIG_STUB": "shadow"}),
        ("glass-noshade", "glass_sphere", {"COSIG_STUB": "shade"}),
        ("large-full", "large_mesh", {}),
        ("large-nomt", "large_mesh", {"COSIG_STUB": "mt"}),
        ("large-novisit", "large_mesh", {"COSIG_STUB": "visit"}),
        ("large-notrav", "large_mesh", {"COSIG_STUB": "trav"}),
        ("large-noshadow", "large_mesh", {"COSIG_STUB": "shadow"}),
    ],
    # large_mesh-only decomposition (stageP minus the glass rows).
    "stagePL": [
        ("large-full", "large_mesh", {}),
        ("large-nomt", "large_mesh", {"COSIG_STUB": "mt"}),
        ("large-novisit", "large_mesh", {"COSIG_STUB": "visit"}),
        ("large-notrav", "large_mesh", {"COSIG_STUB": "trav"}),
        ("large-noshadow", "large_mesh", {"COSIG_STUB": "shadow"}),
        ("large-noshade", "large_mesh", {"COSIG_STUB": "shade"}),
    ],
    # Wide-tile experiment (separate from the K sweep below).
    "stageR": [
        ("large-base6", "large_mesh", {}),
        ("large-R16384", "large_mesh", {"COSIG_WF_R": "16384"}),
        ("large-base7", "large_mesh", {}),
        ("large-R8192", "large_mesh", {"COSIG_WF_R": "8192"}),
    ],
    # MXU traversal A/B (ABAB; COSIG_MXU defaults OFF until the TPU
    # miscompile is resolved — set it explicitly per run).
    "stageM": [
        ("glass-MXU0", "glass_sphere", {"COSIG_MXU": "0"}),
        ("glass-MXUc", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}),
        ("glass-MXU0b", "glass_sphere", {"COSIG_MXU": "0"}),
        ("glass-MXUcb", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}),
        ("large-MXU0", "large_mesh", {"COSIG_MXU": "0"}),
        ("large-MXUc", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}),
        ("large-MXU0b", "large_mesh", {"COSIG_MXU": "0"}),
        ("large-MXUcb", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}),
    ],
    # Full-MXU ABAB (post NaN-guard fix: every mxu_verify mode is OK).
    # Full mode = closest-hit AND any-hit shadow pair tests on the MXU;
    # the K128 rows add big-K clustering (quarters large_mesh's C_pad,
    # affordable only on the MXU per tools/mxu_mt_bench.py).
    "stageMF": [
        ("glass-MXU0", "glass_sphere", {"COSIG_MXU": "0"}),
        ("glass-MXUf", "glass_sphere", {"COSIG_MXU": "1"}),
        ("glass-MXU0b", "glass_sphere", {"COSIG_MXU": "0"}),
        ("glass-MXUfb", "glass_sphere", {"COSIG_MXU": "1"}),
        ("large-MXU0", "large_mesh", {"COSIG_MXU": "0"}),
        ("large-MXUf", "large_mesh", {"COSIG_MXU": "1"}),
        ("large-MXU0b", "large_mesh", {"COSIG_MXU": "0"}),
        ("large-MXUfb", "large_mesh", {"COSIG_MXU": "1"}),
        ("large-MXUf-K128", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_K": "128"}),
        ("large-MXUf-K64", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_K": "64"}),
    ],
    # Packed cluster cut ABAB (COSIG_LEAF_MULT=4 + COSIG_CLUSTER_PACK=1
    # are the defaults; the "old" rows force the round-2 cut). Host
    # model: pair slots -19..-27 %, per-ray bounce visits -22..-43 %,
    # C -25..-40 %. Bit-exact (test_cluster_cut_invariance).
    "stageC": [
        ("glass-packed", "glass_sphere", {}),
        ("glass-oldcut", "glass_sphere",
         {"COSIG_LEAF_MULT": "1", "COSIG_CLUSTER_PACK": "0"}),
        ("glass-packed2", "glass_sphere", {}),
        ("large-packed", "large_mesh", {}),
        ("large-oldcut", "large_mesh",
         {"COSIG_LEAF_MULT": "1", "COSIG_CLUSTER_PACK": "0"}),
        ("large-packed2", "large_mesh", {}),
    ],
    # Batched MXU visits ABAB (run only after tools/mxu_verify.py is
    # green for the matching mode): chunked gathered dots vs per-visit
    # dots, mixed mode, incl. the big-K combination the batched design
    # targets (K=128 quarters C_pad AND the batch fills the MXU).
    "stageMB": [
        ("glass-MXUc", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}),
        ("glass-MXUc-b4", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0", "COSIG_MXU_BATCH": "4"}),
        ("glass-MXUc2", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0"}),
        ("glass-MXUc-b8", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0", "COSIG_MXU_BATCH": "8"}),
        ("large-MXUc-K128", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0", "COSIG_K": "128"}),
        ("large-MXUc-K128-b4", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_MXU_SHADOW": "0", "COSIG_K": "128",
          "COSIG_MXU_BATCH": "4"}),
    ],
    # Upward cluster-size sweep (VPU path): bigger K quarters the bounce
    # stages' per-ray cull grid (large_mesh C_pad 1024 -> 256 at K=128),
    # the dominant large_mesh cost; MT per-visit cost doubles per K step
    # while visit counts roughly halve (host model in STATUS).
    "stageK": [
        ("large-K32", "large_mesh", {}),
        ("large-K64", "large_mesh", {"COSIG_K": "64"}),
        ("large-K32b", "large_mesh", {}),
        ("large-K128", "large_mesh", {"COSIG_K": "128"}),
        ("glass-K32", "glass_sphere", {}),
        ("glass-K64", "glass_sphere", {"COSIG_K": "64"}),
        ("glass-K32b", "glass_sphere", {}),
        ("glass-K128", "glass_sphere", {"COSIG_K": "128"}),
    ],
    # Cross granularity: bounce stages at big K (cheap per-ray culls),
    # primary at K=32 (its frustum cull is already cheap; keeps primary
    # MT pair work low). COSIG_K sets the bounce/base set, COSIG_K_PRIMARY
    # the primary-only set — mixing is exact (clustering-invariant fold).
    "stageKX": [
        ("large-K64-KP32", "large_mesh",
         {"COSIG_K": "64", "COSIG_K_PRIMARY": "32"}),
        ("large-K128-KP32", "large_mesh",
         {"COSIG_K": "128", "COSIG_K_PRIMARY": "32"}),
        ("glass-K64-KP32", "glass_sphere",
         {"COSIG_K": "64", "COSIG_K_PRIMARY": "32"}),
        ("glass-K128-KP32", "glass_sphere",
         {"COSIG_K": "128", "COSIG_K_PRIMARY": "32"}),
    ],
    # stageMF follow-up (12:00 window results: large MXUf 62.5 vs MXU0
    # 55.4; MXUf+K64 72.4 — the winner; glass MXUf flat). Combos around
    # the winner: batched visits on top of MXU+K64, VPU K64 attribution
    # row, glass batch rows (glass's flat MXU result suggests per-visit
    # overhead, which batching amortizes). ABAB anchors interleaved.
    "stageW": [
        ("large-MXU0-w", "large_mesh", {"COSIG_MXU": "0"}),
        ("large-MXUf-K64-w", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_K": "64"}),
        ("large-MXUf-K64-b4", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_K": "64", "COSIG_MXU_BATCH": "4"}),
        ("large-MXUf-K64-b8", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_K": "64", "COSIG_MXU_BATCH": "8"}),
        ("large-MXUf-b4", "large_mesh",
         {"COSIG_MXU": "1", "COSIG_MXU_BATCH": "4"}),
        ("large-K64-vpu", "large_mesh", {"COSIG_K": "64"}),
        ("glass-MXUf-b4", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_BATCH": "4"}),
        ("glass-MXUf-b8", "glass_sphere",
         {"COSIG_MXU": "1", "COSIG_MXU_BATCH": "8"}),
    ],
    # Packed-cut remainder (glass-packed already recorded 12:05).
    "stageC2": [
        ("glass-oldcut", "glass_sphere",
         {"COSIG_LEAF_MULT": "1", "COSIG_CLUSTER_PACK": "0"}),
        ("glass-packed2", "glass_sphere", {}),
        ("large-packed", "large_mesh", {}),
        ("large-oldcut", "large_mesh",
         {"COSIG_LEAF_MULT": "1", "COSIG_CLUSTER_PACK": "0"}),
        ("large-packed2", "large_mesh", {}),
    ],
    # Default-deciding sweep (14:30 window): K64 on the mid/small configs
    # (large-K64 won 247->184; glass/walls/mirror unknown), large K64
    # combos (P2sh on top of the winner), ABAB anchors interleaved.
    "stageZ": [
        ("glass-base-z", "glass_sphere", {}),
        ("glass-K64-z", "glass_sphere", {"COSIG_K": "64"}),
        ("glass-base-z2", "glass_sphere", {}),
        ("glass-K128-z", "glass_sphere", {"COSIG_K": "128"}),
        ("walls-base-z", "cosig_walls", {}),
        ("walls-K64-z", "cosig_walls", {"COSIG_K": "64"}),
        ("mirror-base-z", "mirror_sphere", {}),
        ("mirror-K64-z", "mirror_sphere", {"COSIG_K": "64"}),
        ("large-K64-z", "large_mesh", {"COSIG_K": "64"}),
        ("large-K64-P2sh-z", "large_mesh",
         {"COSIG_K": "64", "COSIG_PHASE2": "shadow"}),
        ("large-K64-KP32-z", "large_mesh",
         {"COSIG_K": "64", "COSIG_K_PRIMARY": "32"}),
    ],
    # Glass decomposition refresh at the current design point.
    "stagePG": [
        ("glass-full", "glass_sphere", {}),
        ("glass-nomt", "glass_sphere", {"COSIG_STUB": "mt"}),
        ("glass-novisit", "glass_sphere", {"COSIG_STUB": "visit"}),
        ("glass-notrav", "glass_sphere", {"COSIG_STUB": "trav"}),
        ("glass-noshadow", "glass_sphere", {"COSIG_STUB": "shadow"}),
        ("glass-noshade", "glass_sphere", {"COSIG_STUB": "shade"}),
    ],
    # Glass headline ABAB (drift-cancelling).
    "stageD": [
        ("glass-base2", "glass_sphere", {}),
        ("glass-R8192", "glass_sphere", {"COSIG_WF_R": "8192"}),
        ("glass-base3", "glass_sphere", {}),
        ("glass-P2sh", "glass_sphere", {"COSIG_PHASE2": "shadow"}),
        ("glass-base4", "glass_sphere", {}),
        (
            "glass-R8-P2sh",
            "glass_sphere",
            {"COSIG_WF_R": "8192", "COSIG_PHASE2": "shadow"},
        ),
        ("glass-base5", "glass_sphere", {}),
        ("glass-R16384", "glass_sphere", {"COSIG_WF_R": "16384"}),
    ],
}


def run_one(label: str, config: str, env_extra: dict) -> dict:
    # Skip the per-run oracle RMSE render: on a degraded tunnel its
    # compile+readback dominates each run, and every sweep knob is
    # separately gated bit-exact by tests.
    env = dict(os.environ, COSIG_BENCH_NO_RMSE="1", **env_extra)
    t0 = time.time()
    out = subprocess.run(
        [sys.executable, "bench.py", "--config", config,
         "--backend", "wavefront", "--emit-details"],
        capture_output=True, text=True, timeout=2400, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        rec = json.loads(line)
    except json.JSONDecodeError:
        rec = {"error": (out.stderr or out.stdout)[-400:]}
    rec.update(label=label, env=env_extra, wall_s=round(time.time() - t0, 1),
               ts=time.strftime("%H:%M:%S"))
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    keys = ("ms_per_frame", "mrays_per_s", "compile_s", "rmse_vs_oracle")
    print(label, {k: rec.get(k) for k in keys}, flush=True)
    return rec


def main():
    for stage in sys.argv[1:] or ["stageA"]:
        print(f"=== {stage} ===", flush=True)
        for label, config, env in STAGES[stage]:
            run_one(label, config, env)


if __name__ == "__main__":
    main()

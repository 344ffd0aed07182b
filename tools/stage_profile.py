"""Hardware stage decomposition + K sweep for the wavefront backend.

Runs bench.py in subprocesses (one per setting: env knobs are read at
import) and prints slope-timed ms/frame:

  stage mode:  full vs COSIG_STUB=mt (no pair tests) vs COSIG_STUB=visit
               (no visit loop): splits a frame into
               [MT pair work | visit-loop overhead | cull+DMA+compaction
               + ray-gen + shading + compaction-between-bounces].
  floor mode:  the round-4 fine attribution — shadow split (cull vs
               visits), shading, and the non-traversal floor split
               (compaction gather, untranspose, state I/O + ray-gen).
               Prints the raw rows first, then the derived attribution.
  k mode:      cluster size sweep (COSIG_K) at the shipping tile size.

Stub rows render WRONG images; every stub run sets COSIG_BENCH_NO_RMSE.

Usage (from /root/repo, healthy tunnel window — tools/tpu_health.py):
  python tools/stage_profile.py stages [config]
  python tools/stage_profile.py floor [config]
  python tools/stage_profile.py k [config] [K ...]
"""

import json
import os
import subprocess
import sys


def run_bench(config: str, env_extra: dict) -> dict:
    env = dict(os.environ, **env_extra)
    if "COSIG_STUB" in env_extra or "COSIG_WF_NOCOMPACT" in env_extra or (
        "COSIG_WF_NOUNT" in env_extra
    ):
        env.setdefault("COSIG_BENCH_NO_RMSE", "1")
    out = subprocess.run(
        [sys.executable, "bench.py", "--config", config,
         "--backend", "wavefront", "--emit-details"],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    line = out.stdout.strip().splitlines()[-1] if out.stdout.strip() else "{}"
    try:
        return json.loads(line)
    except json.JSONDecodeError:
        return {"error": (out.stderr or out.stdout)[-300:]}


FLOOR_SETTINGS = [
    # (name, env) — each removes one stage; cost(stage) = full - row.
    ("full", {}),
    ("no-shade", {"COSIG_STUB": "shade"}),
    ("no-shadow", {"COSIG_STUB": "shadow"}),
    ("no-sh-visits", {"COSIG_STUB": "visit_anyhit"}),
    ("no-sh-mt", {"COSIG_STUB": "mt_anyhit"}),
    ("no-mt", {"COSIG_STUB": "mt"}),
    ("no-visit", {"COSIG_STUB": "visit"}),
    ("no-trav", {"COSIG_STUB": "trav"}),
    ("floor", {"COSIG_STUB": "trav,shade"}),
    ("floor-nocompact", {"COSIG_STUB": "trav,shade", "COSIG_WF_NOCOMPACT": "1"}),
    ("floor-nount", {"COSIG_STUB": "trav,shade", "COSIG_WF_NOUNT": "1"}),
]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    config = sys.argv[2] if len(sys.argv) > 2 else "glass_sphere"
    if mode == "stages":
        settings = [("full", {}), ("no-mt", {"COSIG_STUB": "mt"}),
                    ("no-visit", {"COSIG_STUB": "visit"}),
                    ("no-trav", {"COSIG_STUB": "trav"}),
                    ("no-shadow", {"COSIG_STUB": "shadow"})]
    elif mode == "floor":
        settings = FLOOR_SETTINGS
    else:
        ks = sys.argv[3:] or ["16", "32", "48"]
        settings = [(f"K={k}", {"COSIG_K": k}) for k in ks]
    print("setting\tms_per_frame\tmrays_per_s\trmse")
    ms = {}
    for name, env in settings:
        r = run_bench(config, env)
        if "ms_per_frame" in r:
            ms[name] = r["ms_per_frame"]
            print(f"{name}\t{r['ms_per_frame']:.2f}\t{r['mrays_per_s']:.1f}"
                  f"\t{r.get('rmse_vs_oracle')}", flush=True)
        else:
            print(f"{name}\tFAILED\t{r.get('error', '?')}", flush=True)
    if mode == "floor" and "full" in ms:
        f = ms["full"]

        def cost(row):
            return f - ms[row] if row in ms else float("nan")

        print("\n-- derived attribution (ms of the full frame) --")
        print(f"frame                      {f:8.2f}")
        print(f"shading (lights loop)      {cost('no-shade'):8.2f}")
        print(f"shadow total               {cost('no-shadow'):8.2f}")
        print(f"  shadow visits+MT         {cost('no-sh-visits'):8.2f}")
        print(f"  shadow MT only           {cost('no-sh-mt'):8.2f}")
        sh_cull = ms.get("no-sh-visits", float("nan")) - ms.get(
            "no-shadow", float("nan"))
        print(f"  shadow cull+DMA+compact  {sh_cull:8.2f}")
        print(f"MT pair tests (all)        {cost('no-mt'):8.2f}")
        print(f"visit loops (all)          {cost('no-visit'):8.2f}")
        print(f"traversal (all)            {cost('no-trav'):8.2f}")
        if "floor" in ms:
            fl = ms["floor"]
            print(f"floor (no trav, no shade)  {fl:8.2f}")
            print(f"  compaction gather        {fl - ms.get('floor-nocompact', float('nan')):8.2f}")
            print(f"  final untranspose        {fl - ms.get('floor-nount', float('nan')):8.2f}")
            print(f"  state I/O + raygen + etc {ms.get('floor-nocompact', float('nan')) + ms.get('floor-nount', float('nan')) - fl:8.2f}")


if __name__ == "__main__":
    main()

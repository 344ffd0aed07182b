"""Hardware stage decomposition + K sweep for the wavefront backend.

Runs bench.py in subprocesses (one per setting: env knobs are read at
import) and prints slope-timed ms/frame:

  stage mode:  full vs COSIG_STUB=mt (no pair tests) vs COSIG_STUB=visit
               (no visit loop): splits a frame into
               [MT pair work | visit-loop overhead | cull+DMA+compaction
               + ray-gen + shading + compaction-between-bounces].
  k mode:      cluster size sweep (COSIG_K) at the shipping tile size.

Usage (from /root/repo, healthy tunnel window — tools/tpu_health.py):
  python tools/stage_profile.py stages [config]
  python tools/stage_profile.py k [config] [K ...]
"""

import json
import os
import subprocess
import sys


def run_bench(config: str, env_extra: dict) -> dict:
    env = dict(os.environ, **env_extra)
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


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "stages"
    config = sys.argv[2] if len(sys.argv) > 2 else "glass_sphere"
    if mode == "stages":
        settings = [("full", {}), ("no-mt", {"COSIG_STUB": "mt"}),
                    ("no-visit", {"COSIG_STUB": "visit"}),
                    ("no-trav", {"COSIG_STUB": "trav"}),
                    ("no-shadow", {"COSIG_STUB": "shadow"})]
    else:
        ks = sys.argv[3:] or ["16", "32", "48"]
        settings = [(f"K={k}", {"COSIG_K": k}) for k in ks]
    print("setting\tms_per_frame\tmrays_per_s\trmse")
    for name, env in settings:
        r = run_bench(config, env)
        if "ms_per_frame" in r:
            print(f"{name}\t{r['ms_per_frame']:.2f}\t{r['mrays_per_s']:.1f}"
                  f"\t{r.get('rmse_vs_oracle')}", flush=True)
        else:
            print(f"{name}\tFAILED\t{r.get('error', '?')}", flush=True)


if __name__ == "__main__":
    main()

"""Window-opportunistic runbook executor for the round-5 sweep.

The round-5 tunnel has been DEGRADED (~21,000-47,500 us/tile vs the
~200 workable baseline) for the whole session; ABAB rows taken in that
state measure pool contention, not the kernel (CLAUDE.md hazard #3).
Healthy windows appear unpredictably and may be short, so a human-in-
the-loop gate wastes them: this runner probes tpu_health on a loop and,
the moment a window is workable (< US_OK us/tile), executes the next
pending STATUS-runbook stage via tools/r5_sweep.py (which holds the
results-file lock per stage, so a concurrent manual sweep can't race).

Progress persists in tools/r5_autorun_state.json so the runner can be
killed/restarted without repeating completed stages. Each stage is
re-gated: one probe per stage, so a window that closes mid-queue stops
spending rows (in-stage drift is caught by the stage's own ABAB
anchors). The probe row itself is appended to the state file for the
measurement record.

Usage: nohup python tools/r5_autorun.py >> /tmp/r5_autorun.log 2>&1 &
"""
from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STATE = os.path.join(os.path.dirname(__file__), "r5_autorun_state.json")

# STATUS runbook priority order. `bench` (the --all refresh) runs last
# under whatever defaults are shipped at that moment — a stale-default
# refresh still beats round-3 numbers; it is re-run manually after any
# default flip.
# bench moved ahead of the attribution stages: with windows this scarce
# the decision stage (hybrid) and the --all refresh (VERDICT item 5)
# must land before the nice-to-have decompositions.
QUEUE = ["wsel", "d1", "mega", "wselK", "wselR", "bfrust", "etlarge",
         "occlarge", "hybverify", "hybrid", "bench", "depths", "bflarge",
         "floor"]
US_OK = 2000.0  # STATUS: anything under ~2,000 us/tile supports ABAB
# Bitwise-only stages are timing-independent (image equality, not ABAB);
# they only need a FUNCTIONAL tunnel, so let them use marginal windows
# the timing stages must reject — otherwise a bouncing tunnel starves
# the gates behind the sweeps.
STAGE_US_OK = {
    "hybverify": 60000.0,
    # The hybrid ABAB interleaves three off-anchors with the on rows, so
    # window drift is detectable IN the stage; with windows this scarce a
    # marginal (<8k) window with anchors beats no data. bench keeps the
    # strict gate — published numbers must come from a healthy window.
    "hybrid": 8000.0,
}
PROBE_TIMEOUT = 1200  # degraded probes have exceeded 300 s
SLEEP_S = 540


def load_state() -> dict:
    if os.path.exists(STATE):
        with open(STATE) as f:
            return json.load(f)
    return {"done": [], "probes": []}


def save_state(st: dict) -> None:
    with open(STATE, "w") as f:
        json.dump(st, f, indent=1)


def probe() -> float | None:
    """One tpu_health run -> us/tile, or None on timeout/parse failure."""
    try:
        out = subprocess.run(
            [sys.executable, os.path.join("tools", "tpu_health.py")],
            capture_output=True, text=True, timeout=PROBE_TIMEOUT, cwd=REPO,
        ).stdout
    except subprocess.TimeoutExpired:
        return None
    m = re.search(r"([\d.]+) us/tile", out or "")
    return float(m.group(1)) if m else None


def main() -> None:
    while True:
        st = load_state()
        pending = [s for s in QUEUE if s not in st["done"]]
        if not pending:
            print("all stages done", flush=True)
            return
        us = probe()
        st = load_state()  # probe is slow; a manual edit may have landed
        st["probes"].append(
            {"ts": time.strftime("%H:%M:%S"), "us_per_tile": us}
        )
        save_state(st)
        print(f"{time.strftime('%H:%M:%S')} probe: {us} us/tile "
              f"(pending: {pending})", flush=True)
        runnable = [
            s for s in pending
            if us is not None and us < STAGE_US_OK.get(s, US_OK)
        ]
        if runnable:
            stage = runnable[0]
            print(f"window OPEN -> running stage {stage}", flush=True)
            r = subprocess.run(
                [sys.executable, os.path.join("tools", "r5_sweep.py"), stage],
                cwd=REPO,
            )
            st = load_state()
            # Mark done even on failure (rc recorded) so a persistently
            # failing stage can't starve the rest of the queue; re-queue
            # manually by deleting it from the state file.
            st["done"].append(stage)
            st.setdefault("rc", {})[stage] = r.returncode
            save_state(st)
            continue  # immediately re-probe: use the window while it lasts
        time.sleep(SLEEP_S)


if __name__ == "__main__":
    main()

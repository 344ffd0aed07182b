"""Compiled-TPU A/B gate for the depth-hybrid bounce dispatch
(COSIG_WF_HYBRID_D): the hybrid image (selfskip depths < T, compaction
from T on) must be BIT-identical to the pure selfskip image — each
schedule is individually gated, state at the switch point is in pixel
order either way, and the compaction chain's first step covers the full
extent (trace_wavefront._HYBRID_D note). The compiled form additionally
exercises the cp_from>1 fori_loop + ladder switch on real Mosaic, which
the CPU interpret test cannot (it unrolls).

Usage (from /root/repo, TPU attached):

    python - < tools/hybrid_verify.py                 # glass-like frame
    COSIG_SS_CONFIG=large_mesh python - < tools/hybrid_verify.py
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile

# Runnable both as a script path and via stdin from /root/repo
# (CLAUDE.md): make tools/ importable either way.
sys.path.insert(0, os.path.join(os.getcwd(), "tools"))
try:
    _here = os.path.dirname(os.path.abspath(__file__))
    if _here not in sys.path:
        sys.path.insert(0, _here)
except NameError:
    pass  # stdin invocation: no __file__

from selfskip_verify import CHILD  # same reduced-frame child program


def run(env_extra: dict, out: str) -> str:
    env = dict(os.environ, **env_extra)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, out],
        capture_output=True, text=True, timeout=3000, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if r.returncode != 0:
        print(f"--- {env_extra} FAILED ---\n{r.stderr[-2000:]}")
        sys.exit(1)
    return r.stdout.strip()


def main():
    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        base = os.path.join(td, "base.npy")
        print("hybrid off:", run({}, base), flush=True)
        ia = np.load(base)
        ok = True
        for t in ("2", "3"):
            p = os.path.join(td, f"hyb{t}.npy")
            print(f"hybrid T={t}:", run({"COSIG_WF_HYBRID_D": t}, p),
                  flush=True)
            ib = np.load(p)
            eq = bool((ia == ib).all())
            ok &= eq
            print(f"T={t} bitwise-equal:", eq,
                  "" if eq else f"(max |d| = {np.abs(ia - ib).max()})")
        sys.exit(0 if ok else 2)


if __name__ == "__main__":
    main()

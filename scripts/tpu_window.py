#!/usr/bin/env python
"""One-shot TPU-window driver for the flat-gate miscompile investigation.

Round-2 context (benchmarks/NOTES.md "round 2"): the flat desc/NCC gate
layout measured 1.821 fps, but a later stage-count probe on the SAME
cached executable showed the cascade empty on TPU (second silent
miscompile incident), and the backend went UNAVAILABLE before a bisect
was possible. This script packs the whole investigation into a single
solo TPU session (never run other TPU work concurrently):

  1. CPU-vs-TPU cascade parity with gate_layout=flat (the default)
  2. CPU-vs-TPU cascade parity with gate_layout=dense (the fallback)
  3. bench.py (has its own collapsed-workload guard)

Decision table printed at the end:
  flat ok              -> keep flat default, trust the bench number
  flat bad, dense ok   -> the flat formulation miscompiles: flip the
                          default to dense and re-bench
  both bad             -> compiler/environment drift, not our change
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe_backend(timeout_s: int = 90) -> bool:
    r = subprocess.run(
        [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        capture_output=True, text=True, timeout=timeout_s + 5, cwd=REPO)
    return r.returncode == 0


def run_parity(layout: str) -> bool:
    print(f"=== parity check: gate_layout={layout} ===", flush=True)
    r = subprocess.run(
        [sys.executable, "scripts/check_tpu_parity.py", f"--layout={layout}"],
        cwd=REPO, text=True, capture_output=True, timeout=5400)
    print(r.stdout)
    if r.returncode not in (0, 1):
        print(r.stderr[-1500:])
    return r.returncode == 0


def run_bench() -> dict:
    print("=== bench.py ===", flush=True)
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, text=True,
                       capture_output=True, timeout=5400)
    print(r.stdout)
    print(r.stderr[-500:], file=sys.stderr)
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return {}


def main() -> int:
    try:
        if not probe_backend():
            print("TPU backend unavailable - aborting (no state changed)")
            return 2
    except subprocess.TimeoutExpired:
        print("TPU backend probe hung - backend still down")
        return 2

    flat_ok = run_parity("flat")
    dense_ok = run_parity("dense")
    print(f"\nparity: flat={'OK' if flat_ok else 'FAILED'} "
          f"dense={'OK' if dense_ok else 'FAILED'}")
    if flat_ok:
        print("verdict: flat layout compiles correctly today -> bench below "
              "is trustworthy with the flat default")
    elif dense_ok:
        print("verdict: FLAT FORMULATION MISCOMPILES -> flip "
              "VOConfig.gate_layout default to 'dense' and re-bench")
        os.environ["_VO_BENCH_LAYOUT"] = "dense"
    else:
        print("verdict: both layouts diverge -> compiler/environment drift; "
              "do not trust TPU numbers this window")
        return 1

    bench = run_bench()
    print("bench:", json.dumps(bench))
    return 0


if __name__ == "__main__":
    sys.exit(main())

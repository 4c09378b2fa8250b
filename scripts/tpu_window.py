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
  3. bench.py (has its own collapsed-workload guard + dense fallback)
  4. with --ablate: the config-probe ablation sweep
     (benchmarks/profile_stages.py --ablate) to direct the next
     optimization - only composed-step timings are trustworthy on the
     remote-compile platform, so this is the profile to use.

Everything is tee'd to benchmarks/tpu_window_results.log so the outcome
survives a session death mid-window.

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
LOG = os.path.join(REPO, "benchmarks", "tpu_window_results.log")


def tee(msg: str) -> None:
    print(msg, flush=True)
    with open(LOG, "a") as f:
        f.write(msg + "\n")


def probe_backend(timeout_s: int = 90) -> bool:
    r = subprocess.run(
        [sys.executable, "-c", "import jax; print(len(jax.devices()))"],
        capture_output=True, text=True, timeout=timeout_s + 5, cwd=REPO)
    return r.returncode == 0


def run_parity(layout: str) -> bool:
    tee(f"=== parity check: gate_layout={layout} ===")
    r = subprocess.run(
        [sys.executable, "scripts/check_tpu_parity.py", f"--layout={layout}"],
        cwd=REPO, text=True, capture_output=True, timeout=5400)
    tee(r.stdout)
    if r.returncode not in (0, 1):
        tee(r.stderr[-1500:])
    return r.returncode == 0


def run_bench() -> dict:
    tee("=== bench.py ===")
    r = subprocess.run([sys.executable, "bench.py"], cwd=REPO, text=True,
                       capture_output=True, timeout=5400)
    tee(r.stdout)
    print(r.stderr[-500:], file=sys.stderr)
    for line in reversed(r.stdout.strip().splitlines()):
        try:
            return json.loads(line)
        except ValueError:
            continue
    return {}


def run_ablation() -> None:
    tee("=== ablation sweep (composed-step config probes) ===")
    r = subprocess.run(
        [sys.executable, "benchmarks/profile_stages.py", "--ablate"],
        cwd=REPO, text=True, capture_output=True, timeout=7200)
    tee(r.stdout)
    if r.returncode != 0:
        tee("ablation FAILED: " + r.stderr[-1500:])


def main() -> int:
    import datetime
    with open(LOG, "a") as f:
        f.write(f"\n==== TPU window {datetime.datetime.now().isoformat()} "
                f"(git {subprocess.run(['git', 'rev-parse', '--short', 'HEAD'], cwd=REPO, capture_output=True, text=True).stdout.strip()}) ====\n")
    try:
        if not probe_backend():
            print("TPU backend unavailable - aborting (no state changed)")
            return 2
    except subprocess.TimeoutExpired:
        print("TPU backend probe hung - backend still down")
        return 2

    flat_ok = run_parity("flat")
    dense_ok = run_parity("dense")
    tee(f"\nparity: flat={'OK' if flat_ok else 'FAILED'} "
        f"dense={'OK' if dense_ok else 'FAILED'}")
    if flat_ok:
        tee("verdict: flat layout compiles correctly today -> bench below "
            "is trustworthy with the flat default")
    elif dense_ok:
        tee("verdict: FLAT FORMULATION MISCOMPILES -> flip "
            "VOConfig.gate_layout default to 'dense' and re-bench")
        os.environ["_VO_BENCH_LAYOUT"] = "dense"
    else:
        tee("verdict: both layouts diverge -> compiler/environment drift; "
            "do not trust TPU numbers this window")
        return 1

    bench = run_bench()
    tee("bench: " + json.dumps(bench))
    if "--ablate" in sys.argv:
        run_ablation()
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""One-shot TPU-window driver: parity gates, bench, optional ablation.

History (benchmarks/NOTES.md): the remote TPU compiler has silently
miscompiled cascade stages three times. Round 2's failure was invisible
to the small parity configuration (240x320, reduced budgets — it PASSED
in the same window where bench's flat run collapsed) because the
miscompile onsets only at production shapes. The verdict below therefore
gates on the PRODUCTION-shape parity run (376x1241, unmodified VOConfig,
the exact bench workload): a bench number is only "trustworthy" if the
very configuration bench times diffs clean against the CPU backend.

Order of operations (never run other TPU work concurrently):

  1. CPU-vs-TPU parity, small config, default layout   (fast tripwire)
  2. CPU-vs-TPU parity, PRODUCTION config, default layout  (the gate)
  3. bench.py (has its own collapsed-workload guard + dense fallback)
  4. with --ablate: the config-probe ablation sweep
     (benchmarks/profile_stages.py --ablate) to direct the next
     optimization - only composed-step timings are trustworthy on the
     remote-compile platform, so this is the profile to use.

Everything is tee'd to benchmarks/tpu_window_results.log so the outcome
survives a session death mid-window.
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


def run_parity(layout: str = None, prod: bool = False) -> bool:
    label = "prod" if prod else "small"
    tee(f"=== parity check ({label}): gate_layout={layout or 'default'} ===")
    cmd = [sys.executable, "scripts/check_tpu_parity.py"]
    if layout:
        cmd.append(f"--layout={layout}")
    if prod:
        cmd.append("--prod")
    r = subprocess.run(cmd, cwd=REPO, text=True, capture_output=True,
                       timeout=7200)
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

    small_ok = run_parity()
    prod_ok = run_parity(prod=True)
    tee(f"\nparity: small={'OK' if small_ok else 'FAILED'} "
        f"prod={'OK' if prod_ok else 'FAILED'}")
    if prod_ok:
        tee("verdict: default layout diffs clean vs CPU AT BENCH SHAPES "
            "-> the bench number below is trustworthy")
    else:
        tee("verdict: PRODUCTION-SHAPE MISCOMPILE with the default layout"
            + (" (small parity also failed -> likely environment drift)"
               if not small_ok else
               " (small parity passed -> shape/fusion-dependent, as in "
               "rounds 2-3)")
            + "; bench will self-heal to dense if the default is not "
            "dense, but treat any number below as provisional")

    bench = run_bench()
    tee("bench: " + json.dumps(bench))
    if not prod_ok and "note" not in bench and "error" not in bench:
        tee("WARNING: prod parity failed yet bench reported without a "
            "fallback note - investigate before recording this number")
    if "--ablate" in sys.argv:
        run_ablation()
    return 0 if prod_ok else 1


if __name__ == "__main__":
    sys.exit(main())

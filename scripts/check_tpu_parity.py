#!/usr/bin/env python
"""CPU-vs-TPU cascade parity check: the silent-miscompile detector.

Three times in this project's history the remote TPU compiler silently
broke a stage of the stereo cascade while CPU results stayed correct
(round 1: einsum constant folding zeroed the epipolar gates; round 2:
a collapse first blamed on scatter UB; round 3: a fusion-context
miscompile of the flat stage-4 descriptor gate at production shapes -
see benchmarks/NOTES.md). Every CPU test passes in all three cases; only
CPU-vs-TPU diffs of the per-stage survival counts reveal the damage.

This script runs a synthetic frame pair through the FULL stereo +
temporal steps on both backends and diffs the per-stage counts and final
outputs, in one or both of two configurations:

  small (default): 240x320, reduced budgets - fast smoke parity.
  --prod: 376x1241 (KITTI resolution), UNMODIFIED VOConfig defaults, the
     exact bench.py synthetic frames. Round 2's collapse was invisible to
     the small configuration (capacities never bind at 240x320) and
     onset exactly at production shapes - a "trustworthy" verdict for a
     bench number must come from THIS configuration
     (scripts/tpu_window.py gates on it).

Usage (from the repo root, on a host with the TPU attached):
    python scripts/check_tpu_parity.py [--prod] [--layout=flat|dense|...]

Exit code 0 = backends agree; 1 = divergence (prints the first stage
that differs). The child processes select their backend via the
_VO_PARITY_BACKEND env var (sitecustomize pre-imports jax, so the
selection must be a jax.config.update, not an env var).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_backend(backend: str, layout: str = None, prod: bool = False) -> dict:
    env = dict(os.environ)
    env["_VO_PARITY_BACKEND"] = backend
    if layout:
        env["_VO_PARITY_LAYOUT"] = layout
    if prod:
        env["_VO_PARITY_PROD"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    out = subprocess.run([sys.executable, os.path.abspath(__file__),
                          "--child"], env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=5400)
    if out.returncode != 0:
        raise RuntimeError(f"{backend} child failed:\n{out.stderr[-2000:]}")
    return json.loads(out.stdout.strip().splitlines()[-1])


def child() -> int:
    sys.path.insert(0, REPO)
    backend = os.environ["_VO_PARITY_BACKEND"]
    import jax
    if backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.models import pipeline as PL

    if os.environ.get("_VO_PARITY_PROD"):
        # the bench.py workload: KITTI resolution, UNMODIFIED defaults
        seq = S.make_sequence(n_frames=2, h=376, w=1241)
        cfg = VOConfig()
    else:
        seq = S.make_sequence(n_frames=2, h=240, w=320)
        cfg = dataclasses.replace(
            VOConfig(), max_edges=8192, max_mates=4096,
            max_refine_pairs=16384, max_gate_pairs=65536,
            max_pose_quads=4096)
    layout = os.environ.get("_VO_PARITY_LAYOUT")
    if layout:
        cfg = dataclasses.replace(cfg, gate_layout=layout)
    sstep = PL.build_stereo_step(seq.rig, cfg, has_gt=False)
    tstep = PL.build_temporal_step(seq.rig, cfg, use_gt=False)
    kf = sstep(jnp.asarray(seq.frames[0].left),
               jnp.asarray(seq.frames[0].right))
    cf = sstep(jnp.asarray(seq.frames[1].left),
               jnp.asarray(seq.frames[1].right))
    I = jnp.eye(3, dtype=jnp.float32)
    z = jnp.zeros((3,), jnp.float32)
    # bootstrap-then-predict (see bench.py): the diffed temporal counts
    # come from the steady-state prediction-centered workload. Both legs
    # feed the prediction from their own bootstrap estimate; CPU-vs-TPU
    # pose agreement is part of what parity checks, and a diverged boot
    # pose would surface as (intended) count divergence downstream.
    tr_b = tstep(kf.mates, kf.frame, cf.mates, cf.frame, I, z, jnp.int32(0))
    tr = tstep(kf.mates, kf.frame, cf.mates, cf.frame, tr_b.R, tr_b.t,
               jnp.int32(0))
    n = int(kf.mates.count)
    lx = np.asarray(kf.mates.left_x)[:n]
    print(json.dumps({
        "backend": backend,
        "edges": [int(kf.n_left_edges), int(kf.n_right_edges)],
        "stereo_pairs": [int(r[1]) for r in np.asarray(kf.stereo_metrics)],
        "temporal_pairs": [int(r[1])
                           for r in np.asarray(tr.temporal_metrics)],
        "mates": n,
        "quads": int(tr.n_quads),
        "inlier_ratio": round(float(tr.inlier_ratio), 4),
        "mate_x_sum": round(float(lx.sum()), 1),
    }))
    return 0


def diff(cpu: dict, tpu: dict) -> bool:
    print("cpu:", json.dumps(cpu))
    print("tpu:", json.dumps(tpu))
    ok = True
    # a == b must count as equal BEFORE any ratio test: min > r*max is
    # False at (0, 0), which would misreport a symmetric collapse on BOTH
    # backends as CPU-vs-TPU divergence and misdirect the bisect (ADVICE
    # r3). Flag both-zero separately as a workload collapse.
    for key in ("mates", "quads"):
        if cpu[key] == 0 and tpu[key] == 0:
            print(f"WORKLOAD COLLAPSED on both backends at {key} "
                  "(not a backend divergence)")
            ok = False
    for key in ("edges", "mates", "quads"):
        a, b = cpu[key], tpu[key]
        if key == "edges":
            # f32 NMS threshold ties flip O(1) edges between backends at
            # production shapes (measured: 24184 vs 24185); require a
            # tight ratio rather than exact equality
            same = all(x == y or min(x, y) > 0.998 * max(x, y)
                       for x, y in zip(a, b))
        else:
            same = a == b or min(a, b) > 0.97 * max(a, b)
        if not same:
            print(f"DIVERGENCE at {key}: cpu={a} tpu={b}")
            ok = False
    for key in ("stereo_pairs", "temporal_pairs"):
        for i, (a, b) in enumerate(zip(cpu[key], tpu[key])):
            if min(a, b) < 0.95 * max(a, b) - 5:
                print(f"DIVERGENCE at {key}[{i}]: cpu={a} tpu={b}")
                ok = False
                break
    return ok


def main() -> int:
    layout = None
    prod = "--prod" in sys.argv
    for a in sys.argv[1:]:
        if a.startswith("--layout="):
            layout = a.split("=", 1)[1]
    label = "prod 376x1241/full-defaults" if prod else "small 240x320"
    print(f"configuration: {label}, layout={layout or 'default'}")
    cpu = run_backend("cpu", layout, prod)
    tpu = run_backend("tpu", layout, prod)
    ok = diff(cpu, tpu)
    print("PARITY OK" if ok else "PARITY FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(child() if "--child" in sys.argv else main())

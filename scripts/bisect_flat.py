#!/usr/bin/env python
"""Bisect harness for the flat-gate TPU collapse at production shapes.

BENCH_r02 showed gate_layout=flat collapsing (mates=0, quads=0) at
376x1241 with default budgets on TPU while the dense layout works and
while small-shape parity (240x320, reduced budgets) passes for BOTH
layouts. This script runs the stereo (+ optional temporal) step at an
arbitrary shape with arbitrary VOConfig overrides and prints the
per-stage survival counts, so the failure can be bisected by shape,
budget, and stage.

Usage:
    python scripts/bisect_flat.py --layout=flat --set max_gate_pairs=65536
    python scripts/bisect_flat.py --layout=dense --h=240 --w=320
    JAX_PLATFORMS=cpu python scripts/bisect_flat.py ...   # CPU oracle
"""

import argparse
import dataclasses
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layout", default="flat")
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--frame", type=int, default=0,
                    help="synthetic frame index to run (0..2)")
    ap.add_argument("--temporal", action="store_true",
                    help="also run the temporal step (frames 0->1)")
    ap.add_argument("--set", action="append", default=[],
                    metavar="KEY=VALUE", help="VOConfig field override")
    ap.add_argument("--blur", type=int, default=0,
                    help="host-side box-blur passes on the input frames: "
                    "reduces the edge count WITHOUT changing the compiled "
                    "program (shape/config identical) - separates "
                    "data-dependent failures from compile-dependent ones")
    ap.add_argument("--blank_frac", type=float, default=0.0,
                    help="blank this fraction of image columns (host-side; "
                    "same compiled program, fewer edges)")
    ap.add_argument("--backend", default=None, choices=["cpu", "tpu"],
                    help="force a backend (sitecustomize pre-imports jax, "
                    "so JAX_PLATFORMS env has no effect; this uses "
                    "jax.config.update)")
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    import numpy as np

    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.models import pipeline as PL

    overrides = {"gate_layout": args.layout}
    for kv in args.set:
        k, v = kv.split("=", 1)
        field = {f.name: f for f in dataclasses.fields(VOConfig)}[k]
        overrides[k] = (
            int(v) if field.type == "int" else
            float(v) if field.type == "float" else
            v.lower() in ("1", "true") if field.type == "bool" else v)
    cfg = dataclasses.replace(VOConfig(), **overrides)

    seq = S.make_sequence(n_frames=3, h=args.h, w=args.w)

    def prep(img):
        a = np.asarray(img, np.float32)
        for _ in range(args.blur):
            a = (a
                 + np.roll(a, 1, 0) + np.roll(a, -1, 0)
                 + np.roll(a, 1, 1) + np.roll(a, -1, 1)) / 5.0
        if args.blank_frac > 0:
            w0 = int(a.shape[1] * (1.0 - args.blank_frac))
            a[:, w0:] = a[:, w0:w0 + 1]
        return a

    sstep = PL.build_stereo_step(seq.rig, cfg, has_gt=False)
    f = seq.frames[args.frame]
    out = jax.block_until_ready(
        sstep(jnp.asarray(prep(f.left)), jnp.asarray(prep(f.right))))
    rec = {
        "backend": jax.default_backend(),
        "layout": args.layout,
        "shape": [args.h, args.w],
        "edges": [int(out.n_left_edges), int(out.n_right_edges)],
        "stereo_pairs": [int(r[1]) for r in np.asarray(out.stereo_metrics)],
        "stereo_rows": [int(r[0]) for r in np.asarray(out.stereo_metrics)],
        "mates": int(out.mates.count),
    }
    if args.temporal:
        cf = jax.block_until_ready(sstep(jnp.asarray(seq.frames[1].left),
                                         jnp.asarray(seq.frames[1].right)))
        tstep = PL.build_temporal_step(seq.rig, cfg, use_gt=False)
        I = jnp.eye(3, dtype=jnp.float32)
        z = jnp.zeros((3,), jnp.float32)
        tr = jax.block_until_ready(tstep(out.mates, out.frame, cf.mates,
                                         cf.frame, I, z, jnp.int32(42)))
        rec["mates_cf"] = int(cf.mates.count)
        rec["quads"] = int(tr.n_quads)
        rec["inlier_ratio"] = round(float(tr.inlier_ratio), 4)
        rec["temporal_pairs"] = [int(r[1])
                                 for r in np.asarray(tr.temporal_metrics)]
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""Capture a jax.profiler device trace of the production stereo+temporal
steps at KITTI resolution, and print the top-k device ops by total time
(parsed from the trace protobuf via the tensorboard plugin if available,
else just leaves the trace dir for manual inspection).

Usage: python benchmarks/trace_steps.py [--outdir /tmp/jtrace]
"""
import argparse
import glob
import gzip
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/jtrace")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.models import pipeline as PL

    cfg = VOConfig()
    seq = S.make_sequence(n_frames=2, h=376, w=1241)
    sstep = PL.build_stereo_step(seq.rig, cfg, has_gt=False)
    tstep = PL.build_temporal_step(seq.rig, cfg, use_gt=False)
    l0 = jnp.asarray(seq.frames[0].left)
    r0 = jnp.asarray(seq.frames[0].right)
    l1 = jnp.asarray(seq.frames[1].left)
    r1 = jnp.asarray(seq.frames[1].right)
    I = jnp.eye(3, dtype=jnp.float32)
    z = jnp.zeros((3,), jnp.float32)
    kf = jax.block_until_ready(sstep(l0, r0))
    cf = jax.block_until_ready(sstep(l1, r1))
    trb = jax.block_until_ready(tstep(kf.mates, kf.frame, cf.mates,
                                      cf.frame, I, z, jnp.int32(0)))
    jax.block_until_ready(tstep(kf.mates, kf.frame, cf.mates, cf.frame,
                                trb.R, trb.t, jnp.int32(0)))

    with jax.profiler.trace(args.outdir):
        cf2 = sstep(l1, r1)
        tr = tstep(kf.mates, kf.frame, cf2.mates, cf2.frame,
                   trb.R, trb.t, jnp.int32(1))
        jax.block_until_ready(tr)

    print("trace written to", args.outdir, file=sys.stderr)
    # summarize: find trace.json.gz (host+device events)
    paths = glob.glob(os.path.join(
        args.outdir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print(json.dumps({"ok": False, "note": "no trace.json.gz found"}))
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # device op events carry 'dur' (us) and names; aggregate by name prefix
    agg = {}
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        pid_name = e.get("pid")
        name = e.get("name", "")
        agg.setdefault(name, [0, 0.0])
        agg[name][0] += 1
        agg[name][1] += e["dur"] / 1e3   # ms
    top = sorted(agg.items(), key=lambda kv: -kv[1][1])[:40]
    for name, (n, ms) in top:
        print(f"{ms:9.2f} ms  x{n:<5d} {name[:110]}")


if __name__ == "__main__":
    main()

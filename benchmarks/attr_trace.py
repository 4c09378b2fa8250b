#!/usr/bin/env python
"""Join a device trace (trace_steps.py output dir) with the compiled HLO's
op_name metadata: per-op durations attributed to SOURCE LINES instead of
opaque fusion names. Usage:
    python benchmarks/attr_trace.py --tracedir /tmp/jtrace_r5 [--top 40]
Compiles (cache-served) the same two production step programs to fetch
their optimized HLO text, maps %fusion.N -> metadata op_name, then
aggregates trace durations by source location.
"""
import argparse
import glob
import gzip
import json
import os
import re
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")


def hlo_op_sources(hlo_text):
    """fusion/while/op name -> op_name metadata (jax source scope)."""
    out = {}
    for m in re.finditer(
            r"%?([\w.\-]+) = [^\n]*?metadata={[^}]*?op_name=\"([^\"]+)\"",
            hlo_text):
        out[m.group(1)] = m.group(2)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tracedir", default="/tmp/jtrace_r5")
    ap.add_argument("--top", type=int, default=45)
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
    l1 = jnp.asarray(seq.frames[1].left)
    r1 = jnp.asarray(seq.frames[1].right)
    kf = sstep(jnp.asarray(seq.frames[0].left),
               jnp.asarray(seq.frames[0].right))
    I = jnp.eye(3, dtype=jnp.float32)
    z = jnp.zeros((3,), jnp.float32)

    # fetch optimized HLO of both programs (compile is cache-served)
    s_lowered = jax.jit(lambda a, b: sstep(a, b)).lower(l1, r1)
    s_hlo = s_lowered.compile().as_text()
    cf = sstep(l1, r1)
    t_lowered = jax.jit(
        lambda *a: tstep(*a)).lower(kf.mates, kf.frame, cf.mates, cf.frame,
                                    I, z, jnp.int32(0))
    t_hlo = t_lowered.compile().as_text()

    maps = [hlo_op_sources(s_hlo), hlo_op_sources(t_hlo)]

    paths = glob.glob(os.path.join(
        args.tracedir, "plugins/profile/*/*.trace.json.gz"))
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    steps = [e for e in events
             if e.get("name", "").startswith("jit_step")
             and e.get("ph") == "X"]
    steps.sort(key=lambda e: e["ts"])
    spans = [(e["ts"], e["ts"] + e["dur"], e["name"]) for e in steps]

    def which(ts):
        for i, (d0, d1, n) in enumerate(spans):
            if d0 <= ts <= d1:
                return i
        return -1

    # NOTE: trace step order is stereo-first (trace_steps.py runs sstep then
    # tstep inside the trace); map span 0 -> stereo hlo, 1 -> temporal.
    aggs = [defaultdict(lambda: [0, 0.0]) for _ in spans]
    unknown = [defaultdict(lambda: [0, 0.0]) for _ in spans]
    for e in events:
        if e.get("ph") != "X" or "args" not in e:
            continue
        a = e["args"]
        if "hlo_category" not in a:
            continue
        if a["hlo_category"] in ("while", "conditional"):
            continue                      # containers (double-counted)
        i = which(e["ts"])
        if i < 0:
            continue
        name = e.get("name", "")
        src = maps[i].get(name) or maps[i].get(name.split(".clone")[0])
        if src is None:
            d = unknown[i][a["hlo_category"] + " " + name.split(".")[0]]
        else:
            # keep the trailing jax scope (most specific source op)
            d = aggs[i][src]
        d[0] += 1
        d[1] += e["dur"] / 1e3

    for i, (d0, d1, n) in enumerate(spans):
        label = ["STEREO", "TEMPORAL"][i] if i < 2 else n
        print("=" * 20, label, round((d1 - d0) / 1e3), "ms")
        rows = sorted(aggs[i].items(), key=lambda kv: -kv[1][1])[:args.top]
        for src, (cnt, ms) in rows:
            print(f"  {ms:8.1f} ms x{cnt:<6d} {src[-140:]}")
        urows = sorted(unknown[i].items(), key=lambda kv: -kv[1][1])[:8]
        if urows:
            print("  -- unattributed --")
            for k, (cnt, ms) in urows:
                print(f"  {ms:8.1f} ms x{cnt:<6d} {k}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""AOT-compile the production-shape device programs on the REAL TPU and
print XLA's per-device memory analysis - the honest check for the
mates<->HBM tension (round-3: max_mates=32768 OOMed at 18.30 GiB because
(Q,S,A) attr gathers padded A=6 to 128 lanes; fixed by the attribute-major
grid layout, ops/grid.py). Compile-only: no execution.

Usage: python benchmarks/hbm_probe.py --max_mates 32768 [--set k=v ...]
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
    ap.add_argument("--max_mates", type=int, default=32768)
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--set", nargs="*", default=[],
                    help="extra VOConfig overrides k=v")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.models import pipeline as PL

    over = {"max_mates": args.max_mates}
    for kv in args.set:
        k, v = kv.split("=", 1)
        cur = getattr(VOConfig(), k)
        over[k] = type(cur)(v) if not isinstance(cur, bool) else v == "True"
    cfg = dataclasses.replace(VOConfig(), **over)
    rig = S.default_rig(args.h, args.w)
    print(f"platform={jax.devices()[0].platform} overrides={over}",
          file=sys.stderr)

    img = jax.ShapeDtypeStruct((args.h, args.w), jnp.float32)
    I = jax.ShapeDtypeStruct((3, 3), jnp.float32)
    z = jax.ShapeDtypeStruct((3,), jnp.float32)
    seed = jax.ShapeDtypeStruct((), jnp.int32)

    # build_stereo_step(has_gt=False) returns a plain lambda wrapper;
    # re-jit for .lower (the inner jit makes this free)
    sstep = jax.jit(PL.build_stereo_step(rig, cfg, has_gt=False))
    slow = sstep.lower(img, img).compile()
    sa = slow.memory_analysis()

    sres = jax.eval_shape(sstep, img, img)
    mates_sd = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), sres.mates)
    frame_sd = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), sres.frame)
    tstep = PL.build_temporal_step(rig, cfg, use_gt=False)
    tlow = tstep.lower(mates_sd, frame_sd, mates_sd, frame_sd,
                       I, z, seed).compile()
    ta = tlow.memory_analysis()

    def mib(ma):
        return {
            "argument_mib": round(ma.argument_size_in_bytes / 2**20, 1),
            "output_mib": round(ma.output_size_in_bytes / 2**20, 1),
            "temp_mib": round(ma.temp_size_in_bytes / 2**20, 1),
            "total_gib": round((ma.argument_size_in_bytes
                                + ma.output_size_in_bytes
                                + ma.temp_size_in_bytes) / 2**30, 2),
        }

    rec = {"overrides": over, "h": args.h, "w": args.w,
           "platform": jax.devices()[0].platform,
           "stereo": mib(sa), "temporal": mib(ta)}
    rec["peak_gib"] = max(rec["stereo"]["total_gib"],
                          rec["temporal"]["total_gib"])
    rec["fits_hbm"] = rec["peak_gib"] < 15.0
    print(json.dumps(rec))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Value probe for the flat-gate collapse: materialize stage-1
intermediates (epipolar lines, gathered candidate coords, g_epi) as
program OUTPUTS of the otherwise-unchanged failing program and compare
them against a host-side recomputation.

If the materialized g_epi matches the host oracle, the corruption is
downstream; if not, the gathered attrs or the distance fusion is the
miscompiled region. (Forcing outputs can change fusion and hide the bug
- a pass here with the cascade still collapsing is itself a signal.)
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
    ap.add_argument("--layout", default="flat4")
    ap.add_argument("--h", type=int, default=376)
    ap.add_argument("--w", type=int, default=1241)
    ap.add_argument("--backend", default=None, choices=["cpu"])
    args = ap.parse_args()

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

    import jax
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    import numpy as np

    from edge_based_visual_odometry_tpu import geometry as geom
    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.models import stereo_matcher as SM
    from edge_based_visual_odometry_tpu.models.types import FrameData, RigArrays
    from edge_based_visual_odometry_tpu.ops import image as IMG
    from edge_based_visual_odometry_tpu.ops import toed

    cfg = dataclasses.replace(VOConfig(), gate_layout=args.layout)
    seq = S.make_sequence(n_frames=1, h=args.h, w=args.w)
    rig_arrays = RigArrays.from_rig(seq.rig)
    gather_ry = SM.derive_gather_band(seq.rig, cfg)

    captured = {}
    orig_pld = geom.point_line_distance

    def tap_pld(line, xy):
        out = orig_pld(line, xy)
        # the stage-1 call: (N, S) with S = gather slots
        if "g_epi" not in captured and out.ndim == 2 and out.shape[1] >= 64:
            captured["g_epi"] = out
            captured["g_x"] = xy[..., 0]
            captured["g_y"] = xy[..., 1]
            captured["line"] = jnp.broadcast_to(line, line.shape)
        return out

    geom.point_line_distance = tap_pld

    @jax.jit
    def step(left, right):
        captured.clear()
        left = left.astype(jnp.float32)
        right = right.astype(jnp.float32)
        lgx, lgy = IMG.sobel_gradients(left)
        rgx, rgy = IMG.sobel_gradients(right)
        frame = FrameData(left=left, right=right, left_gx=lgx, left_gy=lgy,
                          right_gx=rgx, right_gy=rgy)
        kw = dict(kernel_size=cfg.toed_kernel_size, sigma=cfg.toed_sigma,
                  grad_mag_min=cfg.toed_grad_mag_min,
                  max_edges=cfg.max_edges, border=cfg.toed_border)
        led = toed.detect_edges(left, **kw)
        red = toed.detect_edges(right, **kw)
        mates, _, metrics = SM.match_stereo(led, red, frame, rig_arrays,
                                            cfg, gather_ry=gather_ry)
        return (mates.count, metrics, led, red,
                captured["g_epi"], captured["g_x"], captured["g_y"],
                captured["line"])

    f = seq.frames[0]
    count, metrics, led, red, g_epi, g_x, g_y, line = jax.block_until_ready(
        step(jnp.asarray(f.left), jnp.asarray(f.right)))
    geom.point_line_distance = orig_pld

    count = int(count)
    g_epi = np.asarray(g_epi)
    g_x = np.asarray(g_x)
    g_y = np.asarray(g_y)
    line = np.asarray(line)
    lx = np.asarray(led.x)
    ly = np.asarray(led.y)
    lvalid = np.asarray(led.valid)
    rx = np.asarray(red.x)
    ry = np.asarray(red.y)
    rvalid = np.asarray(red.valid)

    # host oracle: epipolar lines from the left edges; distance of the
    # gathered coords to them
    F = np.asarray(seq.rig.F21, np.float64)
    ones = np.ones_like(lx)
    L = np.stack([lx, ly, ones], -1) @ F.T          # (N, 3)
    # line returned by the tap is (N, 1, 3) broadcast
    line2 = line.reshape(line.shape[0], -1, 3)[:, 0, :]
    line_err = np.abs(line2 - L)[lvalid]
    num = np.abs(L[:, 0:1] * g_x + L[:, 1:2] * g_y + L[:, 2:3])
    oracle_epi = num / np.sqrt(L[:, 0:1] ** 2 + L[:, 1:2] ** 2)
    d = np.abs(oracle_epi - g_epi)[lvalid]

    # are the gathered coords plausible right-edge coords? check a sample
    # against the nearest actual right edge
    rset = set(zip(np.round(rx[rvalid], 3), np.round(ry[rvalid], 3)))
    sample = [(round(float(g_x[i, j]), 3), round(float(g_y[i, j]), 3))
              for i in range(0, min(2000, g_x.shape[0]), 97)
              for j in range(0, g_x.shape[1], 13)]
    hit = sum(1 for p in sample if p in rset)

    print(json.dumps({
        "backend": jax.default_backend(),
        "layout": args.layout,
        "mates": count,
        "stage_pairs": [int(r[1]) for r in np.asarray(metrics)],
        "line_err_max": float(line_err.max()) if line_err.size else -1.0,
        "g_epi_vs_oracle_max": float(d.max()) if d.size else -1.0,
        "g_epi_vs_oracle_p50": float(np.median(d)) if d.size else -1.0,
        "gathered_coord_hit_rate": round(hit / max(len(sample), 1), 4),
        "g_epi_min": float(g_epi[lvalid].min()),
        "g_epi_p10": float(np.percentile(g_epi[lvalid], 10)),
    }))


if __name__ == "__main__":
    main()

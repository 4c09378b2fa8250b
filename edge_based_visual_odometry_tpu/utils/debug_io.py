"""Debug/analysis file writers (reference include/io.h:14-211 +
Stereo_Matches.cpp:1656-1699, Temporal_Matches.cpp:1066-1112).

These text formats feed the reference's MATLAB visualization scripts
(test/*.m); we keep the column layouts compatible so those offline tools
keep working against our outputs.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def write_toed_edges(path: str, edges) -> None:
    """Raw TOED edge dump: x y orientation per line
    (reference io.h:183-211 write_TOED_edges)."""
    n = int(edges.count)
    x = np.asarray(edges.x)[:n]
    y = np.asarray(edges.y)[:n]
    t = np.asarray(edges.theta)[:n]
    with open(path, "w") as f:
        for i in range(n):
            f.write(f"{x[i]} {y[i]} {t[i]}\n")


def write_finalized_stereo_pairs(path: str, mates, rig) -> None:
    """Finalized stereo edge pairs with reconstructed 3D point + tangent
    (reference write_finalized_stereo_edge_pairs_to_file,
    Stereo_Matches.cpp:1656-1699). Column layout matches the reference
    header line."""
    import jax.numpy as jnp

    from edge_based_visual_odometry_tpu import geometry as geom

    n = int(mates.count)
    lx = np.asarray(mates.left_x)[:n]
    ly = np.asarray(mates.left_y)[:n]
    lt = np.asarray(mates.left_theta)[:n]
    rx = np.asarray(mates.right_x)[:n]
    ry = np.asarray(mates.right_y)[:n]
    rt = np.asarray(mates.right_theta)[:n]

    g1 = geom.pixel_to_ray(rig.K_left_inv, jnp.asarray(np.stack([lx, ly], -1), jnp.float32))
    g2 = geom.pixel_to_ray(rig.K_right_inv, jnp.asarray(np.stack([rx, ry], -1), jnp.float32))
    G = np.asarray(geom.backproject_two_rays(rig.R21, rig.T21, g1, g2))
    t1 = geom.theta_to_ray_tangent(rig.K_left_inv, jnp.asarray(lt, jnp.float32))
    t2 = geom.theta_to_ray_tangent(rig.K_right_inv, jnp.asarray(rt, jnp.float32))
    T1 = geom.reconstruct_3d_tangent(rig.R21, g1, g2, t1, t2)
    pt1 = np.asarray(geom.project_3d_tangent_to_2d(T1, g1))
    # NOTE: T1 is deliberately NOT rotated by R21 before projecting at the
    # right-camera gamma - the reference writes projected_T_2 =
    # project(T_1, gamma_2) with the unrotated left-frame tangent
    # (Stereo_Matches.cpp:1687-1688); reproduced for column-exact parity
    # with its MATLAB consumers (the temporal matcher's own transport at
    # temporal_matcher.py:111-115 does rotate).
    pt2 = np.asarray(geom.project_3d_tangent_to_2d(T1, g2))
    T1 = np.asarray(T1)

    with open(path, "w") as f:
        f.write("left_edge_location, left_edge_orientation, "
                "right_edge_location, right_edge_orientation, "
                "left_edge_3D_point, left_edge_tangent\n")
        for i in range(n):
            f.write(f"{lx[i]} {ly[i]} {lt[i]} {rx[i]} {ry[i]} {rt[i]} "
                    f"{G[i, 0]} {G[i, 1]} {G[i, 2]} "
                    f"{T1[i, 0]} {T1[i, 1]} {T1[i, 2]} "
                    f"{pt1[i, 0]} {pt1[i, 1]} {pt2[i, 0]} {pt2[i, 1]}\n")


def write_quads(path: str, kf_mates, quads, kf_idx: int, cf_idx: int) -> None:
    """Quad CSV dump (reference write_quads_to_file,
    Temporal_Matches.cpp:1066-1112): one row per surviving candidate quad."""
    rm = np.asarray(quads.row_mask)
    cm = np.asarray(quads.cmask)
    klx = np.asarray(kf_mates.left_x)
    kly = np.asarray(kf_mates.left_y)
    krx = np.asarray(kf_mates.right_x)
    kry = np.asarray(kf_mates.right_y)
    lcx = np.asarray(quads.lcx)
    lcy = np.asarray(quads.lcy)
    rcx = np.asarray(quads.rcx)
    rcy = np.asarray(quads.rcy)
    with open(path, "w") as f:
        f.write("# keyframe %d <-> current frame %d\n" % (kf_idx, cf_idx))
        f.write("kf_left_x,kf_left_y,kf_right_x,kf_right_y,"
                "cf_left_x,cf_left_y,cf_right_x,cf_right_y\n")
        rows, cols = np.nonzero(cm & rm[:, None])
        for r, c in zip(rows, cols):
            f.write(f"{klx[r]},{kly[r]},{krx[r]},{kry[r]},"
                    f"{lcx[r, c]},{lcy[r, c]},{rcx[r, c]},{rcy[r, c]}\n")


def write_disparities(path: str, mates, frame_idx: int) -> None:
    """Disparity dump (reference record_disparities,
    Stereo_Matches.cpp:491-532)."""
    n = int(mates.count)
    lx = np.asarray(mates.left_x)[:n]
    ly = np.asarray(mates.left_y)[:n]
    rx = np.asarray(mates.right_x)[:n]
    ry = np.asarray(mates.right_y)[:n]
    gx = np.asarray(mates.gt_x)[:n]
    with open(path, "w") as f:
        f.write(f"# Disparity values for frame {frame_idx}\n")
        f.write("# Columns: left_x\tleft_y\tright_x\tright_y\t"
                "estimated_disp\tgt_disp\tdisp_error\n")
        for i in range(n):
            est = lx[i] - rx[i]
            if gx[i] >= 0:
                gt = lx[i] - gx[i]
                err = est - gt
            else:
                gt = float("nan")
                err = float("nan")
            f.write(f"{lx[i]}\t{ly[i]}\t{rx[i]}\t{ry[i]}\t{est}\t{gt}\t{err}\n")


def write_filter_distribution(path: str, filter_name: str, frame_idx: int,
                              values, is_gt, mask) -> None:
    """Per-candidate filter-score distribution with veridical flags, in
    the reference's record_Filter_Distribution text format
    (Stereo_Matches.cpp:421-452): header + 'filter_value\\tis_GT' rows."""
    values = np.asarray(values)
    is_gt = np.asarray(is_gt).astype(int)
    mask = np.asarray(mask).astype(bool)
    v = values[mask]
    g = is_gt[mask]
    with open(path, "w") as f:
        f.write(f"# {filter_name} distribution for frame {frame_idx}\n")
        f.write(f"# Total values: {v.size} (Veridical: {int(g.sum())}, "
                f"Non-veridical: {int(v.size - g.sum())})\n")
        f.write("filter_value\tis_GT\n")
        for vi, gi in zip(v, g):
            f.write(f"{vi}\t{gi}\n")


def write_ambiguity_distribution(path: str, stage_name: str, frame_idx: int,
                                 counts, row_mask) -> None:
    """Per-edge candidate-count distribution, reference
    record_Ambiguity_Distribution format (Stereo_Matches.cpp:454-489)."""
    counts = np.asarray(counts)
    rm = np.asarray(row_mask).astype(bool)
    c = counts[rm]
    with open(path, "w") as f:
        f.write(f"# Ambiguity distribution for stage: {stage_name} "
                f"| Frame: {frame_idx}\n")
        f.write(f"# Total edges: {c.size}\n")
        f.write("num_candidates\n")
        for ci in c:
            f.write(f"{int(ci)}\n")


def write_distributions(output_dir: str, frame_idx: int, dists: dict) -> None:
    """Write every entry of a match_stereo(record_distributions=True)
    dict: '<name>' -> <name>_frame_N.txt, '<stage>_ambiguity' ->
    ambiguity_<stage>_frame_N.txt (reference filename conventions)."""
    for name, payload in dists.items():
        if name.endswith("_ambiguity"):
            stage = name[: -len("_ambiguity")]
            write_ambiguity_distribution(
                os.path.join(output_dir,
                             f"ambiguity_{stage}_frame_{frame_idx}.txt"),
                stage, frame_idx, *payload)
        else:
            write_filter_distribution(
                os.path.join(output_dir, f"{name}_frame_{frame_idx}.txt"),
                name, frame_idx, *payload)

"""Temporal quad matching + RANSAC pose on a synthetic two-frame scene."""

import numpy as np
import jax.numpy as jnp
import pytest

from edge_based_visual_odometry_tpu import geometry as geom
from edge_based_visual_odometry_tpu.config import VOConfig
from edge_based_visual_odometry_tpu.io import synthetic as S
from edge_based_visual_odometry_tpu.models import motion_tracker as MT
from edge_based_visual_odometry_tpu.models import stereo_matcher as SM
from edge_based_visual_odometry_tpu.models import temporal_matcher as TM
from edge_based_visual_odometry_tpu.models.types import FrameData, RigArrays
from edge_based_visual_odometry_tpu.ops import image as IMG
from edge_based_visual_odometry_tpu.ops import toed

pytestmark = pytest.mark.heavy  # shared full-cascade fixture (~20 s setup)

CFG = VOConfig(max_edges=4096, max_candidates=16, gather_slots=160,
               max_mates=2048, max_refine_pairs=8192,
               max_quad_candidates=24, quad_gather_slots=576,
               ransac_max_iterations=2048)


def frame_data(f):
    lgx, lgy = IMG.sobel_gradients(jnp.asarray(f.left))
    rgx, rgy = IMG.sobel_gradients(jnp.asarray(f.right))
    return FrameData(jnp.asarray(f.left), jnp.asarray(f.right),
                     lgx, lgy, rgx, rgy)


@pytest.fixture(scope="module")
def two_frames():
    seq = S.make_sequence(n_frames=2, h=240, w=320)
    rig = RigArrays.from_rig(seq.rig)
    out = []
    for f in seq.frames:
        fd = frame_data(f)
        led = toed.detect_edges(jnp.asarray(f.left), max_edges=CFG.max_edges)
        red = toed.detect_edges(jnp.asarray(f.right), max_edges=CFG.max_edges)
        mates, _, _ = SM.match_stereo(led, red, fd, rig, CFG,
                                      disparity_map=jnp.asarray(f.disparity))
        out.append((f, fd, mates))
    # GT relative pose KF -> CF (world->cam convention in the renderer)
    p0 = geom.Pose(jnp.asarray(seq.frames[0].R, jnp.float32),
                   jnp.asarray(seq.frames[0].t, jnp.float32))
    p1 = geom.Pose(jnp.asarray(seq.frames[1].R, jnp.float32),
                   jnp.asarray(seq.frames[1].t, jnp.float32))
    rel = geom.relative_pose(p0, p1)
    return seq, rig, out, rel


def test_temporal_quads_gt_metrics(two_frames):
    seq, rig, frames, rel = two_frames
    (f0, fd0, m0), (f1, fd1, m1) = frames
    quads, metrics = TM.match_temporal(m0, m1, fd0, fd1, rel, rig, CFG,
                                       use_gt=True)
    metrics = np.asarray(metrics)
    stages = dict(zip(TM.TEMPORAL_STAGE_NAMES, metrics))
    assert stages["Location Proximity"][0] > 0.9
    final = stages["Edge Clustering"]
    assert final[0] > 0.7, f"temporal recall too low: {final}"
    assert final[1] > 0.7, f"temporal precision too low: {final}"
    assert int(np.asarray(quads.cmask).sum()) > 100


def test_pose_recovery_gt_mode(two_frames):
    seq, rig, frames, rel = two_frames
    (f0, fd0, m0), (f1, fd1, m1) = frames
    quads, _ = TM.match_temporal(m0, m1, fd0, fd1, rel, rig, CFG, use_gt=True)
    pq = MT.lift_quads(m0, quads, rig, CFG, use_gt=True)
    res = MT.estimate_pose(pq, rig, CFG)
    assert bool(res.success)
    assert int(res.inlier_count) > 50
    R_err = np.asarray(res.R) @ np.asarray(rel.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(np.asarray(res.t) - np.asarray(rel.t))
    assert ang < 1.0, f"rotation error {ang:.3f} deg"
    assert t_err < 0.05, f"translation error {t_err:.4f} m"


def test_pose_recovery_production_mode(two_frames):
    """No GT anywhere: quads predicted with identity motion, pose solved
    from triangulated geometry only."""
    seq, rig, frames, rel = two_frames
    (f0, fd0, m0), (f1, fd1, m1) = frames
    ident = geom.Pose.identity()
    quads, _ = TM.match_temporal(m0, m1, fd0, fd1, ident, rig, CFG,
                                 use_gt=False)
    pq = MT.lift_quads(m0, quads, rig, CFG, use_gt=False)
    res = MT.estimate_pose(pq, rig, CFG)
    assert bool(res.success)
    R_err = np.asarray(res.R) @ np.asarray(rel.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(R_err) - 1) / 2, -1, 1)))
    t_err = np.linalg.norm(np.asarray(res.t) - np.asarray(rel.t))
    assert ang < 1.5, f"rotation error {ang:.3f} deg"
    assert t_err < 0.08, f"translation error {t_err:.4f} m"
    assert float(res.inlier_ratio) > 0.3


def test_constraint_sweep(two_frames):
    """Diagnostic constraint recall/precision sweep
    (reference Solution_Constraints_Application)."""
    seq, rig, frames, rel = two_frames
    (f0, fd0, m0), (f1, fd1, m1) = frames
    quads, _ = TM.match_temporal(m0, m1, fd0, fd1, rel, rig, CFG, use_gt=True)
    pq = MT.lift_quads(m0, quads, rig, CFG, use_gt=True)
    rows = np.asarray(MT.constraint_sweep_metrics(pq, CFG))
    assert rows.shape == (5, 3)
    assert abs(rows[0, 0] - 1.0) < 1e-6           # baseline recall 1
    assert np.all(np.diff(rows[:, 2]) <= 1e-6)    # veridical count shrinks
    # constraints must not meaningfully hurt precision. (They used to
    # strictly improve it, but the distance-to-prediction compaction
    # priority raised baseline quad precision to ~0.95, leaving the
    # geometric gates almost nothing to remove - clipping a TP or two
    # now moves precision by ~1%.)
    assert rows[-1, 1] >= rows[0, 1] - 0.02


def test_flat_temporal_gate_matches_dense(two_frames):
    """temporal_gate_layout='flat' must reproduce the dense quad cascade
    exactly on live slots (same cmask, same centers) when the flat budget
    covers all actives - the stereo flat-gate equivalence, applied to the
    temporal NCC/desc stages."""
    import dataclasses
    seq, rig, frames, rel = two_frames
    (f0, fd0, m0), (f1, fd1, m1) = frames
    cfg_flat = dataclasses.replace(CFG, temporal_gate_layout="flat",
                                   temporal_gate_pairs=49152)
    qd, md = TM.match_temporal(m0, m1, fd0, fd1, rel, rig, CFG, use_gt=True)
    qf, mf = TM.match_temporal(m0, m1, fd0, fd1, rel, rig, cfg_flat,
                               use_gt=True)
    np.testing.assert_array_equal(np.asarray(qd.cmask), np.asarray(qf.cmask))
    live = np.asarray(qd.cmask)
    for name in ("lcx", "lcy", "lct", "rcx", "rcy", "rct"):
        a = np.asarray(getattr(qd, name))[live]
        b = np.asarray(getattr(qf, name))[live]
        np.testing.assert_array_equal(a, b, err_msg=name)
    # scores reduce in a different batch shape (per-pair vs (M, Cq)
    # dots) -> f32 summation-order noise for NCC; the descriptor
    # distances additionally run on bf16 storage, where the two
    # contraction shapes round at bf16 granularity (~0.4% rel)
    np.testing.assert_allclose(np.asarray(qd.ncc_l)[live],
                               np.asarray(qf.ncc_l)[live],
                               rtol=2e-5, atol=2e-4, err_msg="ncc_l")
    np.testing.assert_allclose(np.asarray(qd.desc_l)[live],
                               np.asarray(qf.desc_l)[live],
                               rtol=1e-2, atol=0.05, err_msg="desc_l")
    np.testing.assert_allclose(np.asarray(md), np.asarray(mf), atol=1e-6)

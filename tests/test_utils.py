"""Aux subsystems: debug writers, timing report, checkpoint/resume."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from edge_based_visual_odometry_tpu.config import VOConfig
from edge_based_visual_odometry_tpu.io import synthetic as S
from edge_based_visual_odometry_tpu.models import pipeline as PL
from edge_based_visual_odometry_tpu.utils import checkpoint as CKPT
from edge_based_visual_odometry_tpu.utils import debug_io as DIO
from edge_based_visual_odometry_tpu.utils import timing as TIM

CFG = VOConfig(max_edges=1024, max_candidates=8, gather_slots=64,
               max_mates=512, max_refine_pairs=1024,
               max_quad_candidates=8, quad_gather_slots=144,
               ransac_max_iterations=256, gn_max_iter=4)


@pytest.fixture(scope="module")
def small_run():
    seq = S.make_sequence(n_frames=2, h=120, w=160)
    pipe = PL.VOPipeline(rig=seq.rig, cfg=CFG)
    for f in seq.frames:
        pipe.run_frame(f.left, f.right)
    return seq, pipe


@pytest.mark.heavy
def test_debug_writers(small_run, tmp_path):
    from edge_based_visual_odometry_tpu.models.types import RigArrays
    from edge_based_visual_odometry_tpu.ops import toed

    seq, pipe = small_run
    rig = RigArrays.from_rig(seq.rig)
    edges = toed.detect_edges(jnp.asarray(seq.frames[0].left), max_edges=1024)
    p1 = str(tmp_path / "toed.txt")
    DIO.write_toed_edges(p1, edges)
    assert len(open(p1).readlines()) == int(edges.count)

    p2 = str(tmp_path / "pairs.txt")
    DIO.write_finalized_stereo_pairs(p2, pipe.keyframe.mates, rig)
    lines = open(p2).readlines()
    assert len(lines) == int(pipe.keyframe.mates.count) + 1
    assert len(lines[1].split()) == 16

    p4 = str(tmp_path / "disp.txt")
    DIO.write_disparities(p4, pipe.keyframe.mates, 0)
    assert len(open(p4).readlines()) == int(pipe.keyframe.mates.count) + 2


def test_timing_report():
    t = TIM.StageTimer()
    with t.stage("a"):
        pass
    t.timed("b", lambda: jnp.ones((8,)) * 2)
    rep = t.report()
    assert "a" in rep and "b" in rep and "TOTAL" in rep


@pytest.mark.heavy
def test_checkpoint_roundtrip(small_run, tmp_path):
    seq, pipe = small_run
    path = str(tmp_path / "ckpt")
    CKPT.save_pipeline_state(path, pipe)

    pipe2 = PL.VOPipeline(rig=seq.rig, cfg=CFG)
    assert CKPT.restore_pipeline_state(path, pipe2)
    assert pipe2.frame_idx == pipe.frame_idx
    assert len(pipe2.trajectory) == len(pipe.trajectory)
    np.testing.assert_array_equal(np.asarray(pipe2.keyframe.mates.left_x),
                                  np.asarray(pipe.keyframe.mates.left_x))
    # the restored pipeline can continue processing
    f = seq.frames[1]
    fr, tr = pipe2.run_frame(f.left, f.right)
    assert tr is not None

    assert not CKPT.restore_pipeline_state(str(tmp_path / "nope"),
                                           PL.VOPipeline(rig=seq.rig, cfg=CFG))


@pytest.mark.heavy
def test_eval_cluster_dumps(tmp_path):
    """The io.h per-cluster evaluation writers (photo-refine eval,
    TP->FN transition clusters, false-negative clusters + contributing
    edges; reference io.h:14-160) produce well-formed files from the
    cascade-state snapshots."""
    from edge_based_visual_odometry_tpu.models import pipeline as PLM

    seq = S.make_sequence(n_frames=1, h=120, w=160)
    step = PLM.build_stereo_step(seq.rig, CFG, has_gt=True,
                                 record_distributions=True)
    f = seq.frames[0]
    occ = jnp.full_like(jnp.asarray(f.disparity), 255.0)
    fr = step(jnp.asarray(f.left), jnp.asarray(f.right),
              jnp.asarray(f.disparity), occ)
    assert "photo_refine_state" in fr.distributions
    DIO.write_eval_cluster_dumps(str(tmp_path), 0, fr.distributions, tol=1.0)

    pr = (tmp_path / "photo_refine_data_from_evaluation_statistics_"
                     "frame_0.txt").read_text().splitlines()
    assert pr[0].startswith("is_TP, left_edge_index")
    assert len(pr) > 100           # one row per surviving candidate
    assert len(pr[1].split()) == 8
    # TP flags present and mostly true on the exact-GT synthetic scene
    flags = np.array([int(l.split()[0]) for l in pr[1:]])
    assert flags.mean() > 0.8

    for name in ("matching_edge_clusters_data_frame_0.txt",
                 "false_negative_edge_clusters_frame_0.txt",
                 "false_negative_edge_clusters_contributing_edges_"
                 "frame_0.txt"):
        lines = (tmp_path / name).read_text().splitlines()
        assert len(lines) >= 1     # header always written

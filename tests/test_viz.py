"""Offline analysis suite: dump-format loaders + headless figure rendering
(reference test/*.m equivalents; formats from utils/debug_io.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from edge_based_visual_odometry_tpu.viz import plots as P


@pytest.fixture()
def dumps(tmp_path):
    d = tmp_path / "out"
    d.mkdir()
    (d / "toed_edges_frame_0.txt").write_text(
        "10.5 20.25 0.1\n30.0 40.0 -1.2\n")
    (d / "finalized_stereo_edge_pairs_frame_0.txt").write_text(
        "left_edge_location, left_edge_orientation, right_edge_location, "
        "right_edge_orientation, left_edge_3D_point, left_edge_tangent\n"
        + "".join(f"{10+i} {20+i} 0.3 {5+i} {20+i} 0.31 "
                  "1 2 3 0.1 0.2 0.97 0.5 0.86 0.5 0.86\n"
                  for i in range(6)))
    (d / "disparities_frame_0.txt").write_text(
        "# Disparity values for frame 0\n"
        "# Columns: left_x\tleft_y\tright_x\tright_y\test\tgt\terr\n"
        "10\t20\t5\t20\t5.0\t5.2\t-0.2\n"       # TP (|err|<=1)
        "11\t21\t5\t21\t6.0\t4.5\t1.5\n"        # inaccurate (1<|err|<=2)
        "12\t22\t5\t22\t7.0\t2.0\t5.0\n"        # false
        "13\t23\t5\t23\t8.0\tnan\tnan\n")       # no GT
    (d / "quads_frame_1.txt").write_text(
        "# keyframe 0 <-> current frame 1\n"
        "kf_left_x,kf_left_y,kf_right_x,kf_right_y,"
        "cf_left_x,cf_left_y,cf_right_x,cf_right_y\n"
        "10,20,5,20,11,21,6,21\n"
        "30,40,25,40,31,41,26,41\n")
    (d / "ncc_frame_0.txt").write_text(
        "# ncc distribution for frame 0\n"
        "# Total values: 3 (Veridical: 1, Non-veridical: 2)\n"
        "filter_value\tis_GT\n"
        "0.9\t1\n0.3\t0\n0.5\t0\n")
    (d / "ambiguity_orientation_frame_0.txt").write_text(
        "# Ambiguity distribution for stage: orientation | Frame: 0\n"
        "# Total edges: 4\n"
        "num_candidates\n"
        "3\n1\n0\n7\n")
    (d / "trajectory_tum.txt").write_text(
        "".join(f"{i} {float(i)} 0 {0.1*i} 0 0 0 1\n" for i in range(5)))
    return d


def test_loaders_roundtrip(dumps):
    e = P.load_toed_edges(str(dumps / "toed_edges_frame_0.txt"))
    assert e["x"].tolist() == [10.5, 30.0] and e["theta"][1] == -1.2

    pairs = P.load_finalized_pairs(
        str(dumps / "finalized_stereo_edge_pairs_frame_0.txt"))
    assert pairs["left_x"].shape == (6,)
    assert pairs["point3d"].shape == (6, 3)
    np.testing.assert_allclose(pairs["right_x"], pairs["left_x"] - 5)

    disp = P.load_disparities(str(dumps / "disparities_frame_0.txt"))
    assert disp["est_disp"].tolist() == [5.0, 6.0, 7.0, 8.0]
    assert np.isnan(disp["disp_err"][3])

    q = P.load_quads(str(dumps / "quads_frame_1.txt"))
    assert q["cf_left_x"].tolist() == [11.0, 31.0]

    dist = P.load_filter_distribution(str(dumps / "ncc_frame_0.txt"))
    assert dist["values"].tolist() == [0.9, 0.3, 0.5]
    assert dist["is_gt"].tolist() == [True, False, False]

    amb = P.load_ambiguity_distribution(
        str(dumps / "ambiguity_orientation_frame_0.txt"))
    assert amb.tolist() == [3, 1, 0, 7]

    tr = P.load_trajectory_tum(str(dumps / "trajectory_tum.txt"))
    assert tr["pos"].shape == (5, 3) and tr["quat"][0, 3] == 1.0


def test_triage_counts(dumps, tmp_path):
    out = str(tmp_path / "triage.png")
    counts = P.plot_match_triage(out, P.load_disparities(
        str(dumps / "disparities_frame_0.txt")))
    assert counts == {"tp": 1, "inaccurate": 1, "false": 1, "no_gt": 1}
    assert os.path.getsize(out) > 0


def test_plots_render(dumps, tmp_path):
    img = np.zeros((50, 60), np.float32)
    P.plot_edges_on_image(str(tmp_path / "e.png"),
                          P.load_toed_edges(str(dumps / "toed_edges_frame_0.txt")),
                          image=img)
    P.plot_stereo_pairs(
        str(tmp_path / "p.png"),
        P.load_finalized_pairs(
            str(dumps / "finalized_stereo_edge_pairs_frame_0.txt")),
        left_image=img, right_image=img, n_links=3)
    P.plot_quads(str(tmp_path / "q.png"),
                 P.load_quads(str(dumps / "quads_frame_1.txt")))
    P.plot_filter_distribution(
        str(tmp_path / "d.png"),
        P.load_filter_distribution(str(dumps / "ncc_frame_0.txt")), "ncc")
    P.plot_ambiguity_distribution(
        str(tmp_path / "a.png"),
        P.load_ambiguity_distribution(
            str(dumps / "ambiguity_orientation_frame_0.txt")), "orientation")
    est = P.load_trajectory_tum(str(dumps / "trajectory_tum.txt"))
    P.plot_trajectory(str(tmp_path / "t.png"), est, gt=est, plane="xz")
    for name in ["e", "p", "q", "d", "a", "t"]:
        assert os.path.getsize(str(tmp_path / f"{name}.png")) > 0


def test_cli_all_sweep(dumps, tmp_path):
    viz_dir = str(tmp_path / "viz")
    r = subprocess.run(
        [sys.executable, "-m", "edge_based_visual_odometry_tpu.viz",
         "all", str(dumps), viz_dir],
        capture_output=True, text=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
        cwd="/root/repo")
    assert r.returncode == 0, r.stderr
    pngs = sorted(os.listdir(viz_dir))
    # one figure per recognized dump: edges, pairs, disparities, quads,
    # ambiguity, ncc distribution, trajectory
    assert len(pngs) == 7, (pngs, r.stdout)


def test_ncc_debug_dump(tmp_path):
    """dump_ncc_debug reproduces the reference's ncc_debug_* dir layout
    (test_NCC_patch.hpp:75-153) and ranks the true candidate best."""
    rng = np.random.default_rng(3)
    left = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    # right = left shifted 4 px in x, so the candidate at (x-4, y) with the
    # same orientation is photometrically identical
    right = np.roll(left, -4, axis=1)
    edge = (40.0, 32.0, 0.4)
    cands = {"x": np.array([36.0, 20.0, 50.0]),
             "y": np.array([32.0, 40.0, 10.0]),
             "theta": np.array([0.4, 1.2, -0.5])}
    d = str(tmp_path / "nccdbg")
    res = P.dump_ncc_debug(d, left, right, edge, cands, gt_xy=(36.0, 32.0))
    assert res["best"] == 0 and res["scores"][0] > 0.95
    files = set(os.listdir(d))
    assert {"candidate_scores.csv", "patch_statistics.txt",
            "all_patches_grid.png", "edge_patch_plus.png",
            "cand1_patch_plus.png", "cand3_patch_minus.png"} <= files
    rows = open(os.path.join(d, "candidate_scores.csv")).readlines()
    assert rows[0].startswith("Candidate,Position")
    assert len(rows) == 4 and ",Yes" in rows[1]


def test_loader_parses_reference_golden_toed_dump():
    """The edge loader reads the REFERENCE's own shipped golden TOED dump
    (reference test/toed.txt, 51k edges from the C++ binary) - format
    compatibility with the reference's outputs, not just our writers."""
    path = "/root/reference/test/toed.txt"
    if not os.path.exists(path):
        import pytest
        pytest.skip("reference tree unavailable")
    e = P.load_toed_edges(path)
    assert e["x"].shape[0] > 50000
    assert np.isfinite(e["x"]).all() and np.isfinite(e["theta"]).all()
    assert abs(float(e["x"][0]) - 4.33389) < 1e-4

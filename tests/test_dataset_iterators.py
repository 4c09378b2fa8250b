"""Fixture-tree tests for the EuRoC / ETH3D-stereo / ETH3D-SLAM iterators.

Round-1 gap: only KITTI had an on-disk layout test. These construct the
exact directory layouts the reference parses (src/Stereo_Iterator.cpp:
EuRoC :18-78 + GT chain :484-558, ETH3D-stereo :189-301 + mask/PFM loading
src/Dataset.cpp:208-316, ETH3D-SLAM :307-478) and assert the parsed
samples, GT transforms, disparity and occlusion masks.
"""

import numpy as np
import pytest

from edge_based_visual_odometry_tpu.io import datasets
from edge_based_visual_odometry_tpu.io.pfm import read_pfm, write_pfm


def _save_png(path, arr):
    from PIL import Image
    Image.fromarray(np.asarray(arr, np.uint8)).save(str(path))


def _img(h, w, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w), dtype=np.uint8)


def _quat_to_R(qw, qx, qy, qz):
    return datasets._quat_to_R(qw, qx, qy, qz)


# ---------------------------------------------------------------------------
# EuRoC (mav0/cam{0,1}/data + cam0/data.csv + state_groundtruth_estimate0)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def euroc_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("euroc") / "MH_01_easy"
    base = root / "mav0"
    for cam in ("cam0", "cam1"):
        (base / cam / "data").mkdir(parents=True)
    (base / "state_groundtruth_estimate0").mkdir(parents=True)

    ts_list = [1403636579763555584, 1403636579813555456, 1403636579863555584]
    rows = ["#timestamp [ns],filename"]
    for k, ts in enumerate(ts_list):
        _save_png(base / "cam0" / "data" / f"{ts}.png", _img(48, 64, k))
        _save_png(base / "cam1" / "data" / f"{ts}.png", _img(48, 64, 100 + k))
        rows.append(f"{ts},{ts}.png")
    # one CSV row with a missing image pair: iterator must skip it
    rows.append("1403636579999999999,1403636579999999999.png")
    (base / "cam0" / "data.csv").write_text("\n".join(rows) + "\n")

    # GT: ts, p(3), q(w,x,y,z) + extra columns (velocities etc. - EuRoC has
    # 17; the parser must only use the first 8)
    gt_rows = ["#timestamp, p_RS_R_x [m], ..."]
    gt_data = []
    rng = np.random.default_rng(5)
    for ts in ts_list:
        p = rng.normal(size=3)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        gt_data.append((ts, p, q))
        vals = [str(ts)] + [f"{v:.9f}" for v in p] + \
               [f"{v:.9f}" for v in q] + ["0.0"] * 9
        gt_rows.append(",".join(vals))
    (base / "state_groundtruth_estimate0" / "data.csv").write_text(
        "\n".join(gt_rows) + "\n")
    return root, ts_list, gt_data


def test_euroc_iterator_frames_and_gt_chain(euroc_dir):
    root, ts_list, gt_data = euroc_dir
    # a nontrivial frame->body transform (the cam0 extrinsic chain,
    # Stereo_Iterator.cpp:484-558: T_world_from_frame = T_wb * T_frame2body)
    ang = 0.3
    R_f2b = np.array([[np.cos(ang), -np.sin(ang), 0],
                      [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    t_f2b = np.array([0.1, -0.05, 0.2])
    samples = list(datasets.iter_euroc(str(root), R_f2b, t_f2b))
    assert len(samples) == 3          # bad row skipped
    s0 = samples[0]
    assert s0.left.shape == (48, 64)
    assert s0.timestamp == float(str(ts_list[0]))
    # left must be cam0's image
    np.testing.assert_array_equal(s0.left.astype(np.uint8), _img(48, 64, 0))
    np.testing.assert_array_equal(s0.right.astype(np.uint8),
                                  _img(48, 64, 100))
    for s, (ts, p, q) in zip(samples, gt_data):
        R_b = _quat_to_R(*q)
        np.testing.assert_allclose(s.gt_R, R_b @ R_f2b, atol=1e-9)
        np.testing.assert_allclose(s.gt_t, R_b @ t_f2b + p, atol=1e-9)


def test_euroc_factory_wires_frame2body(euroc_dir):
    root, ts_list, gt_data = euroc_dir
    samples = list(datasets.make_iterator(
        "EuRoC", str(root.parent), root.name))
    assert len(samples) == 3
    # identity frame2body: pose == raw body pose
    R_b = _quat_to_R(*gt_data[0][2])
    np.testing.assert_allclose(samples[0].gt_R, R_b, atol=1e-9)


# ---------------------------------------------------------------------------
# ETH3D two-view stereo (stereo_pairs/<pair>/{im0,im1,disp0GT,mask0nocc,..})
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eth3d_stereo_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("eth3d") / "delivery_area"
    disp = {}
    gt = {}
    rng = np.random.default_rng(11)
    for k in range(2):
        pair = root / "stereo_pairs" / f"pair_{k}"
        pair.mkdir(parents=True)
        _save_png(pair / "im0.png", _img(40, 56, k))
        _save_png(pair / "im1.png", _img(40, 56, 50 + k))
        d0 = rng.uniform(1.0, 20.0, size=(40, 56)).astype(np.float32)
        d1 = rng.uniform(1.0, 20.0, size=(40, 56)).astype(np.float32)
        write_pfm(str(pair / "disp0GT.pfm"), d0)
        write_pfm(str(pair / "disp1GT.pfm"), d1, little_endian=False)
        disp[k] = (d0, d1)
        mask0 = np.full((40, 56), 255, np.uint8)
        mask0[:, : 56 // 2] = 0        # left half occluded
        _save_png(pair / "mask0nocc.png", mask0)
        _save_png(pair / "mask1nocc.png", np.full((40, 56), 255, np.uint8))
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3)
        gt[k] = (q, t)
        # COLMAP images.txt: comments + a POINTS2D line + im1 + im0 entries
        lines = [
            "# Image list with two lines of data per image:",
            "#   IMAGE_ID, QW, QX, QY, QZ, TX, TY, TZ, CAMERA_ID, NAME",
            f"2 0.5 0.5 0.5 0.5 9 9 9 1 im1.png",
            "",
            f"1 {q[0]} {q[1]} {q[2]} {q[3]} {t[0]} {t[1]} {t[2]} 0 im0.png",
            "0.0 0.0 -1",
        ]
        (pair / "images.txt").write_text("\n".join(lines) + "\n")
    return root, disp, gt


def test_eth3d_stereo_iterator(eth3d_stereo_dir):
    root, disp, gt = eth3d_stereo_dir
    samples = list(datasets.iter_eth3d_stereo(str(root)))
    assert len(samples) == 2
    for k, s in enumerate(samples):
        assert s.timestamp == float(k)
        np.testing.assert_array_equal(s.left.astype(np.uint8),
                                      _img(40, 56, k))
        # PFMs round-trip (both endiannesses)
        np.testing.assert_allclose(s.left_disparity, disp[k][0], rtol=1e-6)
        np.testing.assert_allclose(s.right_disparity, disp[k][1], rtol=1e-6)
        # occlusion masks found under the reference's filenames
        # (mask0nocc.png / mask1nocc.png, Dataset.cpp:226)
        assert s.left_occlusion is not None
        assert (s.left_occlusion[:, : 56 // 2] == 0).all()
        assert (s.left_occlusion[:, 56 // 2:] == 255).all()
        assert (s.right_occlusion == 255).all()
        # GT comes from the im0.png line, not im1's. COLMAP images.txt is
        # WORLD->CAM; the iterator returns cam->world like every other
        # format (StereoSample contract)
        q, t = gt[k]
        R_w2c = _quat_to_R(*q)
        np.testing.assert_allclose(s.gt_R, R_w2c.T, atol=1e-9)
        np.testing.assert_allclose(s.gt_t, -R_w2c.T @ t, atol=1e-9)


@pytest.mark.heavy
def test_occlusion_mask_excludes_edges_from_gt_supervision():
    """Edges whose GT location is occluded must not enter the veridical
    sets (threaded into match_stereo via the occlusion_map arg)."""
    import dataclasses

    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.models import pipeline as PL

    seq = S.make_sequence(n_frames=1, h=120, w=160)
    cfg = dataclasses.replace(VOConfig(), max_edges=2048, max_mates=512,
                              max_refine_pairs=2048,
                              ransac_max_iterations=64)
    step = PL.build_stereo_step(seq.rig, cfg, has_gt=True)
    f = seq.frames[0]
    left = np.asarray(f.left)
    right = np.asarray(f.right)
    disp = np.asarray(f.disparity)

    occ_full = np.full(left.shape, 255.0, np.float32)
    occ_half = occ_full.copy()
    occ_half[:, : left.shape[1] // 2] = 0.0     # occlude left half

    fr_full = step(left, right, disp, occ_full)
    fr_half = step(left, right, disp, occ_half)

    def mate_x(fr):
        m = np.asarray(fr.mates.valid)
        return np.asarray(fr.mates.left_x)[m]

    x_full = mate_x(fr_full)
    x_half = mate_x(fr_half)
    # the unmasked run finds mates on both halves...
    assert (x_full < left.shape[1] // 2 - 1).sum() > 0
    # ...the masked run finds none in the occluded half and keeps the rest
    assert (x_half < left.shape[1] // 2 - 1).sum() == 0
    assert len(x_half) > 0


# ---------------------------------------------------------------------------
# ETH3D SLAM (rgb.txt -> right camera, rgb2/ -> left, TUM groundtruth.txt)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def eth3d_slam_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("eth3d_slam") / "cable_2"
    (root / "rgb").mkdir(parents=True)
    (root / "rgb2").mkdir(parents=True)
    rows = ["# color images", "# timestamp filename"]
    for k, ts in enumerate((0.10, 0.20, 0.30)):
        name = f"{k:04d}.png"
        _save_png(root / "rgb" / name, _img(36, 44, k))
        _save_png(root / "rgb2" / name, _img(36, 44, 200 + k))
        rows.append(f"{ts} rgb/{name}")
    (root / "rgb.txt").write_text("\n".join(rows) + "\n")

    # TUM GT: ts tx ty tz qx qy qz qw, deliberately out of order + comment
    q = np.array([0.1, -0.2, 0.3, 0.9])
    q /= np.linalg.norm(q)
    gt_lines = [
        "# ground truth trajectory",
        f"0.31 7.0 8.0 9.0 {q[0]} {q[1]} {q[2]} {q[3]}",
        "0.09 1.0 2.0 3.0 0.0 0.0 0.0 1.0",
        "0.22 4.0 5.0 6.0 0.0 0.0 0.0 1.0",
    ]
    (root / "groundtruth.txt").write_text("\n".join(gt_lines) + "\n")
    return root, q


def test_eth3d_slam_iterator(eth3d_slam_dir):
    root, q = eth3d_slam_dir
    samples = list(datasets.iter_eth3d_slam(str(root)))
    assert len(samples) == 3
    s0, s1, s2 = samples
    # rgb.txt lists the RIGHT camera; rgb2/ is the LEFT
    # (Stereo_Iterator.cpp:441-443)
    np.testing.assert_array_equal(s0.right.astype(np.uint8), _img(36, 44, 0))
    np.testing.assert_array_equal(s0.left.astype(np.uint8),
                                  _img(36, 44, 200))
    # nearest-timestamp GT alignment (binary search, :393-420)
    np.testing.assert_allclose(s0.gt_t, [1.0, 2.0, 3.0])   # 0.10 -> 0.09
    np.testing.assert_allclose(s1.gt_t, [4.0, 5.0, 6.0])   # 0.20 -> 0.22
    np.testing.assert_allclose(s2.gt_t, [7.0, 8.0, 9.0])   # 0.30 -> 0.31
    # TUM order is (tx ty tz qx qy qz qw): quaternion w is the LAST token
    np.testing.assert_allclose(s2.gt_R, _quat_to_R(q[3], q[0], q[1], q[2]),
                               atol=1e-9)

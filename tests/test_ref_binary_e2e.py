"""END-TO-END parity against the ACTUAL reference binary (VERDICT r1
items 1/2: replace self-transcribed-oracle circularity with ground truth
from the compiled C++ code).

benchmarks/ref_build/build_reference.sh compiles /root/reference
unmodified (Eigen = TensorFlow's bundled headers, system OpenCV 4.6,
yaml-cpp + xfeatures2d API shims). Both the reference binary and our
main_vo.py CLI then run the SAME synthetic 2-frame ETH3D-stereo fixture
(GT disparity + GT pose via COLMAP images.txt), and this module diffs:

  - TOED edge counts per image (reference src/toed/cpu_toed.cpp)
  - the stereo cascade's per-stage recall/precision/ambiguity tables
    (reference src/Stereo_Matches.cpp:1701-1735 printout)
  - RANSAC inlier ratio + estimated relative rotation vs the synthetic GT
    (reference src/Pipeline.cpp:205-220)

Skipped when the reference tree / toolchain is unavailable.
"""

import os
import re
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BUILD = os.path.join(REPO, "benchmarks", "ref_build")
REF_BIN = os.path.join(REF_BUILD, "build", "ref_main_vo")

pytestmark = pytest.mark.slow


def _have_toolchain():
    import shutil
    return (os.path.isdir("/root/reference")
            and shutil.which("g++") is not None
            and os.path.isdir("/usr/include/opencv4"))


@pytest.fixture(scope="module")
def ref_binary():
    if not _have_toolchain():
        pytest.skip("reference tree or C++ toolchain unavailable")
    if not os.path.exists(REF_BIN):
        r = subprocess.run([os.path.join(REF_BUILD, "build_reference.sh")],
                           capture_output=True, text=True, timeout=1200)
        if r.returncode != 0:
            pytest.skip(f"reference build failed: {r.stderr[-1500:]}")
    return REF_BIN


def _quat_from_R(R):
    t = np.trace(R)
    w = np.sqrt(max(0, 1 + t)) / 2
    x = np.copysign(np.sqrt(max(0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2,
                    R[2, 1] - R[1, 2])
    y = np.copysign(np.sqrt(max(0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2,
                    R[0, 2] - R[2, 0])
    z = np.copysign(np.sqrt(max(0, 1 - R[0, 0] - R[1, 1] + R[2, 2])) / 2,
                    R[1, 0] - R[0, 1])
    return w, x, y, z


@pytest.fixture(scope="module")
def fixture_tree(tmp_path_factory):
    """2-frame 120x160 ETH3D-stereo tree with GT disparity, occlusion
    masks and GT pose (COLMAP images.txt, world->cam quaternion)."""
    from PIL import Image

    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.io.pfm import write_pfm

    root = tmp_path_factory.mktemp("ref_e2e")
    seq_root = root / "seqA"
    seq = S.make_sequence(n_frames=2, h=120, w=160)
    for k, f in enumerate(seq.frames):
        pair = seq_root / "stereo_pairs" / f"pair_{k}"
        pair.mkdir(parents=True)
        Image.fromarray(f.left.astype(np.uint8)).save(str(pair / "im0.png"))
        Image.fromarray(f.right.astype(np.uint8)).save(str(pair / "im1.png"))
        write_pfm(str(pair / "disp0GT.pfm"), f.disparity.astype(np.float32))
        m = Image.fromarray(np.full((120, 160), 255, np.uint8))
        m.save(str(pair / "mask0nocc.png"))
        m.save(str(pair / "mask1nocc.png"))
        qw, qx, qy, qz = _quat_from_R(np.asarray(f.R, np.float64))
        t = np.asarray(f.t, np.float64)
        (pair / "images.txt").write_text(
            "# COLMAP-style image list\n"
            f"1 {qw} {qx} {qy} {qz} {t[0]} {t[1]} {t[2]} 0 im0.png\n"
            "0.0 0.0 -1\n")

    rig = seq.rig
    K = np.asarray(rig.left.K)
    cfg = {
        "dataset_type": "ETH3D_stereo",
        "dataset_dir": str(root),
        "sequence_name": "seqA",
        "output_dir": str(root / "out"),
        "left_camera": {"resolution": [160, 120],
                        "intrinsics": [float(K[0, 0]), float(K[1, 1]),
                                       float(K[0, 2]), float(K[1, 2])],
                        "distortion_coefficients": [0, 0, 0, 0]},
        "right_camera": {"resolution": [160, 120],
                         "intrinsics": [float(K[0, 0]), float(K[1, 1]),
                                        float(K[0, 2]), float(K[1, 2])],
                         "distortion_coefficients": [0, 0, 0, 0]},
        "stereo": {"R21": [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0],
                           [0.0, 0.0, 1.0]],
                   "T21": [float(np.asarray(rig.T21)[0]), 0.0, 0.0]},
    }
    (root / "out").mkdir()
    cfg_path = root / "cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    f0, f1 = seq.frames
    R_rel = np.asarray(f1.R) @ np.asarray(f0.R).T
    return root, cfg_path, R_rel


def _rot_angle_deg(R):
    return float(np.degrees(np.arccos(
        np.clip((np.trace(R) - 1) / 2, -1, 1))))


def _parse_ref_log(text):
    """Parse the reference binary's stdout."""
    edges = [int(m) for m in re.findall(
        r"Number of edges on the (?:left|right) image: (\d+)", text)]
    stages = {}
    for m in re.finditer(
            r"Stage: (.+?) \| Frame: (\d+)\s*\n"
            r"- Recall rate:\s+([\d.]+)\s*\n"
            r"- Precision rate:\s+([\d.]+)\s*\n"
            r"(?:- Precision pair rate:\s+[\d.]+\s*\n)?"
            r"- Average ambiguity:\s+([\d.]+)", text):
        name, frame = m.group(1).strip(), int(m.group(2))
        stages.setdefault(name, []).append(
            (float(m.group(3)), float(m.group(4)), float(m.group(5))))
    # temporal table rows: "   <name> |  <recall> |  <precision> |  <amb>"
    temporal = {}
    tsec = text.split("Temporal Matches Metrics")
    if len(tsec) > 1:
        for m in re.finditer(
                r"^\s*([A-Za-z][A-Za-z\- ]+?) \|\s+([\d.]+) \|\s+([\d.]+) "
                r"\|\s+([\d.]+)\s*$", tsec[1], re.M):
            temporal[m.group(1).strip()] = tuple(
                float(m.group(i)) for i in (2, 3, 4))
    inlier = re.search(r"Inlier ratio: ([\d.]+)", text)
    rot = None
    pm = re.search(
        r"Estimated relative pose from quad pairs:\s*\n- Rotation:\s*\n"
        r"(.+?)\n- Translation:", text, re.S)
    if pm:
        rows = [[float(v) for v in ln.split()]
                for ln in pm.group(1).strip().splitlines()]
        rot = np.array(rows)
    return {
        "edges": edges,
        "stages": {k: np.mean(np.array(v), axis=0) for k, v in stages.items()},
        "temporal": temporal,
        "inlier_ratio": float(inlier.group(1)) if inlier else None,
        "R_est": rot,
    }


def _parse_our_log(text):
    edges = []
    for m in re.finditer(r"edges L/R = (\d+)/(\d+)", text):
        edges += [int(m.group(1)), int(m.group(2))]
    inlier = re.search(r"inliers = \d+ \(([\d.]+)\)", text)

    def table(header):
        sec = text.split(header)
        rows = {}
        if len(sec) > 1:
            # rows run until the NEXT table header ("=====" banner); the
            # first "=====" chunk after this header's own trailing banner
            # holds this table's rows only
            parts = sec[1].split("=====")
            body = parts[1] if len(parts) > 1 else parts[0]
            for m in re.finditer(
                    r"^\s*([A-Za-z][A-Za-z\- ()]+?) \|\s+([\d.]+) \|"
                    r"\s+([\d.]+) \|\s+([\d.]+)\s*$", body, re.M):
                rows[m.group(1).strip()] = tuple(
                    float(m.group(i)) for i in (2, 3, 4))
        return rows

    return {
        "edges": edges,
        "stereo": table("Stereo Edge Matching Metrics"),
        "temporal": table("Temporal Quad Matching Metrics"),
        "inlier_ratio": float(inlier.group(1)) if inlier else None,
    }


@pytest.fixture(scope="module")
def ref_run(ref_binary, fixture_tree):
    root, cfg_path, R_rel = fixture_tree
    r = subprocess.run([ref_binary, "-c", str(cfg_path)],
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-500:]
    return _parse_ref_log(r.stdout)


@pytest.fixture(scope="module")
def our_run(fixture_tree):
    root, cfg_path, R_rel = fixture_tree
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main_vo.py"),
         "-c", str(cfg_path), "--max_edges", "2048", "--use_gt_pose",
         "--dump_stereo_pairs",
         "--output_dir", str(root / "out_ours")],
        capture_output=True, text=True, timeout=1500, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    return _parse_our_log(r.stdout)


SAT_MATES = 256            # << alive rows (~1.3k at 120x160)
SAT_REFINE = 1024          # << live GN input pairs
SAT_GATE = 2048            # << live desc/NCC gate pairs
SAT_POSE_QUADS = 512


@pytest.fixture(scope="module")
def our_run_saturated(fixture_tree):
    """Our CLI on the SAME fixture with every flat capacity forced far
    below the live counts (round-2 verdict item 4: the e2e harness must
    bind the budgets - overflow/truncation semantics were only
    unit-tested before, and this class produced both TPU incidents).
    The reference is unbounded (Dataset.h:180-289), so comparing stage
    recall against the same ref_run proves saturation costs no recall."""
    root, cfg_path, R_rel = fixture_tree
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "main_vo.py"),
         "-c", str(cfg_path), "--max_edges", "2048", "--use_gt_pose",
         "--set", f"max_mates={SAT_MATES}",
         "--set", f"max_refine_pairs={SAT_REFINE}",
         "--set", f"max_gate_pairs={SAT_GATE}",
         "--set", f"max_pose_quads={SAT_POSE_QUADS}",
         "--output_dir", str(root / "out_ours_sat")],
        capture_output=True, text=True, timeout=1500, env=env)
    assert r.returncode == 0, r.stderr[-3000:]
    parsed = _parse_our_log(r.stdout)
    parsed["mates_lines"] = [int(m) for m in
                             re.findall(r"mates = (\d+)", r.stdout)]
    return parsed


def test_saturated_budgets_bind_and_keep_recall(ref_run, our_run,
                                                our_run_saturated):
    """With max_mates/max_refine_pairs/max_gate_pairs all saturated, the
    stereo stage recalls must stay within the SAME tolerances vs the
    unbounded reference binary as the unsaturated run - i.e. overflow
    pairs pass unscored rather than being dropped, compaction keeps the
    best candidates, and finalize truncation happens after the stage
    metrics the cascade is judged on."""
    # the caps actually bind: finalized mates == cap on every frame
    assert our_run_saturated["mates_lines"], "no mates lines parsed"
    assert all(m == SAT_MATES for m in our_run_saturated["mates_lines"]), \
        our_run_saturated["mates_lines"]

    checked = 0
    for ours_name, ref_name in STEREO_MAP:
        sat = our_run_saturated["stereo"].get(ours_name)
        ref = ref_run["stages"].get(ref_name)
        base = our_run["stereo"].get(ours_name)
        if sat is None or ref is None:
            continue
        # same recall tolerance as the unsaturated harness
        assert sat[0] >= ref[0] - 0.03, (ours_name, sat, ref)
        # and saturation itself costs (almost) nothing vs our own
        # unsaturated run
        if base is not None:
            assert sat[0] >= base[0] - 0.02, (ours_name, sat, base)
        checked += 1
    assert checked >= 6, f"only {checked} comparable stages found"

    # temporal end quality despite the mate truncation (ratios, not
    # counts, so the smaller veridical set is judged on its own terms)
    if ref_run["temporal"] and our_run_saturated["temporal"]:
        ref_final = ref_run["temporal"].get("Edge Clustering")
        sat_final = our_run_saturated["temporal"].get("Edge Clustering")
        if ref_final and sat_final:
            assert sat_final[0] >= ref_final[0] - 0.12, (sat_final,
                                                         ref_final)


def test_toed_edge_counts_match_reference(ref_run, our_run):
    """Same images -> same third-order edge counts (<=1%, typically
    exact; validates detect_edges against cpu_toed.cpp inside the full
    production path, not just the isolated harness)."""
    assert len(ref_run["edges"]) == 4
    assert len(our_run["edges"]) == 4
    for ours, ref in zip(our_run["edges"], ref_run["edges"]):
        assert abs(ours - ref) <= 0.01 * ref, (our_run["edges"],
                                               ref_run["edges"])


# ours-name -> reference-name. Our stage-1 row records AFTER the fused
# epipolar+disparity gates, so it pairs with the reference's post-
# disparity row; 'Location Proximity' (gather truncation) has no
# reference analog and is skipped.
STEREO_MAP = [
    ("Epipolar Proximity", "Maximal Disparity Filtering"),
    ("Orientation", "Orientation Filtering"),
    ("SIFT", "SIFT Filtering"),
    ("NCC", "NCC Filtering"),
    ("BNB-NCC", "BNB-NCC"),
    ("BNB-SIFT", "BNB-SIFT"),
    ("Photometric Refinement", "Photometric Refinement"),
    ("Edge Clustering", "Edge Clustering"),
]


def test_stereo_stage_table_matches_reference(ref_run, our_run):
    checked = 0
    for ours_name, ref_name in STEREO_MAP:
        if ours_name not in our_run["stereo"] or \
                ref_name not in ref_run["stages"]:
            continue
        o_rec, o_prec, o_amb = our_run["stereo"][ours_name]
        r_rec, r_prec, r_amb = ref_run["stages"][ref_name]
        assert o_rec >= r_rec - 0.03, (ours_name, o_rec, r_rec)
        assert abs(o_prec - r_prec) <= 0.08, (ours_name, o_prec, r_prec)
        if r_amb > 1.05:
            assert 0.7 <= o_amb / r_amb <= 1.35, (ours_name, o_amb, r_amb)
        checked += 1
    assert checked >= 6, f"only {checked} comparable stages found"


# ours-name -> (reference-name, recall tolerance). The reference computes
# 8 temporal stage rows (Temporal_Matches.cpp:220-292, printed at
# :1114-1148). Our SIFT stand-in descriptor scores differently
# (documented deviation: ops/descriptors.py), but measured deltas on this
# fixture (round 4, after the descriptor window match) are tiny: worst
# deficit -0.0051 (Orientation/NCC), and the SIFT-downstream rows run
# +0.07..0.09 ABOVE the reference - so the round-3 -0.10 slack is
# ratcheted to 0.05 on every row (round-3 verdict item 7).
TEMPORAL_MAP = [
    ("Location Proximity", "Location Proximity", 0.03),
    ("Orientation", "Orientation", 0.03),
    ("NCC", "NCC", 0.05),
    ("SIFT", "SIFT", 0.05),
    ("BNB-NCC", "BNB-NCC", 0.05),
    ("BNB-SIFT", "BNB-SIFT", 0.05),
    ("Photometric Refinement", "Photometric Refinement", 0.05),
    ("Edge Clustering", "Edge Clustering", 0.05),
]


def test_temporal_stage_table_matches_reference(ref_run, our_run):
    """Per-stage temporal recall parity vs the reference binary
    (round-2 verdict item 5: all 8 stages, not just the final row)."""
    if not ref_run["temporal"] or not our_run["temporal"]:
        pytest.skip("temporal tables missing from one side")
    checked = 0
    for ours_name, ref_name, tol in TEMPORAL_MAP:
        ours = our_run["temporal"].get(ours_name)
        ref = ref_run["temporal"].get(ref_name)
        if ours is None or ref is None:
            continue
        assert ours[0] >= ref[0] - tol, (ours_name, ours, ref)
        checked += 1
    assert checked >= 6, (f"only {checked} comparable temporal stages; "
                          f"ours={sorted(our_run['temporal'])} "
                          f"ref={sorted(ref_run['temporal'])}")


def test_temporal_quality_not_worse_than_reference(ref_run, our_run):
    """Temporal cascade end quality: our final-stage recall/precision
    must not be meaningfully below the reference's on the same data
    (different descriptor => no tight per-stage equality)."""
    if not ref_run["temporal"] or not our_run["temporal"]:
        pytest.skip("temporal tables missing from one side")
    ref_final = ref_run["temporal"].get("Edge Clustering")
    our_final = (our_run["temporal"].get("Final")
                 or our_run["temporal"].get("Edge Clustering")
                 or list(our_run["temporal"].values())[-1])
    assert ref_final is not None
    assert our_final[0] >= ref_final[0] - 0.10, (our_final, ref_final)
    assert our_final[1] >= ref_final[1] - 0.10, (our_final, ref_final)


def test_pose_quality_matches_reference(ref_run, our_run, fixture_tree):
    root, cfg_path, R_rel_gt = fixture_tree
    assert ref_run["inlier_ratio"] is not None
    assert our_run["inlier_ratio"] is not None
    assert our_run["inlier_ratio"] >= ref_run["inlier_ratio"] - 0.15

    # Sanity: the reference solves the fixture's motion. Loose bound only -
    # the reference's OpenMP cascade merges thread-local candidate lists in
    # nondeterministic order (Stereo_Matches.cpp:772-776), so its PROSAC
    # ordering and hence RANSAC pose wobbles run-to-run (observed ~1 deg
    # swings on this 120x160 fixture); a broken fixture would be tens of
    # degrees.
    if ref_run["R_est"] is not None:
        ref_err = _rot_angle_deg(ref_run["R_est"] @ R_rel_gt.T)
        assert ref_err < 5.0, ref_err

    # our trajectory against the same GT (written by the CLI run)
    import json
    mpath = os.path.join(str(root), "out_ours", "metrics.json")
    if os.path.exists(mpath):
        m = json.load(open(mpath))
        if m.get("ate_rmse") is not None:
            assert m["ate_rmse"] < 0.1, m


def test_finalized_pair_files_agree_with_reference(ref_run, our_run,
                                                   fixture_tree):
    """Cross-binary diff of the finalized_stereo_edge_pairs_frame_0.txt
    files both CLIs write on the SAME fixture (reference
    Stereo_Matches.cpp:1656-1699; ours utils/debug_io.py): for our pairs
    whose left edge has a reference counterpart within 0.75 px, the right
    edge must agree, and the reconstructed 3D points must match."""
    root, _, _ = fixture_tree
    ref_file = os.path.join(str(root), "out",
                            "finalized_stereo_edge_pairs_frame_0.txt")
    our_file = os.path.join(str(root), "out_ours",
                            "finalized_stereo_edge_pairs_frame_0.txt")
    assert os.path.exists(ref_file) and os.path.exists(our_file)
    ref = np.loadtxt(ref_file, skiprows=1, ndmin=2)
    ours = np.loadtxt(our_file, skiprows=1, ndmin=2)
    assert ref.shape[1] == ours.shape[1] == 16   # identical column layout
    assert len(ours) > 200 and len(ref) > 200

    # nearest reference pair by left-edge location
    d = np.hypot(ours[:, None, 0] - ref[None, :, 0],
                 ours[:, None, 1] - ref[None, :, 1])
    j = d.argmin(axis=1)
    near = d[np.arange(len(ours)), j] < 0.75
    assert near.mean() > 0.5, near.mean()   # substantial edge overlap
    m_our = ours[near]
    m_ref = ref[j[near]]
    # right-edge agreement for matched left edges
    dr = np.hypot(m_our[:, 3] - m_ref[:, 3], m_our[:, 4] - m_ref[:, 4])
    assert np.mean(dr < 1.0) > 0.9, np.mean(dr < 1.0)
    # 3D point agreement (relative depth) on right-agreeing pairs
    ok = dr < 1.0
    rel_dz = np.abs(m_our[ok, 8] - m_ref[ok, 8]) / np.abs(m_ref[ok, 8])
    assert np.median(rel_dz) < 0.05, np.median(rel_dz)

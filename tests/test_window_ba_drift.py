"""Long-sequence WindowBA tests (VERDICT r1 item 6).

A 24-keyframe synthetic corridor sequence with a noisy odometry chain:
sliding-window BA applied in the pipeline's incremental fashion (correct
the newest pose after every keyframe) must reduce ATE drift vs the raw
chain, and the mesh-sharded solve must equal single-device.

These feed WindowBA.add_keyframe directly with synthetic mates (the image
pipeline is exercised by tests/test_pipeline.py::test_pipeline_with_
windowed_ba); the point here is the track bookkeeping + solver over a
sequence 6x longer than the BA window.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from edge_based_visual_odometry_tpu import geometry as geom
from edge_based_visual_odometry_tpu.models.window_ba import (
    WindowBA, WindowBAConfig)

pytestmark = pytest.mark.heavy  # multi-second jitted integration programs

K_CAM = np.array([[300.0, 0.0, 160.0],
                  [0.0, 300.0, 120.0],
                  [0.0, 0.0, 1.0]], np.float32)
W, H = 320, 240


class FakeMates:
    """Just the StereoMates fields add_keyframe reads (models/types.py)."""

    def __init__(self, x, y, theta, gamma, valid):
        self.left_x = np.asarray(x, np.float32)
        self.left_y = np.asarray(y, np.float32)
        self.left_theta = np.asarray(theta, np.float32)
        self.gamma = np.asarray(gamma, np.float32)
        self.valid = np.asarray(valid, bool)
        self.count = np.int32(len(x))


def _rot(axis, deg):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    a = np.radians(deg)
    Kx = np.array([[0, -axis[2], axis[1]],
                   [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    return np.eye(3) + np.sin(a) * Kx + (1 - np.cos(a)) * (Kx @ Kx)


def make_corridor(n_kf=24, n_lm=400, seed=3):
    """GT world->cam poses walking down +z, landmarks ahead of the camera,
    per-KF observations (slot == landmark id), and a NOISY relative-pose
    chain with enough per-step error to accumulate visible drift."""
    rng = np.random.default_rng(seed)
    # landmarks spread along the corridor so every KF sees a few hundred
    X = np.stack([rng.uniform(-8, 8, n_lm),
                  rng.uniform(-5, 5, n_lm),
                  rng.uniform(2.0, 2.0 + 0.35 * n_kf + 20, n_lm)], 1)

    frames = []
    poses_gt = []
    rels_noisy = []
    prev_T = None
    for k in range(n_kf):
        C = np.array([0.05 * np.sin(0.4 * k), 0.0, 0.35 * k])
        R = _rot([0, 1, 0], 1.5 * np.sin(0.3 * k))    # gentle yaw wiggle
        t = -R @ C
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        poses_gt.append(T)

        Xc = X @ R.T + t
        uvw = Xc @ K_CAM.T
        uv = uvw[:, :2] / np.maximum(uvw[:, 2:3], 1e-9)
        valid = (Xc[:, 2] > 1.0) & (uv[:, 0] > 5) & (uv[:, 0] < W - 5) \
            & (uv[:, 1] > 5) & (uv[:, 1] < H - 5)
        uv_meas = uv + rng.normal(0, 0.2, uv.shape)
        gamma = Xc + rng.normal(0, 0.03, Xc.shape)      # stereo triang noise
        theta = rng.uniform(0, np.pi, n_lm)
        frames.append(FakeMates(uv_meas[:, 0], uv_meas[:, 1], theta,
                                gamma, valid))

        if prev_T is not None:
            rel_gt = T @ np.linalg.inv(prev_T)
            dR = _rot(rng.normal(size=3), rng.normal(0, 0.45))
            dt = rng.normal(0, 0.025, 3)
            rel = rel_gt.copy()
            rel[:3, :3] = dR @ rel_gt[:3, :3]
            rel[:3, 3] = rel_gt[:3, 3] + dt
            rels_noisy.append(rel)
        prev_T = T
    return X, poses_gt, frames, rels_noisy


def _center(T):
    return -T[:3, :3].T @ T[:3, 3]


def _ate(traj, poses_gt):
    err = [np.linalg.norm(_center(a) - _center(b))
           for a, b in zip(traj, poses_gt)]
    return float(np.sqrt(np.mean(np.square(err))))


def _pose(T):
    return geom.Pose(jnp.asarray(T[:3, :3], jnp.float32),
                     jnp.asarray(T[:3, 3], jnp.float32))


def run_chain(frames, rels_noisy, poses_gt, wba):
    """Incremental odometry exactly as VOPipeline does it: compose the
    noisy relative pose onto the latest (BA-corrected) estimate, register
    the keyframe, then let BA refresh the newest pose."""
    n_lm = len(frames[0].left_x)
    links = np.arange(n_lm)
    est = [poses_gt[0].copy()]
    if wba is not None:
        wba.add_keyframe(frames[0], _pose(est[0]))
    for k in range(1, len(frames)):
        T = rels_noisy[k - 1] @ est[-1]
        if wba is None:
            est.append(T)
            continue
        wba.add_keyframe(frames[k], _pose(T), links)
        out = wba.run()
        if out is not None:
            poses, _ = out
            R = np.asarray(poses[-1].R, np.float64)
            t = np.asarray(poses[-1].t, np.float64)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
        est.append(T)
    return est


@pytest.fixture(scope="module")
def corridor():
    return make_corridor()


def test_window_ba_reduces_drift(corridor):
    X, poses_gt, frames, rels = corridor
    raw = run_chain(frames, rels, poses_gt, None)
    wba = WindowBA(K_CAM, WindowBAConfig(
        window=6, max_landmarks=512, max_obs=4096, n_iters=6))
    ba = run_chain(frames, rels, poses_gt, wba)
    ate_raw = _ate(raw, poses_gt)
    ate_ba = _ate(ba, poses_gt)
    # the raw chain must actually drift for the test to mean anything
    assert ate_raw > 0.05, f"fixture too easy: raw ATE {ate_raw}"
    assert ate_ba < 0.7 * ate_raw, \
        f"BA ATE {ate_ba:.4f} vs raw {ate_raw:.4f}"


def test_window_ba_sharded_matches_single(corridor):
    """In-loop sharded BA == single-device (VERDICT r1 item 6 gate)."""
    from jax.sharding import Mesh

    X, poses_gt, frames, rels = corridor
    cfg = WindowBAConfig(window=6, max_landmarks=512, max_obs=4096,
                         n_iters=4)
    mesh = Mesh(np.array(jax.devices()[:8]), ("lm",))
    single = run_chain(frames[:8], rels[:7], poses_gt[:8],
                       WindowBA(K_CAM, cfg))
    sharded = run_chain(frames[:8], rels[:7], poses_gt[:8],
                        WindowBA(K_CAM, cfg, mesh=mesh))
    for a, b in zip(single, sharded):
        np.testing.assert_allclose(a, b, atol=1e-4)

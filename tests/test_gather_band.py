"""Epipolar-derived stereo gather band (round-1 ADVICE: the fixed ±4 px
vertical window silently loses candidates on verged rigs).

The reference scans ALL right edges in its epipolar filter
(Stereo_Matches.cpp:381-419) so it has no such blind spot; our banded grid
query needs a static vertical bound, now derived from the rig's F-matrix
(stereo_matcher.derive_gather_band).
"""

import numpy as np

from edge_based_visual_odometry_tpu.config import CameraConfig, StereoRig, VOConfig
from edge_based_visual_odometry_tpu.models.stereo_matcher import derive_gather_band
from edge_based_visual_odometry_tpu.ops import grid as GRID


def _rect_rig(h=240, w=320):
    cam = CameraConfig(width=w, height=h, fx=300.0, fy=300.0,
                       cx=w / 2.0, cy=h / 2.0)
    return StereoRig(left=cam, right=cam,
                     R21=((1, 0, 0), (0, 1, 0), (0, 0, 1)),
                     T21=(-0.12, 0.0, 0.0))


def _verged_rig(h=240, w=320, roll_deg=18.0):
    """Right camera rolled about the optical axis: epipolar lines tilt by
    ~roll, so true candidates sit many px off the horizontal."""
    cam = CameraConfig(width=w, height=h, fx=300.0, fy=300.0,
                       cx=w / 2.0, cy=h / 2.0)
    a = np.deg2rad(roll_deg)
    Rz = np.array([[np.cos(a), -np.sin(a), 0.0],
                   [np.sin(a), np.cos(a), 0.0],
                   [0.0, 0.0, 1.0]])
    # baseline horizontal in the LEFT frame (camera center C = (0.12,0,0)):
    # T21 = -R21 @ C gains a y-component, so right-image epipolar lines
    # tilt by ~roll (T21 along the right x-axis would keep them horizontal)
    T21 = -Rz @ np.array([0.12, 0.0, 0.0])
    return StereoRig(left=cam, right=cam,
                     R21=tuple(tuple(r) for r in Rz),
                     T21=tuple(T21))


def test_rectified_rig_keeps_reference_band():
    cfg = VOConfig()
    ry = derive_gather_band(_rect_rig(), cfg)
    assert abs(ry - 4.0) < 1e-6   # horizontal lines -> the old default


def test_verged_rig_widens_band():
    cfg = VOConfig()
    ry = derive_gather_band(_verged_rig(), cfg)
    # roll 18 deg -> |sin| ~ 0.31 -> ry ~ 25 * 0.31 + 1.5 ~ 9.2
    assert ry > 7.0


def test_band_recall_on_verged_rig():
    """True epipolar candidates outside ±4 px must be recovered by the
    derived band (ry=4 measurably loses them)."""
    cfg = VOConfig()
    rig = _verged_rig()
    F = rig.F21
    h, w = 240, 320
    rng = np.random.default_rng(0)
    Q = 400
    lx = rng.uniform(60, w - 60, Q)
    ly = rng.uniform(60, h - 60, Q)

    # place the true right match ON the epipolar line at a disparity-sized
    # offset toward the epipole (what a real 3D point would project to)
    lines = np.stack([lx, ly, np.ones(Q)], -1) @ F.T
    d = np.stack([-lines[:, 1], lines[:, 0]], -1)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # foot of (lx, ly) on its own epipolar line, then walk along the line
    denom = lines[:, 0] ** 2 + lines[:, 1] ** 2
    val = lines[:, 0] * lx + lines[:, 1] * ly + lines[:, 2]
    foot = np.stack([lx - lines[:, 0] * val / denom,
                     ly - lines[:, 1] * val / denom], -1)
    step = rng.uniform(5.0, 20.0, Q)
    sign = np.where(d[:, 0] > 0, -1.0, 1.0)     # walk toward smaller x
    rx_true = foot[:, 0] + sign * step * d[:, 0]
    ry_true = foot[:, 1] + sign * step * d[:, 1]
    dist = np.hypot(rx_true - lx, ry_true - ly)
    keep = (dist < cfg.max_disparity) & (rx_true > 5) & (rx_true < w - 5) \
        & (ry_true > 5) & (ry_true < h - 5)
    lx, ly = lx[keep], ly[keep]
    rx_true, ry_true = rx_true[keep], ry_true[keep]
    Qk = len(lx)
    assert Qk > 200
    dy = np.abs(ry_true - ly)
    assert (dy > 4.0).mean() > 0.3, "fixture must stress the old band"

    import jax.numpy as jnp
    g = GRID.build_sorted_grid(jnp.asarray(rx_true, jnp.float32),
                               jnp.asarray(ry_true, jnp.float32),
                               jnp.ones(Qk, bool), w, h, band_h=8)

    def recall(ry_band):
        nbw = int(-(-2.0 * ry_band // 8)) + 1
        idx, mask = GRID.query_sorted_grid(
            g, jnp.asarray(lx, jnp.float32), jnp.asarray(ly, jnp.float32),
            rx=cfg.max_disparity + 1.5, ry=ry_band,
            slots_per_band=max(8, cfg.gather_slots // nbw),
            n_band_window=nbw)
        idx, mask = np.asarray(idx), np.asarray(mask)
        hit = [(idx[q][mask[q]] == q).any() for q in range(Qk)]
        return np.mean(hit)

    ry_derived = derive_gather_band(rig, cfg)
    assert recall(4.0) < 0.9, "old fixed band must show the blind spot"
    assert recall(ry_derived) > 0.999

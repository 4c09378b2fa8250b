"""TOED kernel parity vs the float64 NumPy oracle."""

import numpy as np
import pytest

from edge_based_visual_odometry_tpu.ops import toed
from tests import toed_oracle as oracle


def synthetic_image(h=72, w=80, seed=0):
    """Smooth synthetic test image with strong oriented structures."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (
        120.0
        + 80.0 * np.sin(0.21 * xx + 0.13 * yy)
        + 50.0 * (np.tanh((xx - 0.7 * yy - 15.0) / 1.5))
        + 40.0 * np.cos(0.17 * yy)
    )
    img += rng.normal(0, 1.0, size=(h, w))
    return np.clip(img, 0, 255).astype(np.float64)


@pytest.fixture(scope="module")
def image():
    return synthetic_image()


@pytest.fixture(scope="module")
def oracle_field(image):
    return oracle.oracle_gradient_field(image)


def test_gradient_field_matches_oracle(image, oracle_field):
    Ix_o, Iy_o, mag_o, ori_o = oracle_field
    Ix, Iy, mag, ori = toed.toed_gradient_field(
        np.asarray(image, np.float32))
    Ix, Iy, mag, ori = map(np.asarray, (Ix, Iy, mag, ori))

    np.testing.assert_allclose(Ix, Ix_o, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(Iy, Iy_o, rtol=2e-4, atol=2e-3)
    np.testing.assert_allclose(mag, mag_o, rtol=2e-4, atol=2e-3)
    # Orientation: compare where magnitude is significant (atan2 of noise
    # is meaningless)
    m = mag_o > 2.0
    dori = np.abs(ori[m] - ori_o[m])
    dori = np.minimum(dori, 2 * np.pi - dori)
    assert np.quantile(dori, 0.999) < 1e-2
    assert dori.mean() < 1e-4


def test_detect_edges_matches_oracle(image, oracle_field):
    ref_edges = oracle.oracle_nms(*oracle_field, image.shape[0], image.shape[1])
    got = toed.detect_edges(np.asarray(image, np.float32), max_edges=4096)
    n = int(got.count)
    gx = np.asarray(got.x)[:n]
    gy = np.asarray(got.y)[:n]
    gt = np.asarray(got.theta)[:n]

    assert len(ref_edges) > 50, "oracle should find plenty of edges"
    # Counts should agree within a small tolerance (f32 tie-breaking near
    # thresholds can flip a handful of marginal pixels)
    assert abs(n - len(ref_edges)) <= max(3, 0.01 * len(ref_edges))

    ref = np.array([(e[0], e[1]) for e in ref_edges])
    ref_theta = np.array([e[2] for e in ref_edges])
    # Match each detected edge to nearest oracle edge
    d2 = ((gx[:, None] - ref[None, :, 0]) ** 2
          + (gy[:, None] - ref[None, :, 1]) ** 2)
    nn = d2.argmin(axis=1)
    nn_dist = np.sqrt(d2[np.arange(n), nn])
    assert np.quantile(nn_dist, 0.99) < 0.05, "subpixel positions must agree"
    dth = np.abs(gt - ref_theta[nn])
    dth = np.minimum(dth, 2 * np.pi - dth)
    assert np.quantile(dth, 0.98) < 1e-2


def test_detect_edges_raster_order(image):
    got = toed.detect_edges(np.asarray(image, np.float32), max_edges=4096)
    n = int(got.count)
    gy = np.asarray(got.y)[:n]
    # Raster order over the interp grid implies nondecreasing y up to
    # subpixel jitter (< 1 interp px = 0.5 img px)
    assert np.all(np.diff(gy) > -1.0)


def test_capacity_overflow_truncates():
    img = synthetic_image()
    got = toed.detect_edges(np.asarray(img, np.float32), max_edges=16)
    assert int(got.count) == 16
    assert np.asarray(got.valid).sum() == 16

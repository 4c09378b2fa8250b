"""Image preprocessing: Sobel and undistortion parity vs OpenCV."""

import numpy as np
import jax.numpy as jnp
import pytest

from edge_based_visual_odometry_tpu.ops import image as IMG

cv2 = pytest.importorskip("cv2")


def test_sobel_matches_opencv(rng):
    img = rng.uniform(0, 255, (64, 80)).astype(np.float32)
    gx, gy = IMG.sobel_gradients(jnp.asarray(img))
    ref_gx = cv2.Sobel(img, cv2.CV_32F, 1, 0, ksize=3, scale=1.0 / 8.0)
    ref_gy = cv2.Sobel(img, cv2.CV_32F, 0, 1, ksize=3, scale=1.0 / 8.0)
    np.testing.assert_allclose(np.asarray(gx), ref_gx, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gy), ref_gy, atol=1e-3)


def test_undistort_matches_opencv(rng):
    h, w = 120, 160
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (120 + 60 * np.sin(0.2 * xx) + 40 * np.cos(0.15 * yy)).astype(np.float32)
    K = np.array([[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1]])
    dist = np.array([-0.28, 0.07, 0.0002, -0.0001])
    ours = np.asarray(IMG.undistort(jnp.asarray(img), jnp.asarray(K, jnp.float32),
                                    jnp.asarray(dist, jnp.float32)))
    ref = cv2.undistort(img, K, dist)
    # compare away from borders (border extrapolation differs)
    a = ours[10:-10, 10:-10]
    b = ref[10:-10, 10:-10]
    assert np.median(np.abs(a - b)) < 0.5
    assert np.mean(np.abs(a - b) < 2.0) > 0.95

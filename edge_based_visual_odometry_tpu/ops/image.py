"""Image preprocessing ops: Sobel gradients and undistortion remap.

Device-side replacements for the host OpenCV calls in the reference's
prepare_Stereo_Images (src/Pipeline.cpp:64-107):

  - `sobel_gradients`: cv::Sobel(ksize=3, scale=1/8) equivalent
    (util_compute_Img_Gradients, include/utility.h:131-141), with
    reflect-101 borders like OpenCV's default.
  - `undistort`: cv::undistort equivalent - iterative inverse of the
    radial-tangential (k1, k2, p1, p2) model + bilinear remap, jitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from edge_based_visual_odometry_tpu.ops import patches as P

_SOBEL_X = jnp.array([[-1.0, 0.0, 1.0],
                      [-2.0, 0.0, 2.0],
                      [-1.0, 0.0, 1.0]], jnp.float32) / 8.0
_SOBEL_Y = _SOBEL_X.T


def _conv3(img: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """3x3 correlation with reflect-101 borders as unrolled shift-adds
    (a 1-channel conv is degenerate for conv libraries; elementwise FMAs
    fuse into ~2 memory passes)."""
    H, W = img.shape
    p = jnp.pad(img, 1, mode="reflect")  # OpenCV BORDER_REFLECT_101
    k_host = __import__("numpy").asarray(k)
    acc = None
    for a in range(3):
        for b in range(3):
            w = float(k_host[a, b])
            if w == 0.0:
                continue
            s = jax.lax.dynamic_slice(p, (a, b), (H, W))
            acc = w * s if acc is None else acc + w * s
    return acc


def sobel_gradients(img: jnp.ndarray):
    """(gx, gy) with the reference's 1/8 scaling (utility.h:139-140)."""
    img = img.astype(jnp.float32)
    return _conv3(img, _SOBEL_X), _conv3(img, _SOBEL_Y)


def undistort(img: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray,
              n_iter: int = 5) -> jnp.ndarray:
    """Undistort with the OpenCV (k1, k2, p1, p2) model.

    For each undistorted pixel, apply the FORWARD distortion model to find
    the source pixel in the distorted input, then bilinear-sample - exactly
    cv::undistort's remap semantics (src/Pipeline.cpp:78-79). `n_iter` is
    unused in this direction (kept for API symmetry).
    """
    H, W = img.shape
    k1, k2, p1, p2 = dist[0], dist[1], dist[2], dist[3]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    jj = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    ii = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = (jj - cx) / fx
    y = (ii - cy) / fy
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    src_x = xd * fx + cx
    src_y = yd * fy + cy
    return P.bilinear_sample_clamp(img.astype(jnp.float32), src_x, src_y)

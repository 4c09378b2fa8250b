"""Patch sampling / NCC / GN refiners vs direct NumPy references."""

import numpy as np
import jax
import jax.numpy as jnp

from edge_based_visual_odometry_tpu.ops import patches as P
from edge_based_visual_odometry_tpu.ops import gauss_newton as GN


def np_bilinear_clamp(img, x, y):
    h, w = img.shape
    x = np.clip(x, 0, w - 1.0)
    y = np.clip(y, 0, h - 1.0)
    x0, y0 = int(np.floor(x)), int(np.floor(y))
    x1, y1 = min(x0 + 1, w - 1), min(y0 + 1, h - 1)
    a, b = x - x0, y - y0
    return ((1 - a) * (1 - b) * img[y0, x0] + a * (1 - b) * img[y0, x1]
            + (1 - a) * b * img[y1, x0] + a * b * img[y1, x1])


def smooth_image(h=64, w=64, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    return (100 + 60 * np.sin(0.2 * xx) + 40 * np.cos(0.15 * yy)
            + 20 * np.sin(0.1 * (xx + yy))).astype(np.float32)


def test_bilinear_samplers():
    img = smooth_image()
    pts = [(3.2, 4.7), (10.0, 20.5), (63.0, 63.0), (0.0, 0.0)]
    for x, y in pts:
        v = P.bilinear_sample_clamp(jnp.asarray(img), jnp.float32(x), jnp.float32(y))
        np.testing.assert_allclose(float(v), np_bilinear_clamp(img, x, y), rtol=1e-5)
    v, inb = P.bilinear_sample_nan(jnp.asarray(img), jnp.float32(-0.5), jnp.float32(3.0))
    assert not bool(inb)
    v, inb = P.bilinear_sample_nan(jnp.asarray(img), jnp.float32(62.5), jnp.float32(3.0))
    assert bool(inb)
    v, inb = P.bilinear_sample_nan(jnp.asarray(img), jnp.float32(63.5), jnp.float32(3.0))
    assert not bool(inb)


def test_orthogonal_shift_matches_reference_formula():
    # plus = (x + m sin t, y - m cos t) (src/utility.cpp:82-93)
    x, y, t, m = 10.0, 20.0, 0.3, 5.0
    plus, minus = P.orthogonal_shifted_points(
        jnp.float32(x), jnp.float32(y), jnp.float32(t), m)
    np.testing.assert_allclose(
        np.asarray(plus), [x + m * np.sin(t), y - m * np.cos(t)], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(minus), [x - m * np.sin(t), y + m * np.cos(t)], rtol=1e-6)


def test_rotated_patch_coords_layout():
    # (cx + cos t * i - sin t * j, cy + sin t * i + cos t * j), i outer
    # (utility.h:143-157)
    t = 0.5
    coords = P.rotated_patch_coords(
        jnp.float32(7.0), jnp.float32(9.0), jnp.float32(t), 7)
    coords = np.asarray(coords)
    assert coords.shape == (49, 2)
    k = 0
    for i in range(-3, 4):
        for j in range(-3, 4):
            np.testing.assert_allclose(
                coords[k],
                [7.0 + np.cos(t) * i - np.sin(t) * j,
                 9.0 + np.sin(t) * i + np.cos(t) * j], rtol=1e-5)
            k += 1


def test_ncc_properties():
    rng = np.random.default_rng(2)
    p = rng.normal(size=49).astype(np.float32)
    q = (2.5 * p + 7.0).astype(np.float32)   # affine -> NCC 1
    r = rng.normal(size=49).astype(np.float32)
    s1 = float(P.ncc(jnp.asarray(p), jnp.asarray(q)))
    assert abs(s1 - 1.0) < 1e-5
    s2 = float(P.ncc(jnp.asarray(p), jnp.asarray(-p)))
    assert abs(s2 + 1.0) < 1e-5
    # degenerate (constant) patch -> -1 (src/utility.cpp:170-172)
    s3 = float(P.ncc(jnp.asarray(np.full(49, 3.0, np.float32)), jnp.asarray(r)))
    assert s3 == -1.0
    # invalid flag forces -1
    s4 = float(P.ncc(jnp.asarray(p), jnp.asarray(q), jnp.asarray(False)))
    assert s4 == -1.0


def test_edge_patches_two_sides_differ_across_edge():
    # An image with a vertical step edge: the two side patches must see
    # different intensities.
    img = np.zeros((64, 64), np.float32)
    img[:, 32:] = 200.0
    vp, vm, okp, okm = P.edge_patches(
        jnp.asarray(img), jnp.float32(31.5), jnp.float32(32.0),
        jnp.float32(np.pi / 2), 7, 5.0)  # vertical edge -> theta = 90 deg
    assert bool(okp) and bool(okm)
    assert abs(float(jnp.mean(vp)) - float(jnp.mean(vm))) > 100.0


def test_gn_epipolar_recovers_shift():
    """Construct right image as left shifted by 3.25 px along x; GN from a
    candidate 2 px off must recover the shift."""
    img = smooth_image()
    shift = 3.25
    xs = np.arange(64, dtype=np.float32)
    right = np.stack([np.interp(xs + shift, xs, img[r]) for r in range(64)]).astype(np.float32)
    gx = np.gradient(right, axis=1).astype(np.float32)
    gy = np.gradient(right, axis=0).astype(np.float32)

    # left edge at (30, 30), true right match at (30 - shift, 30)
    res = GN.refine_along_epipolar(
        jnp.asarray(img), jnp.asarray(right), jnp.asarray(gx), jnp.asarray(gy),
        jnp.float32(30.0), jnp.float32(30.0), jnp.float32(np.pi / 2),
        jnp.float32(30.0 - shift + 2.0), jnp.float32(30.0),
        jnp.asarray([1.0, 0.0], jnp.float32))
    # refined position = candidate + alpha * dir should land near the truth
    refined_x = 30.0 - shift + 2.0 + float(res.delta)
    assert abs(refined_x - (30.0 - shift)) < 0.2
    assert bool(res.valid)


def analytic_image(h, w, ox=0.0, oy=0.0):
    """Closed-form intensity field with strong structure in BOTH axes
    (weak y-texture leaves the 2-DoF GN ill-conditioned in y, which is
    algorithm behavior, not a bug), evaluated at (x + ox, y + oy)."""
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    xx = xx + ox
    yy = yy + oy
    return (100 + 45 * np.sin(0.35 * xx) + 45 * np.cos(0.4 * yy)
            + 25 * np.sin(0.25 * (xx + yy))).astype(np.float32)


def test_gn_2dof_recovers_shift():
    dx_true, dy_true = 2.5, -1.25
    img = analytic_image(64, 64)
    # CF frame: same field sampled shifted so the KF feature at (x, y)
    # appears at (x - dx_true, y - dy_true) in CF.
    cf = analytic_image(64, 64, ox=dx_true, oy=dy_true)
    gx = np.gradient(cf, axis=1).astype(np.float32)
    gy = np.gradient(cf, axis=0).astype(np.float32)

    kx, ky = 30.0, 30.0
    # true CF location of the KF point
    cx_true, cy_true = kx - dx_true, ky - dy_true
    res = GN.refine_2dof(
        jnp.asarray(img), jnp.asarray(cf), jnp.asarray(gx), jnp.asarray(gy),
        jnp.float32(kx), jnp.float32(ky), jnp.float32(0.7),
        jnp.float32(cx_true + 1.0), jnp.float32(cy_true - 0.8), jnp.float32(0.7))
    d = np.asarray(res.delta)
    refined = np.array([kx - d[0], ky - d[1]])
    assert np.linalg.norm(refined - [cx_true, cy_true]) < 0.2
    assert bool(res.valid)


def test_gn_vmappable():
    img = smooth_image()
    gx = np.gradient(img, axis=1).astype(np.float32)
    gy = np.gradient(img, axis=0).astype(np.float32)
    n = 8
    f = jax.vmap(lambda lx, ly, lt, rx, ry: GN.refine_along_epipolar(
        jnp.asarray(img), jnp.asarray(img), jnp.asarray(gx), jnp.asarray(gy),
        lx, ly, lt, rx, ry, jnp.asarray([1.0, 0.0], jnp.float32)))
    res = f(jnp.full((n,), 30.0), jnp.full((n,), 30.0), jnp.full((n,), 1.0),
            jnp.linspace(25.0, 35.0, n), jnp.full((n,), 30.0))
    assert res.delta.shape == (n,)

"""Tile-resident sampling parity vs the direct (gather-based) ops."""

import numpy as np
import jax
import jax.numpy as jnp

from edge_based_visual_odometry_tpu.ops import descriptors as DESC
from edge_based_visual_odometry_tpu.ops import gauss_newton as GN
from edge_based_visual_odometry_tpu.ops import patches as P
from edge_based_visual_odometry_tpu.ops import tiled_sampling as TS


def image(h=96, w=128, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (100 + 45 * np.sin(0.35 * xx) + 45 * np.cos(0.4 * yy)
           + 25 * np.sin(0.25 * (xx + yy)) + rng.normal(0, 2, (h, w)))
    return img.astype(np.float32)


def test_bilinear_tiles_match_direct(rng):
    img = image()
    B, S = 32, 49
    cx = rng.uniform(15, 110, B).astype(np.float32)
    cy = rng.uniform(15, 80, B).astype(np.float32)
    xs = cx[:, None] + rng.uniform(-8, 8, (B, S)).astype(np.float32)
    ys = cy[:, None] + rng.uniform(-8, 8, (B, S)).astype(np.float32)
    out = TS.sample_maps_tiled(jnp.asarray(img)[None], jnp.asarray(cx),
                               jnp.asarray(cy), jnp.asarray(xs),
                               jnp.asarray(ys), tile=24)[:, 0]
    ref = P.bilinear_sample_clamp(jnp.asarray(img), jnp.asarray(xs),
                                  jnp.asarray(ys))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-3)


def test_map_chunked_roundtrip(rng):
    xs = jnp.asarray(rng.normal(size=(37, 5)).astype(np.float32))
    out = TS.map_chunked(lambda a: a * 2.0, xs, 37, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xs) * 2.0)


def test_edge_patches_tiled_matches_direct(rng):
    img = image()
    B = 64
    x = rng.uniform(15, 110, B).astype(np.float32)
    y = rng.uniform(15, 80, B).astype(np.float32)
    th = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
    tp, tm, tokp, tokm = P.edge_patches_tiled(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(th),
        7, 5.0, tile=32, stride=8, chunk=16)
    dp, dm, dokp, dokm = P.edge_patches(
        jnp.asarray(img), jnp.asarray(x), jnp.asarray(y), jnp.asarray(th),
        7, 5.0)
    np.testing.assert_array_equal(np.asarray(tokp), np.asarray(dokp))
    np.testing.assert_array_equal(np.asarray(tokm), np.asarray(dokm))
    np.testing.assert_allclose(np.asarray(tp), np.asarray(dp),
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_allclose(np.asarray(tm), np.asarray(dm),
                               rtol=1e-5, atol=1e-3)


def test_edge_patches_tiled_border_validity(rng):
    img = image()
    x = jnp.asarray([3.0, 60.0], jnp.float32)   # near-border edge invalid
    y = jnp.asarray([3.0, 40.0], jnp.float32)
    th = jnp.asarray([0.3, 0.3], jnp.float32)
    _, _, okp, okm = P.edge_patches_tiled(jnp.asarray(img), x, y, th, 7, 5.0)
    assert not bool(okp[0]) or not bool(okm[0])
    assert bool(okp[1]) and bool(okm[1])


def test_descriptors_tiled_match_direct(rng):
    img = image()
    gx = np.gradient(img, axis=1).astype(np.float32)
    gy = np.gradient(img, axis=0).astype(np.float32)
    B = 24
    x = rng.uniform(25, 100, B).astype(np.float32)
    y = rng.uniform(25, 70, B).astype(np.float32)
    th = rng.uniform(-np.pi, np.pi, B).astype(np.float32)
    d_tiled = DESC.edge_descriptors_tiled(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(th), tile=40, chunk=16)
    d_ref = DESC.edge_descriptors(
        jnp.asarray(gx), jnp.asarray(gy), jnp.asarray(x), jnp.asarray(y),
        jnp.asarray(th))
    # tiled descriptors are stored bf16 (documented); ~0.4% quantization.
    # tiled layout is FLAT (N, 2*D) [plus | minus]
    np.testing.assert_allclose(
        np.asarray(d_tiled, dtype=np.float32),
        np.asarray(d_ref).reshape(d_ref.shape[0], -1), rtol=8e-3, atol=1.0)


def test_gn_batch_matches_scalar(rng):
    img = image()
    # right image: analytic shift
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    right = (100 + 45 * np.sin(0.35 * (xx + 2.0)) + 45 * np.cos(0.4 * yy)
             + 25 * np.sin(0.25 * (xx + 2.0 + yy))).astype(np.float32)
    gx = np.gradient(right, axis=1).astype(np.float32)
    gy = np.gradient(right, axis=0).astype(np.float32)
    B = 16
    lx = rng.uniform(25, 100, B).astype(np.float32)
    ly = rng.uniform(25, 70, B).astype(np.float32)
    lt = rng.uniform(0.3, 1.2, B).astype(np.float32)
    rx = (lx - 2.0 + rng.uniform(-1, 1, B)).astype(np.float32)
    ry = ly.copy()
    ed = np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1))

    batch = GN.refine_along_epipolar_batch(
        jnp.asarray(img), jnp.asarray(right), jnp.asarray(gx), jnp.asarray(gy),
        jnp.asarray(lx), jnp.asarray(ly), jnp.asarray(lt),
        jnp.asarray(rx), jnp.asarray(ry), jnp.asarray(ed),
        tile=32, chunk=8)
    scalar = jax.vmap(lambda a, b, c, d, e, f: GN.refine_along_epipolar(
        jnp.asarray(img), jnp.asarray(right), jnp.asarray(gx), jnp.asarray(gy),
        a, b, c, d, e, f))(
        jnp.asarray(lx), jnp.asarray(ly), jnp.asarray(lt),
        jnp.asarray(rx), jnp.asarray(ry), jnp.asarray(ed))
    np.testing.assert_allclose(np.asarray(batch.delta),
                               np.asarray(scalar.delta), atol=0.05)
    agree = (np.asarray(batch.valid) == np.asarray(scalar.valid)).mean()
    assert agree > 0.9


def test_gn2_batch_matches_scalar(rng):
    kf = image()
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    cf = (100 + 45 * np.sin(0.35 * (xx + 1.5)) + 45 * np.cos(0.4 * (yy - 1.0))
          + 25 * np.sin(0.25 * (xx + 1.5 + yy - 1.0))).astype(np.float32)
    gx = np.gradient(cf, axis=1).astype(np.float32)
    gy = np.gradient(cf, axis=0).astype(np.float32)
    B = 12
    kx = rng.uniform(25, 100, B).astype(np.float32)
    ky = rng.uniform(25, 70, B).astype(np.float32)
    kt = rng.uniform(0.3, 1.2, B).astype(np.float32)
    cx = (kx - 1.5 + rng.uniform(-0.5, 0.5, B)).astype(np.float32)
    cy = (ky + 1.0 + rng.uniform(-0.5, 0.5, B)).astype(np.float32)
    ct = kt.copy()

    batch = GN.refine_2dof_batch(
        jnp.asarray(kf), jnp.asarray(cf), jnp.asarray(gx), jnp.asarray(gy),
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(kt),
        jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(ct),
        tile=32, chunk=8)
    scalar = jax.vmap(lambda a, b, c, d, e, f: GN.refine_2dof(
        jnp.asarray(kf), jnp.asarray(cf), jnp.asarray(gx), jnp.asarray(gy),
        a, b, c, d, e, f))(
        jnp.asarray(kx), jnp.asarray(ky), jnp.asarray(kt),
        jnp.asarray(cx), jnp.asarray(cy), jnp.asarray(ct))
    np.testing.assert_allclose(np.asarray(batch.delta),
                               np.asarray(scalar.delta), atol=0.05)


def test_gn_two_phase_matches_single_phase(rng):
    """Convergence compaction (gauss_newton._two_phase) must reproduce the
    single-phase results exactly for every lane within the phase-2 budget
    (VERDICT r1 item 1 optimization)."""
    img = image()
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    right = (100 + 45 * np.sin(0.35 * (xx + 2.0)) + 45 * np.cos(0.4 * yy)
             + 25 * np.sin(0.25 * (xx + 2.0 + yy))).astype(np.float32)
    gx = np.gradient(right, axis=1).astype(np.float32)
    gy = np.gradient(right, axis=0).astype(np.float32)
    B = 32
    lx = rng.uniform(25, 100, B).astype(np.float32)
    ly = rng.uniform(25, 70, B).astype(np.float32)
    lt = rng.uniform(0.3, 1.2, B).astype(np.float32)
    rx = (lx - 2.0 + rng.uniform(-1, 1, B)).astype(np.float32)
    ry = ly.copy()
    ed = np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1))
    active = np.ones(B, bool)
    active[::5] = False

    common = (jnp.asarray(img), jnp.asarray(right), jnp.asarray(gx),
              jnp.asarray(gy), jnp.asarray(lx), jnp.asarray(ly),
              jnp.asarray(lt), jnp.asarray(rx), jnp.asarray(ry),
              jnp.asarray(ed))
    one = GN.refine_along_epipolar_batch(
        *common, tile=32, chunk=8, active=jnp.asarray(active))
    two = GN.refine_along_epipolar_batch(
        *common, tile=32, chunk=8, active=jnp.asarray(active),
        phase1_iters=3, phase2_budget=B)
    np.testing.assert_allclose(np.asarray(two.delta)[active],
                               np.asarray(one.delta)[active], atol=1e-5)
    np.testing.assert_allclose(np.asarray(two.score)[active],
                               np.asarray(one.score)[active], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(two.valid)[active],
                                  np.asarray(one.valid)[active])


def test_gn2_two_phase_matches_single_phase(rng):
    kf = image()
    yy, xx = np.mgrid[0:96, 0:128].astype(np.float64)
    cf = (100 + 45 * np.sin(0.35 * (xx + 1.5)) + 45 * np.cos(0.4 * (yy - 1.0))
          + 25 * np.sin(0.25 * (xx + 1.5 + yy - 1.0))).astype(np.float32)
    gx = np.gradient(cf, axis=1).astype(np.float32)
    gy = np.gradient(cf, axis=0).astype(np.float32)
    B = 24
    kx = rng.uniform(25, 100, B).astype(np.float32)
    ky = rng.uniform(25, 70, B).astype(np.float32)
    kt = rng.uniform(0.3, 1.2, B).astype(np.float32)
    cx = (kx - 1.5 + rng.uniform(-0.5, 0.5, B)).astype(np.float32)
    cy = (ky + 1.0 + rng.uniform(-0.5, 0.5, B)).astype(np.float32)
    ct = kt.copy()
    common = (jnp.asarray(kf), jnp.asarray(cf), jnp.asarray(gx),
              jnp.asarray(gy), jnp.asarray(kx), jnp.asarray(ky),
              jnp.asarray(kt), jnp.asarray(cx), jnp.asarray(cy),
              jnp.asarray(ct))
    one = GN.refine_2dof_batch(*common, tile=32, chunk=8)
    two = GN.refine_2dof_batch(*common, tile=32, chunk=8,
                               phase1_iters=3, phase2_budget=B)
    np.testing.assert_allclose(np.asarray(two.delta), np.asarray(one.delta),
                               atol=1e-5)
    np.testing.assert_array_equal(np.asarray(two.valid),
                                  np.asarray(one.valid))

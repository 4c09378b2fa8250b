"""Pallas TOED gradient-field kernel vs the XLA shift-add formulation."""

import numpy as np
import jax.numpy as jnp

from edge_based_visual_odometry_tpu.ops import toed
from edge_based_visual_odometry_tpu.ops import toed_pallas


def test_pallas_gradient_field_matches_xla(rng):
    img = (rng.random((96, 200)) * 255).astype(np.float32)
    ref = toed.toed_gradient_field(jnp.asarray(img))
    out = toed_pallas.toed_gradient_field_pallas(
        jnp.asarray(img), block_h=32, interpret=True)
    names = ["Ix", "Iy", "mag", "orient"]
    for nm, a, b in zip(names, out, ref):
        a = np.asarray(a)
        b = np.asarray(b)
        if nm == "orient":
            m = np.asarray(ref[2]) > 2.0
            d = np.abs(a[m] - b[m])
            d = np.minimum(d, 2 * np.pi - d)
            assert np.quantile(d, 0.999) < 1e-3, nm
        else:
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-3,
                                       err_msg=nm)


def test_gn_pallas_matches_batch(rng):
    """Fused Pallas GN vs the XLA batched refiner (interpret mode)."""
    import jax.numpy as jnp
    from edge_based_visual_odometry_tpu.ops import gauss_newton as GN
    from edge_based_visual_odometry_tpu.ops import gn_pallas as GNP

    h, w = 96, 200
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = (100 + 45 * np.sin(0.35 * xx) + 45 * np.cos(0.4 * yy)
           + 25 * np.sin(0.25 * (xx + yy))).astype(np.float32)
    right = (100 + 45 * np.sin(0.35 * (xx + 2.0)) + 45 * np.cos(0.4 * yy)
             + 25 * np.sin(0.25 * (xx + 2.0 + yy))).astype(np.float32)
    gx = np.gradient(right, axis=1).astype(np.float32)
    gy = np.gradient(right, axis=0).astype(np.float32)
    B = 24
    lx = rng.uniform(30, w - 30, B).astype(np.float32)
    ly = rng.uniform(30, h - 30, B).astype(np.float32)
    lt = rng.uniform(0.3, 1.2, B).astype(np.float32)
    rxs = (lx - 2.0 + rng.uniform(-1, 1, B)).astype(np.float32)
    rys = ly.copy()
    ed = np.tile(np.array([[1.0, 0.0]], np.float32), (B, 1))
    act = np.ones(B, bool)
    act[-4:] = False

    ref = GN.refine_along_epipolar_batch(
        jnp.asarray(img), jnp.asarray(right), jnp.asarray(gx), jnp.asarray(gy),
        jnp.asarray(lx), jnp.asarray(ly), jnp.asarray(lt),
        jnp.asarray(rxs), jnp.asarray(rys), jnp.asarray(ed),
        chunk=8, active=jnp.asarray(act))
    out = GNP.refine_along_epipolar_pallas(
        jnp.asarray(img), jnp.asarray(right), jnp.asarray(gx), jnp.asarray(gy),
        jnp.asarray(lx), jnp.asarray(ly), jnp.asarray(lt),
        jnp.asarray(rxs), jnp.asarray(rys), jnp.asarray(ed),
        block_b=8, active=jnp.asarray(act), interpret=True)
    m = act
    np.testing.assert_allclose(np.asarray(out.delta)[m],
                               np.asarray(ref.delta)[m], atol=2e-3)
    np.testing.assert_allclose(np.asarray(out.score)[m],
                               np.asarray(ref.score)[m], atol=1e-2)
    assert (np.asarray(out.valid)[m] == np.asarray(ref.valid)[m]).mean() > 0.9

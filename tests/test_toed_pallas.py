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

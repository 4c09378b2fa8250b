"""Filter-bank generation vs the reference's hard-coded taps."""

import numpy as np

from edge_based_visual_odometry_tpu.ops import filters
from tests import toed_oracle as oracle


def test_generated_taps_match_reference_constants():
    """Our closed-form taps must match the hard-coded arrays at
    cpu_toed.cpp:143-160 to printed precision."""
    gen = lambda nm, sh: filters.gaussian_derivative_taps(nm, 2.0, sh, 9)
    np.testing.assert_allclose(gen("G", 0.0), oracle.G, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("Gx", 0.0), oracle.GX, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("Gxx", 0.0), oracle.GXX, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("Gxxx", 0.0), oracle.GXXX, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("G", 0.5), oracle.G_SH, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("Gx", 0.5), oracle.GX_SH, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("Gxx", 0.5), oracle.GXX_SH, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(gen("Gxxx", 0.5), oracle.GXXX_SH, rtol=1e-12, atol=1e-18)


def test_conv_kernel_layout():
    k = filters.toed_conv_kernels(17, 2.0)
    assert k.shape == (36, 1, 19, 19)
    # Phase (0,0) kernels must have zeroed outer ring rows/cols from 17-tap
    # truncation.
    phase0_fx = k[0, 0]
    assert np.all(phase0_fx[0, :] == 0) and np.all(phase0_fx[-1, :] == 0)
    assert np.all(phase0_fx[:, 0] == 0) and np.all(phase0_fx[:, -1] == 0)
    # fx kernel at phase 0: k[a, b] = Gx(9-b) * G(9-a)  (correlation layout)
    a, b = 5, 7
    expected = oracle.GX[9 - b + 9] * oracle.G[9 - a + 9]
    np.testing.assert_allclose(phase0_fx[a, b], expected, rtol=1e-6)


def test_separable_equals_dense_kernels():
    col, sel, row = filters.toed_separable_taps(17, 2.0)
    dense = filters.toed_conv_kernels(17, 2.0)
    for out in range(36):
        k2d = np.outer(col[sel[out]], row[out])
        np.testing.assert_allclose(k2d, dense[out, 0], rtol=1e-5, atol=1e-12)

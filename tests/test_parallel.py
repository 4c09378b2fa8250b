"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

The JAX-native 'fake backend' test the reference cannot have
(SURVEY.md §4 implication (c)).
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.heavy  # multi-second jitted integration programs


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip_8():
    from edge_based_visual_odometry_tpu.parallel.mesh import dryrun_multichip
    dryrun_multichip(8)


def test_sharded_matches_single_device():
    """The sharded batched step must produce identical results to the
    unsharded vmap (determinism under sharding)."""
    import jax.numpy as jnp

    from edge_based_visual_odometry_tpu.config import VOConfig
    from edge_based_visual_odometry_tpu.io import synthetic as S
    from edge_based_visual_odometry_tpu.parallel import mesh as PM

    cfg = VOConfig(max_edges=512, max_candidates=8, gather_slots=32,
                   max_mates=256, max_refine_pairs=512,
                   max_quad_candidates=8, quad_gather_slots=80,
                   ransac_max_iterations=64, gn_max_iter=3)
    seq = S.make_sequence(n_frames=2, h=64, w=96)
    B = 4
    h, w = 64, 96
    kf_l = jnp.broadcast_to(jnp.asarray(seq.frames[0].left), (B, h, w))
    kf_r = jnp.broadcast_to(jnp.asarray(seq.frames[0].right), (B, h, w))
    cf_l = jnp.broadcast_to(jnp.asarray(seq.frames[1].left), (B, h, w))
    cf_r = jnp.broadcast_to(jnp.asarray(seq.frames[1].right), (B, h, w))
    R0 = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3))
    t0 = jnp.zeros((B, 3), jnp.float32)
    seeds = jnp.zeros((B,), jnp.int32)   # identical seeds -> identical rows

    mesh = PM.make_mesh(4)
    sharded = PM.build_sharded_pair_step(seq.rig, cfg, mesh)
    out_sharded = sharded(kf_l, kf_r, cf_l, cf_r, R0, t0, seeds)

    single = jax.jit(jax.vmap(PM.build_pair_step(seq.rig, cfg)))
    R, t, ratio, nk, nc = single(kf_l, kf_r, cf_l, cf_r, R0, t0, seeds)

    np.testing.assert_allclose(np.asarray(out_sharded.R), np.asarray(R),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_sharded.inlier_ratio),
                               np.asarray(ratio), atol=1e-6)
    # identical inputs + identical seeds -> identical rows
    np.testing.assert_allclose(np.asarray(out_sharded.R[0]),
                               np.asarray(out_sharded.R[1]), atol=1e-6)

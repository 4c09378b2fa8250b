"""Windowed BA: synthetic convergence + sharded-equals-single tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from edge_based_visual_odometry_tpu.models import ba as BA


def make_problem(rng, Kn=4, L=200, noise_px=0.3, perturb=True):
    K_cam = jnp.asarray([[400.0, 0, 160.0], [0, 400.0, 120.0], [0, 0, 1]],
                        jnp.float32)
    X_gt = np.stack([rng.uniform(-2, 2, L), rng.uniform(-1.5, 1.5, L),
                     rng.uniform(4, 8, L)], -1)
    Rs, ts = [], []
    for k in range(Kn):
        ang = 0.02 * k
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        t = np.array([-0.1 * k, 0.01 * k, -0.05 * k])
        Rs.append(R)
        ts.append(t)
    Rs = np.stack(Rs)
    ts = np.stack(ts)

    obs_kf, obs_lm, obs_uv = [], [], []
    Kc = np.asarray(K_cam)
    for k in range(Kn):
        Xc = X_gt @ Rs[k].T + ts[k]
        uv = (Xc @ Kc.T)
        uv = uv[:, :2] / uv[:, 2:3]
        for l in range(L):
            obs_kf.append(k)
            obs_lm.append(l)
            obs_uv.append(uv[l] + rng.normal(0, noise_px, 2))
    obs_kf = np.array(obs_kf, np.int32)
    obs_lm = np.array(obs_lm, np.int32)
    obs_uv = np.array(obs_uv, np.float32)

    R0 = Rs.copy()
    t0 = ts.copy()
    X0 = X_gt.copy()
    if perturb:
        for k in range(1, Kn):
            w = rng.normal(0, 0.01, 3)
            R0[k] = np.asarray(BA._so3_exp(jnp.asarray(w, jnp.float32))) @ R0[k]
            t0[k] = t0[k] + rng.normal(0, 0.03, 3)
        X0 = X_gt + rng.normal(0, 0.05, X_gt.shape)

    p = BA.BAProblem(
        R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32),
        X=jnp.asarray(X0, jnp.float32),
        obs_kf=jnp.asarray(obs_kf), obs_lm=jnp.asarray(obs_lm),
        obs_uv=jnp.asarray(obs_uv),
        obs_w=jnp.ones((len(obs_kf),), jnp.float32),
        K_cam=K_cam)
    return p, Rs, ts, X_gt


def test_ba_converges(rng):
    p, Rs, ts, X_gt = make_problem(rng)
    res = BA.run_ba(p, n_iters=15, damping=1e-3)
    costs = np.asarray(res.cost_history)
    assert costs[-1] < costs[0] * 0.5 or costs[-1] < 0.2
    # poses recovered (noise floor ~ noise_px)
    for k in range(1, 4):
        dR = np.asarray(res.R[k]) @ Rs[k].T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 0.2, f"pose {k} rotation off by {ang} deg"
        assert np.linalg.norm(np.asarray(res.t[k]) - ts[k]) < 0.02


def test_ba_perfect_data_zero_cost(rng):
    p, *_ = make_problem(rng, noise_px=0.0, perturb=True)
    res = BA.run_ba(p, n_iters=15, damping=1e-4)
    assert float(res.cost_history[-1]) < 1e-4


def test_ba_sharded_matches_single(rng):
    """Landmark-sharded BA over the 8-device mesh must equal the
    single-device result to float tolerance (SURVEY.md §7 hard-part #5:
    N-device vs 1-device BA to 1e-5-level agreement)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    p, *_ = make_problem(rng, Kn=4, L=256)
    single = jax.jit(lambda q: BA.run_ba(q, n_iters=5, damping=1e-3))(p)

    mesh = Mesh(np.array(jax.devices()[:8]), ("frame",))
    lm_shard = NamedSharding(mesh, P("frame"))
    obs_shard = NamedSharding(mesh, P("frame"))
    repl = NamedSharding(mesh, P())
    p_sharded = p._replace(
        X=jax.device_put(p.X, lm_shard),
        obs_kf=jax.device_put(p.obs_kf, obs_shard),
        obs_lm=jax.device_put(p.obs_lm, obs_shard),
        obs_uv=jax.device_put(p.obs_uv, obs_shard),
        obs_w=jax.device_put(p.obs_w, obs_shard),
        R=jax.device_put(p.R, repl), t=jax.device_put(p.t, repl),
        K_cam=jax.device_put(p.K_cam, repl))
    sharded = jax.jit(lambda q: BA.run_ba(q, n_iters=5, damping=1e-3))(
        p_sharded)

    # f32 reduction-order differences (scatter-add + AllReduce ordering)
    # amplify through the 5 GN solves; ~1e-4 absolute is the f32 floor here.
    np.testing.assert_allclose(np.asarray(sharded.R), np.asarray(single.R),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(sharded.cost_history),
                               np.asarray(single.cost_history), rtol=5e-3)

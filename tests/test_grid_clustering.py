"""Sorted-grid queries and clustering vs brute-force references."""

import numpy as np
import jax.numpy as jnp

from edge_based_visual_odometry_tpu.ops import grid as G
from edge_based_visual_odometry_tpu.ops import clustering as CL


def test_sorted_grid_box_query_matches_bruteforce(rng):
    n = 500
    W, H = 200, 100
    x = rng.uniform(0, W, n).astype(np.float32)
    y = rng.uniform(0, H, n).astype(np.float32)
    valid = rng.uniform(size=n) > 0.1
    g = G.build_sorted_grid(jnp.asarray(x), jnp.asarray(y), jnp.asarray(valid),
                            W, H, band_h=8)
    qx = rng.uniform(10, W - 10, 20).astype(np.float32)
    qy = rng.uniform(10, H - 10, 20).astype(np.float32)
    rx = ry = 6.0
    idx, mask = G.query_sorted_grid(
        g, jnp.asarray(qx), jnp.asarray(qy), rx, ry,
        slots_per_band=64, n_band_window=3)
    idx, mask = np.asarray(idx), np.asarray(mask)
    for q in range(20):
        got = set(idx[q][mask[q]].tolist())
        # Brute force: must contain everything within the exact box; may
        # also contain extras in overlapping bands (superset semantics)
        need = set(np.nonzero(valid
                              & (np.abs(x - qx[q]) <= rx - 0.1)
                              & (np.abs(y - qy[q]) <= ry - 0.1))[0].tolist())
        assert need <= got, f"query {q} missing {need - got}"
        # and nothing outside the conservative box
        for e in got:
            assert abs(x[e] - qx[q]) <= rx + 0.2
            # y granularity: bands b0..b0+2 span up to ry + 2*band_h
            assert abs(y[e] - qy[q]) <= ry + 16 + 0.2


def test_compact_candidates():
    idx = jnp.asarray([[5, 7, 9, 11, 13, 15]])
    mask = jnp.asarray([[False, True, False, True, True, False]])
    cidx, cmask = G.compact_candidates(idx, mask, capacity=4)
    assert np.asarray(cmask).tolist() == [[True, True, True, False]]
    assert np.asarray(cidx)[0, :3].tolist() == [7, 11, 13]
    # priority ordering
    pri = jnp.asarray([[0.0, 3.0, 0.0, 1.0, 2.0, 0.0]])
    cidx, cmask = G.compact_candidates(idx, mask, capacity=2, priority=pri)
    assert np.asarray(cidx)[0].tolist() == [11, 13]


def bruteforce_components(xy, theta, mask, dist_t, orient_t):
    n = len(xy)
    labels = list(range(n))

    def find(a):
        while labels[a] != a:
            a = labels[a]
        return a

    for i in range(n):
        for j in range(n):
            if not (mask[i] and mask[j]):
                continue
            d = np.linalg.norm(xy[i] - xy[j])
            if d < dist_t and abs(theta[i] - theta[j]) < np.deg2rad(orient_t):
                ra, rb = find(i), find(j)
                labels[max(ra, rb)] = min(ra, rb)
    return [find(i) if mask[i] else n for i in range(n)]


def test_cluster_labels_match_bruteforce(rng):
    C = 16
    for trial in range(5):
        x = rng.uniform(0, 6, C).astype(np.float32)
        y = rng.uniform(0, 2, C).astype(np.float32)
        th = rng.uniform(-np.pi, np.pi, C).astype(np.float32)
        mask = rng.uniform(size=C) > 0.2
        res = CL.cluster_edges(jnp.asarray(x)[None], jnp.asarray(y)[None],
                               jnp.asarray(th)[None], jnp.asarray(mask)[None])
        labels = np.asarray(res.label)[0]
        ref = bruteforce_components(np.stack([x, y], -1), th, mask, 1.0, 20.0)
        # same partition (labels are min member index in both)
        assert labels.tolist() == ref


def test_cluster_representative_gaussian_average():
    # Two edges 0.5 px apart -> one cluster; representative = Gaussian-
    # weighted average (equal weights by symmetry -> midpoint).
    x = jnp.asarray([[10.0, 10.5, 20.0]])
    y = jnp.asarray([[5.0, 5.0, 5.0]])
    th = jnp.asarray([[0.1, 0.2, 0.3]])
    mask = jnp.asarray([[True, True, True]])
    res = CL.cluster_edges(x, y, th, mask)
    m = np.asarray(res.mask)[0]
    assert m.tolist() == [True, False, True]
    np.testing.assert_allclose(float(np.asarray(res.x)[0, 0]), 10.25, atol=1e-5)
    np.testing.assert_allclose(float(np.asarray(res.theta)[0, 0]), 0.15, atol=1e-5)
    # singleton cluster keeps its own values
    np.testing.assert_allclose(float(np.asarray(res.x)[0, 2]), 20.0, atol=1e-5)


def test_max_cluster_size_cap():
    """MAX_CLUSTER_SIZE semantics (EdgeClusterer.cpp:179): an overgrown
    component keeps only `cap` members nearest its centroid; the rest
    revert to singleton clusters (separate hypotheses, not dropped)."""
    import jax.numpy as jnp

    # 6 collinear edges 0.5 px apart: one component without a cap
    x = jnp.asarray([[0.0, 0.5, 1.0, 1.5, 2.0, 2.5]])
    y = jnp.zeros((1, 6))
    th = jnp.zeros((1, 6))
    mask = jnp.ones((1, 6), bool)
    uncapped = CL.cluster_edges(x, y, th, mask, dist_thresh=0.75,
                                by_orientation=False)
    assert int(np.asarray(uncapped.mask).sum()) == 1
    capped = CL.cluster_edges(x, y, th, mask, dist_thresh=0.75,
                              by_orientation=False, max_cluster_size=4)
    m = np.asarray(capped.mask)[0]
    lab = np.asarray(capped.label)[0]
    # core of 4 + 2 singletons = 3 clusters, all 6 members still labeled
    assert int(m.sum()) == 3
    assert (lab < 6).all()
    sizes = sorted(s for s in np.bincount(lab).tolist() if s)
    assert sizes == [1, 1, 4]


def test_cluster_cc_pointer_jump_matches_union_find():
    """The log-round propagate+jump connected components (clustering.py
    body()) must be exact on adversarial chain graphs - the worst case
    for bounded-round propagation (diameter == C)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    C, N = 48, 4
    for _ in range(8):
        x = np.cumsum(rng.uniform(0.3, 1.2, (N, C)), axis=1).astype(
            np.float32)
        y = np.zeros((N, C), np.float32)
        th = rng.uniform(-0.1, 0.1, (N, C)).astype(np.float32)
        mask = rng.random((N, C)) < 0.8
        res = CL.cluster_edges(jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(th), jnp.asarray(mask),
                               dist_thresh=1.0, by_orientation=False,
                               max_cluster_size=0)
        lab = np.asarray(res.label)
        for r in range(N):
            parent = list(range(C))

            def find(a):
                while parent[a] != a:
                    a = parent[a]
                return a

            for i in range(C):
                for j in range(C):
                    if (mask[r, i] and mask[r, j]
                            and np.hypot(x[r, i] - x[r, j],
                                         y[r, i] - y[r, j]) < 1.0):
                        pi, pj = find(i), find(j)
                        parent[max(pi, pj)] = min(pi, pj)
            oracle = [min(k for k in range(C)
                          if mask[r, k] and find(k) == find(j))
                      if mask[r, j] else C for j in range(C)]
            assert np.array_equal(lab[r], oracle), (r, lab[r], oracle)

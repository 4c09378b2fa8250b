"""Exactness tests for ops/sortfree.py: every routine must reproduce the
XLA sort/top_k/cumsum expression it replaced bit-for-bit (the cascade's
parity suites assume the permutations are IDENTICAL, not just valid)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from edge_based_visual_odometry_tpu.ops import sortfree as SF

pytestmark = pytest.mark.core


def rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------- cumsum

@pytest.mark.parametrize("n", [1, 7, 255, 256, 257, 70000, 1 << 21])
def test_cumsum_i32_flags(n):
    x = rng(n % 97).integers(0, 2, size=n).astype(np.int32)
    got = np.asarray(SF.cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_cumsum_i32_values():
    x = rng(3).integers(0, 50, size=123457).astype(np.int32)
    got = np.asarray(SF.cumsum_i32(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x))


def test_cumsum_i32_bool_and_vmap():
    x = rng(4).integers(0, 2, size=(2, 4096)).astype(bool)
    got = np.asarray(jax.vmap(SF.cumsum_i32)(jnp.asarray(x)))
    np.testing.assert_array_equal(got, np.cumsum(x, axis=1))


# ------------------------------------------------------------- row ranks

@pytest.mark.parametrize("shape", [(1, 4), (33, 32), (100, 160), (5000, 32)])
def test_top_k_order_rows_matches_top_k(shape):
    g = rng(shape[0])
    score = g.normal(size=shape).astype(np.float32)
    # inject ties and the masked sentinel
    score[g.random(size=shape) < 0.3] = 1.25
    score[g.random(size=shape) < 0.2] = -np.float32(3.0e38)
    for cap in (1, min(8, shape[1]), shape[1]):
        _, want = jax.lax.top_k(jnp.asarray(score), cap)
        got = SF.top_k_order_rows(jnp.asarray(score), cap)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_top_k_order_rows_wide_fallback():
    score = rng(9).normal(size=(17, 512)).astype(np.float32)
    _, want = jax.lax.top_k(jnp.asarray(score), 32)
    got = SF.top_k_order_rows(jnp.asarray(score), 32)  # > max_rank_width
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_argsort_rows_asc_matches_double_argsort():
    g = rng(11)
    key = g.normal(size=(300, 32)).astype(np.float32)
    key[g.random(size=key.shape) < 0.4] = 7.5       # heavy ties
    key[g.random(size=key.shape) < 0.2] = np.float32(3.4e38)
    inv, order = SF.argsort_rows_asc(jnp.asarray(key))
    want_order = jnp.argsort(jnp.asarray(key), axis=-1, stable=True)
    want_inv = jnp.argsort(want_order, axis=-1)
    np.testing.assert_array_equal(np.asarray(order), np.asarray(want_order))
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(want_inv))


# ------------------------------------------------------------- flat sorts

@pytest.mark.parametrize("n", [5, 8192, 8193, 40000])
def test_argsort_flat_stable(n):
    g = rng(n % 13)
    # small key domain -> many ties exercise the stability term
    keys = g.integers(0, max(4, n // 50), size=n).astype(np.int32)
    got = np.asarray(SF.argsort_flat_stable(jnp.asarray(keys)))
    want = np.argsort(keys, kind="stable")
    np.testing.assert_array_equal(got, want)


def test_partition_order_stable():
    for n in (3, 1024, 131072):
        flag = rng(n % 7).integers(0, 2, size=n).astype(bool)
        got = np.asarray(SF.partition_order_stable(jnp.asarray(flag)))
        want = np.argsort(flag.astype(np.int32), kind="stable")
        np.testing.assert_array_equal(got, want)
    # all-true / all-false edges
    for flag in (np.ones(64, bool), np.zeros(64, bool)):
        got = np.asarray(SF.partition_order_stable(jnp.asarray(flag)))
        np.testing.assert_array_equal(got, np.arange(64))


# ---------------------------------------------------------- counting sort

@pytest.mark.parametrize("n,n_classes,n_out", [
    (100, 6, 40), (4096, 34, 512), (70000, 34, 8192)])
def test_counting_sort_order_matches_topk(n, n_classes, n_out):
    g = rng(n % 17)
    cls = g.integers(0, n_classes - 2, size=n).astype(np.int32)
    mask = g.random(size=n) < 0.6
    key = np.where(mask, cls.astype(np.int64) * n + np.arange(n), 2**31 - 1)
    want = np.argsort(key, kind="stable")[:n_out]
    order, n_valid = SF.counting_sort_order(
        jnp.asarray(cls), jnp.asarray(mask), n_classes, n_out)
    order = np.asarray(order)
    assert int(n_valid) == int(mask.sum())
    k = min(int(n_valid), n_out)
    np.testing.assert_array_equal(order[:k], want[:k])
    # tail slots (if any) must be exactly 0 so callers can mask by n_valid
    np.testing.assert_array_equal(order[k:], np.zeros(n_out - k, np.int32))


def test_counting_sort_order_all_masked():
    order, n_valid = SF.counting_sort_order(
        jnp.zeros(256, jnp.int32), jnp.zeros(256, bool), 4, 16)
    assert int(n_valid) == 0
    np.testing.assert_array_equal(np.asarray(order), np.zeros(16, np.int32))


# ------------------------------------------------- disabled-path fallback

def test_disabled_flag_reverts_to_xla(monkeypatch):
    monkeypatch.setattr(SF, "ENABLED", False)
    score = rng(1).normal(size=(8, 16)).astype(np.float32)
    _, want = jax.lax.top_k(jnp.asarray(score), 4)
    got = SF.top_k_order_rows(jnp.asarray(score), 4)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    x = jnp.asarray(rng(2).integers(0, 2, 999).astype(np.int32))
    np.testing.assert_array_equal(np.asarray(SF.cumsum_i32(x)),
                                  np.cumsum(np.asarray(x)))


# ------------------------------------------- one-hot compaction / expand

def test_compact_by_rank_matches_take_along():
    g = rng(21)
    N, S, cap = 200, 37, 8
    score = g.normal(size=(N, S)).astype(np.float32)
    score[g.random(size=(N, S)) < 0.3] = -np.float32(3.0e38)
    planes = g.normal(size=(3, N, S)).astype(np.float32) * 1e3
    rank = SF.rank_desc_rows(jnp.asarray(score))
    got = np.asarray(SF.compact_by_rank(rank, cap, jnp.asarray(planes)))
    _, order = jax.lax.top_k(jnp.asarray(score), cap)
    want = np.asarray(jnp.take_along_axis(
        jnp.asarray(planes), np.asarray(order)[None], axis=-1))
    np.testing.assert_array_equal(got, want)   # bit-exact f32 passthrough


def test_expand_by_rank_matches_take_along():
    g = rng(22)
    N, S = 64, 16
    rank = np.stack([g.permutation(S) for _ in range(N)]).astype(np.int32)
    vals = g.normal(size=(N, S)).astype(np.float32) / 3.0
    got = np.asarray(SF.expand_by_rank(jnp.asarray(rank), jnp.asarray(vals)))
    want = np.take_along_axis(vals, rank, axis=-1)
    np.testing.assert_array_equal(got, want)


def test_grid_bucket_table_matches_searchsorted():
    from edge_based_visual_odometry_tpu.ops import grid as GRID
    g = rng(23)
    n, W, H = 700, 100, 64
    x = g.uniform(0, W - 1, n).astype(np.float32)
    y = g.uniform(0, H - 1, n).astype(np.float32)
    valid = g.random(n) < 0.8
    gr = GRID.build_sorted_grid(jnp.asarray(x), jnp.asarray(y),
                                jnp.asarray(valid), W, H, band_h=8)
    sk = np.asarray(gr.sorted_keys)
    start = np.asarray(gr.start)
    nb = gr.n_bands * W * 16
    probes = g.integers(0, nb + 1, size=500)
    valid_keys = sk[: int(valid.sum())]       # invalid sort to the tail
    for k in probes:
        assert start[k] == np.searchsorted(valid_keys, k, side="left")

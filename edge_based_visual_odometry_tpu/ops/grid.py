"""Scatter-free spatial indexing: sort-by-band + searchsorted range queries.

TPU-native replacement for the reference's SpatialGrid
(include/Dataset.h:22-114), whose build is a two-phase parallel-classify /
serial-insert into std::vector cells and whose query concatenates
variable-length cell lists. Here:

  build: edges are sorted once by a composite (y-band, x) key - a pure
         argsort, no scatter conflicts.
  query: a (qx, qy, rx, ry) box query becomes `n_bands` contiguous segments
         of the sorted order, located with searchsorted and gathered into
         fixed-size slot windows with validity masks.

Unlike the reference's cell-granular query (which returns everything in the
ceil(r/cell)-neighborhood, i.e. a superset of the radius - Dataset.h:69-113),
this returns exactly the edges whose x lies in [qx-rx, qx+rx] and whose
y-band overlaps [qy-ry, qy+ry]; downstream exact filters are unchanged.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from edge_based_visual_odometry_tpu.ops import sortfree as SF


class SortedGrid(NamedTuple):
    """Final sorted structure with int32 composite keys."""
    sorted_idx: jnp.ndarray    # (N,)
    sorted_keys: jnp.ndarray   # (N,) int32 composite (band, x/16px)
    sorted_attrs: jnp.ndarray  # (A, N) edge attributes in sorted order,
                               # ATTRIBUTE-MAJOR: a query's attr fetch is
                               # one gather per attribute with the (large)
                               # slot axis minor. The previous (N, A)
                               # row-gather produced (Q, S, A) outputs
                               # whose A=6 lane axis padded to 128 on TPU
                               # (21x HBM inflation - the round-3
                               # max_mates=32768 OOM, capacity_sweep.py)
    band_h: float
    n_bands: int
    width: int


def build_sorted_grid(x, y, valid, width: int, height: int,
                      band_h: int, attrs=None) -> SortedGrid:
    """Build the sorted composite-key index (see module docstring).

    Composite int32 key = band * (W*16) + round(x*16): x quantized to
    1/16 px so the key stays monotone in (band, x) and fits int32 for any
    realistic image size.

    attrs: optional (N, A) per-edge payload; stored attribute-major in
    sorted order so a query's attribute fetch is one lane-efficient
    gather per attribute (see SortedGrid.sorted_attrs).
    """
    n_bands = -(-height // band_h)
    W16 = jnp.int32(width * 16)
    band = jnp.clip(jnp.floor(y / band_h), 0, n_bands - 1).astype(jnp.int32)
    xq = jnp.clip(jnp.round(x * 16.0), 0, width * 16 - 1).astype(jnp.int32)
    key = band * W16 + xq
    key = jnp.where(valid, key, jnp.int32((n_bands + 1) * width * 16))
    # comparison-count rank instead of XLA's bitonic argsort (~20 ms per
    # 32k-key sort in the round-5 trace; ops/sortfree.py)
    order = SF.argsort_flat_stable(key)
    if attrs is None:
        attrs = jnp.stack([x, y], -1)
    return SortedGrid(order, key[order], attrs.T[:, order],
                      float(band_h), int(n_bands), int(width))


def _band_window_positions(grid: SortedGrid, qx, qy, rx: float, ry: float,
                           slots_per_band: int, n_band_window: int):
    """Shared body of the box queries: searchsorted band spans ->
    (pos, mask) of shape (Q, n_band_window * slots_per_band) into the
    sorted arrays.

    All n_band_window spans are resolved by ONE batched searchsorted
    (lo and hi stacked into a single (2, K, Q) query tensor): the earlier
    per-band python loop emitted 2*K separate searchsorted programs whose
    aggregate op overhead showed up in the round-4 device trace."""
    W16 = jnp.int32(grid.width * 16)
    b0 = jnp.floor((qy - ry) / grid.band_h).astype(jnp.int32)
    xq_lo = jnp.clip(jnp.floor((qx - rx) * 16.0), 0,
                     grid.width * 16 - 1).astype(jnp.int32)
    xq_hi = jnp.clip(jnp.ceil((qx + rx) * 16.0), 0,
                     grid.width * 16 - 1).astype(jnp.int32)
    N = grid.sorted_idx.shape[0]
    ks = jnp.arange(n_band_window, dtype=jnp.int32)
    b = b0[None, :] + ks[:, None]                       # (K, Q)
    b_ok = (b >= 0) & (b < grid.n_bands)
    keys = jnp.stack([b * W16 + xq_lo[None, :],
                      b * W16 + xq_hi[None, :]])        # (2, K, Q)
    lo = jnp.searchsorted(grid.sorted_keys, keys[0].reshape(-1),
                          side="left").reshape(n_band_window, -1)
    hi = jnp.searchsorted(grid.sorted_keys, keys[1].reshape(-1),
                          side="right").reshape(n_band_window, -1)
    offs = jnp.arange(slots_per_band, dtype=jnp.int32)
    pos = lo[:, :, None] + offs[None, None, :]          # (K, Q, S)
    m = (pos < hi[:, :, None]) & b_ok[:, :, None] & (pos < N)
    pos = jnp.minimum(pos, N - 1)
    # (K, Q, S) -> (Q, K*S), matching the previous per-band concat order
    pos = jnp.transpose(pos, (1, 0, 2)).reshape(qx.shape[0], -1)
    m = jnp.transpose(m, (1, 0, 2)).reshape(qx.shape[0], -1)
    return pos, m


def query_sorted_grid(grid: SortedGrid, qx, qy, rx: float, ry: float,
                      slots_per_band: int, n_band_window: int):
    """Box query; qx, qy: (Q,). Returns (idx, mask) of shape
    (Q, n_band_window * slots_per_band); idx indexes the ORIGINAL edge
    arrays; mask=False entries have idx 0."""
    pos, mask = _band_window_positions(grid, qx, qy, rx, ry,
                                       slots_per_band, n_band_window)
    return jnp.where(mask, grid.sorted_idx[pos], 0), mask


def query_sorted_grid_attrs(grid: SortedGrid, qx, qy, rx: float, ry: float,
                            slots_per_band: int, n_band_window: int):
    """Box query returning (idx, attrs, mask): attrs is ATTRIBUTE-MAJOR
    (A, Q, S) - index attrs[k] for the k-th attribute's (Q, S) plane.
    The slot axis stays minor so TPU lane padding applies to S (large),
    not A (tiny)."""
    pos, mask = _band_window_positions(grid, qx, qy, rx, ry,
                                       slots_per_band, n_band_window)
    idx = jnp.where(mask, grid.sorted_idx[pos], 0)
    return idx, grid.sorted_attrs[:, pos], mask


def _compact_order(mask, capacity: int, priority):
    """top_k slot ordering shared by the compaction variants: valid
    entries first (original order, or ascending `priority`)."""
    S = mask.shape[-1]
    slot_iota = jax.lax.broadcasted_iota(jnp.int32, mask.shape, mask.ndim - 1)
    if priority is None:
        score = jnp.where(mask, -slot_iota.astype(jnp.float32),
                          -jnp.float32(2 * S))
    else:
        score = jnp.where(mask, -priority, -jnp.float32(3.0e38))
    return SF.top_k_order_rows(score, capacity)


def compact_candidates(idx, mask, capacity: int, priority=None):
    """Compact (Q, S) masked slots to (Q, capacity).

    Valid entries move to the front preserving order (or by ascending
    `priority` when given). Overflow beyond capacity is dropped. Uses
    top_k (cheaper than a full row argsort on TPU).
    """
    order = _compact_order(mask, capacity, priority)
    return (jnp.take_along_axis(idx, order, axis=-1),
            jnp.take_along_axis(mask, order, axis=-1))


def compact_candidates_attrs(idx, attrs, mask, capacity: int, priority=None):
    """compact_candidates + carry the attribute-major (A, Q, S) attribute
    planes along (-> (A, Q, capacity))."""
    order = _compact_order(mask, capacity, priority)
    return (jnp.take_along_axis(idx, order, axis=-1),
            jnp.take_along_axis(attrs, order[None], axis=-1),
            jnp.take_along_axis(mask, order, axis=-1))

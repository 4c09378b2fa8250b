"""Tile-resident bilinear sampling: the TPU answer to random image gathers.

Per-element gathers (what naive `img[y, x]` lowers to) run at a few
elements per cycle on TPU - the photometric stages need O(10^8) bilinear
samples per frame, which made the XLA gather formulation ~50 s/frame.
This module restructures image sampling in two steps:

  1. `gather_tiles`: one vmapped dynamic_slice per candidate fetches a
     TxT tile around its anchor - a slice-gather (contiguous rows), which
     the TPU memory system handles well.
  2. `bilinear_sample_tiles`: arbitrary subpixel samples WITHIN the tile
     are evaluated with separable hat-function weight matrices and two
     batched einsums - MXU matmuls instead of random access:
       value[b, s] = sum_{r, c} hat(ry[b,s]-r) * tile[b,r,c] * hat(rx[b,s]-c)

The hat-function product is exactly bilinear interpolation for in-tile
points; coordinates are clamped to the tile, which reproduces the
reference's border-clamp sampling (util_bilinear_Sample_F,
include/utility.h:159-172) whenever the tile touches the image border,
and bounds Gauss-Newton travel to the tile otherwise (documented
deviation; tiles are sized with travel margin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tile_origins(cx, cy, tile: int, height: int, width: int):
    """Top-left origins of TxT tiles centered near (cx, cy), clipped to
    stay inside the image."""
    oy = jnp.clip(jnp.floor(cy).astype(jnp.int32) - tile // 2 + 1,
                  0, height - tile)
    ox = jnp.clip(jnp.floor(cx).astype(jnp.int32) - tile // 2 + 1,
                  0, width - tile)
    return ox, oy


def gather_tiles(imgs: jnp.ndarray, ox: jnp.ndarray, oy: jnp.ndarray,
                 tile: int) -> jnp.ndarray:
    """Fetch TxT tiles from (C, H, W) stacked maps at per-candidate
    origins. Returns (B, C, T, T)."""
    def one(oy_i, ox_i):
        return jax.lax.dynamic_slice(
            imgs, (0, oy_i, ox_i), (imgs.shape[0], tile, tile))
    return jax.vmap(one)(oy, ox)


def bilinear_sample_tiles(tiles: jnp.ndarray, ox, oy, xs, ys,
                          precision=jax.lax.Precision.HIGHEST):
    """Bilinear-sample (B, C, T, T) tiles at absolute coords (B, S).

    Returns (B, C, S). Coordinates are clamped to the tile interior.
    """
    B, C, T, _ = tiles.shape
    rx = jnp.clip(xs - ox[:, None].astype(xs.dtype), 0.0, T - 1.0)
    ry = jnp.clip(ys - oy[:, None].astype(ys.dtype), 0.0, T - 1.0)
    iota = jnp.arange(T, dtype=xs.dtype)
    # hat weights: exactly the two bilinear corner weights per axis
    w_row = jnp.maximum(0.0, 1.0 - jnp.abs(ry[..., None] - iota))  # (B,S,T)
    w_col = jnp.maximum(0.0, 1.0 - jnp.abs(rx[..., None] - iota))  # (B,S,T)
    # (B,S,T) x (B,C,T,T) -> (B,C,S,T), then weighted column reduce
    p = jnp.einsum("bst,bctu->bcsu", w_row, tiles, precision=precision)
    return jnp.einsum("bcsu,bsu->bcs", p, w_col, precision=precision)


def sample_maps_tiled(imgs: jnp.ndarray, cx, cy, xs, ys, tile: int):
    """Convenience: tiles around (cx, cy) then sample (B, S) coords from
    each of the (C, H, W) maps. Returns (B, C, S)."""
    H, W = imgs.shape[-2:]
    ox, oy = tile_origins(cx, cy, tile, H, W)
    tiles = gather_tiles(imgs, ox, oy, tile)
    return bilinear_sample_tiles(tiles, ox, oy, xs, ys)


def map_chunked(fn, args, batch: int, chunk: int):
    """Apply `fn` (pytree of (chunk, ...) arrays -> pytree of (chunk, ...)
    arrays) over a (batch, ...) pytree in sequential chunks via lax.map -
    bounds the HBM working set of tile buffers and einsum temporaries."""
    n_chunks = -(-batch // chunk)
    pad = n_chunks * chunk - batch

    def pad_reshape(a):
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    args_c = jax.tree_util.tree_map(pad_reshape, args)
    out = jax.lax.map(fn, args_c)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(n_chunks * chunk, *a.shape[2:])[:batch], out)

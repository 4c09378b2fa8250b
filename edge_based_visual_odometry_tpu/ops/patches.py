"""Batched rotated-patch sampling and NCC scoring.

Re-designs the reference's per-edge OpenCV patch machinery as vmapped
gather kernels:

  - bilinear samplers      (reference include/utility.h:81-130 NaN-OOB
                            variant; :159-172 clamped variant)
  - orthogonal shifts      (reference src/utility.cpp:82-93,128-139)
  - rotated patch coords   (reference include/utility.h:143-157)
  - two-side edge patches  (reference src/utility.cpp:141-161,182-212)
  - NCC similarity         (reference src/utility.cpp:163-180)
  - 4-way NCC max          (reference src/Stereo_Matches.cpp:592-596)

All functions broadcast over arbitrary leading batch dims.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def bilinear_sample_nan(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Bilinear interpolation with out-of-bounds detection.

    Mirrors Bilinear_Interpolation (utility.h:81-130): OOB when
    floor(x) < 0 or ceil(x) > W-1 (same for y). The reference returns NaN;
    we return (value, in_bounds) and let callers mask - explicit finite
    masks instead of NaN propagation (SURVEY.md §7 design stance).
    """
    H, W = img.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = jnp.ceil(x)
    y1 = jnp.ceil(y)
    inb = (x0 >= 0) & (y0 >= 0) & (x1 <= W - 1) & (y1 <= H - 1)

    x0i = jnp.clip(x0, 0, W - 1).astype(jnp.int32)
    y0i = jnp.clip(y0, 0, H - 1).astype(jnp.int32)
    x1i = jnp.clip(x1, 0, W - 1).astype(jnp.int32)
    y1i = jnp.clip(y1, 0, H - 1).astype(jnp.int32)

    v00 = img[y0i, x0i]
    v10 = img[y0i, x1i]
    v01 = img[y1i, x0i]
    v11 = img[y1i, x1i]
    a = x - x0
    b = y - y0
    val = ((1 - a) * (1 - b) * v00 + a * (1 - b) * v10
           + (1 - a) * b * v01 + a * b * v11)
    return val, inb


def bilinear_sample_clamp(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray):
    """Clamped bilinear sampling (util_bilinear_Sample_F, utility.h:159-172)."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    a = x - x0
    b = y - y0
    v00 = img[y0, x0]
    v10 = img[y0, x1]
    v01 = img[y1, x0]
    v11 = img[y1, x1]
    return ((1 - a) * (1 - b) * v00 + a * (1 - b) * v10
            + (1 - a) * b * v01 + a * b * v11)


def orthogonal_shifted_points(x, y, theta, shift_mag: float):
    """(plus, minus) points shifted perpendicular to the edge direction
    (src/utility.cpp:82-93): plus = (x + m sin t, y - m cos t)."""
    sx = shift_mag * jnp.sin(theta)
    sy = shift_mag * jnp.cos(theta)
    plus = jnp.stack([x + sx, y - sy], axis=-1)
    minus = jnp.stack([x - sx, y + sy], axis=-1)
    return plus, minus


def rotated_patch_coords(cx, cy, theta, patch_size: int):
    """(..., P*P, 2) rotated patch coordinates, row-major over (i, j) with i
    the rotated-x offset (utility.h:143-157):
      (cx + cos t * i - sin t * j,  cy + sin t * i + cos t * j)
    """
    half = patch_size // 2
    offs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    ii = jnp.repeat(offs, patch_size)      # i outer
    jj = jnp.tile(offs, patch_size)        # j inner
    ct = jnp.cos(theta)[..., None]
    st = jnp.sin(theta)[..., None]
    px = cx[..., None] + ct * ii - st * jj
    py = cy[..., None] + st * ii + ct * jj
    return jnp.stack([px, py], axis=-1)


def sample_patch(img, coords, mode: str = "clamp"):
    """Sample (..., P, 2) coords. mode='clamp' returns values;
    mode='nan' returns (values, patch_valid) where patch_valid requires
    every sample in bounds (NaN-poisoning equivalent)."""
    x = coords[..., 0]
    y = coords[..., 1]
    if mode == "clamp":
        return bilinear_sample_clamp(img, x, y)
    val, inb = bilinear_sample_nan(img, x, y)
    return val, jnp.all(inb, axis=-1)


def edge_patches(img, x, y, theta, patch_size: int, shift_mag: float):
    """Two-side rotated patches of an edge (src/utility.cpp:182-212).

    Returns (patch_plus, patch_minus, valid_plus, valid_minus) with patches
    (..., P*P). The reference's NaN-on-OOB becomes validity flags.
    """
    plus, minus = orthogonal_shifted_points(x, y, theta, shift_mag)
    cp = rotated_patch_coords(plus[..., 0], plus[..., 1], theta, patch_size)
    cm = rotated_patch_coords(minus[..., 0], minus[..., 1], theta, patch_size)
    vp, okp = sample_patch(img, cp, mode="nan")
    vm, okm = sample_patch(img, cm, mode="nan")
    return vp, vm, okp, okm


def edge_patches_tiled(img, x, y, theta, patch_size: int, shift_mag: float,
                       tile: int = 32, stride: int = 8, chunk: int = 8192,
                       active=None):
    """Batched two-side edge patches via tile-resident sampling
    (ops/tiled_sampling.py) - same outputs as `edge_patches` but with one
    slice-gathered tile per edge instead of per-sample element gathers.

    x, y, theta: (B,). Returns (patch_plus, patch_minus, ok_plus, ok_minus)
    with patches (B, P*P). `active`: optional (B,) mask - all-inactive
    chunks are skipped (outputs zero/False there).
    """
    from edge_based_visual_odometry_tpu.ops import tiled_sampling as TS

    B = x.shape[0]
    pp = patch_size * patch_size
    H, W = img.shape
    # static coverage guard: every sample of the two side patches must fit
    # the nearest atlas tile
    need = shift_mag + (patch_size // 2) * 1.4143 + 1.0
    assert tile / 2 - stride / 2 - 1 >= need, \
        f"atlas tile {tile}/stride {stride} covers +-{tile/2-stride/2-1}, " \
        f"patches need +-{need:.1f}"
    atlas = TS.build_atlas(img[None], tile, stride)

    def run_chunk(args):
        x_c, y_c, t_c = args
        plus, minus = orthogonal_shifted_points(x_c, y_c, t_c, shift_mag)
        cp = rotated_patch_coords(plus[..., 0], plus[..., 1], t_c, patch_size)
        cm = rotated_patch_coords(minus[..., 0], minus[..., 1], t_c, patch_size)
        coords = jnp.concatenate([cp, cm], axis=-2)      # (b, 2pp, 2)
        vals = TS.sample_atlas(atlas, x_c, y_c,
                               coords[..., 0], coords[..., 1])[:, 0]
        # NaN-variant OOB validity (utility.h:95-99), computed from coords
        cx_ = coords[..., 0]
        cy_ = coords[..., 1]
        inb = ((jnp.floor(cx_) >= 0) & (jnp.floor(cy_) >= 0)
               & (jnp.ceil(cx_) <= W - 1) & (jnp.ceil(cy_) <= H - 1))
        okp = jnp.all(inb[:, :pp], -1)
        okm = jnp.all(inb[:, pp:], -1)
        return vals[:, :pp], vals[:, pp:], okp, okm

    return TS.map_chunked(run_chunk, (x, y, theta), B, chunk, active=active)


def ncc(p1, p2, valid=None, eps: float = 1e-10):
    """Normalized cross-correlation of (..., K) patches
    (src/utility.cpp:163-180). Returns -1 where degenerate or invalid."""
    m1 = jnp.mean(p1, axis=-1, keepdims=True)
    m2 = jnp.mean(p2, axis=-1, keepdims=True)
    c1 = p1 - m1
    c2 = p2 - m2
    ss1 = jnp.sum(c1 * c1, axis=-1)
    ss2 = jnp.sum(c2 * c2, axis=-1)
    score = jnp.sum(c1 * c2, axis=-1) / jnp.sqrt(
        jnp.maximum(ss1 * ss2, eps * eps))
    bad = (ss1 < eps) | (ss2 < eps)
    if valid is not None:
        bad = bad | ~valid
    return jnp.where(bad, -1.0, score)


def ncc4(ap, am, a_okp, a_okm, bp, bm, b_okp, b_okm):
    """max of the 4 side pairings (Stereo_Matches.cpp:592-596):
    (A+,B+), (A-,B-), (A+,B-), (A-,B+)."""
    s_pp = ncc(ap, bp, a_okp & b_okp)
    s_nn = ncc(am, bm, a_okm & b_okm)
    s_pn = ncc(ap, bm, a_okp & b_okm)
    s_np = ncc(am, bp, a_okm & b_okp)
    return jnp.maximum(jnp.maximum(s_pp, s_nn), jnp.maximum(s_pn, s_np))

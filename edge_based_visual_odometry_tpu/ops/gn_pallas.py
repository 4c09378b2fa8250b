"""Pallas TPU kernel: fused 1-DoF epipolar photometric Gauss-Newton.

The XLA formulation (gauss_newton.refine_along_epipolar_batch) re-streams
the per-candidate tile stack and einsum intermediates through HBM on every
GN iteration. This kernel keeps each candidate block's tiles, left patches
and per-candidate state in VMEM for the whole 20-iteration solve; HBM sees
each tile exactly once.

STATUS: numerically exact vs the XLA path on TPU (max |delta alpha| = 0 at
B=65k), but measured SLOWER: 57.8 ms vs 33.8 ms (v5e, 65536 pairs, 50%
active, KITTI size, block_b=128). The (Bc, 3, 48, 48) tile block lane-pads
48->128 (62.5% of VMEM bandwidth wasted) and the hat-weight sampling runs
as a VPU contraction here, while the XLA formulation does the same
sampling as lane-dense MXU einsums and overlaps the re-streaming well.
Fixing it would need a candidate-in-lanes (3, T, T, 128) layout with a
batched-over-lanes contraction Mosaic does not currently express well.
Retained (like toed_pallas) as the tested Pallas reference; the default
path stays ops/gauss_newton.py.

Mosaic portability notes earned here: iota must be integer (build f32
ramps from int iota + cast); kernels cannot capture array constants;
bool (i1) vectors cannot be select/carried in while_loop ("Unsupported
target bitwidth for truncation") - use f32 0/1 masks; the default 16 MB
scoped-vmem cap is raised via CompilerParams(vmem_limit_bytes).

Same math/semantics as the XLA path (which itself mirrors the reference
min_Edge_Photometric_Residual_by_Gauss_Newton_along_EpipolarLine,
src/Stereo_Matches.cpp:1159-1288).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edge_based_visual_odometry_tpu.ops import patches as P
from edge_based_visual_odometry_tpu.ops import tiled_sampling as TS
from edge_based_visual_odometry_tpu.ops.gauss_newton import RefineResult


def _gn_kernel(tiles_ref, lpat_ref, geom_ref, out_ref, *,
               patch_size, max_iter, tol, huber_delta, tile, block_b):
    """One candidate block.

    tiles_ref: (Bc, 3, T, T)  - [img, gx, gy] tiles
    lpat_ref:  (Bc, 2*pp)     - centered left patches [plus | minus]
    geom_ref:  (Bc, 16)       - packed per-candidate geometry:
        0:2 base plus-center (x, y) rel to tile, 2:4 minus-center,
        4:6 epipolar dir, 6:8 (cos lt, sin lt), 8 active flag
    out_ref:   (Bc, 8)        - [alpha, score, conf, valid, ...]
    """
    pp = patch_size * patch_size
    T = tile
    half = patch_size // 2

    lp = lpat_ref[:, :pp]
    lm = lpat_ref[:, pp:]
    g = geom_ref[:]
    cpx = g[:, 0:1]
    cpy = g[:, 1:2]
    cmx = g[:, 2:3]
    cmy = g[:, 3:4]
    dirx = g[:, 4:5]
    diry = g[:, 5:6]
    ct = g[:, 6:7]
    st = g[:, 7:8]
    active = g[:, 8:9]

    # rotated patch offsets from an integer iota (Mosaic: iota must be
    # int, and array constants can't be captured by the kernel)
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, pp), 1)
    ii = (idx // patch_size - half).astype(jnp.float32)         # (1, pp)
    jj = (idx % patch_size - half).astype(jnp.float32)
    rot_x = ct * ii - st * jj                      # (Bc, pp)
    rot_y = st * ii + ct * jj

    iota_t = jax.lax.broadcasted_iota(jnp.int32, (1, 1, T), 2
                                      ).astype(jnp.float32)

    def sample_all(sx, sy):
        """Bilinear-sample img/gx/gy tiles at (Bc, 2pp) coords.
        Returns (Bc, 3, 2pp)."""
        rx = jnp.clip(sx, 0.0, T - 1.0)[:, :, None]     # (Bc, 2pp, 1)
        ry = jnp.clip(sy, 0.0, T - 1.0)[:, :, None]
        w_row = jnp.maximum(0.0, 1.0 - jnp.abs(ry - iota_t))  # (Bc,2pp,T)
        w_col = jnp.maximum(0.0, 1.0 - jnp.abs(rx - iota_t))
        outs = []
        for c in range(3):
            t_c = tiles_ref[:, c, :, :]
            p1 = jax.lax.dot_general(
                w_row, t_c, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)     # (Bc, 2pp, T)
            outs.append(jnp.sum(p1 * w_col, axis=2))
        return outs

    # carries are all f32 masks: Mosaic cannot select/carry i1 vectors
    def body(carry):
        alpha, done_f, score, conf, valid_f, it = carry
        sxp = cpx + rot_x + alpha * dirx
        syp = cpy + rot_y + alpha * diry
        sxm = cmx + rot_x + alpha * dirx
        sym = cmy + rot_y + alpha * diry
        sx = jnp.concatenate([sxp, sxm], axis=1)        # (Bc, 2pp)
        sy = jnp.concatenate([syp, sym], axis=1)
        rv, gxv, gyv = sample_all(sx, sy)
        rvp = rv[:, :pp]
        rvm = rv[:, pp:]
        rvp = rvp - jnp.mean(rvp, axis=1, keepdims=True)
        rvm = rvm - jnp.mean(rvm, axis=1, keepdims=True)
        r = jnp.concatenate([lp - rvp, lm - rvm], axis=1)
        grad = -gxv * dirx + gyv * diry
        absr = jnp.abs(r)
        w = jnp.where(absr <= huber_delta, 1.0, huber_delta / absr)
        Hh = jnp.sum(w * grad * grad, axis=1, keepdims=True)
        b = jnp.sum(w * grad * r, axis=1, keepdims=True)
        cost = jnp.sum(w * r * r, axis=1, keepdims=True)

        deg_f = (Hh < 1e-8).astype(jnp.float32)
        delta = (1.0 - deg_f) * (-b / jnp.maximum(Hh, 1e-8))
        rms = jnp.sqrt(cost / (2 * pp))
        conv_f = jnp.maximum(
            (jnp.abs(delta) < tol).astype(jnp.float32),
            jnp.float32(it == max_iter - 1))
        ok_f = ((rms <= huber_delta * 2.0).astype(jnp.float32)
                * jnp.float32(it >= 1))
        fin_f = conv_f * (1.0 - done_f) * (1.0 - deg_f)
        score = fin_f * rms + (1.0 - fin_f) * score
        conf = fin_f * jnp.exp(-rms / huber_delta) + (1.0 - fin_f) * conf
        valid_f = fin_f * ok_f + (1.0 - fin_f) * valid_f
        step_f = (1.0 - done_f) * (1.0 - deg_f)
        alpha = alpha + step_f * delta
        done_f = jnp.maximum(done_f, jnp.maximum(conv_f, deg_f))
        return alpha, done_f, score, conf, valid_f, it + 1

    init = (jnp.zeros((block_b, 1), jnp.float32),
            1.0 - active,
            jnp.full((block_b, 1), 1e6, jnp.float32),
            jnp.zeros((block_b, 1), jnp.float32),
            jnp.zeros((block_b, 1), jnp.float32),
            jnp.int32(0))
    out = jax.lax.while_loop(
        lambda c: (c[5] < max_iter) & jnp.any(c[1] < 0.5), body, init)
    alpha, _, score, conf, valid_f, _ = out
    res = jnp.concatenate(
        [alpha, score, conf, valid_f,
         jnp.zeros((block_b, 4), jnp.float32)], axis=1)
    out_ref[:, :] = res


def refine_along_epipolar_pallas(left_img, right_img, right_gx, right_gy,
                                 lx, ly, ltheta, rx, ry, epi_dir,
                                 patch_size: int = 7, max_iter: int = 20,
                                 tol: float = 1e-3, huber_delta: float = 1.0,
                                 tile: int = 48, block_b: int = 128,
                                 active=None,
                                 interpret: bool = False) -> RefineResult:
    """Drop-in replacement for refine_along_epipolar_batch."""
    B = lx.shape[0]
    if active is None:
        active = jnp.ones((B,), bool)
    pp = patch_size * patch_size
    side = patch_size / 2.0 + 1.0
    H, W = left_img.shape

    # left patches (centered) via the XLA atlas path - one-time cost
    left_atlas = TS.build_atlas(left_img[None], 32, 8)
    t = jnp.stack([jnp.cos(ltheta), jnp.sin(ltheta)], -1)
    n = jnp.stack([-t[..., 1], t[..., 0]], -1)
    c_plus = jnp.stack([lx, ly], -1) + n * side
    c_minus = jnp.stack([lx, ly], -1) - n * side
    cp = P.rotated_patch_coords(c_plus[..., 0], c_plus[..., 1], ltheta,
                                patch_size)
    cm = P.rotated_patch_coords(c_minus[..., 0], c_minus[..., 1], ltheta,
                                patch_size)
    lcoords = jnp.concatenate([cp, cm], axis=-2)
    lvals = TS.sample_atlas(left_atlas, lx, ly,
                            lcoords[..., 0], lcoords[..., 1])[:, 0]
    lp = lvals[:, :pp]
    lm = lvals[:, pp:]
    lp = lp - jnp.mean(lp, axis=1, keepdims=True)
    lm = lm - jnp.mean(lm, axis=1, keepdims=True)
    lpat = jnp.concatenate([lp, lm], axis=1)           # (B, 2pp)

    # right tiles via atlas (one row-gather)
    stride = tile // 3 if tile % 3 == 0 else tile // 4
    right_atlas = TS.build_atlas(
        jnp.stack([right_img, right_gx, right_gy]), tile, stride)
    tiles, ox, oy = TS.fetch_atlas_tiles(right_atlas, rx, ry)  # (B,3,T,T)

    # packed per-candidate geometry, coords relative to tile origin
    oxf = ox.astype(jnp.float32)
    oyf = oy.astype(jnp.float32)
    geom = jnp.stack([
        rx + n[:, 0] * side - oxf, ry + n[:, 1] * side - oyf,
        rx - n[:, 0] * side - oxf, ry - n[:, 1] * side - oyf,
        epi_dir[:, 0], epi_dir[:, 1],
        jnp.cos(ltheta), jnp.sin(ltheta),
        active.astype(jnp.float32),
        jnp.zeros_like(lx), jnp.zeros_like(lx), jnp.zeros_like(lx),
        jnp.zeros_like(lx), jnp.zeros_like(lx), jnp.zeros_like(lx),
        jnp.zeros_like(lx)], axis=1)                    # (B, 16)

    Bp = -(-B // block_b) * block_b
    padb = Bp - B
    tiles = jnp.pad(tiles, ((0, padb), (0, 0), (0, 0), (0, 0)))
    lpat = jnp.pad(lpat, ((0, padb), (0, 0)))
    geom = jnp.pad(geom, ((0, padb), (0, 0)))

    kern = functools.partial(_gn_kernel, patch_size=patch_size,
                             max_iter=max_iter, tol=tol,
                             huber_delta=huber_delta, tile=tile,
                             block_b=block_b)
    out = pl.pallas_call(
        kern,
        grid=(Bp // block_b,),
        in_specs=[
            pl.BlockSpec((block_b, 3, tile, tile), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 2 * pp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 16), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_b, 8), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            # the (Bc,3,48,48) tile block lane-pads 48->128 and is
            # double-buffered; the default 16MB scoped-vmem cap is far
            # below v5e's 128MB physical VMEM
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(tiles, lpat, geom)

    out = out[:B]
    return RefineResult(out[:, 0], out[:, 1], out[:, 2], out[:, 3] > 0.5)

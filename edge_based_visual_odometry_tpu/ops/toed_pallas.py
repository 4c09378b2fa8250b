"""Pallas TPU kernel for the TOED gradient field.

Fuses the entire third-order filter bank (12 column passes + 36 row
passes + the third-order direction products, reference
cpu_toed.cpp:122-376) into one VMEM-resident pass per row-block.

STATUS: bit-exact against the XLA shift-add formulation (ops/toed.py) on
TPU, but measured slightly SLOWER at KITTI size (9.9 ms vs 7.4 ms on
v5e) - XLA's fusion pipeline already keeps this workload near bandwidth,
and the lax.switch phase dispatch costs VMEM that forces small (24-row)
blocks. Retained as the Pallas reference implementation and testbed;
the default path stays ops/toed.py.

Layout/semantics notes:
  - The image is zero-padded to (H + 2*HALO, W_pad) outside the kernel;
    zero padding reproduces the reference's boundary skip.
  - Row (x-direction) convolution uses lane rolls; circular wrap is
    harmless because the x pad (>= 2*HALO columns) is zeros, so wrapped
    reads return exactly the zero-padding value.
  - Outputs are (4, H, W_pad) per map in phase order (0,0),(0,1),(1,0),
    (1,1); the (2H, 2W) interleave is a cheap XLA transpose outside.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from edge_based_visual_odometry_tpu.ops import filters

HALO = 9


def _kernel(img_ref, ix_ref, iy_ref, mag_ref, tix_ref, tiy_ref, *,
            col_taps, row_select, row_taps, block_h):
    # img_ref: full (Hp + 2*HALO, Wp) in VMEM; outputs: (4, block_h, Wp)
    # block for this program.
    i = pl.program_id(0)
    phase = pl.program_id(1)
    r0 = i * block_h
    # one aligned slab load per block (vector loads need 8-aligned row
    # starts, so unaligned r0+a loads are replaced by rolls of the slab)
    slab_h = block_h + 24          # >= block_h + 2*HALO, multiple of 8
    slab = img_ref[pl.ds(r0, slab_h), :]

    # ---- column convolutions: 12 channels (see filters.toed_separable_taps)
    cols = []
    for c in range(12):
        acc = None
        for a in range(2 * HALO + 1):
            t = float(col_taps[c, a])
            if t == 0.0:
                continue
            # out[r] = sum_a tap[a] * slab[r + a]
            term = t * pltpu.roll(slab, (-a) % slab_h, 0)
            acc = term if acc is None else acc + term
        cols.append(acc[:block_h, :])

    # ---- this program's phase (grid dim 1): 9 row convolutions +
    # third-order products. Each phase selects its 9 tap rows with
    # lax.switch over the (static) 4 phase banks.
    def phase_body(ph):
        fs = []
        for d in range(9):
            o = ph * 9 + d
            src = cols[int(row_select[o])]
            acc = None
            for a in range(2 * HALO + 1):
                t = float(row_taps[o, a])
                if t == 0.0:
                    continue
                # out[j] = sum_a taps[a] * src[j + a - HALO]; roll shift
                # must be non-negative.
                shift = (-(a - HALO)) % src.shape[1]
                term = t * pltpu.roll(src, shift, 1)
                acc = term if acc is None else acc + term
            fs.append(acc)
        return fs

    fs = jax.lax.switch(phase, [lambda ph=ph: phase_body(ph)
                                for ph in range(4)])
    fx, fy, fxx, fxy, fyy, fxxy, fxyy, fxxx, fyyy = fs
    mag = jnp.sqrt(fx * fx + fy * fy)
    to_ix = (fx * (2 * fxx * fxx + 2 * fxy * fxy)
             + fy * (2 * fxx * fxy + 2 * fyy * fxy)
             + 2 * fx * fy * fxxy + fy * fy * fxyy + fx * fx * fxxx)
    to_iy = (fx * (2 * fxx * fxy + 2 * fyy * fxy)
             + fy * (2 * fyy * fyy + 2 * fxy * fxy)
             + 2 * fx * fy * fxyy + fx * fx * fxxy + fy * fy * fyyy)
    # atan2 is not lowerable in Mosaic; emit the third-order components
    # and take arctan2 in XLA outside the kernel.
    ix_ref[0, :, :] = fx
    iy_ref[0, :, :] = fy
    mag_ref[0, :, :] = mag
    tix_ref[0, :, :] = to_ix
    tiy_ref[0, :, :] = to_iy


@functools.partial(jax.jit, static_argnames=("kernel_size", "sigma",
                                             "block_h", "interpret"))
def toed_gradient_field_pallas(img: jnp.ndarray, kernel_size: int = 17,
                               sigma: float = 2.0, block_h: int = 24,
                               interpret: bool = False):
    """Drop-in replacement for ops.toed.toed_gradient_field on TPU.

    img: (H, W) float32. Returns (Ix, Iy, grad_mag, orient), each (2H, 2W).
    """
    H, W = img.shape
    col_taps, row_select, row_taps = filters.toed_separable_taps(
        kernel_size, sigma)

    Hp = -(-H // block_h) * block_h
    Wp = -(-(W + 2 * HALO + 7) // 128) * 128
    # 24 = slab_h - block_h rows of bottom padding for the aligned slab
    padded = jnp.zeros((Hp + HALO + 24, Wp), jnp.float32)
    padded = padded.at[HALO:HALO + H, :W].set(img.astype(jnp.float32))

    n_blocks = Hp // block_h
    kern = functools.partial(_kernel, col_taps=col_taps,
                             row_select=row_select, row_taps=row_taps,
                             block_h=block_h)
    out_shape = [jax.ShapeDtypeStruct((4, Hp, Wp), jnp.float32)
                 for _ in range(5)]
    out_spec = pl.BlockSpec((1, block_h, Wp), lambda i, p: (p, i, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(n_blocks, 4),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(padded)

    def interleave(phases):
        # (4, Hp, Wp) phase-major -> (2H, 2W)
        t = phases.reshape(2, 2, Hp, Wp)
        t = jnp.transpose(t, (2, 0, 3, 1)).reshape(2 * Hp, 2 * Wp)
        return t[: 2 * H, : 2 * W]

    ix, iy, mag, tix, tiy = outs
    orient = jnp.arctan2(tix, -tiy)
    return (interleave(ix), interleave(iy), interleave(mag),
            interleave(orient))

#!/usr/bin/env python
"""Microbench: grid-window fetch strategies on TPU (round-5).

The surviving big gathers after the one-hot compaction are the raw
gather-window fetches: sorted_attrs[:, pos] with pos (Q, S) spanning
contiguous per-band ranges (~22 ms each in the r5b trace). Candidates:

  A. element gather (today): attrs (A, N) indexed at (Q, S) positions.
  B. row-atlas + static-shift select: overlapping length-(S+s) windows of
     the sorted arrays at stride s; fetch one row per (query, band) by
     row gather, then align with an s-way static-slice select.
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    g = np.random.default_rng(0)
    N, Q, S, A = 32768, 32768, 160, 4
    s = 8
    attrs = jnp.asarray(g.normal(size=(A, N)).astype(np.float32))
    lo = jnp.asarray(g.integers(0, N - S, size=(Q,)).astype(np.int32))

    def elem_gather(attrs, lo):
        pos = lo[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        return attrs[:, pos]                      # (A, Q, S)

    L = S + s
    Rn = -(-N // s)

    def build_rows(attrs):
        pad = Rn * s + L - N
        ap = jnp.pad(attrs, ((0, 0), (0, pad)))
        k = L // s + (1 if L % s else 0)
        blocks = ap[:, : (Rn + k) * s].reshape(A, -1, s)
        rows = jnp.concatenate([blocks[:, i:i + Rn] for i in range(k)],
                               axis=-1)[..., :L]  # (A, Rn, L)
        return jnp.moveaxis(rows, 0, 1).reshape(Rn, A * L)  # row-major

    rows_flat = jax.jit(build_rows)(attrs)

    def row_shift(rows_flat, lo):
        rid = lo // s
        sh = lo % s                                # (Q,)
        fetched = rows_flat[rid].reshape(Q, A, L)  # row gather
        # s-way static-shift select
        stack = jnp.stack([fetched[:, :, i:i + S] for i in range(s)], 0)
        return jnp.take_along_axis(
            stack, sh[None, :, None, None].astype(jnp.int32), axis=0)[0]

    def row_shift_select(rows_flat, lo):
        rid = lo // s
        sh = lo % s
        fetched = rows_flat[rid].reshape(Q, A, L)
        out = jnp.zeros((Q, A, S), jnp.float32)
        for i in range(s):
            out = jnp.where((sh == i)[:, None, None],
                            fetched[:, :, i:i + S], out)
        return out

    t_a = timeit(jax.jit(elem_gather), attrs, lo)
    t_b = timeit(jax.jit(row_shift_select), rows_flat, lo)
    t_build = timeit(jax.jit(build_rows), attrs)
    print(f"A element gather (A={A}, {Q}x{S}):  {t_a:7.2f} ms")
    print(f"B row-atlas shift-select:           {t_b:7.2f} ms"
          f" (+build {t_build:.2f} ms)")


if __name__ == "__main__":
    main()

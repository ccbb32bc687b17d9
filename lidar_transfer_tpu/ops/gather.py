"""Gather formulations tuned for the remote XLA:TPU compiler.

The compiler lowers large arbitrary-index 1-D gathers through a
~8.5-19 ns/index scalar path, while 2-D ROW gathers vectorize
(docs/PERF.md). ``lane_pick`` expresses ``vol[idx]`` as a row gather of
the (nvox/128, 128) view plus a one-hot lane reduction — measured 2x
the 1-D gather at 1.1M indices from a 1 GB operand (8.0 vs 16.4 ms),
despite moving 128x the bytes: bandwidth beats the scalar-gather issue
rate. (``take_along_axis`` for the lane pick is SLOWER than the plain
gather — 21 ms — so the one-hot reduce is load-bearing.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lane_pick(vol_flat: jax.Array, idx: jax.Array) -> jax.Array:
    """``vol_flat[idx]`` via row gather + one-hot lane reduce.

    A true drop-in for the gather: out-of-range indices clamp to the
    last element (XLA gather clamp semantics — clipping the FULL index
    first, not row and lane separately, which would pick a different
    element), exactly one lane survives the mask so the reduction adds
    a single element to zero, and the result keeps ``vol_flat``'s dtype
    (``jnp.sum`` alone would promote bool/int8 to int32). Falls back to
    the plain gather when the volume isn't 128-divisible.
    """
    nvox = vol_flat.shape[0]
    if nvox % 128:
        return vol_flat[idx]
    # match the gather exactly: negatives wrap numpy-style FIRST, then
    # out-of-range clamps to the ends (XLA gather clamp semantics)
    idx = jnp.clip(jnp.where(idx < 0, idx + nvox, idx), 0, nvox - 1)
    rows = vol_flat.reshape(-1, 128)[idx // 128]          # (n, 128)
    oh = (jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
          == (idx % 128)[:, None])
    zero = jnp.zeros((), rows.dtype)
    return jnp.sum(jnp.where(oh, rows, zero), axis=1,
                   dtype=rows.dtype)

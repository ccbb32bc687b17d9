"""Confusion-matrix backends: Pallas MXU kernel, XLA one-hot matmul, scatter.

The reference accumulates its confusion matrix with ``np.add.at``
(auxiliary/np_ioueval.py:43) — a host-side scatter. On TPU, scatter-add is
the *worst* formulation (serialized updates through HBM); the TPU-native
formulation is a dense one-hot contraction on the MXU:

    conf[c1, c2] = sum_i [pred_i == c1] * [target_i == c2]
                 = onehot(pred)^T @ onehot(target)

Three interchangeable implementations live here:

  - ``confusion_pallas``: a Pallas TPU kernel that tiles the N samples,
    builds the two one-hot blocks *in VMEM* (never materialized in HBM),
    and accumulates the (C, C) product on the MXU in float32 across grid
    steps. bfloat16 one-hot operands: 0/1 are exact, products are exact,
    accumulation is f32 (`preferred_element_type`), so counts are exact
    integers for any realistic N (< 2^24 per cell).
  - ``confusion_onehot``: the same contraction left to XLA (fallback for
    CPU, and the baseline the Pallas kernel is benchmarked against).
  - ``confusion_scatter``: the literal scatter-add (reference semantics
    oracle for tests).

All three drop out-of-range ids like the reference's masked scatter: an id
outside [0, n_classes) matches no one-hot column and contributes nothing.

Mosaic gather probe note (why THIS op got the Pallas kernel): per-element
dynamic gathers — what the TSDF integrate (ops/tsdf.py) and raymarcher
(ops/raycast.py) need — are not usable from Pallas on this stack
(jnp.take -> "Only 2D gather is supported"; wide take_along_axis crashes
the Mosaic compiler). Those ops therefore stay on XLA's native fused
gather path, which profiles near HBM speed-of-light; the confusion matrix
is gather-free and genuinely MXU-shaped, so it gets the hand-written
kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _confusion_kernel(pred_ref, tgt_ref, out_ref):
    """One grid step: (1, TILE) int32 ids -> accumulate (C, C) counts."""
    c = out_ref.shape[0]
    tile = pred_ref.shape[1]

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    classes = jax.lax.broadcasted_iota(jnp.int32, (tile, c), 1)
    onehot_p = (pred_ref[0, :][:, None] == classes).astype(jnp.bfloat16)
    onehot_t = (tgt_ref[0, :][:, None] == classes).astype(jnp.bfloat16)
    # (C, TILE) @ (TILE, C) on the MXU, f32 accumulation
    out_ref[:] += jax.lax.dot_general(
        onehot_p, onehot_t,
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("n_classes", "tile", "interpret"))
def confusion_pallas(pred: jax.Array, target: jax.Array, n_classes: int,
                     tile: int = 2048, interpret: bool = False) -> jax.Array:
    """(n_classes, n_classes) int32 confusion matrix via a Pallas MXU kernel.

    rows = pred, cols = target (≡ reference addBatch, np_ioueval.py:27-43).
    """
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    n = p.shape[0]
    n_pad = _round_up(max(n, 1), tile)
    # pad with -1: matches no class, drops out (like mode="drop")
    p = jnp.pad(p, (0, n_pad - n), constant_values=-1).reshape(1, n_pad)
    t = jnp.pad(t, (0, n_pad - n), constant_values=-1).reshape(1, n_pad)
    c_pad = _round_up(n_classes, 128)

    conf = pl.pallas_call(
        _confusion_kernel,
        grid=(n_pad // tile,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c_pad, c_pad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(p, t)
    return conf[:n_classes, :n_classes].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_classes",))
def confusion_onehot(pred: jax.Array, target: jax.Array,
                     n_classes: int) -> jax.Array:
    """Same contraction expressed in plain XLA (CPU fallback / baseline)."""
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    classes = jnp.arange(n_classes, dtype=jnp.int32)
    oh_p = (p[:, None] == classes).astype(jnp.bfloat16)
    oh_t = (t[:, None] == classes).astype(jnp.bfloat16)
    conf = jax.lax.dot_general(
        oh_p, oh_t, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    return conf.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("n_classes",))
def confusion_scatter(pred: jax.Array, target: jax.Array,
                      n_classes: int) -> jax.Array:
    """Literal scatter-add (reference-semantics oracle).

    Negative ids are mapped out of range first so they drop like any other
    out-of-range id (bare ``mode="drop"`` would *wrap* them — numpy/JAX
    negative indexing — which no backend should inherit as semantics).
    """
    p = pred.reshape(-1).astype(jnp.int32)
    t = target.reshape(-1).astype(jnp.int32)
    p = jnp.where(p < 0, n_classes, p)
    t = jnp.where(t < 0, n_classes, t)
    cm = jnp.zeros((n_classes, n_classes), dtype=jnp.int32)
    return cm.at[p, t].add(1, mode="drop")


def confusion_matrix(pred: jax.Array, target: jax.Array,
                     n_classes: int) -> jax.Array:
    """Backend-dispatching confusion matrix (rows=pred, cols=target).

    TPU: Pallas MXU kernel. Elsewhere: XLA one-hot matmul (the dense
    contraction beats scatter on every backend we measured).
    """
    if jax.default_backend() == "tpu":
        return confusion_pallas(pred, target, n_classes)
    return confusion_onehot(pred, target, n_classes)


def benchmark_backends(n: int = 131072, n_classes: int = 260,
                       iters: int = 50, seed: int = 0) -> dict:
    """Time all backends on the current device. Returns {name: seconds}."""
    import time

    rng = np.random.default_rng(seed)
    p = jnp.asarray(rng.integers(0, n_classes, n), jnp.int32)
    t = jnp.asarray(rng.integers(0, n_classes, n), jnp.int32)
    fns = {"scatter": confusion_scatter, "onehot_xla": confusion_onehot}
    if jax.default_backend() == "tpu":
        fns["pallas"] = confusion_pallas
    out = {}
    for name, fn in fns.items():
        fn(p, t, n_classes).block_until_ready()  # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            fn(p, t, n_classes).block_until_ready()
        out[name] = (time.perf_counter() - t0) / iters
    return out

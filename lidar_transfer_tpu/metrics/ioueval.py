"""Confusion-matrix IoU/accuracy metrics on device (JAX).

TPU-native rebuild of the reference ``iouEval``
(auxiliary/np_ioueval.py:8-70): the ``np.add.at`` scatter becomes a dense
one-hot MXU contraction (metrics/confusion.py — Pallas kernel on TPU, XLA
matmul elsewhere; ~2x the jitted scatter-add); matrices from sharded
batches reduce with ``psum`` when used inside ``shard_map``. Semantics
(ignore-class row+col masking, the 1e-15 union epsilon, mean over included
classes) match exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.metrics.confusion import confusion_matrix

__all__ = ["confusion_matrix", "iou_from_confusion", "acc_from_confusion",
           "IoUEval"]


def _masked_stats(conf: jax.Array, ignore_mask: jax.Array):
    """tp/fp/fn with ignore rows+cols zeroed (np_ioueval.py:45-54)."""
    keep = ~ignore_mask
    conf = conf * keep[:, None] * keep[None, :]
    tp = jnp.diagonal(conf)
    fp = conf.sum(axis=1) - tp
    fn = conf.sum(axis=0) - tp
    return tp, fp, fn


@jax.jit
def iou_from_confusion(conf: jax.Array, ignore_mask: jax.Array
                       ) -> tuple[jax.Array, jax.Array]:
    """-> (mean IoU over included classes, per-class IoU for ALL classes).

    ≡ reference getIoU (np_ioueval.py:56-63) incl. the 1e-15 epsilon —
    BUT in jax's default f32 (the float64 casts are downcast unless
    jax_enable_x64 is on): exact to ~1 ulp for counts < 2^24 per cell.
    The in-graph / psum-reducible variant; the stateful ``IoUEval``
    computes the final ratios host-side in true float64.
    """
    tp, fp, fn = _masked_stats(conf, ignore_mask)
    union = (tp + fp + fn).astype(jnp.float64) + 1e-15
    iou = tp.astype(jnp.float64) / union
    include = ~ignore_mask
    n_inc = jnp.maximum(include.sum(), 1)
    mean_iou = jnp.where(include, iou, 0.0).sum() / n_inc
    return mean_iou, iou


@jax.jit
def acc_from_confusion(conf: jax.Array, ignore_mask: jax.Array) -> jax.Array:
    """≡ reference getacc (np_ioueval.py:65-70); f32 in-graph variant —
    see iou_from_confusion's precision note."""
    tp, fp, fn = _masked_stats(conf, ignore_mask)
    include = ~ignore_mask
    total_tp = tp.sum().astype(jnp.float64)
    total = (jnp.where(include, tp, 0).sum()
             + jnp.where(include, fp, 0).sum()).astype(jnp.float64) + 1e-15
    return total_tp / total


class IoUEval:
    """Stateful accumulator with the reference's iouEval API surface.

    Per-batch confusion matrices compute on device (the jitted/psum-able
    kernels in metrics.confusion); the ACCUMULATOR is host numpy int64 —
    the reference uses int64 for exactly this (np_ioueval.py:29), and a
    device int32 accumulator wraps silently past 2^31 counts per cell
    (~16k full scans of one dominant class). In-graph consumers that
    need a device-resident sum use metrics.confusion directly.
    """

    def __init__(self, n_classes: int, ignore=None):
        self.n_classes = n_classes
        ignore = np.asarray([] if ignore is None else ignore, dtype=np.int64)
        mask = np.zeros((n_classes,), dtype=bool)
        if ignore.size:
            mask[ignore] = True
        self.ignore_mask = jnp.asarray(mask)
        self.reset()

    def reset(self) -> None:
        self.conf = np.zeros((self.n_classes, self.n_classes),
                             dtype=np.int64)

    def add_batch(self, pred, target) -> None:
        self.conf = self.conf + np.asarray(confusion_matrix(
            jnp.asarray(pred), jnp.asarray(target), self.n_classes),
            dtype=np.int64)

    # reference-compatible alias (np_ioueval.py:27)
    addBatch = add_batch

    def _host_stats(self):
        """One fetch of the (tiny) confusion matrix; ratios in TRUE
        numpy float64 — bit-for-bit the reference np_ioueval math, which
        the device variants only approximate in f32 (jax_enable_x64 is
        never turned on by this package)."""
        conf = np.array(self.conf, dtype=np.int64)
        ignore = np.asarray(self.ignore_mask)
        conf[ignore, :] = 0
        conf[:, ignore] = 0
        tp = np.diag(conf).astype(np.float64)
        fp = conf.sum(axis=1) - np.diag(conf)
        fn = conf.sum(axis=0) - np.diag(conf)
        return tp, fp.astype(np.float64), fn.astype(np.float64), ~ignore

    def get_iou(self) -> tuple[float, np.ndarray]:
        tp, fp, fn, include = self._host_stats()
        iou = tp / (tp + fp + fn + 1e-15)
        mean_iou = iou[include].sum() / max(include.sum(), 1)
        return float(mean_iou), iou

    getIoU = get_iou

    def get_acc(self) -> float:
        tp, fp, fn, include = self._host_stats()
        return float(tp.sum() / (tp[include].sum() + fp[include].sum()
                                 + 1e-15))

    getacc = get_acc

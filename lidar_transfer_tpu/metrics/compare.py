"""Source-vs-virtual scan comparison (JAX).

Rebuild of the reference's ``compare()`` (auxiliary/laserscan.py:1181-1301):
masks out black/unlabeled pixels, evaluates label agreement as mIoU/Acc via
the confusion matrix, and range/remission agreement as squared-error images.

Parity note: the reference remaps the sparse union of present label ids to
contiguous indices and marks absent indices as ignore (laserscan.py:1214-1228).
Per-class tp/fp/fn are invariant under that bijective remap, so we evaluate
directly on raw label ids with "present" classes included — the resulting
mIoU/Acc are identical (the remap only relabels confusion-matrix rows/cols).
The reference includes class 0 in the mean when present (it only ignores
*empty* classes); we reproduce that behavior.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lidar_transfer_tpu.metrics.ioueval import confusion_matrix


class CompareResult(NamedTuple):
    mean_iou: jax.Array        # scalar f32
    mean_acc: jax.Array        # scalar f32
    mse: jax.Array             # scalar f32: masked range MSE
    iou_per_class: jax.Array   # (max_label,) f32 IoU on raw ids
    present: jax.Array         # (max_label,) bool: class in post-mask union
    label_diff: jax.Array      # (H,W) i32: 1 where labels disagree
    range_diff: jax.Array      # (H,W) f32: squared range error
    remission_diff: jax.Array  # (H,W) f32: squared remission error


@functools.partial(jax.jit, static_argnames=("max_label",))
def compare_scans(source_label: jax.Array, source_mask: jax.Array,
                  source_range: jax.Array, source_remission: jax.Array,
                  target_label: jax.Array, target_range: jax.Array,
                  target_remission: jax.Array,
                  max_label: int = 260) -> CompareResult:
    """Compare a source range image against a synthesized virtual scan.

    Args:
      source_label:     (H,W) i32 raw label ids
      source_mask:      (H,W) bool — source pixel has data
      source_range:     (H,W) f32
      source_remission: (H,W) f32
      target_*:         same layout for the virtual scan
      max_label:        static bound on raw label ids (SemanticKITTI: 260)

    Masking semantics ≡ laserscan.py:1199-1209: pixels where the source is
    black (no data or label 0) are zeroed in both scans, then pixels whose
    (masked) source label is 0 are zeroed in the target as well.
    """
    src_lbl = source_label.astype(jnp.int32)
    tgt_lbl = target_label.astype(jnp.int32)

    # "black" = source color sums to 0 = no data or label 0
    # (color_lut[0] == (0,0,0) and proj_color inits to 0)
    black = (~source_mask) | (src_lbl == 0)
    src_lbl = jnp.where(black, 0, src_lbl)
    tgt_lbl = jnp.where(black, 0, tgt_lbl)

    bg = src_lbl == 0
    tgt_lbl = jnp.where(bg, 0, tgt_lbl)

    label_diff = (src_lbl != tgt_lbl).astype(jnp.int32)

    # confusion over raw ids; preds=target, gt=source (laserscan.py:1229)
    conf = confusion_matrix(tgt_lbl, src_lbl, max_label)
    present = (conf.sum(axis=0) + conf.sum(axis=1)) > 0

    tp = jnp.diagonal(conf)
    fp = conf.sum(axis=1) - tp
    fn = conf.sum(axis=0) - tp
    union = (tp + fp + fn).astype(jnp.float32) + 1e-15
    iou = tp.astype(jnp.float32) / union
    n_present = jnp.maximum(present.sum(), 1)
    mean_iou = jnp.where(present, iou, 0.0).sum() / n_present

    total_tp = tp.sum().astype(jnp.float32)
    total = (jnp.where(present, tp, 0).sum()
             + jnp.where(present, fp, 0).sum()).astype(jnp.float32) + 1e-15
    mean_acc = total_tp / total

    # range MSE with label-background masking (laserscan.py:1255-1261,
    # range_mask_label=True branch)
    src_rng = jnp.where(bg, 0.0, source_range)
    tgt_rng = jnp.where(bg, 0.0, target_range)
    range_diff = (src_rng - tgt_rng) ** 2
    mse = range_diff.sum() / range_diff.size

    # remission squared diff (laserscan.py:1276-1280)
    src_rem = jnp.where(bg, 0.0, source_remission)
    tgt_rem = jnp.where(bg, 0.0, target_remission)
    rem_diff = (src_rem - tgt_rem) ** 2

    return CompareResult(mean_iou=mean_iou, mean_acc=mean_acc, mse=mse,
                         iou_per_class=iou, present=present,
                         label_diff=label_diff, range_diff=range_diff,
                         remission_diff=rem_diff)

"""Multi-scan window loading and merging.

Rebuild of the reference's ``MultiSemLaserScan.open_multiple_scans``
(auxiliary/laserscan.py:776-817):

  - a window of ``nscans`` around the primary index: prev half / next half,
    primary moved to slot 0 (laserscan.py:783-790);
  - per-scan pose application (we defer it: the *relative* transform
    inv(pose[primary]) @ pose[i] is composed on host in float64 and applied
    on device in one batched einsum — numerically better than the
    reference's apply-pose-then-apply-inverse-pose double f32 matmul);
  - moving classes masked from all but the primary scan (laserscan.py:803),
    ignore classes masked everywhere (laserscan.py:807) — masking, not
    physical removal (masked points can never win a pixel; identical
    downstream semantics).
"""

from __future__ import annotations

import collections
import dataclasses
import weakref

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.config import TransferConfig
from lidar_transfer_tpu.datasets.kitti import KittiSequence, pad_points
from lidar_transfer_tpu.ops.projection import mask_classes
from lidar_transfer_tpu.ops.transforms import transform_points


def window_indices(nscans: int, idx: int) -> list[int]:
    """Scan indices for a window around idx, primary first.

    ≡ laserscan.py:781-790: relative = arange(-nscans//2, nscans-nscans//2)
    with 0 moved to the front.
    """
    if nscans <= 1:
        return [idx]
    n_prev = nscans // 2
    n_next = nscans - n_prev
    rel = [r for r in range(-n_prev, n_next) if r != 0]
    rel.insert(0, 0)
    return [idx + r for r in rel]


def min_start_index(nscans: int) -> int:
    """First valid primary index (needs nscans//2 previous scans),
    ≡ lidar_deform.py:386-390 automatic offset."""
    return nscans // 2


def max_end_index(nscans: int, length: int) -> int:
    """One past the last valid primary index: the centered window needs
    only ``nscans - nscans//2 - 1`` future scans (window_indices)."""
    return length - (nscans - nscans // 2 - 1)


@dataclasses.dataclass
class ScanWindow:
    """A padded window of scans. Points are raw (sensor frame); ``rel_pose``
    maps each scan into the primary scan's frame.

    ``primary_index`` is the primary scan's ROW within the window (0 by
    ``window_indices`` construction — the primary is always stacked
    first). It is static jit metadata, so it must NOT carry per-frame
    values like the sequence index: that forced a full retrace + remote
    relower of every engine program per frame on the CLI path (the jit
    cache keys on meta_fields)."""

    points: jax.Array       # (S, C, 3) f32
    remissions: jax.Array   # (S, C) f32
    labels: jax.Array       # (S, C) i32
    valid: jax.Array        # (S, C) bool
    rel_pose: jax.Array     # (S, 4, 4) f32: inv(pose[primary]) @ pose[i]
    primary_index: int = 0

    @property
    def nscans(self) -> int:
        return self.points.shape[0]

    @property
    def capacity(self) -> int:
        return self.points.shape[1]


# per-sequence LRU of padded host tensors, keyed (scan_idx, capacity);
# sized to cover a sliding window generously without pinning a sequence
_scan_cache: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()
_SCAN_CACHE_MAX = 16


def load_window(seq: KittiSequence, cfg: TransferConfig, idx: int,
                capacity: int) -> ScanWindow:
    """Read, pad, and mask a scan window from a KITTI sequence.

    Raises IndexError when the centered window does not fit the
    sequence: Python's negative indexing would otherwise silently wrap
    ``seq.read(-1)``/``seq.poses[-1]`` to the END of the sequence and
    merge a temporally distant scan with a wildly wrong relative pose
    (callers guard with ``min_start_index``/``max_end_index``, ≡ the
    reference's automatic offset at lidar_deform.py:386-390)."""
    n = cfg.number_of_scans
    if not (min_start_index(n) <= idx < max_end_index(n, len(seq))):
        raise IndexError(
            f"window of {n} scans around index {idx} does not fit the "
            f"{len(seq)}-scan sequence (valid primary range: "
            f"[{min_start_index(n)}, {max_end_index(n, len(seq))}))")
    idxs = window_indices(cfg.number_of_scans, idx)
    cache = _scan_cache.setdefault(seq, collections.OrderedDict())
    pose_primary_inv = np.linalg.inv(seq.poses[idx])
    extra = cfg.transformation_matrix.astype(np.float64)

    pts_l, rem_l, lbl_l, val_l, rel_l = [], [], [], [], []
    for slot, i in enumerate(idxs):
        # consecutive windows share nscans-1 scans; cache the padded
        # host tensors so streaming a sequence reads each file once,
        # not nscans times (entries are treated as immutable)
        key = (i, capacity)
        if key in cache:
            cache.move_to_end(key)
            p, r, l, m = cache[key]
        else:
            points, rem, labels = seq.read(i)
            p, r, l, m = pad_points(points, rem, labels, capacity)
            cache[key] = (p, r, l, m)
            while len(cache) > _SCAN_CACHE_MAX:
                cache.popitem(last=False)
        pts_l.append(p)
        rem_l.append(r)
        lbl_l.append(l)
        val_l.append(m)
        # f64 host composition; optional config transformation applied in
        # the world frame like open_scan_append (laserscan.py:76-81)
        rel = pose_primary_inv @ extra @ seq.poses[i]
        rel_l.append(rel.astype(np.float32))

    window = ScanWindow(
        points=jnp.asarray(np.stack(pts_l)),
        remissions=jnp.asarray(np.stack(rem_l)),
        labels=jnp.asarray(np.stack(lbl_l)),
        valid=jnp.asarray(np.stack(val_l)),
        rel_pose=jnp.asarray(np.stack(rel_l)),
    )
    return apply_class_masks(window, cfg.ignore_classes, cfg.moving_classes)


def stack_windows(wins: list[ScanWindow]) -> ScanWindow:
    """Stack F windows on a leading frame axis for
    ``TransferEngine.transfer_stream``.

    (The streamed engine's lazy volume consumers — ``fused_state``,
    rolling shutter — take an explicit ``frame=i`` afterwards.)
    """
    return ScanWindow(
        points=jnp.stack([w.points for w in wins]),
        remissions=jnp.stack([w.remissions for w in wins]),
        labels=jnp.stack([w.labels for w in wins]),
        valid=jnp.stack([w.valid for w in wins]),
        rel_pose=jnp.stack([w.rel_pose for w in wins]),
        primary_index=wins[0].primary_index,
    )


def apply_class_masks(window: ScanWindow, ignore_classes: tuple[int, ...],
                      moving_classes: tuple[int, ...]) -> ScanWindow:
    """Mask ignore classes everywhere; moving classes on non-primary scans."""
    valid = mask_classes(window.labels, window.valid, tuple(ignore_classes))
    if window.nscans > 1 and moving_classes:
        non_primary = mask_classes(window.labels, valid,
                                   tuple(moving_classes))
        first = valid[0:1]
        valid = jnp.concatenate([first, non_primary[1:]], axis=0)
    return dataclasses.replace(window, valid=valid)


@jax.jit
def merge_window(window: ScanWindow):
    """Transform every scan into the primary frame and flatten to one cloud.

    ≡ the concat + apply_inv_pose dance of deform() (laserscan.py:836-845,
    939-949). -> (points (S*C,3), rem (S*C,), labels (S*C,), valid (S*C,)).
    """
    pts = transform_points(window.points, window.rel_pose)
    flat = lambda a: a.reshape((-1,) + a.shape[2:])  # noqa: E731
    return (flat(pts), flat(window.remissions), flat(window.labels),
            flat(window.valid))


jax.tree_util.register_dataclass(
    ScanWindow,
    data_fields=["points", "remissions", "labels", "valid", "rel_pose"],
    meta_fields=["primary_index"],
)

"""Virtual-scan dataset writer (KITTI-format output).

≡ ``MultiSemLaserScan.write`` (auxiliary/laserscan.py:1121-1178) with the
same filters — drop no-data pixels and (0,0,0) points — but vectorized
numpy ``tofile`` instead of per-point ``struct.pack`` loops
(laserscan.py:1162-1178).
"""

from __future__ import annotations

import os

import numpy as np

from lidar_transfer_tpu.datasets import kitti
from lidar_transfer_tpu.pipeline.deform import VirtualScan


def filter_virtual_scan(vs: VirtualScan
                        ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """-> (points (N,3), remissions (N,), labels (N,)) with the reference's
    write-time filters applied (laserscan.py:1147-1154): non-negative label
    (always true for us), and sum(point) != 0 removes misses/no-data."""
    pts = np.asarray(vs.points).reshape(-1, 3)
    lbl = np.asarray(vs.label).reshape(-1).astype(np.int32)
    rem = np.asarray(vs.remission).reshape(-1)
    keep = lbl >= 0
    # NOTE: the reference's cp path also drops the pixel won by point
    # index 0 (`index > 0`, laserscan.py:1138) — an off-by-one we do not
    # reproduce; we use the validity mask instead.
    keep &= np.asarray(vs.mask).reshape(-1)
    keep &= pts.sum(axis=1) != 0
    return pts[keep], rem[keep], lbl[keep]


def write_virtual_scan(out_path: str, idx: int, vs: VirtualScan) -> int:
    """Write <out>/velodyne/XXXXXX.bin + <out>/labels/XXXXXX.label.
    Returns the number of points written."""
    pts, rem, lbl = filter_virtual_scan(vs)
    kitti.write_scan_file(
        os.path.join(out_path, "velodyne", f"{idx:06d}.bin"), pts, rem)
    kitti.write_label_file(
        os.path.join(out_path, "labels", f"{idx:06d}.label"), lbl)
    return pts.shape[0]

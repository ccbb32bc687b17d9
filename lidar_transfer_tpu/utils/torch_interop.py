"""Torch interop: RangeImage <-> channel-first torch tensors.

The reference converts scans to torch for its external CNN
(auxiliary/laserscan.py:503-534 ``LaserScan.torch()/numpy()``). Our
segmentation model is flax/JAX, but downstream consumers of the reference
commonly feed RangeNet-style torch models; these helpers produce the same
tensor layout the reference's ``torch()`` did (channel-first [C,H,W]
images, float range/xyz/remission, long index maps). Torch is imported
lazily — the framework never requires it.
"""

from __future__ import annotations

import numpy as np


def range_image_to_torch(ri, points=None) -> dict:
    """RangeImage -> dict of torch tensors in the reference's layout:

      proj_range     (H,W)    float32
      proj_xyz       (3,H,W)  float32   (zeros where no data; present
                              only when ``points`` is passed — the
                              RangeImage doesn't retain point coordinates)
      proj_remission (H,W)    float32
      proj_idx       (H,W)    int64     (-1 where no data)
      proj_mask      (H,W)    float32
      proj_x/proj_y  (N,)     int64     per-POINT pixel coords — the
                              reference's layout (laserscan.py:49
                              "[m,1]": unproj consumers scatter pixel
                              predictions back to points through them)
      unproj_range   (N,)     float32   per-point range (laserscan.py:47)
      points_valid   (N,)     bool      point survived projection
                              filters (padded capacity rows are False)

    ``points``: the (N,3) point array the RangeImage was projected from
    (padded capacity matching ``ri.index``); per-pixel xyz of the winning
    point is gathered through ``ri.index`` channel-first, exactly like the
    reference's ``torch()`` (laserscan.py:511-512).
    """
    import torch

    mask = np.asarray(ri.mask)
    out = {
        "proj_range": torch.from_numpy(
            np.asarray(ri.range, np.float32)),
        "proj_remission": torch.from_numpy(
            np.asarray(ri.remission, np.float32)),
        "proj_idx": torch.from_numpy(
            np.asarray(ri.index, np.int64)),
        "proj_mask": torch.from_numpy(mask.astype(np.float32)),
        # per-POINT pixel coords, the reference's proj_x/proj_y layout
        # (laserscan.py:49): one entry per input point, for scattering
        # per-pixel predictions back to the cloud
        "proj_x": torch.from_numpy(np.asarray(ri.point_u, np.int64)),
        "proj_y": torch.from_numpy(np.asarray(ri.point_v, np.int64)),
        "unproj_range": torch.from_numpy(
            np.asarray(ri.point_depth, np.float32)),
        "points_valid": torch.from_numpy(
            np.asarray(ri.point_valid, bool)),
    }
    if points is not None:
        idx = np.asarray(ri.index, np.int64)
        xyz = np.asarray(points, np.float32)[np.maximum(idx, 0)]
        xyz[~mask] = 0.0
        out["proj_xyz"] = torch.from_numpy(
            np.ascontiguousarray(np.transpose(xyz, (2, 0, 1))))
    return out


def features_to_torch(features) -> "object":
    """(H,W,C) jax features -> (C,H,W) torch float tensor (channel first,
    like the reference's proj_xyz transpose at laserscan.py:511-512)."""
    import torch

    f = np.asarray(features, np.float32)
    return torch.from_numpy(np.transpose(f, (2, 0, 1)))


def torch_to_numpy(t) -> np.ndarray:
    """Torch tensor -> numpy (≡ LaserScan.numpy(), laserscan.py:522-534)."""
    return t.detach().cpu().numpy()

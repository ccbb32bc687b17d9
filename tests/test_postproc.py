"""kNN post-processor vs its per-point numpy oracle.

The reference's inference chain applies RangeNet++'s KNN cleanup when
back-mapping pixel predictions to points (external lidar-bonnetal
infer.py, driven by reference experiments/run_*.sh). These tests pin the
TPU formulation (static window stack + row gather + sort-threshold vote)
to the straightforward per-point loop.
"""

import numpy as np
import pytest

from lidar_transfer_tpu.models.postproc import (knn_cleanup,
                                                knn_cleanup_oracle)


def _scene(seed, H=16, W=32, N=400, C=7):
    rng = np.random.default_rng(seed)
    proj_range = rng.uniform(2.0, 40.0, (H, W)).astype(np.float32)
    mask = rng.uniform(size=(H, W)) > 0.15
    proj_range = np.where(mask, proj_range, -1.0).astype(np.float32)
    pred = rng.integers(0, C, (H, W)).astype(np.int32)
    pv = rng.integers(0, H, N).astype(np.int32)
    pu = rng.integers(0, W, N).astype(np.int32)
    # point ranges near their pixel's range (so votes actually happen)
    pr = (proj_range[np.clip(pv, 0, H - 1), np.clip(pu, 0, W - 1)]
          + rng.normal(0, 0.4, N)).astype(np.float32)
    valid = rng.uniform(size=N) > 0.1
    return proj_range, pred, mask, pr, pu, pv, valid, C


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("k,ksize", [(5, 5), (3, 3), (7, 5)])
def test_knn_matches_oracle(seed, k, ksize):
    proj_range, pred, mask, pr, pu, pv, valid, C = _scene(seed)
    got = np.asarray(knn_cleanup(
        proj_range, pred, mask, pr, pu, pv, valid,
        num_classes=C, k=k, ksize=ksize))
    want = knn_cleanup_oracle(
        proj_range, pred, mask, pr, pu, pv, valid,
        num_classes=C, k=k, ksize=ksize)
    assert (got == want).mean() == 1.0


def test_knn_identity_on_uniform_labels():
    """A single-class prediction image must survive cleanup unchanged."""
    proj_range, pred, mask, pr, pu, pv, valid, C = _scene(3)
    pred[:] = 4
    got = np.asarray(knn_cleanup(
        proj_range, pred, mask, pr, pu, pv, valid, num_classes=C))
    assert (got == 4).all()


def test_knn_recovers_background_depth():
    """A point at background depth whose pixel was won by a foreground
    surface gets the background label back from its neighborhood."""
    H, W, C = 8, 8, 3
    proj_range = np.full((H, W), 20.0, np.float32)   # background at 20 m
    pred = np.full((H, W), 1, np.int32)              # background class 1
    mask = np.ones((H, W), bool)
    # center pixel won by a 5 m foreground surface labeled 2
    proj_range[4, 4] = 5.0
    pred[4, 4] = 2
    # the occluded point sits at 20 m behind it
    got = np.asarray(knn_cleanup(
        proj_range, pred, mask,
        np.asarray([20.0], np.float32),
        np.asarray([4], np.int32), np.asarray([4], np.int32),
        np.asarray([True]), num_classes=C))
    assert got[0] == 1
    # and the foreground point itself keeps the foreground label
    got_fg = np.asarray(knn_cleanup(
        proj_range, pred, mask,
        np.asarray([5.0], np.float32),
        np.asarray([4], np.int32), np.asarray([4], np.int32),
        np.asarray([True]), num_classes=C))
    assert got_fg[0] == 2


def test_knn_cutoff_falls_back_to_center():
    """No neighbor within the range cutoff -> the pixel's own label."""
    H, W, C = 6, 6, 4
    proj_range = np.full((H, W), 10.0, np.float32)
    pred = np.full((H, W), 3, np.int32)
    mask = np.ones((H, W), bool)
    got = np.asarray(knn_cleanup(
        proj_range, pred, mask,
        np.asarray([50.0], np.float32),     # 40 m from every neighbor
        np.asarray([2], np.int32), np.asarray([2], np.int32),
        np.asarray([True]), num_classes=C, cutoff=1.0))
    assert got[0] == 3

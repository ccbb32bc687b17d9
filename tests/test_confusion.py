"""Confusion-matrix backends: Pallas (interpret), XLA one-hot, scatter.

The scatter backend is the literal reference semantics
(np_ioueval.py:27-43); the dense backends must match it exactly on every
input, including out-of-range ids (dropped).
"""

import numpy as np
import pytest

from lidar_transfer_tpu.metrics import confusion as C


@pytest.fixture(scope="module")
def ids():
    rng = np.random.default_rng(99)
    pred = rng.integers(0, 26, 20000).astype(np.int32)
    tgt = rng.integers(0, 26, 20000).astype(np.int32)
    return pred, tgt


def test_onehot_matches_scatter(ids):
    pred, tgt = ids
    a = np.asarray(C.confusion_scatter(pred, tgt, 26))
    b = np.asarray(C.confusion_onehot(pred, tgt, 26))
    np.testing.assert_array_equal(a, b)
    assert a.sum() == 20000


def test_pallas_interpret_matches_scatter(ids):
    pred, tgt = ids
    a = np.asarray(C.confusion_scatter(pred, tgt, 26))
    b = np.asarray(C.confusion_pallas(pred, tgt, 26, tile=1024,
                                      interpret=True))
    np.testing.assert_array_equal(a, b)


def test_out_of_range_dropped():
    pred = np.asarray([0, 3, 30, -1, 2], np.int32)
    tgt = np.asarray([0, 50, 1, 1, -7], np.int32)
    for fn in (C.confusion_scatter, C.confusion_onehot):
        m = np.asarray(fn(pred, tgt, 26))
        assert m.sum() == 1 and m[0, 0] == 1
    m = np.asarray(C.confusion_pallas(pred, tgt, 26, tile=512,
                                      interpret=True))
    assert m.sum() == 1 and m[0, 0] == 1


def test_empty_input():
    z = np.zeros((0,), np.int32)
    assert np.asarray(C.confusion_onehot(z, z, 8)).sum() == 0
    assert np.asarray(C.confusion_pallas(z, z, 8, tile=256,
                                         interpret=True)).sum() == 0


def test_large_counts_exact():
    """One-hot bf16 products accumulate in f32: counts stay exact well
    beyond a full 64x2048 range image in a single cell."""
    n = 200000
    pred = np.zeros(n, np.int32)
    tgt = np.zeros(n, np.int32)
    m = np.asarray(C.confusion_pallas(pred, tgt, 4, tile=4096,
                                      interpret=True))
    assert m[0, 0] == n


def test_dispatcher_runs():
    pred = np.asarray([1, 2, 2], np.int32)
    m = np.asarray(C.confusion_matrix(pred, pred, 4))
    assert m[1, 1] == 1 and m[2, 2] == 2

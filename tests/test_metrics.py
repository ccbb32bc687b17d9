"""Metric tests: known-answer IoU (≡ reference np_ioueval.py:73-95 self-test)
and compare() semantics."""

import numpy as np
import jax.numpy as jnp

from lidar_transfer_tpu.metrics import IoUEval, compare_scans


def test_known_iou_two_squares():
    """The reference's mock problem: two 2x2 squares on a 7x7 grid."""
    lbl = np.zeros((7, 7), np.int64)
    pred = np.zeros((7, 7), np.int64)
    lbl[2:4, 2:4] = 1
    pred[3:5, 3:5] = 1

    ev = IoUEval(2, ignore=[])
    ev.add_batch(pred, lbl)
    m_iou, iou = ev.get_iou()
    # class 1: intersection 1, union 7; class 0: tp=42, fp=3, fn=3
    np.testing.assert_allclose(iou[1], 1.0 / 7.0, rtol=1e-6)
    np.testing.assert_allclose(iou[0], 42.0 / 48.0, rtol=1e-6)
    np.testing.assert_allclose(m_iou, (1.0 / 7.0 + 42.0 / 48.0) / 2,
                               rtol=1e-6)
    acc = ev.get_acc()
    np.testing.assert_allclose(acc, 43.0 / 49.0, rtol=1e-6)


def test_ignore_classes():
    lbl = np.array([[0, 1, 2], [2, 1, 0]])
    pred = np.array([[0, 2, 2], [2, 2, 0]])
    ev = IoUEval(3, ignore=[0])
    ev.add_batch(pred, lbl)
    m_iou, iou = ev.get_iou()
    # class 0 masked out of rows+cols; class1: tp=0 fp=0 fn=2 -> 0;
    # class2: tp=2 fp=2 fn=0 -> 0.5
    np.testing.assert_allclose(iou[1], 0.0, atol=1e-9)
    np.testing.assert_allclose(iou[2], 0.5, rtol=1e-6)
    np.testing.assert_allclose(m_iou, 0.25, rtol=1e-6)


def test_compare_identity():
    """Identity transfer must give mIoU=1, Acc=1, MSE=0."""
    h, w = 8, 16
    rng_ = np.random.default_rng(0)
    lbl = rng_.choice(np.array([0, 10, 40, 50]), size=(h, w)).astype(np.int32)
    mask = lbl > 0
    rngim = np.where(mask, rng_.random((h, w)) * 50 + 1, 0).astype(np.float32)
    rem = np.where(mask, rng_.random((h, w)), 0).astype(np.float32)

    res = compare_scans(jnp.asarray(lbl), jnp.asarray(mask),
                        jnp.asarray(rngim), jnp.asarray(rem),
                        jnp.asarray(lbl), jnp.asarray(rngim),
                        jnp.asarray(rem))
    np.testing.assert_allclose(float(res.mean_iou), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(res.mean_acc), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(res.mse), 0.0, atol=1e-9)
    assert int(res.label_diff.sum()) == 0


def test_compare_known_disagreement():
    """Hand-computable disagreement: half the class-10 pixels flip to 50."""
    h, w = 4, 8
    lbl = np.full((h, w), 10, np.int32)
    lbl[:2] = 40
    tgt = lbl.copy()
    tgt[2] = 50  # 8 of 16 class-10 pixels now predict 50
    mask = np.ones((h, w), bool)
    rngim = np.full((h, w), 10.0, np.float32)
    tgt_rng = rngim.copy()
    tgt_rng[0, 0] = 14.0  # one pixel off by 4 -> SE 16

    res = compare_scans(jnp.asarray(lbl), jnp.asarray(mask),
                        jnp.asarray(rngim), jnp.asarray(rngim),
                        jnp.asarray(tgt), jnp.asarray(tgt_rng),
                        jnp.asarray(rngim))
    # classes present: 0? no black pixels -> {10, 40, 50}
    # class 40: tp=16 fp=0 fn=0 -> 1; class 10: tp=8, fn=8 -> 0.5
    # class 50: tp=0 fp=8 -> 0 ; mean = 0.5
    np.testing.assert_allclose(float(res.mean_iou), 0.5, rtol=1e-5)
    np.testing.assert_allclose(float(res.mean_acc), 24.0 / 32.0, rtol=1e-5)
    np.testing.assert_allclose(float(res.mse), 16.0 / 32.0, rtol=1e-5)


def test_compare_black_masking():
    """Source no-data pixels zero out target labels before evaluation
    (laserscan.py:1199-1209)."""
    h, w = 2, 4
    lbl = np.array([[10, 10, 0, 0], [40, 40, 40, 40]], np.int32)
    mask = np.array([[True, True, False, False], [True] * 4])
    tgt = np.array([[10, 10, 50, 50], [40, 40, 40, 40]], np.int32)
    z = np.zeros((h, w), np.float32)
    res = compare_scans(jnp.asarray(lbl), jnp.asarray(mask), jnp.asarray(z),
                        jnp.asarray(z), jnp.asarray(tgt), jnp.asarray(z),
                        jnp.asarray(z))
    # the 50s fall on black source pixels -> masked to 0 -> perfect agreement
    np.testing.assert_allclose(float(res.mean_iou), 1.0, rtol=1e-6)

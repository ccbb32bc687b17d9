"""Offline visualizer CLI: panel rendering on the synthetic dataset."""

import os

import numpy as np

from lidar_transfer_tpu import visualize
from lidar_transfer_tpu.datasets import kitti


def test_visualize_labels(tmp_path, synthetic_dataset):
    out = str(tmp_path / "viz")
    rc = visualize.main(["-d", synthetic_dataset, "--out", out,
                         "--frames", "2"])
    assert rc == 0
    files = sorted(os.listdir(out))
    assert files == ["00_000000.png", "00_000001.png"]
    assert os.path.getsize(os.path.join(out, files[0])) > 10000


def test_visualize_ignore_semantics(tmp_path, synthetic_dataset):
    out = str(tmp_path / "viz")
    rc = visualize.main(["-d", synthetic_dataset, "--out", out, "-i",
                         "--offset", "1"])
    assert rc == 0
    assert os.listdir(out) == ["00_000001.png"]


def test_visualize_predictions(tmp_path, synthetic_dataset):
    # fabricate a predictions tree: ground-truth labels with a corruption
    pred_root = str(tmp_path / "preds")
    pred_dir = os.path.join(pred_root, "sequences", "00", "predictions")
    os.makedirs(pred_dir)
    seq = kitti.KittiSequence.open(synthetic_dataset)
    for i in range(len(seq)):
        _, _, lbl = seq.read(i)
        lbl = lbl.copy()
        lbl[::7] = 1  # corrupt every 7th point
        kitti.write_label_file(
            os.path.join(pred_dir, f"{i:06d}.label"), lbl)

    out = str(tmp_path / "viz")
    rc = visualize.main(["-d", synthetic_dataset, "--out", out,
                         "-p", pred_root])
    assert rc == 0
    assert os.listdir(out) == ["00_000000.png"]


def test_bev_image():
    pts = np.array([[0.0, 0.0, 0.0], [10.0, 10.0, 1.0],
                    [100.0, 0.0, 0.0]], np.float32)  # last out of radius
    cols = np.full((3, 3), 200, np.uint8)
    img = visualize.bev_image(pts, cols, radius=50.0, size=100)
    assert img.shape == (100, 100, 3)
    assert img.sum() == 2 * 3 * 200  # two in-range points splatted

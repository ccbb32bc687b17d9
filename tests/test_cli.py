"""CLI end-to-end smoke test on the synthetic dataset."""

import json
import os

import numpy as np

from lidar_transfer_tpu import cli
from lidar_transfer_tpu.config import TransferConfig
from lidar_transfer_tpu.datasets import kitti


def test_cli_cp_write(tmp_path, synthetic_dataset):
    cfg = TransferConfig(
        adaption="cp", number_of_scans=1, voxel_size=0.25,
        voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    cfg_path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(cfg_path)
    out = str(tmp_path / "out")
    os.makedirs(out)
    metrics_path = str(tmp_path / "metrics.json")

    rc = cli.main([
        "-d", synthetic_dataset, "-c", cfg_path, "-b", "-w",
        "-p", out, "--frames", "2", "--metrics-json", metrics_path,
        "--cpu",
    ])
    assert rc == 0

    out_seq = os.path.join(out, "sequences", "00")
    bins = sorted(os.listdir(os.path.join(out_seq, "velodyne")))
    assert len(bins) == 2
    pts, rem = kitti.read_scan_file(
        os.path.join(out_seq, "velodyne", bins[0]))
    assert pts.shape[0] > 100
    lbl = kitti.read_label_file(
        os.path.join(out_seq, "labels", bins[0].replace(".bin", ".label")))
    assert lbl.shape[0] == pts.shape[0]

    with open(metrics_path) as f:
        metrics = json.load(f)
    assert len(metrics) == 2
    # identity transfer: near-perfect agreement
    assert metrics[0]["iou"] > 0.99
    assert metrics[0]["mse"] < 1e-3
    # configs copied alongside the output (≡ lidar_deform.py:447-452)
    assert os.path.exists(os.path.join(out_seq, "lidar_transfer.yaml"))


def test_cli_mergemesh_one_scan(tmp_path, synthetic_dataset):
    cfg = TransferConfig(
        adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
        voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    cfg_path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(cfg_path)
    metrics_path = str(tmp_path / "m.json")
    rc = cli.main([
        "-d", synthetic_dataset, "-c", cfg_path, "-b", "--one_scan",
        "--metrics-json", metrics_path, "--cpu", "--fixed-bounds",
    ])
    assert rc == 0
    with open(metrics_path) as f:
        metrics = json.load(f)
    assert len(metrics) == 1
    assert metrics[0]["iou"] > 0.5
    assert np.isfinite(metrics[0]["mse"])


def test_cli_stream_matches_per_frame(tmp_path, synthetic_dataset):
    """--stream N must reproduce the per-frame loop's metrics and write
    the same frames."""
    cfg = TransferConfig(
        adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
        voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    cfg_path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(cfg_path)

    outs = {}
    for name, extra in (("single", []), ("stream", ["--stream", "2"])):
        out = str(tmp_path / name)
        os.makedirs(out)
        mpath = str(tmp_path / f"{name}.json")
        rc = cli.main([
            "-d", synthetic_dataset, "-c", cfg_path, "-b", "-w",
            "-p", out, "--frames", "3", "--metrics-json", mpath,
            "--fixed-bounds", "--cpu", *extra,
        ])
        assert rc == 0
        with open(mpath) as f:
            outs[name] = json.load(f)
        bins = sorted(os.listdir(
            os.path.join(out, "sequences", "00", "velodyne")))
        assert len(bins) == 3

    assert [m["index"] for m in outs["single"]] == \
           [m["index"] for m in outs["stream"]]
    for a, b in zip(outs["single"], outs["stream"]):
        # same frame body modulo scan-program fusion rounding
        np.testing.assert_allclose(a["iou"], b["iou"], atol=5e-3)
        np.testing.assert_allclose(a["acc"], b["acc"], atol=5e-3)

"""Dataset converters: NCLT decode round-trip, Ford .mat conversion, CLI."""

import os
import struct

import numpy as np
import pytest

from lidar_transfer_tpu.datasets import convert, kitti


def _pack_nclt(points_xyz, intensities):
    """Encode points the NCLT way (inverse of nclt_decode)."""
    out = bytearray()
    for (x, y, z), i in zip(points_xyz, intensities):
        xs = int(round((x - (-100.0)) / 0.005))
        ys = int(round((y - (-100.0)) / 0.005))
        zs = int(round((-z - (-100.0)) / 0.005))   # stored z is pre-flip
        out += struct.pack("<HHHBB", xs, ys, zs, int(i), 3)
    return bytes(out)


def test_nclt_decode_roundtrip():
    pts = np.array([[1.25, -3.5, 0.75], [0.0, 0.0, 0.0],
                    [50.0, 99.0, -20.0]], np.float64)
    rem = np.array([7, 0, 255], np.float64)
    raw = _pack_nclt(pts, rem)
    dec_pts, dec_rem = convert.nclt_decode(raw)
    np.testing.assert_allclose(dec_pts, pts, atol=0.005 / 2 + 1e-6)
    np.testing.assert_array_equal(dec_rem, rem)


def test_nclt_decode_truncated_record():
    raw = _pack_nclt(np.zeros((2, 3)), np.zeros(2)) + b"\x01\x02\x03"
    pts, rem = convert.nclt_decode(raw)
    assert pts.shape == (2, 3)          # partial trailing record dropped


def test_convert_nclt_tree(tmp_path):
    src = tmp_path / "nclt_src"
    src.mkdir()
    pts = np.array([[5.0, 1.0, -1.5]] * 10, np.float64)
    (src / "0001.bin").write_bytes(_pack_nclt(pts, np.arange(10)))
    (src / "0002.bin").write_bytes(_pack_nclt(pts * 0.5, np.arange(10)))

    out = str(tmp_path / "out")
    n = convert.convert_nclt(str(src), out, "77", verbose=False)
    assert n == 2
    seq = kitti.KittiSequence.open(out, "77", require_labels=False)
    assert len(seq) == 2
    p0, r0 = kitti.read_scan_file(seq.scan_files[0])
    np.testing.assert_allclose(p0, pts, atol=0.01)
    assert seq.poses.shape == (2, 4, 4)


def test_ford_pose_and_frames():
    # pure-yaw pose: heading 90 deg turns x into y
    T = convert.ford_pose([1.0, 2.0, 3.0, 0.0, 0.0, np.pi / 2])
    np.testing.assert_allclose(T[:3, 3], [1, 2, 3])
    np.testing.assert_allclose(T[:3, :3] @ [1, 0, 0], [0, 1, 0], atol=1e-12)


def test_convert_ford_mat(tmp_path):
    scipy_io = pytest.importorskip("scipy.io")
    src = tmp_path / "ford"
    (src / "SCANS").mkdir(parents=True)
    xyz = np.array([[1.0, 0.0, 0.0], [0.0, 2.0, 0.5]]).T   # (3, N)
    for i, heading in enumerate([0.0, 0.1]):
        scan = {"SCAN": {
            "XYZ": xyz,
            "X_wv": np.array([[i * 1.0], [0.0], [0.0],
                              [0.0], [0.0], [heading]]),
        }}
        scipy_io.savemat(str(src / "SCANS" / f"Scan{i:04d}.mat"), scan)

    out = str(tmp_path / "kitti")
    n = convert.convert_ford(str(src), out, "10", verbose=False)
    assert n == 2
    seq = kitti.KittiSequence.open(out, "10", require_labels=False)
    pts, rem = kitti.read_scan_file(seq.scan_files[0])
    # rotZ(-90): (x,y) -> (y, -x)
    np.testing.assert_allclose(pts[0], [0.0, -1.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(pts[1], [2.0, 0.0, 0.5], atol=1e-6)
    assert np.all(rem == 0)
    # poses rebased to first
    np.testing.assert_allclose(seq.poses[0], np.eye(4), atol=1e-12)
    assert abs(seq.poses[1][0, 3] - 1.0) < 1e-9


def test_nuscenes_gated_import():
    with pytest.raises((ImportError, ValueError)):
        convert.convert_nuscenes("/nonexistent", "/tmp/x")


def test_cli_nclt(tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.bin").write_bytes(_pack_nclt(np.ones((3, 3)), np.zeros(3)))
    rc = convert.main(["nclt", str(src), str(tmp_path / "o"),
                       "--scene", "00"])
    assert rc == 0
    assert os.path.exists(tmp_path / "o" / "sequences" / "00" /
                          "velodyne" / "000000.bin")

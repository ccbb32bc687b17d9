"""Dataset IO + synthetic fixture tests."""

import os

import numpy as np

from lidar_transfer_tpu.config import SensorSpec, TransferConfig
from lidar_transfer_tpu.datasets import (KittiSequence, kitti, synthetic)


def test_scan_label_roundtrip(tmp_path):
    pts = np.random.default_rng(0).normal(size=(100, 3)).astype(np.float32)
    rem = np.random.default_rng(1).random(100).astype(np.float32)
    lbl = np.arange(100, dtype=np.int32) % 260
    sp = str(tmp_path / "000000.bin")
    lp = str(tmp_path / "000000.label")
    kitti.write_scan_file(sp, pts, rem)
    kitti.write_label_file(lp, lbl)
    pts2, rem2 = kitti.read_scan_file(sp)
    lbl2 = kitti.read_label_file(lp, 100)
    np.testing.assert_array_equal(pts, pts2)
    np.testing.assert_array_equal(rem, rem2)
    np.testing.assert_array_equal(lbl, lbl2)


def test_label_upper_half_word_stripped(tmp_path):
    """Instance ids in the upper 16 bits must be dropped (laserscan.py:588)."""
    lp = str(tmp_path / "x.label")
    raw = np.array([10 | (7 << 16), 40, 252 | (1 << 16)], np.uint32)
    raw.tofile(lp)
    lbl = kitti.read_label_file(lp)
    np.testing.assert_array_equal(lbl, [10, 40, 252])


def test_poses_roundtrip(tmp_path):
    calib_path = str(tmp_path / "calib.txt")
    with open(calib_path, "w") as f:
        # a non-trivial Tr to exercise the Tr^-1 P Tr conjugation
        f.write("P0: 1 0 0 0 0 1 0 0 0 0 1 0\n")
        f.write("Tr: 0 -1 0 0.5 1 0 0 -0.2 0 0 1 0.1\n")
    calib = kitti.parse_calibration(calib_path)
    poses = synthetic.straight_line_poses(4)
    pp = str(tmp_path / "poses.txt")
    kitti.write_poses(pp, poses, calib)
    poses2 = kitti.parse_poses(pp, calib)
    np.testing.assert_allclose(poses2, poses, atol=1e-5)


def test_synthetic_dataset_tree(synthetic_dataset, small_spec):
    seq = KittiSequence.open(synthetic_dataset, "00")
    assert len(seq) == 5
    pts, rem, lbl = seq.read(0)
    assert pts.shape[0] == rem.shape[0] == lbl.shape[0]
    assert pts.shape[0] > 1000
    assert set(np.unique(lbl)) <= {0, 10, 40, 50, 71}
    spec = SensorSpec.from_yaml(os.path.join(synthetic_dataset, "config.yaml"))
    assert spec.beams == small_spec.beams
    assert spec.W == small_spec.W


def test_transfer_config_yaml_roundtrip(tmp_path):
    cfg = TransferConfig(adaption="cp", number_of_scans=3, voxel_size=0.1)
    path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(path)
    cfg2 = TransferConfig.from_yaml(path)
    assert cfg2.adaption == "cp"
    assert cfg2.number_of_scans == 3
    assert cfg2.voxel_size == 0.1
    assert cfg2.nclasses == 34
    np.testing.assert_allclose(cfg2.voxel_bounds_array,
                               cfg.voxel_bounds_array)


def test_reference_yaml_schema_compat():
    """Our loader accepts the reference's tool-config schema verbatim."""
    ref = "/root/reference/config/lidar_transfer.yaml"
    if not os.path.exists(ref):
        return
    cfg = TransferConfig.from_yaml(ref)
    assert cfg.adaption == "mergemesh"
    assert cfg.number_of_scans == 1
    assert cfg.voxel_size == 0.05
    assert cfg.ignore_classes == (0, 1)
    assert cfg.moving_classes == tuple(range(252, 260))
    assert cfg.nclasses == 34


def test_pad_points_capacity():
    pts = np.ones((10, 3), np.float32)
    p, r, l, m = kitti.pad_points(pts, np.ones(10, np.float32),
                                  np.ones(10, np.int32), 16)
    assert p.shape == (16, 3)
    assert m.sum() == 10
    assert (p[10:] == 0).all()


def test_prefetcher_order_and_errors():
    from lidar_transfer_tpu.utils.prefetch import Prefetcher

    out = list(Prefetcher(lambda i: i * i, [3, 1, 4, 1, 5], depth=2))
    assert out == [(3, 9), (1, 1), (4, 16), (1, 1), (5, 25)]

    def boom(i):
        if i == 2:
            raise IOError("nope")
        return i

    it = Prefetcher(boom, [0, 1, 2, 3], depth=1)
    assert next(it) == (0, 0)
    assert next(it) == (1, 1)
    import pytest
    with pytest.raises(RuntimeError, match="index 2"):
        next(it)

    # close() mid-stream doesn't hang the worker
    it2 = Prefetcher(lambda i: i, range(1000), depth=2)
    assert next(it2)[0] == 0
    it2.close()

    # StopIteration REPEATS after exhaustion (iterator protocol) — a
    # further next() must not block on the empty queue forever
    it3 = Prefetcher(lambda i: i, [0, 1], depth=2)
    assert list(it3) == [(0, 0), (1, 1)]
    assert next(it3, None) is None
    assert next(it3, None) is None


def test_ply_ascii_edge_rows(tmp_path):
    """Single-row and empty vertex/face blocks round-trip in BOTH ply
    encodings (np.loadtxt squeezes them to 1-D without ndmin=2)."""
    import numpy as np

    from lidar_transfer_tpu.utils.plyio import read_ply, write_ply

    for binary in (False, True):
        for nv, nf in ((0, 0), (1, 0), (3, 1), (4, 2)):
            p = str(tmp_path / f"{binary}_{nv}_{nf}.ply")
            v = np.arange(nv * 3, dtype=np.float32).reshape(nv, 3)
            f = (np.arange(nf * 3) % max(nv, 1)).reshape(nf, 3).astype(
                np.int32)
            write_ply(p, v, f, binary=binary)
            rv, rf = read_ply(p)[:2]
            assert rv.shape == (nv, 3) and rf.shape == (nf, 3)


def test_prefetcher_next_after_close_stops():
    """__next__ after close() ends the iteration instead of blocking
    forever on the drained queue."""
    import pytest

    from lidar_transfer_tpu.utils.prefetch import Prefetcher

    pf = Prefetcher(lambda i: i * 2, range(100), depth=2)
    next(pf)
    pf.close()
    with pytest.raises(StopIteration):
        next(pf)


def test_lane_pick_matches_gather_semantics():
    """lane_pick is a drop-in for vol[idx] incl. negative wrap and OOB
    clamp, keeping the volume dtype, on BOTH the lane and fallback
    paths."""
    import numpy as np
    import jax.numpy as jnp

    from lidar_transfer_tpu.ops.gather import lane_pick

    for n in (256, 255):               # lane path / fallback path
        for dt in (np.int32, np.float32, np.int8, bool):
            base = np.arange(n) % 2 if dt is bool else np.arange(n)
            vol = jnp.asarray(base, dt)
            idx = jnp.asarray([-1, -5, 0, n - 1, n + 50, -(n + 50)])
            got = np.asarray(lane_pick(vol, idx))
            want = np.asarray(vol[idx])
            assert got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)


def test_oracle_solid_interiors():
    """Rays starting inside a Box hit its exit face; clipped cylinders
    are opaque via the far quadratic root (open-cap entry)."""
    import numpy as np

    from lidar_transfer_tpu.datasets import synthetic

    box = synthetic.Box(center=(0.0, 0.0, 1.0), size=(2.0, 2.0, 2.0),
                        label=10)
    o = np.asarray([[0.0, 0.0, 1.0]])          # inside the box
    d = np.asarray([[1.0, 0.0, 0.0]])
    t = synthetic._ray_box(o, d, box)
    np.testing.assert_allclose(t, [1.0], atol=1e-6)  # exit face at x=1

    cyl = synthetic.Cylinder(center=(5.0, 0.0), radius=1.0,
                             z_range=(0.0, 2.0), label=18)
    # steep ray entering through the open top region: near root above
    # z_max, far root inside the clipped wall
    o2 = np.asarray([[5.0, -2.0, 4.0]])
    d2 = np.asarray([[0.0, 1.0, -1.0]])
    d2 = d2 / np.linalg.norm(d2)
    t2 = synthetic._ray_cylinder(o2, d2, cyl)
    assert np.isfinite(t2[0])
    z_hit = o2[0, 2] + t2[0] * d2[0, 2]
    assert 0.0 <= z_hit <= 2.0

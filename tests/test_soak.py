"""Opt-in randomized soak suites (LT_SOAK=1 python -m pytest tests/test_soak.py).

Extended random-geometry sweeps beyond CI's fixed seeds — the harnesses
that closed round 3 (they found the on-pixel-boundary tolerance gap in
the three-way integrate fuzz; everything below has since run clean:
240 differential cases, 16 random engine-geometry parity trials, 60
KNN/surface oracle cases). Skipped by default: the full set costs
~10 min on this 1-core VM, vs the 5-minute main suite.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

SOAK = bool(os.environ.get("LT_SOAK"))
pytestmark = pytest.mark.skipif(not SOAK, reason="set LT_SOAK=1 to run")


@pytest.mark.parametrize("seed", range(300, 320))
def test_differential_soak(seed):
    import test_differential as D

    D.test_integrate_three_way(seed)
    D.test_projection_sort_vs_segment_fuzz(seed)
    D.test_confusion_three_way_fuzz(seed)
    D.test_winner_flags_vs_image_zbuffer(seed)


@pytest.mark.parametrize("seed", range(400, 408))
def test_engine_parity_random_geometry(seed):
    """classic transfer() (oracle path) vs transfer_fast vs
    transfer_stream across random sensors/adaptions/nscans."""
    from lidar_transfer_tpu.config import SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets import synthetic
    from lidar_transfer_tpu.datasets.kitti import pad_points
    from lidar_transfer_tpu.pipeline import TransferEngine
    from lidar_transfer_tpu.pipeline.multiscan import (ScanWindow,
                                                       stack_windows)

    rng = np.random.default_rng(seed)
    src = SensorSpec(name="s", beams=int(rng.integers(8, 33)),
                     fov_up=float(rng.uniform(2, 12)),
                     fov_down=float(rng.uniform(-30, -10)),
                     angle_res_hor=360.0 / int(rng.choice([128, 256])))
    tgt = SensorSpec(name="t", beams=int(rng.integers(6, 33)),
                     fov_up=float(rng.uniform(2, 12)),
                     fov_down=float(rng.uniform(-30, -10)),
                     angle_res_hor=360.0 / int(rng.choice([128, 256])))
    nscans = int(rng.integers(1, 4))
    b = float(rng.uniform(10, 20))
    cfg = TransferConfig(
        adaption=str(rng.choice(["mergemesh", "mesh", "cp"])),
        number_of_scans=nscans, voxel_size=float(rng.choice([0.25, 0.2])),
        voxel_bounds=((-b, b), (-b, b), (-4.0, 4.0)))
    cap = 16384
    scene = synthetic.Scene.default()
    poses = synthetic.straight_line_poses(nscans, step=0.8)
    inv0 = np.linalg.inv(poses[0])
    arrs = [pad_points(*synthetic.simulate_scan(scene, src, poses[i]),
                       cap) + ((inv0 @ poses[i]).astype(np.float32),)
            for i in range(nscans)]
    window = ScanWindow(
        points=jnp.asarray(np.stack([a[0] for a in arrs])),
        remissions=jnp.asarray(np.stack([a[1] for a in arrs])),
        labels=jnp.asarray(np.stack([a[2] for a in arrs])),
        valid=jnp.asarray(np.stack([a[3] for a in arrs])),
        rel_pose=jnp.asarray(np.stack([a[4] for a in arrs])))
    eng_c = TransferEngine(src, tgt, cfg, cap, fixed_bounds=True)
    eng_f = TransferEngine(src, tgt, cfg, cap, fixed_bounds=True)
    vs_c, _ = eng_c.transfer(window)
    vs_f = eng_f.transfer_fast(window)
    sv = eng_f.transfer_stream(stack_windows([window, window]))

    mc, mf = np.asarray(vs_c.mask), np.asarray(vs_f.mask)
    assert (mc == mf).mean() > 0.97
    both = mc & mf
    # the classic path's candidates are float ROUND-TRIPS of the fast
    # path's original points (reverse_project(preserve_float)), so at
    # pixel-boundary/exact-tie cases the two select different (equally
    # valid) winners — a handful of both-hit pixels may differ in range
    # (and, for cp's re-rounded FMAs, label). Bulk agreement is the
    # contract (test_fast_path asserts exactness on the tie-free
    # fixture).
    lbl_agree = (np.asarray(vs_c.label)[both]
                 == np.asarray(vs_f.label)[both]).mean()
    rng_close = np.isclose(np.asarray(vs_c.range)[both],
                           np.asarray(vs_f.range)[both],
                           atol=1e-3).mean()
    assert lbl_agree > 0.99, lbl_agree
    assert rng_close > 0.99, rng_close
    np.testing.assert_array_equal(np.asarray(sv.mask[0]), mf)
    np.testing.assert_allclose(np.asarray(sv.range[0]),
                               np.asarray(vs_f.range), atol=1e-5)


@pytest.mark.parametrize("seed", range(500, 515))
def test_knn_and_surface_oracle_soak(seed):
    import test_postproc as TPP
    import test_surface as TSF
    from lidar_transfer_tpu.models.postproc import (knn_cleanup,
                                                    knn_cleanup_oracle)
    from lidar_transfer_tpu.ops.marching import (marching_tetrahedra,
                                                 marching_tetrahedra_cells)
    from lidar_transfer_tpu.ops.surface import extract_surface_cells

    rng = np.random.default_rng(seed)
    k = int(rng.integers(1, 9))
    ksize = int(rng.choice([3, 5, 7]))
    pr_, pred, mask, pr2, pu, pv, valid, C = TPP._scene(seed)
    got = np.asarray(knn_cleanup(pr_, pred, mask, pr2, pu, pv, valid,
                                 num_classes=C, k=k, ksize=ksize))
    want = knn_cleanup_oracle(pr_, pred, mask, pr2, pu, pv, valid,
                              num_classes=C, k=k, ksize=ksize)
    assert (got == want).all()

    rng2 = np.random.default_rng(seed + 9999)
    dims = tuple(int(rng2.integers(6, 20)) for _ in range(3))
    tsdf = rng2.uniform(-1, 1, dims).astype(np.float32)
    tsdf[rng2.random(dims) > 0.4] = 1.0
    cells = extract_surface_cells(jnp.asarray(tsdf),
                                  x_chunk=int(rng2.integers(3, 9)))
    tri_ref = marching_tetrahedra(tsdf, 0.0)
    tri_cells = marching_tetrahedra_cells(cells.idx, cells.vals, 0.0)
    assert tri_ref.shape == tri_cells.shape
    assert np.array_equal(TSF._tri_keys(tri_ref),
                          TSF._tri_keys(tri_cells))

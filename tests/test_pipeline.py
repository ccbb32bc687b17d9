"""End-to-end pipeline tests on the synthetic dataset.

Gate 3+6 of SURVEY.md §7: cp transfer identity fidelity (mIoU/MSE) and
mergemesh 16->8-beam virtual scans validated against the analytic scene.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_transfer_tpu.config import SensorSpec, TransferConfig
from lidar_transfer_tpu.datasets import KittiSequence, kitti, synthetic
from lidar_transfer_tpu.metrics import compare_scans
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.pipeline import TransferEngine, load_window
from lidar_transfer_tpu.pipeline.multiscan import (merge_window,
                                                   window_indices)
from lidar_transfer_tpu.pipeline.writer import (filter_virtual_scan,
                                                write_virtual_scan)

CAP = 8192  # one synthetic scan has ~4k points


def make_cfg(**kw):
    base = dict(adaption="cp", number_of_scans=1, preserve_float=True,
                voxel_size=0.25,
                voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    base.update(kw)
    return TransferConfig(**base)


def source_range_image(seq, spec, cfg, idx):
    """Single source scan projection (the reference's comparison scan,
    lidar_deform.py:403-409)."""
    pts, rem, lbl = seq.read(idx)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, CAP)
    m = P.mask_classes(jnp.asarray(l), jnp.asarray(m), cfg.ignore_classes)
    return P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                           m, H=spec.H, W=spec.W, fov_up_deg=spec.fov_up,
                           fov_down_deg=spec.fov_down)


def test_window_indices():
    assert window_indices(1, 5) == [5]
    assert window_indices(3, 5) == [5, 4, 6]
    assert window_indices(4, 5) == [5, 3, 4, 6]


def test_load_window_is_jit_stable_across_frames(synthetic_dataset):
    """Windows from different frames must hit the SAME jit trace:
    regression for primary_index carrying the per-frame sequence index
    as static pytree metadata, which retraced + relowered every engine
    program once per frame on the CLI path."""
    import jax

    cfg = make_cfg(adaption="cp", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)

    calls = []

    @jax.jit
    def probe(w):
        calls.append(1)          # runs only when tracing
        return w.points.sum()

    for idx in (1, 2, 3):
        probe(load_window(seq, cfg, idx, CAP))
    assert len(calls) == 1, (
        f"{len(calls)} traces for 3 frames — ScanWindow static metadata "
        "varies per frame again")


def test_load_window_rejects_out_of_range_window(synthetic_dataset):
    """A window that does not fit must raise, not wrap to seq end via
    Python negative indexing (silently wrong poses)."""
    import pytest

    cfg = make_cfg(adaption="cp", number_of_scans=3)
    seq = KittiSequence.open(synthetic_dataset)
    with pytest.raises(IndexError):
        load_window(seq, cfg, 0, CAP)           # needs one previous scan
    with pytest.raises(IndexError):
        load_window(seq, cfg, len(seq) - 1, CAP)  # needs one future scan


def test_cp_identity_transfer(synthetic_dataset, small_spec):
    """cp with identical source/target must reproduce the source projection
    almost exactly (gate 3)."""
    cfg = make_cfg(adaption="cp", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)

    idx = 2
    window = load_window(seq, cfg, idx, CAP)
    vs, ri = eng.transfer(window)
    src = source_range_image(seq, small_spec, cfg, idx)

    res = compare_scans(src.label, src.mask, src.range,
                        jnp.maximum(src.remission, 0.0),
                        vs.label, vs.range, vs.remission)
    assert float(res.mean_iou) > 0.99
    assert float(res.mean_acc) > 0.99
    assert float(res.mse) < 1e-4


def test_cp_multi_scan(synthetic_dataset, small_spec):
    """3-scan cp: still high fidelity vs the primary scan (extra scans only
    densify; the primary's points win their own pixels at equal depth...
    they arrive first in the window)."""
    cfg = make_cfg(adaption="cp", number_of_scans=3)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    idx = 2
    window = load_window(seq, cfg, idx, CAP)
    assert window.nscans == 3
    vs, _ = eng.transfer(window)
    src = source_range_image(seq, small_spec, cfg, idx)
    res = compare_scans(src.label, src.mask, src.range,
                        jnp.maximum(src.remission, 0.0),
                        vs.label, vs.range, vs.remission)
    # multi-scan aggregation fills occlusions and parallax reveals closer
    # surfaces, so range MSE vs the single primary scan legitimately grows;
    # label agreement stays high
    assert float(res.mean_iou) > 0.8
    assert float(res.mse) < 25.0


def test_mergemesh_identity(synthetic_dataset, small_spec, scene):
    """mergemesh 16->16: virtual scan ranges close to source ranges."""
    cfg = make_cfg(adaption="mergemesh", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    idx = 2
    window = load_window(seq, cfg, idx, CAP)
    vs, ri = eng.transfer(window)
    src = source_range_image(seq, small_spec, cfg, idx)

    both = np.asarray(vs.mask) & np.asarray(src.mask) \
        & (np.asarray(src.range) < 14.0)
    assert both.sum() > 0.4 * np.asarray(src.mask).sum()
    err = np.abs(np.asarray(vs.range)[both] - np.asarray(src.range)[both])
    assert np.median(err) < 3 * cfg.voxel_size
    agree = (np.asarray(vs.label)[both] ==
             np.asarray(src.label)[both]).mean()
    assert agree > 0.85


def test_mergemesh_downbeam(synthetic_dataset, small_spec, scene):
    """16 -> 8 beams (the 64->32 analog): validate against analytic scene."""
    target = SensorSpec(name="t8", beams=8, fov_up=5.0, fov_down=-20.0,
                        angle_res_hor=360.0 / 128.0)
    cfg = make_cfg(adaption="mergemesh", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, target, cfg, CAP)
    idx = 2
    window = load_window(seq, cfg, idx, CAP)
    vs, _ = eng.transfer(window)

    rays = np.asarray(eng.rays, np.float64)
    pose = seq.poses[idx]
    dirs_w = rays @ pose[:3, :3].T
    origins = np.broadcast_to(pose[:3, 3], dirs_w.shape)
    t_true, lbl_true = synthetic.raycast_scene(scene, origins, dirs_w)
    t_true = t_true.reshape(target.H, target.W)
    lbl_true = lbl_true.reshape(target.H, target.W)

    inside = np.isfinite(t_true) & (t_true < 12.0)
    both = np.asarray(vs.mask) & inside
    assert both.sum() > 0.5 * inside.sum()
    err = np.abs(np.asarray(vs.range)[both] - t_true[both])
    assert np.median(err) < 3 * cfg.voxel_size
    agree = (np.asarray(vs.label)[both] == lbl_true[both]).mean()
    assert agree > 0.85


@pytest.mark.parametrize("engine", ["splat", "oracle"])
def test_catmesh_identity(synthetic_dataset, small_spec, scene, engine):
    """catmesh 16->16 (the strategy the reference stubs, laserscan.py:1014)
    on BOTH engines — the production splat body (device, default) and the
    per-category-mesh host oracle. Ranges must track the source like
    mergemesh does, labels must be pure category ids, and the adaption
    must be reachable through transfer()."""
    cfg = make_cfg(adaption="catmesh", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         catmesh_engine=engine)
    idx = 2
    window = load_window(seq, cfg, idx, CAP)
    vs, ri = eng.transfer(window)
    assert vs.adaption == "catmesh"
    src = source_range_image(seq, small_spec, cfg, idx)

    vs_mask = np.asarray(vs.mask)
    both = vs_mask & np.asarray(src.mask) & (np.asarray(src.range) < 14.0)
    assert both.sum() > 0.4 * np.asarray(src.mask).sum()
    err = np.abs(np.asarray(vs.range)[both] - np.asarray(src.range)[both])
    assert np.median(err) < 3 * cfg.voxel_size
    agree = (np.asarray(vs.label)[both] ==
             np.asarray(src.label)[both]).mean()
    assert agree > 0.8
    # label purity: every hit carries a category that exists in the input
    in_labels = set(np.unique(np.asarray(window.labels)))
    out_labels = set(np.unique(np.asarray(vs.label)[vs_mask]))
    assert out_labels <= in_labels | {0}


def test_mesh_adaption_runs(synthetic_dataset, small_spec):
    cfg = make_cfg(adaption="mesh", number_of_scans=2, voxel_size=0.25)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    window = load_window(seq, cfg, 2, CAP)
    vs, _ = eng.transfer(window)
    assert bool(np.asarray(vs.mask).any())


def test_mesh_staged_matches_whole_frame(synthetic_dataset, small_spec):
    """The staged mesh dispatch (fixed_bounds=True: projection jit ->
    eager two-stage integrates -> synthesis jit) must reproduce the
    single-program _mesh_core bit for bit — it is the path
    `bench --adaption mesh` runs."""
    import jax

    cfg = make_cfg(adaption="mesh", number_of_scans=2, voxel_size=0.25)
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)

    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         fixed_bounds=True)
    vs_staged, ri_staged = eng.mesh(window)

    eng2 = TransferEngine(small_spec, small_spec, cfg, CAP,
                          fixed_bounds=True)
    geom = eng2._ensure_geom(small_spec.fov_up, small_spec.fov_down,
                             small_spec.H)
    out = jax.jit(eng2._mesh_core, donate_argnums=(1,))(
        window, eng2._take_state(), geom)
    rng_w, lbl_w, rem_w, ends_w, mask_w, ris_w = out[:6]
    ri0_w = ris_w[0]

    np.testing.assert_array_equal(np.asarray(vs_staged.mask),
                                  np.asarray(mask_w))
    np.testing.assert_array_equal(np.asarray(vs_staged.label),
                                  np.asarray(lbl_w))
    np.testing.assert_allclose(np.asarray(vs_staged.range),
                               np.asarray(rng_w), atol=1e-5)
    np.testing.assert_allclose(np.asarray(vs_staged.remission),
                               np.asarray(rem_w), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ri_staged.index),
                                  np.asarray(ri0_w.index))


def test_catmesh_jax_fallback_branch(synthetic_dataset, small_spec,
                                     monkeypatch):
    """catmesh's dense Möller–Trumbore fallback (used when the native lib
    is unavailable) must produce a usable virtual scan on its own.

    The native BVH and the dense sweep legitimately differ at a handful
    of category-SEAM pixels (coincident triangles from two categories tie
    at machine epsilon; measured ~0.7% of hit pixels on this fixture), so
    this asserts quality, not bit-equality with the native engine."""
    from lidar_transfer_tpu import native

    monkeypatch.setattr(native, "available", lambda: False)
    cfg = make_cfg(adaption="catmesh", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         catmesh_engine="oracle")
    idx = 2
    window = load_window(seq, cfg, idx, CAP)
    vs, _ = eng.transfer(window)
    src = source_range_image(seq, small_spec, cfg, idx)

    both = np.asarray(vs.mask) & np.asarray(src.mask) \
        & (np.asarray(src.range) < 14.0)
    assert both.sum() > 0.4 * np.asarray(src.mask).sum()
    err = np.abs(np.asarray(vs.range)[both] - np.asarray(src.range)[both])
    assert np.median(err) < 3 * cfg.voxel_size
    agree = (np.asarray(vs.label)[both] ==
             np.asarray(src.label)[both]).mean()
    assert agree > 0.8


def test_writer_roundtrip(tmp_path, synthetic_dataset, small_spec):
    cfg = make_cfg(adaption="cp")
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    window = load_window(seq, cfg, 2, CAP)
    vs, _ = eng.transfer(window)

    out = str(tmp_path)
    import os
    os.makedirs(os.path.join(out, "velodyne"))
    os.makedirs(os.path.join(out, "labels"))
    n = write_virtual_scan(out, 2, vs)
    assert n > 100
    pts, rem = kitti.read_scan_file(os.path.join(out, "velodyne",
                                                 "000002.bin"))
    lbl = kitti.read_label_file(os.path.join(out, "labels", "000002.label"),
                                pts.shape[0])
    assert pts.shape[0] == n
    assert (np.abs(pts).sum(axis=1) > 0).all()
    assert set(np.unique(lbl)) <= {0, 10, 40, 50, 71}


def test_unknown_adaption_raises(synthetic_dataset, small_spec):
    # an unknown adaption name is a ValueError (all four named strategies
    # — cp/mesh/mergemesh/catmesh — are implemented)
    cfg = make_cfg(adaption="warpfield")
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    window = load_window(seq, cfg, 2, CAP)
    with pytest.raises(ValueError):
        eng.transfer(window)


def test_beam_angles_target(synthetic_dataset, small_spec):
    """Target spec with explicit (non-equidistant) beam_angles: the full
    mergemesh pipeline must produce rows at exactly those pitches."""
    import numpy as np

    angles_deg = [-20.0, -14.0, -9.0, -5.0, -2.0, 0.0, 2.0, 6.0]
    target = SensorSpec(name="custom8", beams=8, fov_up=8.0,
                        fov_down=-22.0, angle_res_hor=360.0 / 128.0,
                        beam_angles=tuple(np.deg2rad(angles_deg)))
    cfg = make_cfg(adaption="mergemesh", number_of_scans=1)
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, target, cfg, CAP)
    window = load_window(seq, cfg, 2, CAP)
    vs, _ = eng.transfer(window)
    assert vs.range.shape == (8, 128)
    mask = np.asarray(vs.mask)
    # upward beams see sky and the -5/-2 deg ground rings fall outside the
    # +-16 m volume; the downward beams must land
    assert mask.mean() > 0.15
    assert mask[-1].mean() > 0.9          # steepest beam: solid ground

    # hit points' pitches must cluster on the requested beam angles
    pts = np.asarray(vs.points)[mask]
    pitch = np.arcsin(pts[:, 2] / np.maximum(
        np.linalg.norm(pts, axis=1), 1e-9))
    nearest = np.min(np.abs(pitch[:, None]
                            - np.deg2rad(angles_deg)[None, :]), axis=1)
    assert np.median(nearest) < np.deg2rad(1.0)


def test_load_window_scan_cache_shares_reads(synthetic_dataset,
                                             monkeypatch):
    """Sliding windows must read each scan file once, not nscans times
    (the per-sequence padded-tensor LRU)."""
    from lidar_transfer_tpu.pipeline import multiscan

    cfg = make_cfg(adaption="cp", number_of_scans=3)
    seq = KittiSequence.open(synthetic_dataset)
    reads = []
    real_read = seq.read

    def counting_read(i):
        reads.append(i)
        return real_read(i)

    monkeypatch.setattr(seq, "read", counting_read)
    w1 = load_window(seq, cfg, 1, CAP)   # scans {1, 0, 2}
    w2 = load_window(seq, cfg, 2, CAP)   # scans {2, 1, 3} — 2 cached
    assert sorted(reads) == [0, 1, 2, 3], reads
    # shared scan bit-identical across the two windows
    np.testing.assert_array_equal(np.asarray(w1.points[2]),
                                  np.asarray(w2.points[0]))

"""Splat synthesis: parity vs raymarcher / native mesh oracle / attrs modes."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.config import SensorSpec, TransferConfig
from lidar_transfer_tpu.datasets import synthetic
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.pipeline import TransferEngine, load_window

CAP = 8192


def make_cfg(**kw):
    base = dict(adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
                voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    base.update(kw)
    return TransferConfig(**base)


def test_splat_beats_or_matches_raymarch(synthetic_dataset, small_spec):
    """Same fused volume, two engines: splat must cover at least as many
    near pixels and agree on ranges where both hit."""
    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)

    eng_s = TransferEngine(small_spec, small_spec, cfg, CAP,
                           synthesis="splat")
    vs_s, ri = eng_s.transfer(window)
    eng_r = TransferEngine(small_spec, small_spec, cfg, CAP,
                           synthesis="raymarch")
    vs_r, _ = eng_r.transfer(window)

    src = np.asarray(ri.range)
    near = np.asarray(ri.mask) & (src < 14.0) & (src > 0)
    cov_s = (np.asarray(vs_s.mask) & near).sum()
    cov_r = (np.asarray(vs_r.mask) & near).sum()
    assert cov_s >= cov_r

    both = np.asarray(vs_s.mask) & np.asarray(vs_r.mask) & near
    d = np.abs(np.asarray(vs_s.range) - np.asarray(vs_r.range))[both]
    assert np.median(d) < 2 * cfg.voxel_size
    # identity transfer: splat range error vs the source is tiny
    err = np.abs(np.asarray(vs_s.range) - src)[np.asarray(vs_s.mask) & near]
    assert np.median(err) < 0.5 * cfg.voxel_size


def test_splat_image_vs_volume_attrs(synthetic_dataset, small_spec):
    """Single fused image: image-derived attributes must closely match the
    volume-gathered ones (they describe the same written band)."""
    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.ops.splat import splat_synthesize
    from lidar_transfer_tpu.pipeline.multiscan import merge_window

    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    pts, rem, lbl, valid = merge_window(window)
    ri = P.range_project(pts, rem, lbl, valid, H=small_spec.H,
                         W=small_spec.W, fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    origin, active = eng._frame_volume(pts, valid)
    state = eng._integrate(eng._take_state(), ri, small_spec.fov_up,
                           small_spec.fov_down, origin, active, reset=True)
    back = P.reverse_project(ri, fov_up_deg=small_spec.fov_up,
                             fov_down_deg=small_spec.fov_down,
                             preserve_float=True)
    srcs = [(ri.range.reshape(-1), back, ri.mask.reshape(-1),
             ri.label.reshape(-1),
             jnp.maximum(ri.remission, 0.0).reshape(-1))]
    kw = dict(target_H=small_spec.H, target_W=small_spec.W,
              fov_up_deg=small_spec.fov_up,
              fov_down_deg=small_spec.fov_down,
              vol_origin=origin, active_dims=active)
    ri_img = splat_synthesize(state, eng.vol_spec, srcs, attrs="image",
                              **kw)
    ri_vol = splat_synthesize(state, eng.vol_spec, srcs, attrs="volume",
                              **kw)
    m_img, m_vol = np.asarray(ri_img[4]), np.asarray(ri_vol[4])
    both = m_img & m_vol
    assert both.sum() > 0.8 * max(m_vol.sum(), 1)
    lbl_agree = (np.asarray(ri_img[1]) == np.asarray(ri_vol[1]))[both]
    assert lbl_agree.mean() > 0.97
    rng_diff = np.abs(np.asarray(ri_img[0]) - np.asarray(ri_vol[0]))[both]
    assert np.median(rng_diff) < cfg.voxel_size


@pytest.mark.skipif(
    not __import__("lidar_transfer_tpu.native", fromlist=["available"]
                   ).available(),
    reason="native toolchain unavailable")
def test_splat_vs_native_mesh_oracle(synthetic_dataset, small_spec, scene):
    """Splat ranges vs the native BVH tracing of the marching-tetrahedra
    mesh of the SAME volume: the two surface definitions agree to within
    a voxel on well-observed pixels."""
    from lidar_transfer_tpu import native
    from lidar_transfer_tpu.ops import raycast as RC
    from lidar_transfer_tpu.ops.marching import marching_tetrahedra

    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         synthesis="splat", fixed_bounds=True)
    vs, ri = eng.transfer(window)

    state = eng.fused_state()      # materializes (transfer deferred it)
    tsdf = np.asarray(state.tsdf, np.float32)
    tris_grid = marching_tetrahedra(tsdf, 0.0)
    tris_world = (tris_grid * cfg.voxel_size
                  + np.asarray(eng.vol_spec.origin, np.float32))
    verts = tris_world.reshape(-1, 3)
    faces = np.arange(verts.shape[0], dtype=np.int32).reshape(-1, 3)
    lab = np.ones(verts.shape[0], np.int32)
    remv = np.zeros(verts.shape[0], np.float32)

    rays = RC.generate_rays(small_spec.H, small_spec.W,
                            small_spec.fov_up, small_spec.fov_down)
    nat = native.trace_mesh(rays, np.zeros(3), verts, faces, lab, remv)
    nat_rng = nat.range.reshape(small_spec.H, small_spec.W)

    both = np.asarray(vs.mask) & (nat_rng > 0) & (nat_rng < 14.0)
    assert both.sum() > 500
    d = np.abs(np.asarray(vs.range) - nat_rng)[both]
    assert np.median(d) < 2 * cfg.voxel_size


def test_deferred_volume_identical_output(synthetic_dataset, small_spec):
    """defer_volume must not change the transfer output AT ALL: the splat
    image path provably never reads the volume, so skipping the integrate
    write is output-invariant (bit-exact)."""
    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)

    eng_d = TransferEngine(small_spec, small_spec, cfg, CAP,
                           synthesis="splat", defer_volume=True)
    eng_e = TransferEngine(small_spec, small_spec, cfg, CAP,
                           synthesis="splat", defer_volume=False)
    vs_d, ri_d = eng_d.transfer(window)
    vs_e, ri_e = eng_e.transfer(window)

    np.testing.assert_array_equal(np.asarray(vs_d.mask),
                                  np.asarray(vs_e.mask))
    np.testing.assert_array_equal(np.asarray(vs_d.label),
                                  np.asarray(vs_e.label))
    np.testing.assert_array_equal(np.asarray(vs_d.range),
                                  np.asarray(vs_e.range))
    np.testing.assert_array_equal(np.asarray(vs_d.remission),
                                  np.asarray(vs_e.remission))
    np.testing.assert_array_equal(np.asarray(ri_d.range),
                                  np.asarray(ri_e.range))
    # the deferred engine never materialized the volume
    assert getattr(eng_d, "_fused", False) is False
    assert eng_e._fused is True


def test_fused_state_materializes_lazily(synthetic_dataset, small_spec):
    """fused_state() after a deferred transfer equals the eager engine's
    volume on tsdf/label/rem (weight is documented-unspecified)."""
    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)

    eng_d = TransferEngine(small_spec, small_spec, cfg, CAP,
                           synthesis="splat", defer_volume=True)
    eng_e = TransferEngine(small_spec, small_spec, cfg, CAP,
                           synthesis="splat", defer_volume=False)
    eng_d.transfer(window)
    eng_e.transfer(window)

    lazy = eng_d.fused_state()
    eager = eng_e.fused_state()
    np.testing.assert_array_equal(np.asarray(lazy.label),
                                  np.asarray(eager.label))
    np.testing.assert_allclose(np.asarray(lazy.tsdf, np.float32),
                               np.asarray(eager.tsdf, np.float32),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(lazy.rem, np.float32),
                               np.asarray(eager.rem, np.float32),
                               atol=1e-4)
    # second call returns the cached state, no re-integrate
    assert eng_d.fused_state() is lazy


def test_fused_state_without_transfer_raises(small_spec):
    cfg = make_cfg()
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    with pytest.raises(RuntimeError, match="no fused volume"):
        eng.fused_state()


def test_band_label_probe_semantics(synthetic_dataset, small_spec):
    """label_probe=False (raymarcher label-0 semantics): identical to
    label_probe=True when every source pixel is labeled; with injected
    label-0 pixels their surfaces still occlude and report label 0
    (probe=True instead drops them from the band entirely)."""
    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.ops.splat import splat_synthesize
    from lidar_transfer_tpu.pipeline.multiscan import merge_window

    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    pts, rem, lbl, valid = merge_window(window)
    ri = P.range_project(pts, rem, lbl, valid, H=small_spec.H,
                         W=small_spec.W, fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    origin, active = eng._frame_volume(pts, valid)
    state = eng._integrate(eng._take_state(), ri, small_spec.fov_up,
                           small_spec.fov_down, origin, active, reset=True)
    back = P.reverse_project(ri, fov_up_deg=small_spec.fov_up,
                             fov_down_deg=small_spec.fov_down,
                             preserve_float=True)
    srcs = [(ri.range.reshape(-1), back, ri.mask.reshape(-1),
             ri.label.reshape(-1),
             jnp.maximum(ri.remission, 0.0).reshape(-1))]
    kw = dict(target_H=small_spec.H, target_W=small_spec.W,
              fov_up_deg=small_spec.fov_up,
              fov_down_deg=small_spec.fov_down,
              vol_origin=origin, active_dims=active, attrs="volume")
    a = splat_synthesize(state, eng.vol_spec, srcs, label_probe=True,
                         **kw)
    b = splat_synthesize(state, eng.vol_spec, srcs, label_probe=False,
                         **kw)
    # synthetic world: every valid pixel is labeled -> identical output
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # zero out some labels in the fused volume: probe=True unsees those
    # surfaces; probe=False keeps them (occluding, label 0)
    lbl_vol = np.asarray(state.label)
    written = np.asarray(state.tsdf) <= 0
    zx = written & (np.arange(lbl_vol.shape[0])[:, None, None] % 3 == 0)
    state0 = state._replace(label=jnp.asarray(np.where(zx, 0, lbl_vol)))
    a0 = splat_synthesize(state0, eng.vol_spec, srcs, label_probe=True,
                          **kw)
    b0 = splat_synthesize(state0, eng.vol_spec, srcs, label_probe=False,
                          **kw)
    m_a, m_b = np.asarray(a0[4]), np.asarray(b0[4])
    # probe=False coverage is a superset (tsdf<=0 alone admits more rays)
    assert (m_b | m_a).sum() == m_b.sum()
    assert m_b.sum() > m_a.sum()      # the zeroed surfaces still hit
    # and the extra hits carry label 0
    extra = m_b & ~m_a
    assert (np.asarray(b0[1])[extra] == 0).any()


def test_mesh_fold_matches_volume_probe(synthetic_dataset, small_spec):
    """The fold synthesis (volume-free, deferred integrates) must agree
    with the materialized volume-probe path on the mesh adaption — same
    class-collision semantics, sub-voxel geometric deviations only — and
    fused_state() must materialize the exact same chained volume the
    eager path builds."""
    cfg = make_cfg(adaption="mesh", number_of_scans=3)
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)

    # fixed_bounds: both engines then project through the SAME staged jit
    # (the eager _mesh_core re-rounds FMAs and flips ~0.007% of boundary
    # pixels, which would show up as spurious state diffs below)
    eng_v = TransferEngine(small_spec, small_spec, cfg, CAP,
                           mesh_attrs="volume", fixed_bounds=True)
    eng_f = TransferEngine(small_spec, small_spec, cfg, CAP,
                           fixed_bounds=True)  # fold
    vs_v, _ = eng_v.transfer(window)
    vs_f, _ = eng_f.transfer(window)
    assert not eng_f._fused          # integrates actually deferred

    m_v, m_f = np.asarray(vs_v.mask), np.asarray(vs_f.mask)
    both = m_v & m_f
    assert both.sum() > 0.9 * max(m_v.sum(), m_f.sum())
    lbl_agree = (np.asarray(vs_v.label) == np.asarray(vs_f.label))[both]
    assert lbl_agree.mean() > 0.97
    rng_diff = np.abs(np.asarray(vs_v.range) - np.asarray(vs_f.range))[both]
    assert np.median(rng_diff) < cfg.voxel_size

    # deferred materialization == the eager chain, exactly
    st_f = eng_f.fused_state()
    st_v = eng_v.fused_state()
    np.testing.assert_array_equal(np.asarray(st_f.label),
                                  np.asarray(st_v.label))
    np.testing.assert_allclose(np.asarray(st_f.tsdf),
                               np.asarray(st_v.tsdf), atol=1e-6)


def test_fold_single_source_matches_image(synthetic_dataset, small_spec):
    """S == 1: the fold reduces to the image path (same band, same
    zero-crossing) up to one-ulp float association differences."""
    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.ops.splat import splat_synthesize
    from lidar_transfer_tpu.pipeline.multiscan import merge_window

    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 1, CAP)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP)
    pts, rem, lbl, valid = merge_window(window)
    ri = P.range_project(pts, rem, lbl, valid, H=small_spec.H,
                         W=small_spec.W, fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    origin, active = eng._frame_volume(pts, valid)
    back = P.reverse_project(ri, fov_up_deg=small_spec.fov_up,
                             fov_down_deg=small_spec.fov_down,
                             preserve_float=True)
    srcs = [(ri.range.reshape(-1), back, ri.mask.reshape(-1),
             ri.label.reshape(-1),
             jnp.maximum(ri.remission, 0.0).reshape(-1))]
    kw = dict(target_H=small_spec.H, target_W=small_spec.W,
              fov_up_deg=small_spec.fov_up,
              fov_down_deg=small_spec.fov_down,
              vol_origin=origin, active_dims=active)
    a = splat_synthesize(None, eng.vol_spec, srcs, attrs="image", **kw)
    b = splat_synthesize(None, eng.vol_spec, srcs, attrs="fold", **kw)
    np.testing.assert_array_equal(np.asarray(a[4]), np.asarray(b[4]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    both = np.asarray(a[4])
    np.testing.assert_allclose(np.asarray(a[0])[both],
                               np.asarray(b[0])[both], atol=1e-4)


def test_chunked_row_gather_bit_identical_and_heuristic(monkeypatch):
    """Round-5 assemble-gather split: chunking the index vector must be
    bit-identical to the single gather, and the auto heuristic splits
    only past the measured fast-lowering row bound (131072)."""
    import os

    import numpy as np

    from lidar_transfer_tpu.ops.splat import (_GATHER_FAST_ROWS,
                                              _chunked_row_gather,
                                              _gather_split_for)

    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.standard_normal((1000, 8)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 1000, size=512).astype(np.int32))
    ref = np.asarray(table[idx])
    for split in (1, 2, 4, 8):
        np.testing.assert_array_equal(
            np.asarray(_chunked_row_gather(table, idx, split)), ref)

    monkeypatch.delenv("LT_ASSEMBLE_GATHER_SPLIT", raising=False)
    assert _gather_split_for(65536) == 1
    assert _gather_split_for(_GATHER_FAST_ROWS) == 1
    assert _gather_split_for(262144) == 2            # the upsample point
    assert _gather_split_for(4 * _GATHER_FAST_ROWS) == 4
    # non-divisible counts fall back to the single gather
    assert _gather_split_for(_GATHER_FAST_ROWS + 1) == 1
    # env override: force / disable
    monkeypatch.setenv("LT_ASSEMBLE_GATHER_SPLIT", "1")
    assert _gather_split_for(262144) == 1
    monkeypatch.setenv("LT_ASSEMBLE_GATHER_SPLIT", "4")
    assert _gather_split_for(262144) == 4
    monkeypatch.setenv("LT_ASSEMBLE_GATHER_SPLIT", "3")
    assert _gather_split_for(262144) == 1            # 262144 % 3 != 0

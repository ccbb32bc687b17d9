"""transfer_fast: the gather-free throughput path vs the classic engine.

The fast body (pipeline/deform.py `_mergemesh_core_fast`) selects winners
per POINT (ops/projection.project_winners) and splats the original point
arrays, instead of assembling the source RangeImage and back-projecting
it. The candidate sets are identical up to float round-trip ulps (the
image path reconstructs exactly these points via
``reverse_project(preserve_float=True)``), so outputs must agree except
at pixel-boundary / exact-tie cases.
"""

import numpy as np
import pytest

from lidar_transfer_tpu.config import TransferConfig
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.pipeline import TransferEngine, load_window

CAP = 8192


def make_cfg(**kw):
    base = dict(adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
                voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    base.update(kw)
    return TransferConfig(**base)


def _engines(synthetic_dataset, small_spec, cfg):
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    eng_c = TransferEngine(small_spec, small_spec, cfg, CAP,
                           fixed_bounds=True)
    eng_f = TransferEngine(small_spec, small_spec, cfg, CAP,
                           fixed_bounds=True)
    return seq, window, eng_c, eng_f


def test_fast_matches_classic(synthetic_dataset, small_spec):
    cfg = make_cfg()
    _, window, eng_c, eng_f = _engines(synthetic_dataset, small_spec, cfg)
    vs_c, _ = eng_c.transfer(window)
    vs_f = eng_f.transfer_fast(window)

    mc = np.asarray(vs_c.mask)
    mf = np.asarray(vs_f.mask)
    # boundary/tie pixels may flip either way; the bulk must agree
    assert (mc == mf).mean() > 0.98
    both = mc & mf
    # where both paths hit, the winning candidate is the SAME point, so
    # range/label/remission agree exactly (identical arithmetic on
    # identical inputs from the candidate onward)
    np.testing.assert_array_equal(np.asarray(vs_c.label)[both],
                                  np.asarray(vs_f.label)[both])
    np.testing.assert_allclose(np.asarray(vs_c.range)[both],
                               np.asarray(vs_f.range)[both], atol=1e-4)
    np.testing.assert_allclose(np.asarray(vs_c.remission)[both],
                               np.asarray(vs_f.remission)[both], atol=1e-5)


def test_fast_fused_state_and_rolling(synthetic_dataset, small_spec):
    """fused_state() after transfer_fast rebuilds the RangeImage lazily;
    the volume matches the classic engine's up to jit-fusion rounding
    (different program boundaries re-round pixel coords — same FMA
    effect the cp() docstring documents)."""
    import jax.numpy as jnp

    cfg = make_cfg()
    seq, window, eng_c, eng_f = _engines(synthetic_dataset, small_spec,
                                         cfg)
    eng_c.transfer(window)
    eng_f.transfer_fast(window)
    st_c = eng_c.fused_state()
    st_f = eng_f.fused_state()
    t_c = np.asarray(st_c.tsdf, np.float32)
    t_f = np.asarray(st_f.tsdf, np.float32)
    assert (t_c == t_f).mean() > 0.995

    # rolling shutter drives the lazy path end-to-end
    pose_next = np.linalg.inv(seq.poses[2]) @ seq.poses[3]
    rs = eng_f.resynthesize_rolling_shutter(pose_next)
    assert float(np.asarray(rs.mask).mean()) > 0.3


def test_fast_falls_back_for_other_adaptions(synthetic_dataset,
                                             small_spec):
    cfg = make_cfg(adaption="mesh", number_of_scans=2)
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         fixed_bounds=True)
    vs = eng.transfer_fast(window)
    assert vs.adaption == "mesh"
    assert bool(np.asarray(vs.mask).any())


def test_fast_beam_angles_target(synthetic_dataset, small_spec):
    """transfer_fast with an explicit-beam-angle target (the beam_rows
    z-buffer + beam-exact endpoints branch) matches the classic path."""
    from lidar_transfer_tpu.config import SensorSpec

    angles_deg = [-20.0, -14.0, -9.0, -5.0, -2.0, 0.0, 2.0, 6.0]
    target = SensorSpec(name="custom8", beams=8, fov_up=8.0,
                        fov_down=-22.0, angle_res_hor=360.0 / 128.0,
                        beam_angles=tuple(np.deg2rad(angles_deg)))
    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    eng_c = TransferEngine(small_spec, target, cfg, CAP, fixed_bounds=True)
    eng_f = TransferEngine(small_spec, target, cfg, CAP, fixed_bounds=True)
    vs_c, _ = eng_c.transfer(window)
    vs_f = eng_f.transfer_fast(window)
    mc, mf = np.asarray(vs_c.mask), np.asarray(vs_f.mask)
    assert (mc == mf).mean() > 0.97
    both = mc & mf
    # pixel-boundary candidates can pick a different (equally valid)
    # winner on the two paths — the bulk must agree exactly
    dr = np.abs(np.asarray(vs_c.range)[both] - np.asarray(vs_f.range)[both])
    assert (dr < 1e-4).mean() > 0.99
    same_lbl = (np.asarray(vs_c.label)[both]
                == np.asarray(vs_f.label)[both])
    assert same_lbl.mean() > 0.99


def test_stream_matches_fast(synthetic_dataset, small_spec):
    """transfer_stream (one lax.scan program over F frames) must produce
    the same VirtualScans as per-frame transfer_fast calls."""
    import jax
    import jax.numpy as jnp

    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    wins = [load_window(seq, cfg, i, CAP) for i in (1, 2, 3)]
    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         fixed_bounds=True)
    singles = [eng.transfer_fast(w) for w in wins]

    from lidar_transfer_tpu.pipeline.multiscan import stack_windows
    stacked = stack_windows(wins)
    eng2 = TransferEngine(small_spec, small_spec, cfg, CAP,
                          fixed_bounds=True)
    sv = eng2.transfer_stream(stacked)
    assert sv.range.shape[0] == 3
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(np.asarray(sv.mask[i]),
                                      np.asarray(s.mask))
        np.testing.assert_allclose(np.asarray(sv.range[i]),
                                   np.asarray(s.range), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(sv.label[i]),
                                      np.asarray(s.label))
    # lazy consumers after a stream are FRAME-INDEXED (VERDICT r3 #6):
    # omitting frame= is an explicit error, not a silent last-frame pick
    with pytest.raises(ValueError, match="frame=i"):
        eng2.fused_state()
    st_stream = eng2.fused_state(frame=-1)
    eng3 = TransferEngine(small_spec, small_spec, cfg, CAP,
                          fixed_bounds=True)
    eng3.transfer_fast(wins[-1])
    st_single = eng3.fused_state()
    np.testing.assert_array_equal(np.asarray(st_stream.tsdf),
                                  np.asarray(st_single.tsdf))
    # a NON-last frame must materialize that frame's volume exactly
    st_mid = eng2.fused_state(frame=1)
    eng4 = TransferEngine(small_spec, small_spec, cfg, CAP,
                          fixed_bounds=True)
    eng4.transfer_fast(wins[1])
    np.testing.assert_array_equal(np.asarray(st_mid.tsdf),
                                  np.asarray(eng4.fused_state().tsdf))
    assert not np.array_equal(np.asarray(st_mid.tsdf),
                              np.asarray(st_single.tsdf))
    with pytest.raises(IndexError):
        eng2.fused_state(frame=3)
    # a single-frame transfer clears the stream: frame-less works again,
    # frame= indexing is rejected
    eng2.transfer_fast(wins[0])
    eng2.fused_state()
    with pytest.raises(ValueError, match="preceding transfer_stream"):
        eng2.fused_state(frame=0)


def test_project_winners_matches_range_project(synthetic_dataset,
                                               small_spec):
    """The winner SET of project_winners must equal range_project's
    winner-index image exactly (same keys, same stable sort)."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.pipeline.multiscan import merge_window

    cfg = make_cfg()
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, CAP)
    pts, rem, lbl, valid = merge_window(window)
    H, W = small_spec.H, small_spec.W
    ri = P.range_project(pts, rem, lbl, valid, H=H, W=W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    is_winner, depth = P.project_winners(
        pts, valid, H=H, W=W, fov_up_deg=small_spec.fov_up,
        fov_down_deg=small_spec.fov_down)
    win_from_image = np.zeros(pts.shape[0], bool)
    idx = np.asarray(ri.index).reshape(-1)
    win_from_image[idx[idx >= 0]] = True
    np.testing.assert_array_equal(np.asarray(is_winner), win_from_image)
    np.testing.assert_allclose(np.asarray(depth),
                               np.asarray(ri.point_depth), rtol=0, atol=0)


def test_mesh_stream_matches_single(synthetic_dataset, small_spec):
    """transfer_stream for the deferred-fold mesh adaption (lax.scan
    body) == per-frame mesh() calls."""
    cfg = make_cfg(adaption="mesh", number_of_scans=2)
    seq = KittiSequence.open(synthetic_dataset)
    wins = [load_window(seq, cfg, i, CAP) for i in (1, 2, 3)]
    eng = TransferEngine(small_spec, small_spec, cfg, CAP,
                         fixed_bounds=True)
    singles = [eng.transfer(w)[0] for w in wins]

    from lidar_transfer_tpu.pipeline.multiscan import stack_windows
    eng2 = TransferEngine(small_spec, small_spec, cfg, CAP,
                          fixed_bounds=True)
    sv = eng2.transfer_stream(stack_windows(wins))
    assert sv.range.shape[0] == 3 and sv.adaption == "mesh"
    for i, s in enumerate(singles):
        np.testing.assert_array_equal(np.asarray(sv.mask[i]),
                                      np.asarray(s.mask))
        np.testing.assert_allclose(np.asarray(sv.range[i]),
                                   np.asarray(s.range), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(sv.label[i]),
                                      np.asarray(s.label))
    # lazy volume after the stream is frame-indexed; pick a NON-last
    # frame and check it materializes that frame's per-scan chain
    import pytest as _pytest
    with _pytest.raises(ValueError, match="frame=i"):
        eng2.fused_state()
    st = eng2.fused_state(frame=0)
    eng.transfer(wins[0])
    np.testing.assert_allclose(np.asarray(st.tsdf),
                               np.asarray(eng.fused_state().tsdf),
                               atol=1e-6)


def test_fast_matches_classic_wide_window(synthetic_dataset, small_spec):
    """Same parity at a 5-scan window — the reference grid-search axis
    goes to nscans 20 (grid_search_nframes_voxelsize.py:49); the bench
    measured linear point-scan throughput out to S=20 on hardware
    (BASELINE.md window-size scaling), and this pins the fast path's
    CORRECTNESS at a window wider than the 1-3 the other tests use
    (all 5 frames of the synthetic sequence in one window)."""
    cfg = make_cfg(number_of_scans=5)
    _, window, eng_c, eng_f = _engines(synthetic_dataset, small_spec, cfg)
    assert window.nscans == 5
    vs_c, _ = eng_c.transfer(window)
    vs_f = eng_f.transfer_fast(window)

    mc = np.asarray(vs_c.mask)
    mf = np.asarray(vs_f.mask)
    assert (mc == mf).mean() > 0.98
    both = mc & mf
    np.testing.assert_array_equal(np.asarray(vs_c.label)[both],
                                  np.asarray(vs_f.label)[both])
    # a wide window over a STATIC world yields cross-scan depth
    # near-ties in one pixel; the classic path's float round-trip can
    # flip such winners to a different (same-label, same-surface) point,
    # so range must agree exactly in bulk, with a bounded tie tail
    rc = np.asarray(vs_c.range)[both]
    rf = np.asarray(vs_f.range)[both]
    close = np.abs(rc - rf) < 1e-4
    assert close.mean() > 0.995
    assert np.abs(rc - rf).max() < 0.5

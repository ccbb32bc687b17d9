"""Upsampling targets: chord-interpolated splat coverage.

The reference's mesh raycast hits triangle INTERIORS between adjacent
source beams (RayTracer.cpp:62-92), so a target grid denser than the
source fills interior pixels; a one-candidate-per-source-ray splat
cannot. ``ops/splat._interp_candidates`` closes this by emitting chord
candidates between connected adjacent source returns (band overlap OR
the grazing-surface angle criterion), auto-activated by the engine when
the target grid is denser (``TransferEngine.upsample_interp``).

Oracles: the TSDF raymarcher (which fills these pixels natively) and
the synthetic world's ground-truth target-spec scan.
"""

import numpy as np
import pytest

from lidar_transfer_tpu.config import SensorSpec, TransferConfig
from lidar_transfer_tpu.datasets import synthetic
from lidar_transfer_tpu.datasets.kitti import KittiSequence
from lidar_transfer_tpu.pipeline import TransferEngine, load_window

CAP = 8192


def _cfg(**kw):
    base = dict(adaption="mergemesh", number_of_scans=1, voxel_size=0.25,
                voxel_bounds=((-16.0, 16.0), (-16.0, 16.0), (-4.0, 4.0)))
    base.update(kw)
    return TransferConfig(**base)


@pytest.fixture(scope="module")
def up_spec(small_spec):
    """Twice the small_spec's beam density, same fov."""
    return SensorSpec(name="up32", beams=small_spec.beams * 2,
                      fov_up=small_spec.fov_up,
                      fov_down=small_spec.fov_down,
                      angle_res_hor=small_spec.angle_res_hor)


def test_interp_auto_gating(synthetic_dataset, small_spec, up_spec):
    cfg = _cfg()
    ident = TransferEngine(small_spec, small_spec, cfg, CAP,
                           fixed_bounds=True)
    assert not ident._interp_active
    assert ident._interp_mv == 0 and ident._interp_mu == 0

    up = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True)
    assert up._interp_active and up._interp_mv == 1

    down = TransferEngine(up_spec, small_spec, cfg, CAP, fixed_bounds=True)
    assert not down._interp_active

    wide = SensorSpec(name="w2", beams=small_spec.beams,
                      fov_up=small_spec.fov_up,
                      fov_down=small_spec.fov_down,
                      angle_res_hor=small_spec.angle_res_hor / 2.0)
    wider = TransferEngine(small_spec, wide, cfg, CAP, fixed_bounds=True)
    assert wider._interp_mu == 1 and wider._interp_mv == 0

    off = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True,
                         upsample_interp=False)
    assert not off._interp_active


def test_interp_identity_beam_angles_stays_off(synthetic_dataset,
                                               small_spec):
    """A non-uniform beam_angles identity pair must NOT activate (its
    min gap is below span/H; the mean-gap + slack gating ignores the
    convention mismatch)."""
    import dataclasses

    rng = np.random.default_rng(0)
    base = np.linspace(small_spec.fov_down, small_spec.fov_up,
                       small_spec.beams)
    jitter = rng.uniform(-0.2, 0.2, small_spec.beams) * (
        base[1] - base[0])
    ba = np.radians(np.sort(base + jitter)).tolist()
    spec_ba = dataclasses.replace(small_spec, beam_angles=ba)
    eng = TransferEngine(spec_ba, spec_ba, _cfg(), CAP, fixed_bounds=True)
    assert not eng._interp_active


def test_upsample_vertical_coverage_and_quality(synthetic_dataset,
                                                small_spec, up_spec,
                                                scene):
    cfg = _cfg()
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)

    base = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True,
                          upsample_interp=False)
    vb, _ = base.transfer(win)
    mb = np.asarray(vb.mask)

    eng = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True)
    vs, _ = eng.transfer(win)
    m = np.asarray(vs.mask)

    # interpolation roughly doubles coverage and fills every beam row
    assert m.mean() > 1.7 * mb.mean()
    assert m.any(axis=1).all()
    assert not mb.any(axis=1).all()

    # ground truth: simulate the target-spec scan at the same pose and
    # compare labels/range where both grids have data
    from lidar_transfer_tpu.ops import projection as Pj
    import jax.numpy as jnp

    poses = synthetic.straight_line_poses(5, 1.5)
    pts, rem, lab = synthetic.simulate_scan(scene, up_spec, poses[1])
    n = pts.shape[0]

    def pad(a, fill=0):
        out = np.full((CAP,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    ri_t = Pj.range_project(
        jnp.asarray(pad(pts.astype(np.float32))),
        jnp.asarray(pad(rem.astype(np.float32))),
        jnp.asarray(pad(lab.astype(np.int32))),
        jnp.asarray(pad(np.ones(n, bool))),
        H=up_spec.H, W=up_spec.W, fov_up_deg=up_spec.fov_up,
        fov_down_deg=up_spec.fov_down)
    mt = np.asarray(ri_t.mask)
    lt = np.asarray(ri_t.label)
    rt = np.asarray(ri_t.range)

    both = m & mt
    recall = both.sum() / mt.sum()
    label_acc = (np.asarray(vs.label)[both] == lt[both]).mean()
    range_mae = np.abs(np.asarray(vs.range)[both] - rt[both]).mean()
    false_hit = (m & ~mt).mean()
    assert recall > 0.75
    assert label_acc > 0.96
    assert range_mae < 0.5
    assert false_hit < 0.01


def test_upsample_matches_raymarch_bulk(synthetic_dataset, small_spec,
                                        up_spec):
    cfg = _cfg()
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    eng = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True)
    ray = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True,
                         synthesis="raymarch")
    vs, _ = eng.transfer(win)
    vr, _ = ray.transfer(win)
    m, mr = np.asarray(vs.mask), np.asarray(vr.mask)
    # coverage parity with the volume-marching engine
    assert abs(m.mean() - mr.mean()) < 0.05
    both = m & mr
    agree = (np.asarray(vs.label)[both] == np.asarray(vr.label)[both])
    assert agree.mean() > 0.9


@pytest.mark.parametrize("body", ["classic", "fast"])
def test_upsample_fast_and_stream_interpolate(synthetic_dataset,
                                              small_spec, up_spec,
                                              monkeypatch, body):
    """Both interp stream bodies agree with the classic transfer().

    body="fast" exercises the round-4 interpolating fast body (winners
    densified into raster order with one int32 index scatter + row
    gather); it must agree with the classic transfer() to float-ulp
    tolerance (chord endpoints are the original points vs the classic
    body's reverse-projected reconstructions). body="classic" is the
    default routing (measured faster on device — deform.py
    _interp_body_fast) and must match transfer() EXACTLY (transfer_fast
    runs the same classic deferred body). Either way the stream must
    equal transfer_fast."""
    monkeypatch.setenv("LT_INTERP_STREAM_BODY", body)
    cfg = _cfg()
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    eng = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True)
    vs, _ = eng.transfer(win)
    vf = eng.transfer_fast(win)
    mc, mf = np.asarray(vs.mask), np.asarray(vf.mask)
    if body == "classic":
        # the default routing IS the classic body — bit-exact, pinning
        # the pre-round-4 exact-equality contract of transfer_fast
        for name in ("range", "label", "remission", "points", "mask"):
            np.testing.assert_array_equal(
                np.asarray(getattr(vs, name)),
                np.asarray(getattr(vf, name)), err_msg=name)
    else:
        assert (mc == mf).mean() > 0.99        # pixel-boundary flips only
        assert abs(mc.mean() - mf.mean()) < 0.005  # same coverage
        both = mc & mf
        dr = np.abs(np.asarray(vs.range) - np.asarray(vf.range))[both]
        assert (dr < 1e-4).mean() > 0.999
        same = (np.asarray(vs.label) == np.asarray(vf.label))[both]
        assert same.mean() > 0.999

    from lidar_transfer_tpu.pipeline.multiscan import stack_windows

    sv = eng.transfer_stream(stack_windows([win, win]))
    assert sv.range.shape[0] == 2
    np.testing.assert_array_equal(np.asarray(sv.label[0]),
                                  np.asarray(vf.label))
    np.testing.assert_allclose(np.asarray(sv.range[0]),
                               np.asarray(vf.range), atol=1e-5)


def test_upsample_mesh_adaption(synthetic_dataset, small_spec, up_spec):
    """The fold (mesh) path interpolates each source image too."""
    cfg = _cfg(adaption="mesh", number_of_scans=2)
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    base = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True,
                          upsample_interp=False)
    eng = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True)
    vb, _ = base.transfer(win)
    vs, _ = eng.transfer(win)
    m, mb = np.asarray(vs.mask), np.asarray(vb.mask)
    assert m.mean() > 1.5 * mb.mean()
    assert m.any(axis=1).all()


def test_upsample_both_axes(synthetic_dataset, small_spec):
    """2x density on BOTH axes: diagonal interior pixels need the cell-
    diagonal chords; coverage must stay near the raymarcher's."""
    both2 = SensorSpec(name="up2x2", beams=small_spec.beams * 2,
                       fov_up=small_spec.fov_up,
                       fov_down=small_spec.fov_down,
                       angle_res_hor=small_spec.angle_res_hor / 2.0)
    cfg = _cfg()
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    eng = TransferEngine(small_spec, both2, cfg, CAP, fixed_bounds=True)
    assert eng._interp_mv == 1 and eng._interp_mu == 1
    ray = TransferEngine(small_spec, both2, cfg, CAP, fixed_bounds=True,
                         synthesis="raymarch")
    vs, _ = eng.transfer(win)
    vr, _ = ray.transfer(win)
    m, mr = np.asarray(vs.mask), np.asarray(vr.mask)
    # interior-of-cell pixels (odd row AND odd col) must actually fill
    interior = m[1::2, 1::2]
    assert interior.mean() > 0.25
    assert abs(m.mean() - mr.mean()) < 0.07
    both = m & mr
    agree = (np.asarray(vs.label)[both] == np.asarray(vr.label)[both])
    assert agree.mean() > 0.9


def test_interp_respects_volume_bounds(synthetic_dataset, small_spec,
                                       up_spec):
    """Interpolated candidates must pass the same inside-active-volume
    gate as every other candidate source: chords between returns beyond
    clipped bounds must not synthesize phantom returns there (the
    marched surface the reference interpolates only exists inside the
    fused volume)."""
    cfg = _cfg(voxel_bounds=((-4.0, 4.0), (-4.0, 4.0), (-4.0, 4.0)),
               voxel_size=0.25)
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    eng = TransferEngine(small_spec, up_spec, cfg, CAP, fixed_bounds=True)
    assert eng._interp_active
    vs, _ = eng.transfer(win)
    m = np.asarray(vs.mask)
    ends = np.asarray(vs.points)[m]
    origin = np.asarray(eng.vol_spec.origin)
    dims = np.asarray(eng.vol_spec.dims)
    gi = np.round((ends - origin) / cfg.voxel_size)
    inside = ((gi >= 0) & (gi < dims)).all(axis=1)
    assert inside.all(), (
        f"{(~inside).sum()} synthesized returns outside the active "
        f"volume (max range {np.linalg.norm(ends[~inside], axis=1).max():.2f})")


def test_interp_gating_uses_projection_span(synthetic_dataset, small_spec):
    """mergemesh projects the merged cloud at TARGET fov over source.H
    rows (laserscan.py:929+952): a narrow-fov target with source-count
    beams yields a source image ALREADY at target pitch — interp must
    stay off (the max-of-spans gating falsely activated and forced the
    slow classic body). The mesh adaption projects at SOURCE fov, where
    the same pair genuinely upsamples."""
    narrow = SensorSpec(name="narrow16", beams=small_spec.beams,
                        fov_up=4.0, fov_down=-10.0,
                        angle_res_hor=360.0 / 256.0)
    mm = TransferEngine(small_spec, narrow, _cfg(), CAP, fixed_bounds=True)
    assert mm._interp_mv == 0 and not mm._interp_active
    mesh = TransferEngine(small_spec, narrow,
                          _cfg(adaption="mesh", number_of_scans=2),
                          CAP, fixed_bounds=True)
    # source span 30deg / 15 gaps = 2deg over target rows 14/16 = 0.875:
    # ratio 2.29, worst source-row gap = 3 target rows -> 2 interior
    # samples (the conservative span/(H-1) spacing; was 1 with span/H,
    # which systematically skipped a row in every 3-row gap)
    assert mesh._interp_mv == 2


def test_interp_bridges_snapped_beam_gaps(synthetic_dataset, small_spec):
    """A non-uniform source beam table whose snapped rows leave empty
    interleaved rows: vertical chords must bridge up to the max
    occupied-row gap (engine _interp_vspan), not just adjacent rows —
    adjacent-row chords never find two valid endpoints across an empty
    row."""
    import dataclasses

    # 16 beams over the fov with a doubled gap in the middle: rows
    # under the target-fov projection leave >=1 empty row between the
    # two halves
    span = small_spec.fov_up - small_spec.fov_down
    lo = np.linspace(small_spec.fov_down, small_spec.fov_down + 0.36 * span, 8)
    hi = np.linspace(small_spec.fov_up - 0.36 * span, small_spec.fov_up, 8)
    ba = np.radians(np.concatenate([lo, hi])).tolist()
    src = dataclasses.replace(small_spec, beam_angles=ba)
    up = SensorSpec(name="up32g", beams=small_spec.beams * 2,
                    fov_up=small_spec.fov_up,
                    fov_down=small_spec.fov_down,
                    angle_res_hor=small_spec.angle_res_hor)
    cfg = _cfg()
    eng = TransferEngine(src, up, cfg, CAP, fixed_bounds=True)
    assert eng._interp_active
    assert eng._interp_vspan > 1

    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    vs, _ = eng.transfer(win)
    m = np.asarray(vs.mask)

    # the same engine restricted to adjacent-row chords leaves the
    # mid-fov band empty; the span-aware one must cover more
    eng1 = TransferEngine(src, up, cfg, CAP, fixed_bounds=True)
    eng1._interp_vspan = 1
    v1, _ = eng1.transfer(win)
    m1 = np.asarray(v1.mask)
    assert m.sum() > m1.sum()
    # rows covered only via the bridged chords exist
    gained = m.any(axis=1) & ~m1.any(axis=1)
    assert gained.any()


def test_interp_vspan_cap_warns(small_spec):
    """ADVICE r4: the 4-row chord-span cap must be LOUD — a beam table
    whose occupied-row gaps exceed it warns instead of silently leaving
    the wide gaps empty."""
    import dataclasses
    import warnings

    # 16 beams crammed into the top/bottom 10% of the fov: the middle
    # 80% of target rows is one huge occupied-row gap >> 4
    span = small_spec.fov_up - small_spec.fov_down
    lo = np.linspace(small_spec.fov_down, small_spec.fov_down + 0.1 * span, 8)
    hi = np.linspace(small_spec.fov_up - 0.1 * span, small_spec.fov_up, 8)
    src = dataclasses.replace(
        small_spec,
        beam_angles=np.radians(np.concatenate([lo, hi])).tolist())
    up = SensorSpec(name="up32w", beams=small_spec.beams * 2,
                    fov_up=small_spec.fov_up,
                    fov_down=small_spec.fov_down,
                    angle_res_hor=small_spec.angle_res_hor)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        eng = TransferEngine(src, up, _cfg(), CAP, fixed_bounds=True)
    assert eng._interp_vspan == 4
    msgs = [str(w.message) for w in rec]
    assert any("bridges at most 4" in m for m in msgs), msgs
    # and a table within the cap stays silent
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        TransferEngine(small_spec, up, _cfg(), CAP, fixed_bounds=True)
    assert not any("bridges at most" in str(w.message) for w in rec2)


def test_upsample_4x(synthetic_dataset, small_spec, scene):
    """4x beam density (16 -> 64 beams, the VLP16 -> HDL64 shape): four
    chord interior samples per source-row gap (_interp_mv == 4 — source
    beams span the fov inclusively, so their target-row gaps alternate
    4 and 5 rows and m_v must cover the worst one; span/H-based m_v=3
    left one target row per 5-row gap SYSTEMATICALLY empty). Every
    target row must fill and quality vs the synthetic ground-truth
    64-beam scan must hold — chords subtend 4x the angle of the 2x
    point, so thresholds are the measured honest values, slightly
    looser than test_upsample_vertical_coverage_and_quality's."""
    up4 = SensorSpec(name="up4", beams=small_spec.beams * 4,
                     fov_up=small_spec.fov_up,
                     fov_down=small_spec.fov_down,
                     angle_res_hor=small_spec.angle_res_hor)
    cfg = _cfg()
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 1, CAP)
    eng = TransferEngine(small_spec, up4, cfg, CAP, fixed_bounds=True)
    assert eng._interp_active and eng._interp_mv == 4
    vs, _ = eng.transfer(win)
    m = np.asarray(vs.mask)
    assert m.any(axis=1).all()          # every interpolated row fills

    from lidar_transfer_tpu.ops import projection as Pj
    import jax.numpy as jnp

    poses = synthetic.straight_line_poses(5, 1.5)
    pts, rem, lab = synthetic.simulate_scan(scene, up4, poses[1])
    n = pts.shape[0]
    cap4 = 1 << int(np.ceil(np.log2(max(n, 1))))

    def pad(a, fill=0):
        out = np.full((cap4,) + a.shape[1:], fill, a.dtype)
        out[:n] = a
        return out

    ri_t = Pj.range_project(
        jnp.asarray(pad(pts.astype(np.float32))),
        jnp.asarray(pad(rem.astype(np.float32))),
        jnp.asarray(pad(lab.astype(np.int32))),
        jnp.asarray(pad(np.ones(n, bool))),
        H=up4.H, W=up4.W, fov_up_deg=up4.fov_up,
        fov_down_deg=up4.fov_down)
    mt = np.asarray(ri_t.mask)
    both = m & mt
    recall = both.sum() / mt.sum()
    label_acc = (np.asarray(vs.label)[both]
                 == np.asarray(ri_t.label)[both]).mean()
    range_mae = np.abs(np.asarray(vs.range)[both]
                       - np.asarray(ri_t.range)[both]).mean()
    false_hit = (m & ~mt).mean()
    print(f"4x upsample: recall {recall:.3f} label_acc {label_acc:.3f} "
          f"range_mae {range_mae:.3f} false_hit {false_hit:.4f}")
    # measured: recall 0.826, label_acc 0.990, mae 0.062 m, false 0.002
    assert recall > 0.78
    assert label_acc > 0.97
    assert range_mae < 0.2
    assert false_hit < 0.005

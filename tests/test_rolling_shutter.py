"""Rolling-shutter rays, pose interpolation, per-ray-origin raycast,
catmesh, torch interop."""

import numpy as np
import pytest

from lidar_transfer_tpu.ops import raycast as RC
from lidar_transfer_tpu.ops import transforms as T


def _rot_z(a):
    c, s = np.cos(a), np.sin(a)
    m = np.eye(4)
    m[:2, :2] = [[c, -s], [s, c]]
    return m


def test_interpolate_pose_endpoints_and_midpoint():
    p1 = _rot_z(np.pi / 2)
    p1[:3, 3] = [2.0, 0.0, 1.0]
    out = T.interpolate_pose(np.eye(4), p1, [0.0, 0.5, 1.0])
    np.testing.assert_allclose(out[0], np.eye(4), atol=1e-12)
    np.testing.assert_allclose(out[2], p1, atol=1e-9)
    mid = out[1]
    np.testing.assert_allclose(mid[:3, 3], [1.0, 0.0, 0.5], atol=1e-9)
    np.testing.assert_allclose(mid[:3, :3], _rot_z(np.pi / 4)[:3, :3],
                               atol=1e-9)


def test_quaternion_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        ang = rng.uniform(-np.pi, np.pi)
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K
        q = T.rotation_to_quaternion(R)
        np.testing.assert_allclose(T.quaternion_to_rotation(q), R,
                                   atol=1e-10)


def test_rays_moving_identity_matches_static():
    rays, origins = RC.generate_rays_moving(8, 64, 5.0, -20.0, np.eye(4))
    static = RC.generate_rays(8, 64, 5.0, -20.0)
    np.testing.assert_allclose(rays, static, atol=1e-6)
    np.testing.assert_allclose(origins, 0.0)


def test_rays_moving_translation_ramps():
    pose = np.eye(4)
    pose[:3, 3] = [1.0, 0.0, 0.0]
    rays, origins = RC.generate_rays_moving(4, 100, 5.0, -20.0, pose)
    o = origins.reshape(4, 100, 3)
    # first fired column at t=0, origins ramp linearly along x, < 1.0
    np.testing.assert_allclose(o[:, 0], 0.0, atol=1e-12)
    assert o[0, -1, 0] == pytest.approx(0.99, abs=1e-6)
    assert np.all(np.diff(o[0, :, 0]) > 0)
    # directions stay unit under pure translation
    np.testing.assert_allclose(np.linalg.norm(rays, axis=1), 1.0,
                               atol=1e-6)


def test_raycast_per_ray_origins():
    """Two rays aimed +x at a wall; per-ray origins shift the hit range."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.ops.tsdf import TSDFState, VolumeSpec

    dims = (64, 16, 16)
    voxel = 0.25
    spec = VolumeSpec(origin=(0.0, -2.0, -2.0), voxel_size=voxel, dims=dims)
    gx = np.arange(dims[0])[:, None, None] * voxel  # x coordinate
    d = 10.0 - gx            # signed distance to wall at x=10 (+ = free)
    tsdf = np.clip(d / (5 * voxel), -1, 1).astype(np.float32)
    tsdf = np.broadcast_to(tsdf, dims).copy()
    state = TSDFState(tsdf=jnp.asarray(tsdf),
                      weight=jnp.ones(dims, jnp.float32),
                      label=jnp.full(dims, 9, jnp.int32),
                      rem=jnp.zeros(dims, jnp.float32))
    rays = jnp.asarray([[1.0, 0, 0], [1.0, 0, 0]], jnp.float32)
    origins = jnp.asarray([[0.5, 0, 0], [3.0, 0, 0]], jnp.float32)
    res = RC.raycast_tsdf(state, spec, rays, origins, H=1, W=2)
    r = np.asarray(res.range).reshape(-1)
    assert res.hit.all()
    assert r[0] == pytest.approx(9.5, abs=0.3)
    assert r[1] == pytest.approx(7.0, abs=0.3)
    # ranges differ by exactly the origin shift
    assert (r[0] - r[1]) == pytest.approx(2.5, abs=0.05)


def test_unknown_adaption_raises_valueerror(synthetic_dataset, small_spec):
    # catmesh is now implemented (tests/test_pipeline.py::
    # test_catmesh_identity); only truly unknown names raise
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="bogus", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, 8192)
    window = load_window(seq, cfg, 0, 8192)
    with pytest.raises(ValueError):
        eng.transfer(window)


def test_torch_interop(synthetic_dataset, small_spec):
    torch = pytest.importorskip("torch")
    import jax.numpy as jnp

    from lidar_transfer_tpu.datasets import kitti
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.utils.torch_interop import (
        features_to_torch, range_image_to_torch)

    seq = KittiSequence.open(synthetic_dataset)
    pts, rem, lbl = seq.read(0)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, 8192)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=small_spec.H, W=small_spec.W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    t = range_image_to_torch(ri, points=p)
    # full reference torch() key set (laserscan.py:503-534) + per-point
    # extras
    assert set(t) == {"proj_range", "proj_xyz", "proj_remission",
                      "proj_idx", "proj_mask", "proj_x", "proj_y",
                      "unproj_range", "points_valid"}
    # proj_x/proj_y are per-POINT (the reference's [m,1] layout,
    # laserscan.py:49) — scattering pixel predictions back to the cloud
    # through them must reproduce the per-point label projection
    N = p.shape[0]
    assert t["proj_x"].shape == (N,) and t["proj_y"].shape == (N,)
    assert t["unproj_range"].shape == (N,)
    per_point = np.asarray(ri.label)[t["proj_y"].numpy(),
                                      t["proj_x"].numpy()]
    assert per_point.shape == (N,)
    assert t["points_valid"].numpy().dtype == bool
    assert t["proj_range"].dtype == torch.float32
    assert t["proj_idx"].dtype == torch.int64
    assert t["proj_range"].shape == (small_spec.H, small_spec.W)
    np.testing.assert_allclose(t["proj_range"].numpy(),
                               np.asarray(ri.range))
    # proj_xyz: channel-first winner coordinates, zeros where no data
    assert t["proj_xyz"].dtype == torch.float32
    assert t["proj_xyz"].shape == (3, small_spec.H, small_spec.W)
    xyz = t["proj_xyz"].numpy()
    mask = np.asarray(ri.mask)
    idx = np.asarray(ri.index)
    np.testing.assert_allclose(
        np.transpose(xyz, (1, 2, 0))[mask], p[idx[mask]])
    assert (xyz[:, ~mask] == 0).all()
    # without points the key is absent (documented), not wrong
    assert "proj_xyz" not in range_image_to_torch(ri)

    from lidar_transfer_tpu.models.rangenet import range_image_features
    xyz = jnp.zeros((small_spec.H, small_spec.W, 3))
    feats = range_image_features(ri.range, xyz, ri.remission, ri.mask)
    ft = features_to_torch(feats)
    assert ft.shape == (5, small_spec.H, small_spec.W)


def test_engine_rolling_shutter_identity(synthetic_dataset, small_spec):
    """pose_next = identity ==> rolling-shutter resynthesis equals the
    static raymarcher on the same volume."""
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, 8192,
                         fixed_bounds=True, synthesis="raymarch")
    window = load_window(seq, cfg, 2, 8192)
    vs_static, _ = eng.transfer(window)
    vs_rs = eng.resynthesize_rolling_shutter(np.eye(4), engine="raymarch")
    np.testing.assert_array_equal(np.asarray(vs_rs.mask),
                                  np.asarray(vs_static.mask))
    both = np.asarray(vs_rs.mask) & np.asarray(vs_static.mask)
    np.testing.assert_allclose(np.asarray(vs_rs.range)[both],
                               np.asarray(vs_static.range)[both],
                               atol=1e-4)


def test_rolling_splat_identity_matches_static(synthetic_dataset,
                                               small_spec):
    """pose_next = identity ==> the splat rolling path reproduces the
    static fast transfer (same winner set; exact surface ranges)."""
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, 8192,
                         fixed_bounds=True)
    window = load_window(seq, cfg, 2, 8192)
    vs_static = eng.transfer_fast(window)
    vs_rs = eng.resynthesize_rolling_shutter(np.eye(4))
    assert vs_rs.adaption == "mergemesh-rolling"
    ms, mr = np.asarray(vs_static.mask), np.asarray(vs_rs.mask)
    # identical winner set; the static path additionally requires an
    # in-volume BAND sample, the rolling path an in-volume surface —
    # boundary points may differ either way
    assert (ms == mr).mean() > 0.97
    both = ms & mr
    np.testing.assert_allclose(np.asarray(vs_rs.range)[both],
                               np.asarray(vs_static.range)[both],
                               atol=1e-3)
    np.testing.assert_array_equal(np.asarray(vs_rs.label)[both],
                                  np.asarray(vs_static.label)[both])


def test_rolling_shutter_frame_indexed_after_stream(synthetic_dataset,
                                                    small_spec):
    """After transfer_stream, rolling shutter is frame-indexed: frame=i
    reproduces the per-frame engine's output for that (non-last) frame,
    and omitting frame= is an explicit error (VERDICT r3 #6)."""
    import pytest

    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window
    from lidar_transfer_tpu.pipeline.multiscan import stack_windows

    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    wins = [load_window(seq, cfg, i, 8192) for i in (0, 1, 2)]
    pose = np.eye(4)
    pose[0, 3] = 0.5

    eng = TransferEngine(small_spec, small_spec, cfg, 8192,
                         fixed_bounds=True)
    eng.transfer_stream(stack_windows(wins))
    with pytest.raises(ValueError, match="frame=i"):
        eng.resynthesize_rolling_shutter(pose)
    rs1 = eng.resynthesize_rolling_shutter(pose, frame=1)

    ref = TransferEngine(small_spec, small_spec, cfg, 8192,
                         fixed_bounds=True)
    ref.transfer_fast(wins[1])
    rs_ref = ref.resynthesize_rolling_shutter(pose)
    np.testing.assert_array_equal(np.asarray(rs1.mask),
                                  np.asarray(rs_ref.mask))
    np.testing.assert_allclose(np.asarray(rs1.range),
                               np.asarray(rs_ref.range), atol=1e-5)


def test_rolling_splat_cross_validates_raymarcher(synthetic_dataset,
                                                  small_spec):
    """Same motion, two engines: the splat rolling reprojection and the
    per-ray-origin raymarcher must agree on the distorted geometry."""
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    window = load_window(seq, cfg, 2, 8192)
    pose = np.eye(4)
    pose[0, 3] = 1.0

    eng_s = TransferEngine(small_spec, small_spec, cfg, 8192,
                           fixed_bounds=True)
    eng_s.transfer_fast(window)
    rs_s = eng_s.resynthesize_rolling_shutter(pose)

    eng_r = TransferEngine(small_spec, small_spec, cfg, 8192,
                           fixed_bounds=True, synthesis="raymarch")
    eng_r.transfer(window)
    rs_r = eng_r.resynthesize_rolling_shutter(pose, engine="raymarch")

    both = np.asarray(rs_s.mask) & np.asarray(rs_r.mask)
    assert both.mean() > 0.3
    d = np.abs(np.asarray(rs_s.range) - np.asarray(rs_r.range))[both]
    # exact surfaces vs trilinear TSDF crossings: sub-voxel agreement
    assert np.median(d) < 2 * cfg.voxel_size


def test_engine_rolling_shutter_motion_shifts(synthetic_dataset,
                                              small_spec):
    """Forward ego motion pulls later-fired columns closer to forward
    surfaces: ranges must differ from the static cast."""
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, 8192,
                         fixed_bounds=True, synthesis="raymarch")
    window = load_window(seq, cfg, 2, 8192)
    vs_static, _ = eng.transfer(window)
    pose = np.eye(4)
    pose[0, 3] = 1.0                     # 1 m forward over the frame
    vs_rs = eng.resynthesize_rolling_shutter(pose)
    both = np.asarray(vs_rs.mask) & np.asarray(vs_static.mask)
    d = np.abs(np.asarray(vs_rs.range) - np.asarray(vs_static.range))[both]
    assert np.median(d) > 0.01           # distortion is visible
    assert np.median(d) < 1.5            # but bounded by the motion


def test_mesh_deferred_rolling_shutter(synthetic_dataset, small_spec):
    """Rolling shutter after a deferred-fold MESH transfer takes the fast
    splat reprojection (the window is stashed) and stays close to the
    static mesh output under an identity pose step."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="mesh", number_of_scans=2,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    eng = TransferEngine(small_spec, small_spec, cfg, 8192,
                         fixed_bounds=True)
    window = load_window(seq, cfg, 2, 8192)
    vs, _ = eng.transfer(window)
    rs = eng.resynthesize_rolling_shutter(np.eye(4))
    m_s, m_r = np.asarray(vs.mask), np.asarray(rs.mask)
    assert m_r.mean() > 0.3
    both = m_s & m_r
    assert both.sum() > 0.85 * m_s.sum()
    dr = np.abs(np.asarray(vs.range) - np.asarray(rs.range))[both]
    # static-pose rolling == plain reprojection of the merged points;
    # differs from the fold output only at collision/boundary pixels
    assert np.median(dr) < cfg.voxel_size


def test_rolling_volume_core_materialized_engines(synthetic_dataset,
                                                  small_spec):
    """Materialized engines (no stashed window) take the volume-band
    reprojection (round 4 — replaces the ~1.5 s raymarcher fallback):
    identity pose tracks the static output sub-voxel, and under motion
    it agrees with the splat-window rolling core."""
    from lidar_transfer_tpu.config import TransferConfig
    from lidar_transfer_tpu.datasets.kitti import KittiSequence
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window

    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.25,
                         voxel_bounds=((-16.0, 16.0), (-16.0, 16.0),
                                       (-4.0, 4.0)))
    seq = KittiSequence.open(synthetic_dataset)
    win = load_window(seq, cfg, 2, 8192)

    eng_m = TransferEngine(small_spec, small_spec, cfg, 8192,
                           fixed_bounds=True, defer_volume=False)
    vs_m, _ = eng_m.transfer(win)
    assert getattr(eng_m, "_pending_window", None) is None  # materialized

    # identity pose: volume-band reprojection == the static output up to
    # voxel quantization of the band probe
    rs_id = eng_m.resynthesize_rolling_shutter(np.eye(4))
    mm, ms = np.asarray(rs_id.mask), np.asarray(vs_m.mask)
    assert (mm == ms).mean() > 0.97
    both = mm & ms
    dr = np.abs(np.asarray(rs_id.range) - np.asarray(vs_m.range))[both]
    assert np.median(dr) < 0.5 * cfg.voxel_size
    same = (np.asarray(rs_id.label) == np.asarray(vs_m.label))[both]
    assert same.mean() > 0.98

    # under motion: agrees with the splat-window rolling core
    pose = np.eye(4)
    pose[0, 3] = 0.5
    rs_mv = eng_m.resynthesize_rolling_shutter(pose)
    eng_s = TransferEngine(small_spec, small_spec, cfg, 8192,
                           fixed_bounds=True)
    eng_s.transfer_fast(win)
    rs_s = eng_s.resynthesize_rolling_shutter(pose)
    m1, m2 = np.asarray(rs_mv.mask), np.asarray(rs_s.mask)
    assert (m1 == m2).mean() > 0.98
    both = m1 & m2
    dr = np.abs(np.asarray(rs_mv.range) - np.asarray(rs_s.range))[both]
    assert np.median(dr) < 0.5 * cfg.voxel_size
    same = (np.asarray(rs_mv.label) == np.asarray(rs_s.label))[both]
    assert same.mean() > 0.98

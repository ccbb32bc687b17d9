"""TSDF fusion + TSDF raycast tests.

Gate 4 of SURVEY.md §7: Pallas/XLA fusion vs numpy reference oracle on
synthetic scenes; raycast validated against the analytic scene geometry
(stronger than the reference's assert-nothing smoke test,
raytracing.py:229-276).
"""

import numpy as np
import jax.numpy as jnp

from lidar_transfer_tpu.datasets import kitti, synthetic
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops import raycast as RC
from lidar_transfer_tpu.ops import tsdf as TS


def small_volume():
    bounds = np.array([[-16.0, 16.0], [-16.0, 16.0], [-4.0, 4.0]])
    return TS.VolumeSpec.from_bounds(bounds, voxel_size=0.25)


def test_volume_spec_dims():
    spec = small_volume()
    assert spec.dims == (128, 128, 32)
    assert spec.trunc_margin == 1.25
    np.testing.assert_allclose(spec.bounds[:, 0], [-16, -16, -4])


def test_integrate_matches_numpy_oracle(rng):
    spec = TS.VolumeSpec.from_bounds(
        np.array([[-8.0, 8.0], [-8.0, 8.0], [-2.0, 2.0]]), 0.5)
    H, W = 16, 64
    fovu, fovd = 8.0, -22.0

    depth = (rng.random((H, W)) * 10 + 1).astype(np.float32)
    depth[rng.random((H, W)) < 0.2] = 0.0  # holes
    label = rng.choice(np.array([10, 40, 50], np.int32), size=(H, W))
    rem = rng.random((H, W)).astype(np.float32)

    state = spec.init_state()
    t, w, l, r = (np.asarray(state.tsdf), np.asarray(state.weight),
                  np.asarray(state.label), np.asarray(state.rem))
    for i in range(3):
        d2 = np.roll(depth, i, axis=1)
        l2 = np.roll(label, i, axis=1)
        r2 = np.roll(rem, i, axis=1)
        state = TS.integrate(state, spec, jnp.asarray(d2),
                             jnp.asarray(l2), jnp.asarray(r2),
                             fov_up_deg=fovu, fov_down_deg=fovd)
        t, w, l, r = TS.integrate_reference_numpy(
            t, w, l, r, spec, d2, l2, r2, fovu, fovd)

    np.testing.assert_allclose(np.asarray(state.tsdf), t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.weight), w, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(state.label), l)
    np.testing.assert_allclose(np.asarray(state.rem), r, atol=1e-5)


def test_class_aware_update_rule():
    """Unit checks of the reference's quirky merge rule
    (fusion_lidar.py:191-228 — weight doubles as dist_old)."""
    spec = TS.VolumeSpec.from_bounds(
        np.array([[0.0, 4.0], [-2.0, 2.0], [-2.0, 2.0]]), 0.5)
    H, W = 8, 32
    fovu, fovd = 45.0, -45.0

    # a wall at x≈2m straight ahead
    depth = np.full((H, W), 2.0, np.float32)
    label = np.full((H, W), 50, np.int32)
    rem = np.full((H, W), 0.5, np.float32)

    state = spec.init_state()
    state = TS.integrate(state, spec, jnp.asarray(depth), jnp.asarray(label),
                         jnp.asarray(rem), fov_up_deg=fovu, fov_down_deg=fovd)
    tsdf = np.asarray(state.tsdf)
    weight = np.asarray(state.weight)

    # first observation: only behind-surface voxels (dist<0) get written,
    # since dist_old == weight == 0 on untouched voxels
    written = tsdf < 1.0
    assert written.any()
    assert (tsdf[written] < 0).all()
    assert (weight == 0).all()  # diff-class writes never bump the weight

    # same-class second pass: weighted average kicks in, weights increment
    state2 = TS.integrate(state, spec, jnp.asarray(depth),
                          jnp.asarray(label), jnp.asarray(rem),
                          fov_up_deg=fovu, fov_down_deg=fovd)
    w2 = np.asarray(state2.weight)
    assert (w2 > 0).any()

    # different-class closer observation overwrites label
    depth3 = np.full((H, W), 1.2, np.float32)
    label3 = np.full((H, W), 10, np.int32)
    state3 = TS.integrate(state2, spec, jnp.asarray(depth3),
                          jnp.asarray(label3), jnp.asarray(rem),
                          fov_up_deg=fovu, fov_down_deg=fovd)
    l3 = np.asarray(state3.label)
    assert (l3 == 10).any()


def fuse_synthetic(scene, spec_sensor, vol):
    """Project one synthetic scan and fuse it."""
    pts, rem, lbl = synthetic.simulate_scan(scene, spec_sensor, np.eye(4))
    cap = kitti.scan_capacity(pts.shape[0])
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=spec_sensor.H, W=spec_sensor.W,
                         fov_up_deg=spec_sensor.fov_up,
                         fov_down_deg=spec_sensor.fov_down)
    state = vol.init_state()
    state = TS.integrate(state, vol, ri.range, ri.label,
                         jnp.maximum(ri.remission, 0.0),
                         fov_up_deg=spec_sensor.fov_up,
                         fov_down_deg=spec_sensor.fov_down)
    return state, ri


def test_raycast_matches_analytic_scene(scene, small_spec):
    """Fuse one scan, re-raycast with the same sensor: ranges must match the
    analytic scene within a few voxels, labels must agree almost everywhere.
    """
    vol = small_volume()
    state, ri = fuse_synthetic(scene, small_spec, vol)

    rays = RC.generate_rays(small_spec.H, small_spec.W, small_spec.fov_up,
                            small_spec.fov_down)
    res = RC.raycast_tsdf(state, vol, jnp.asarray(rays),
                          jnp.zeros(3, jnp.float32),
                          small_spec.H, small_spec.W)

    t_true, lbl_true = synthetic.raycast_scene(
        scene, np.zeros((rays.shape[0], 3)), rays.astype(np.float64))
    t_true = t_true.reshape(small_spec.H, small_spec.W)
    lbl_true = lbl_true.reshape(small_spec.H, small_spec.W)

    hit = np.asarray(res.hit)
    rng_j = np.asarray(res.range)
    lbl_j = np.asarray(res.label)

    # only compare where analytic geometry is inside the fused volume
    inside = np.isfinite(t_true) & (t_true < 14.0)
    both = hit & inside
    assert both.sum() > 0.5 * inside.sum()

    err = np.abs(rng_j[both] - t_true[both])
    # The TSDF surface band bulges ~1 voxel laterally at oblique incidence
    # (projection quantization), so along-ray error scales with
    # 1/sin(incidence) — the reference's marching-cubes level-0 surface sits
    # in exactly the same place. Gate at a few voxels:
    assert np.median(err) < 3.0 * vol.voxel_size
    assert (err < 8 * vol.voxel_size).mean() > 0.9

    agree = (lbl_j[both] == lbl_true[both]).mean()
    assert agree > 0.9

    # rays leaving the volume without surface must be misses
    sky = ~np.isfinite(t_true.reshape(-1))
    assert (~np.asarray(res.hit).reshape(-1)[sky]).mean() > 0.95


def test_generate_rays_matches_reverse_projection():
    """A ray through pixel center must land near reverse_project's direction
    for the same pixel grid (consistency between synthesis and projection)."""
    H, W = 16, 64
    rays = RC.generate_rays(H, W, 8.0, -22.0).reshape(H, W, 3)
    norms = np.linalg.norm(rays, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    # first row points up at fov_up, last row at fov_down
    pitch = np.rad2deg(np.arcsin(rays[:, 0, 2]))
    np.testing.assert_allclose(pitch[0], 8.0, atol=1e-4)
    np.testing.assert_allclose(pitch[-1], -22.0, atol=1e-4)


def test_occupancy_grid():
    tsdf = jnp.ones((16, 16, 16))
    tsdf = tsdf.at[8, 8, 8].set(-0.5)
    occ = np.asarray(RC.occupancy_grid(tsdf, block=4))
    assert occ.shape == (4, 4, 4)
    assert occ[2, 2, 2]
    # dilation marks the 3^3 neighborhood
    assert occ[1, 2, 2] and occ[3, 2, 2] and occ[2, 1, 2]
    assert not occ[0, 0, 0]


def test_compact_state_matches_f32(small_spec):
    """bf16/int16 compact volumes must agree with f32 within bf16 quantization
    (labels exactly) on a real fuse+raycast cycle."""
    import jax.numpy as jnp
    import numpy as np

    from lidar_transfer_tpu.ops import raycast as RC
    from lidar_transfer_tpu.ops import tsdf as TS

    rng = np.random.default_rng(11)
    H, W = 16, 128
    depth = rng.uniform(3.0, 12.0, (H, W)).astype(np.float32)
    label = rng.integers(1, 30, (H, W)).astype(np.int32)
    rem = rng.uniform(0, 1, (H, W)).astype(np.float32)
    spec = TS.VolumeSpec(origin=(-14.0, -14.0, -3.0), voxel_size=0.25,
                         dims=(112, 112, 24))

    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0)
    s32 = TS.integrate(spec.init_state(), spec,
                       jnp.asarray(depth), jnp.asarray(label),
                       jnp.asarray(rem), **kw)
    s16 = TS.integrate(spec.init_state_compact(), spec,
                       jnp.asarray(depth), jnp.asarray(label),
                       jnp.asarray(rem), **kw)
    assert s16.tsdf.dtype == jnp.bfloat16
    assert s16.label.dtype == jnp.int16
    np.testing.assert_array_equal(np.asarray(s16.label, np.int32),
                                  np.asarray(s32.label))
    np.testing.assert_allclose(np.asarray(s16.tsdf, np.float32),
                               np.asarray(s32.tsdf), atol=0.01)

    rays = RC.generate_rays(16, 128, 8.0, -22.0)
    r32 = RC.raycast_tsdf(s32, spec, jnp.asarray(rays), np.zeros(3),
                          H=16, W=128)
    r16 = RC.raycast_tsdf(s16, spec, jnp.asarray(rays), np.zeros(3),
                          H=16, W=128)
    assert r16.label.dtype == jnp.int32
    agree = np.asarray(r16.hit) == np.asarray(r32.hit)
    assert agree.mean() > 0.99
    both = np.asarray(r16.hit) & np.asarray(r32.hit)
    np.testing.assert_allclose(np.asarray(r16.range)[both],
                               np.asarray(r32.range)[both], atol=0.05)
    same_lbl = (np.asarray(r16.label)[both] ==
                np.asarray(r32.label)[both])
    assert same_lbl.mean() > 0.99


def test_integrate_write_weight_false(rng):
    """XLA integrate: write_weight=False leaves weight untouched and all
    other volumes identical to the full write (both chunked and single)."""
    spec = TS.VolumeSpec.from_bounds(
        np.array([[-8.0, 8.0], [-8.0, 8.0], [-2.0, 2.0]]), 0.5)
    H, W = 16, 64
    depth = (rng.random((H, W)) * 10 + 1).astype(np.float32)
    label = rng.choice(np.array([10, 40, 50], np.int32), size=(H, W))
    rem = rng.random((H, W)).astype(np.float32)
    kw = dict(fov_up_deg=8.0, fov_down_deg=-22.0)

    for x_chunk in (None, 8):
        full = TS.integrate(spec.init_state(), spec, jnp.asarray(depth),
                            jnp.asarray(label), jnp.asarray(rem),
                            x_chunk=x_chunk, **kw)
        slim = TS.integrate(spec.init_state(), spec, jnp.asarray(depth),
                            jnp.asarray(label), jnp.asarray(rem),
                            x_chunk=x_chunk, write_weight=False, **kw)
        np.testing.assert_array_equal(np.asarray(slim.label),
                                      np.asarray(full.label))
        np.testing.assert_allclose(np.asarray(slim.tsdf),
                                   np.asarray(full.tsdf), atol=1e-6)
        np.testing.assert_allclose(np.asarray(slim.rem),
                                   np.asarray(full.rem), atol=1e-6)
        np.testing.assert_array_equal(np.asarray(slim.weight), 0.0)


def test_occupancy_from_points_covers_all_touched_voxels(rng):
    """The point-derived occupancy must be a SUPERSET of the integrate's
    touched cells (else the raymarcher forces tsdf=1 inside written band
    voxels and silently misses crossings). Uses a coarse-beam image so
    the pixel cone's LATERAL footprint matters — the regression the
    trunc-only dilation radius missed at long range."""
    spec = TS.VolumeSpec.from_bounds(
        np.array([[-16.0, 16.0], [-16.0, 16.0], [-4.0, 4.0]]), 0.1)
    # very coarse rows (7.5 deg) + fine voxels: the lateral footprint at
    # range (~2 m at 16 m) far exceeds the trunc-only dilation (was 108
    # touched cells outside the old occupancy in this exact regime)
    H, W = 4, 32
    fovu, fovd = 10.0, -20.0

    depth = (rng.random((H, W)) * 14 + 1.5).astype(np.float32)
    depth[rng.random((H, W)) < 0.15] = 0.0
    label = rng.integers(1, 30, (H, W)).astype(np.int32)
    rem = rng.random((H, W)).astype(np.float32)

    state = TS.integrate(
        TS.VolumeSpec.init_state(spec), spec, jnp.asarray(depth),
        jnp.asarray(label), jnp.asarray(rem),
        fov_up_deg=fovu, fov_down_deg=fovd, reset=True)
    block = 4
    touched = np.asarray(state.tsdf) < 0.9999
    cx, cy, cz = (-(-d // block) for d in spec.dims)
    pad = [(0, (-d) % block) for d in spec.dims]
    coarse_touched = np.pad(touched, pad).reshape(
        cx, block, cy, block, cz, block).any(axis=(1, 3, 5))

    # back-project the image to its winning points (what the engine does)
    ri = P.RangeImage(
        range=jnp.asarray(depth), index=jnp.where(depth > 0, 0, -1),
        remission=jnp.asarray(rem), label=jnp.asarray(label),
        u_float=(jnp.arange(W, dtype=jnp.float32)[None, :]
                 + 0.5) * jnp.ones((H, 1)),
        v_float=(jnp.arange(H, dtype=jnp.float32)[:, None]
                 + 0.5) * jnp.ones((1, W)),
        point_valid=jnp.ones((H * W,), bool),
        point_u=jnp.zeros((H * W,), jnp.int32),
        point_v=jnp.zeros((H * W,), jnp.int32),
        point_depth=jnp.asarray(depth).reshape(-1))
    pts = P.reverse_project(ri, fov_up_deg=fovu, fov_down_deg=fovd,
                            preserve_float=True)
    pixel_angle = np.deg2rad(fovu - fovd) / H
    occ = np.asarray(RC.occupancy_from_points(
        pts, jnp.asarray(depth).reshape(-1) > 0,
        jnp.asarray(spec.origin), spec, block=block,
        pixel_angle_rad=float(pixel_angle)))

    missing = coarse_touched & ~occ
    assert not missing.any(), (
        f"{missing.sum()} touched coarse cells outside the occupancy")

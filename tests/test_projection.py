"""Projection op tests.

Includes a from-scratch numpy oracle of the reference's "depth" z-buffer loop
semantics (do_range_projection_new, laserscan.py:372-391) to verify pixel-
exact parity of the scatter-min implementation, plus the round-trip property
test the reference ships (auxiliary/test.py:47-57).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from lidar_transfer_tpu.datasets import kitti, synthetic
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops import transforms as T


def numpy_zbuffer_oracle(points, remissions, labels, H, W,
                         fov_up_deg, fov_down_deg, beam_angles=None):
    """Per-point loop with the reference's exact update rule:
    overwrite iff (depth < current) or pixel empty."""
    fov_up = np.deg2rad(fov_up_deg)
    fov_down = np.deg2rad(fov_down_deg)
    fov = abs(fov_up) + abs(fov_down)

    depth = np.linalg.norm(points, axis=1)
    keep = depth != 0
    points, remissions, labels, depth = (points[keep], remissions[keep],
                                         labels[keep], depth[keep])
    yaw = -np.arctan2(points[:, 1], points[:, 0])
    pitch = np.arcsin(points[:, 2] / depth)
    if beam_angles is not None:
        ba = np.asarray(beam_angles)
        pitch = ba[np.argmin(np.abs(pitch[:, None] - ba[None, :]), axis=1)]
    u = 0.5 * (yaw / np.pi + 1.0)
    v = 1.0 - (pitch + abs(fov_down)) / fov
    keep = (v >= 0) & (v <= 1)
    u, v, depth, remissions, labels = (u[keep], v[keep], depth[keep],
                                       remissions[keep], labels[keep])
    uf, vf = u * W, v * H
    px = np.clip(np.floor(uf), 0, W - 1).astype(np.int32)
    py = np.clip(np.floor(vf), 0, H - 1).astype(np.int32)

    rng = np.zeros((H, W), np.float32)
    idx = np.full((H, W), -1, np.int32)
    rem = np.full((H, W), -1.0, np.float32)
    lbl = np.zeros((H, W), np.int32)
    for i in range(len(depth)):
        y, x = py[i], px[i]
        if depth[i] < rng[y, x] or idx[y, x] == -1:
            rng[y, x] = depth[i]
            idx[y, x] = i
            rem[y, x] = remissions[i]
            lbl[y, x] = labels[i]
    return rng, idx, rem, lbl, keep


def random_cloud(rng, n, seed_labels=(0, 10, 40, 50, 71)):
    pts = rng.normal(size=(n, 3)).astype(np.float32) * np.array(
        [20.0, 20.0, 2.0], np.float32)
    rem = rng.random(n).astype(np.float32)
    lbl = rng.choice(np.array(seed_labels, np.int32), size=n)
    return pts, rem, lbl


@pytest.mark.parametrize("H,W,fovs", [(16, 256, (8.0, -22.0)),
                                      (64, 1024, (3.0, -25.0))])
def test_zbuffer_parity_random(rng, H, W, fovs):
    """Scatter-min projection matches the reference loop pixel-exactly."""
    pts, rem, lbl = random_cloud(rng, 20000)
    o_rng, o_idx, o_rem, o_lbl, _ = numpy_zbuffer_oracle(
        pts, rem, lbl, H, W, *fovs)

    cap = kitti.scan_capacity(pts.shape[0])
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W,
                         fov_up_deg=fovs[0], fov_down_deg=fovs[1])

    # np and XLA libm (arcsin/arctan2) differ by ULPs, which can flip a
    # point sitting exactly on a pixel floor() boundary into the adjacent
    # pixel. Allow a vanishing fraction of such boundary flips; everything
    # else must match the oracle exactly.
    n_pix = H * W
    mask_flips = (np.asarray(ri.mask) != (o_idx >= 0)).sum()
    assert mask_flips <= max(2, n_pix // 10000)

    rng_j = np.asarray(ri.range)
    close = np.isclose(rng_j, o_rng, rtol=1e-5, atol=1e-4)
    assert (~close).sum() <= max(2, n_pix // 10000)
    lbl_flips = (np.asarray(ri.label) != o_lbl).sum()
    assert lbl_flips <= max(2, n_pix // 10000)
    rem_close = np.isclose(np.asarray(ri.remission), o_rem, rtol=1e-5,
                           atol=1e-5)
    assert (~rem_close).sum() <= max(2, n_pix // 10000)


def test_zbuffer_depth_ties(rng):
    """Equal-depth collisions: first point in original order must win."""
    H, W = 4, 8
    # two identical points (same pixel, same depth) with different labels
    pts = np.array([[5.0, 0.0, 0.0], [5.0, 0.0, 0.0], [3.0, 0.0, 0.0]],
                   np.float32)
    rem = np.array([0.1, 0.2, 0.3], np.float32)
    lbl = np.array([10, 50, 40], np.int32)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, 8)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W, fov_up_deg=10.0,
                         fov_down_deg=-10.0)
    lbl_img = np.asarray(ri.label)
    # the nearer point (depth 3, label 40) wins the pixel
    assert (lbl_img == 40).sum() == 1
    assert (lbl_img == 50).sum() == 0  # tie lost to first point, then both
    # lost to the closer point; check tie alone:
    pts2 = pts[:2]
    p, r, l, m = kitti.pad_points(pts2, rem[:2], lbl[:2], 8)
    ri2 = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                          jnp.asarray(m), H=H, W=W, fov_up_deg=10.0,
                          fov_down_deg=-10.0)
    assert (np.asarray(ri2.label) == 10).sum() == 1
    assert (np.asarray(ri2.label) == 50).sum() == 0


def test_beam_angle_snapping(rng):
    """Beam snapping matches the per-point argmin oracle."""
    H, W = 8, 64
    beam_angles = np.deg2rad(np.linspace(-20.0, 6.0, H))
    pts, rem, lbl = random_cloud(rng, 5000)
    o_rng, o_idx, _, o_lbl, _ = numpy_zbuffer_oracle(
        pts, rem, lbl, H, W, 6.0, -20.0, beam_angles)
    cap = kitti.scan_capacity(pts.shape[0])
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=H, W=W, fov_up_deg=6.0,
                         fov_down_deg=-20.0,
                         beam_angles=jnp.asarray(beam_angles))
    # allow rare ULP boundary flips (see test_zbuffer_parity_random)
    close = np.isclose(np.asarray(ri.range), o_rng, rtol=1e-5, atol=1e-4)
    assert (~close).sum() <= 2
    assert (np.asarray(ri.label) != o_lbl).sum() <= 2


def test_project_unproject_roundtrip():
    """≡ reference auxiliary/test.py:47-57 round-trip property."""
    points = np.array([[1, 0, 0], [0, 0, 1], [1, 1, 1], [2, 2, 2]],
                      np.float64)
    fov_up, fov_down = 10.0, -10.0
    u, v, depth = P.project_uv(jnp.asarray(points), fov_up, fov_down)
    u, v, depth = np.asarray(u), np.asarray(v), np.asarray(depth)

    fov = np.deg2rad(abs(fov_up) + abs(fov_down))
    yaw = (u * 2 - 1.0) * np.pi
    pitch = np.pi / 2 - (fov - v * fov - np.deg2rad(abs(fov_down)))
    rec = np.stack([depth * np.sin(pitch) * np.cos(-yaw),
                    depth * np.sin(pitch) * np.sin(-yaw),
                    depth * np.cos(pitch)], axis=-1)
    np.testing.assert_allclose(rec, points, atol=1e-5)


def test_reverse_projection_preserve_float(rng, small_spec):
    """preserve_float back-projection reconstructs winning points exactly
    (up to float32) — quantized back-projection lands on pixel rays."""
    scene = synthetic.Scene.default()
    pose = np.eye(4)
    pts, rem, lbl = synthetic.simulate_scan(scene, small_spec, pose)
    cap = kitti.scan_capacity(pts.shape[0])
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    ri = P.range_project(jnp.asarray(p), jnp.asarray(r), jnp.asarray(l),
                         jnp.asarray(m), H=small_spec.H, W=small_spec.W,
                         fov_up_deg=small_spec.fov_up,
                         fov_down_deg=small_spec.fov_down)
    back = np.asarray(P.reverse_project(
        ri, fov_up_deg=small_spec.fov_up, fov_down_deg=small_spec.fov_down,
        preserve_float=True)).reshape(small_spec.H, small_spec.W, 3)
    mask = np.asarray(ri.mask)
    idx = np.asarray(ri.index)
    winners = p[np.where(mask, idx, 0)]
    err = np.linalg.norm(back - winners, axis=-1)
    assert err[mask].max() < 1e-3
    # no-data pixels map to the origin
    np.testing.assert_allclose(back[~mask], 0.0, atol=1e-6)


def test_mask_classes():
    lbl = jnp.asarray(np.array([0, 1, 10, 40, 252], np.int32))
    valid = jnp.ones(5, bool)
    out = np.asarray(P.mask_classes(lbl, valid, (0, 1)))
    np.testing.assert_array_equal(out, [False, False, True, True, True])


def test_transform_roundtrip(rng):
    pts = jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32))
    ang = 0.3
    pose = np.array([[np.cos(ang), -np.sin(ang), 0, 1.0],
                     [np.sin(ang), np.cos(ang), 0, -2.0],
                     [0, 0, 1, 0.5],
                     [0, 0, 0, 1]], np.float32)
    pose = jnp.asarray(pose)
    out = T.transform_points(T.transform_points(pts, pose),
                             T.inverse_pose(pose))
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts), atol=1e-5)


def test_sort_and_segment_methods_identical(rng, small_spec):
    """The sort-based z-buffer must match the two-pass segment-min
    exactly, including collision tie-breaks (lots of duplicate pixels)."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.ops import projection as P

    n = 20000
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    rem = rng.uniform(0, 1, n).astype(np.float32)
    lbl = rng.integers(0, 30, n).astype(np.int32)
    val = rng.random(n) > 0.1
    # force heavy collisions: duplicate 30% of the points exactly
    dup = rng.integers(0, n, n // 3)
    pts[dup] = pts[(dup + 1) % n]

    kw = dict(H=small_spec.H, W=small_spec.W,
              fov_up_deg=small_spec.fov_up,
              fov_down_deg=small_spec.fov_down)
    a = P.range_project(jnp.asarray(pts), jnp.asarray(rem),
                        jnp.asarray(lbl), jnp.asarray(val),
                        method="sort", **kw)
    b = P.range_project(jnp.asarray(pts), jnp.asarray(rem),
                        jnp.asarray(lbl), jnp.asarray(val),
                        method="segment", **kw)
    np.testing.assert_array_equal(np.asarray(a.index), np.asarray(b.index))
    np.testing.assert_array_equal(np.asarray(a.range), np.asarray(b.range))
    np.testing.assert_array_equal(np.asarray(a.label), np.asarray(b.label))


def test_beam_rows_requires_matching_height(rng):
    """beam_rows assigns row = nearest beam: an image height that does
    not match the beam table must raise instead of silently dropping
    points into the overflow segment."""
    import jax.numpy as jnp
    import pytest

    from lidar_transfer_tpu.ops import projection as P

    n = 100
    pts = jnp.asarray(rng.uniform(-20, 20, (n, 3)).astype(np.float32))
    val = jnp.ones((n,), bool)
    beams = jnp.linspace(0.1, -0.4, 8)          # 8 beams
    kw = dict(fov_up_deg=5.0, fov_down_deg=-25.0,
              beam_angles=beams, beam_rows=True)
    with pytest.raises(ValueError, match="beam"):
        P.project_winner_order(pts, val, H=16, W=64, **kw)  # H != 8
    with pytest.raises(ValueError, match="beam"):
        P.range_project(pts, pts[:, 0], jnp.zeros((n,), jnp.int32),
                        val, H=16, W=64, **kw)
    # matching height is fine
    P.project_winner_order(pts, val, H=8, W=64, **kw)

"""Differential fuzzing across independent implementations.

Every hot op in the framework has at least two independent
implementations (XLA / Pallas-interpret / numpy oracle / scatter oracle /
sort-vs-segment). These tests sweep randomized geometries and inputs and
require the implementations to agree — the strongest cheap evidence that
the TPU-native formulations preserve the reference semantics.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lidar_transfer_tpu.ops import tsdf as TS
from lidar_transfer_tpu.ops.tsdf_pallas import integrate_pallas, supports


def _pixel_boundary_dist(pw, fov_up, fov_down, H, W):
    """Min angular distance (rad) of a world point to ANY projection
    quantization boundary: the FOV edges, the H row boundaries, and the
    W column boundaries. Voxels within float epsilon of one are
    measure-zero ambiguities — f32-vs-f64 rounding or the pallas
    kernel's minimax atan (~1e-5 rad) can flip which pixel they read,
    which changes the fused value by O(1) legitimately."""
    d = max(np.linalg.norm(pw), 1e-12)
    pitch = np.arcsin(pw[2] / d)
    yaw = -np.arctan2(pw[1], pw[0])
    fov = np.deg2rad(abs(fov_up) + abs(fov_down))
    v = (1.0 - (pitch + abs(np.deg2rad(fov_down))) / fov) * H
    u = 0.5 * (yaw / np.pi + 1.0) * W
    dv = abs(v - round(v)) * fov / H          # rows -> rad
    du = abs(u - round(u)) * 2.0 * np.pi / W  # cols -> rad
    edge = min(abs(pitch - np.deg2rad(fov_up)),
               abs(pitch - np.deg2rad(fov_down)))
    return min(dv, du, edge)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_integrate_three_way(seed):
    """XLA integrate == Pallas(interpret) == numpy oracle on random
    volumes/images/fovs, accumulating over 2 fusions."""
    rng = np.random.default_rng(seed)
    dims = (int(rng.integers(4, 10)), 128, int(rng.integers(10, 40)))
    spec = TS.VolumeSpec(
        origin=tuple(rng.uniform(-15, -5, 3)),
        voxel_size=float(rng.uniform(0.15, 0.5)), dims=dims)
    H, W = int(rng.integers(8, 32)), int(rng.integers(64, 256))
    fov_up = float(rng.uniform(2, 15))
    fov_down = float(rng.uniform(-30, -10))
    assert supports(spec, H)

    xs = TS.TSDFState(jnp.ones(dims), jnp.zeros(dims),
                      jnp.zeros(dims, jnp.int32), jnp.zeros(dims))
    ps = TS.TSDFState(jnp.ones(dims), jnp.zeros(dims),
                      jnp.zeros(dims, jnp.int32), jnp.zeros(dims))
    nt = np.ones(dims, np.float32)
    nw = np.zeros(dims, np.float32)
    nl = np.zeros(dims, np.int32)
    nr = np.zeros(dims, np.float32)

    for k in range(2):
        depth = (rng.uniform(1.0, 25.0, (H, W))
                 * (rng.random((H, W)) > 0.15)).astype(np.float32)
        label = rng.integers(0, 40, (H, W)).astype(np.int32)
        rem = rng.uniform(0, 1, (H, W)).astype(np.float32)
        kw = dict(fov_up_deg=fov_up, fov_down_deg=fov_down)
        xs = TS.integrate(xs, spec, jnp.asarray(depth),
                          jnp.asarray(label), jnp.asarray(rem), **kw)
        ps = integrate_pallas(ps, spec, jnp.asarray(depth),
                              jnp.asarray(label), jnp.asarray(rem),
                              reset=False, interpret=True, **kw)
        nt, nw, nl, nr = TS.integrate_reference_numpy(
            nt, nw, nl, nr, spec, depth, label, rem, fov_up, fov_down)

    # XLA vs f64 numpy oracle: f32 projection arithmetic may flip the
    # row/col of a voxel sitting on a pixel boundary (a 60-seed soak
    # found ~1 voxel per ~40k at < 1e-6 rad of a row boundary); any
    # disagreeing voxel must be ON such a boundary and rare
    lx, ln_ = np.asarray(xs.label), nl
    mism_o = np.argwhere(lx != ln_)
    for ijk in mism_o:
        pw = (np.asarray(spec.origin)
              + np.asarray(ijk) * spec.voxel_size)
        bd = _pixel_boundary_dist(pw, fov_up, fov_down, H, W)
        assert bd < 3e-5, (ijk, bd)
    assert len(mism_o) <= 3
    ok_o = lx == ln_
    np.testing.assert_allclose(np.asarray(xs.tsdf)[ok_o], nt[ok_o],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(xs.rem)[ok_o], nr[ok_o],
                               atol=1e-5)

    # pallas vs XLA: the kernel's minimax atan/asin (~1e-5 rad) may
    # additionally flip pixel decisions in the same epsilon band
    la, lp = np.asarray(xs.label), np.asarray(ps.label)
    mism = np.argwhere(la != lp)
    for ijk in mism:
        pw = (np.asarray(spec.origin)
              + np.asarray(ijk) * spec.voxel_size)
        bd = _pixel_boundary_dist(pw, fov_up, fov_down, H, W)
        assert bd < 3e-5, (ijk, bd)
    assert len(mism) <= 3
    ok = la == lp
    np.testing.assert_allclose(np.asarray(xs.tsdf)[ok],
                               np.asarray(ps.tsdf)[ok], atol=1e-5)
    # pallas remission rides the 14-bit packed channel
    np.testing.assert_allclose(np.asarray(xs.rem)[ok],
                               np.asarray(ps.rem)[ok], atol=2e-4)


@pytest.mark.parametrize("seed", [11, 12, 13, 14])
def test_projection_sort_vs_segment_fuzz(seed):
    """Sort z-buffer == two-pass segment-min on random clouds with
    duplicates, random fovs/dims (incl. beam snapping)."""
    from lidar_transfer_tpu.ops import projection as P

    rng = np.random.default_rng(seed)
    n = int(rng.integers(2000, 30000))
    pts = rng.uniform(-25, 25, (n, 3)).astype(np.float32)
    dup = rng.integers(0, n, n // 4)
    pts[dup] = pts[(dup + 3) % n]
    rem = rng.uniform(0, 1, n).astype(np.float32)
    lbl = rng.integers(0, 50, n).astype(np.int32)
    val = rng.random(n) > 0.05
    H = int(rng.integers(8, 64))
    W = int(rng.integers(64, 512))
    ba = None
    if rng.random() > 0.5:
        ba = jnp.asarray(np.sort(rng.uniform(-0.5, 0.2, H)), jnp.float32)
    kw = dict(H=H, W=W, fov_up_deg=float(rng.uniform(2, 20)),
              fov_down_deg=float(rng.uniform(-30, -5)), beam_angles=ba)
    a = P.range_project(jnp.asarray(pts), jnp.asarray(rem),
                        jnp.asarray(lbl), jnp.asarray(val),
                        method="sort", **kw)
    b = P.range_project(jnp.asarray(pts), jnp.asarray(rem),
                        jnp.asarray(lbl), jnp.asarray(val),
                        method="segment", **kw)
    np.testing.assert_array_equal(np.asarray(a.index), np.asarray(b.index))
    np.testing.assert_array_equal(np.asarray(a.label), np.asarray(b.label))
    np.testing.assert_array_equal(np.asarray(a.range), np.asarray(b.range))


@pytest.mark.parametrize("seed", [21, 22, 23])
def test_confusion_three_way_fuzz(seed):
    from lidar_transfer_tpu.metrics import confusion as C

    rng = np.random.default_rng(seed)
    n = int(rng.integers(100, 50000))
    ncls = int(rng.integers(2, 300))
    p = rng.integers(-2, ncls + 5, n).astype(np.int32)   # incl. out-of-range
    t = rng.integers(-2, ncls + 5, n).astype(np.int32)
    a = np.asarray(C.confusion_scatter(p, t, ncls))
    b = np.asarray(C.confusion_onehot(p, t, ncls))
    c = np.asarray(C.confusion_pallas(p, t, ncls, tile=1024,
                                      interpret=True))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_winner_flags_vs_image_zbuffer(seed):
    """project_winners / project_winner_order must select EXACTLY the
    image z-buffer's winner set over random geometries — including
    duplicate depths (exact-tie stability) and out-of-FOV points."""
    from lidar_transfer_tpu.ops import projection as P

    rng = np.random.default_rng(seed)
    n = int(rng.integers(500, 4000))
    H, W = int(rng.integers(4, 32)), int(rng.integers(32, 256))
    fov_up = float(rng.uniform(2, 15))
    fov_down = float(rng.uniform(-30, -10))
    pts = rng.uniform(-30, 30, (n, 3)).astype(np.float32)
    # force exact depth ties: duplicate a slice of points verbatim
    k = n // 5
    pts[n - k:] = pts[:k]
    valid = rng.random(n) > 0.1
    rem = rng.uniform(0, 1, n).astype(np.float32)
    lbl = rng.integers(1, 40, n).astype(np.int32)

    ri = P.range_project(jnp.asarray(pts), jnp.asarray(rem),
                         jnp.asarray(lbl), jnp.asarray(valid),
                         H=H, W=W, fov_up_deg=fov_up,
                         fov_down_deg=fov_down)
    expect = np.zeros(n, bool)
    idx = np.asarray(ri.index).reshape(-1)
    expect[idx[idx >= 0]] = True

    is_winner, depth = P.project_winners(
        jnp.asarray(pts), jnp.asarray(valid), H=H, W=W,
        fov_up_deg=fov_up, fov_down_deg=fov_down)
    np.testing.assert_array_equal(np.asarray(is_winner), expect)

    si, is_first, _ = P.project_winner_order(
        jnp.asarray(pts), jnp.asarray(valid), H=H, W=W,
        fov_up_deg=fov_up, fov_down_deg=fov_down)
    got = np.zeros(n, bool)
    got[np.asarray(si)[np.asarray(is_first)]] = True
    np.testing.assert_array_equal(got, expect)

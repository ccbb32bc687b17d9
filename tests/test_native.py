"""Native C++ BVH raytracer: build, correctness, and parity vs the JAX caster.

The native engine (lidar_transfer_tpu/native/raytracer.cpp) is the
framework's counterpart of the reference's C++ ray engine
(auxiliary/raytracer/RayTracer.cpp + BVH.cpp); these tests mirror the
reference's hand-built-scene smoke test (auxiliary/raytracing.py:229-276)
but actually assert, and cross-check the JAX dense caster
(ops/triangles.py) against the native BVH on random scenes.
"""

import numpy as np
import pytest

from lidar_transfer_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable")


def _unit(v):
    v = np.asarray(v, np.float32)
    return v / np.linalg.norm(v)


def test_single_triangle_hit_and_miss():
    verts = np.array([[5.0, -1.0, -1.0], [5.0, 1.0, -1.0], [5.0, 0.0, 1.5]],
                     np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    labels = np.array([7, 8, 9], np.int32)
    rems = np.array([0.3, 0.6, 0.9], np.float32)
    rays = np.array([_unit([1, 0, 0]),      # through the centroid plane
                     _unit([-1, 0, 0]),     # away
                     _unit([0, 1, 0])],     # parallel miss
                    np.float32)
    res = native.trace_mesh(rays, np.zeros(3), verts, faces, labels, rems)
    assert res.hits == 1
    assert res.tri[0] == 0 and res.tri[1] == -1 and res.tri[2] == -1
    assert res.range[0] == pytest.approx(5.0, abs=1e-5)
    # vertex-0 label, mean remission (RayTracer.cpp:73-90, Triangle.h:63-70)
    assert res.labels[0] == 7
    assert res.remissions[0] == pytest.approx(0.6, abs=1e-6)
    np.testing.assert_allclose(res.endpoints[0], [5.0, 0.0, 0.0], atol=1e-5)
    assert res.range[1] == 0.0 and res.labels[1] == 0


def test_nearest_hit_wins():
    # two parallel triangles; the nearer one (listed second) must win
    def quad_tri(x):
        return np.array([[x, -2, -2], [x, 2, -2], [x, 0, 2]], np.float32)

    verts = np.concatenate([quad_tri(9.0), quad_tri(3.0)])
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    labels = np.array([1, 1, 1, 2, 2, 2], np.int32)
    rems = np.zeros(6, np.float32)
    res = native.trace_mesh(np.array([[1.0, 0, 0]], np.float32),
                            np.zeros(3), verts, faces, labels, rems)
    assert res.tri[0] == 1
    assert res.range[0] == pytest.approx(3.0, abs=1e-5)
    assert res.labels[0] == 2


def test_empty_mesh():
    res = native.trace_mesh(np.array([[1.0, 0, 0]], np.float32),
                            np.zeros(3),
                            np.zeros((0, 3), np.float32),
                            np.zeros((0, 3), np.int32),
                            np.zeros((0,), np.int32),
                            np.zeros((0,), np.float32))
    assert res.hits == 0
    assert res.tri[0] == -1


def _random_scene(rng, n_tris=300, spread=8.0):
    centers = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    offsets = rng.normal(0, 0.6, (n_tris, 3, 3)).astype(np.float32)
    tris = centers[:, None, :] + offsets
    verts = tris.reshape(-1, 3)
    faces = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    labels = rng.integers(1, 20, verts.shape[0]).astype(np.int32)
    rems = rng.uniform(0, 1, verts.shape[0]).astype(np.float32)
    return verts, faces, labels, rems


def test_parity_with_jax_caster():
    """Native BVH vs the dense JAX Möller–Trumbore sweep on a random soup:
    identical hit masks, matching t (the BVH and the dense sweep must find
    the same nearest surface) and matching attributes."""
    from lidar_transfer_tpu.ops.triangles import (mesh_hit_attributes,
                                                  raycast_mesh)

    rng = np.random.default_rng(12345)
    verts, faces, labels, rems = _random_scene(rng)
    dirs = rng.normal(size=(800, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    origin = np.zeros(3, np.float32)

    nat = native.trace_mesh(dirs, origin, verts, faces, labels, rems)
    jx = raycast_mesh(origin, dirs, verts[faces], chunk=128)
    jt = np.where(np.asarray(jx.hit), np.asarray(jx.t), 0.0)

    np.testing.assert_array_equal(nat.tri >= 0, np.asarray(jx.hit))
    np.testing.assert_allclose(nat.range, jt, rtol=1e-4, atol=1e-4)

    # attributes agree wherever both engines picked the same triangle
    # (exact-tie rays may legitimately differ in winner)
    jl, jr = mesh_hit_attributes(jx, faces, labels, rems)
    same = nat.tri == np.asarray(jx.tri)
    assert same.mean() > 0.99
    np.testing.assert_array_equal(nat.labels[same], jl[same])
    np.testing.assert_allclose(nat.remissions[same], jr[same], atol=1e-5)


def test_parity_with_tsdf_raymarcher():
    """Mesh extracted from a sphere TSDF, traced natively, must agree with
    the direct TSDF raymarcher (ops/raycast.py) to within a voxel."""
    import jax.numpy as jnp

    from lidar_transfer_tpu.ops.marching import marching_tetrahedra
    from lidar_transfer_tpu.ops.raycast import raycast_tsdf
    from lidar_transfer_tpu.ops.tsdf import TSDFState, VolumeSpec

    dims = (48, 48, 48)
    voxel = 0.25
    spec = VolumeSpec(origin=(-6.0, -6.0, -6.0), voxel_size=voxel, dims=dims)
    gx, gy, gz = np.meshgrid(*[np.arange(d) for d in dims], indexing="ij")
    pw = np.stack([spec.origin[0] + gx * voxel,
                   spec.origin[1] + gy * voxel,
                   spec.origin[2] + gz * voxel], -1)
    # sphere centered off-origin so the (0,0,0) ray origin is OUTSIDE the
    # surface: the TSDF marcher detects entering (+ -> -) crossings only,
    # mesh backface hits from inside are out of contract
    center = np.array([3.2, 0.0, 0.0])
    d = np.linalg.norm(pw - center, axis=-1) - 1.5
    tsdf = np.clip(d / (5 * voxel), -1, 1).astype(np.float32)

    tris_grid = marching_tetrahedra(tsdf, 0.0)
    tris_world = tris_grid * voxel + np.asarray(spec.origin, np.float32)
    verts = tris_world.reshape(-1, 3)
    faces = np.arange(verts.shape[0], dtype=np.int32).reshape(-1, 3)
    lab = np.full(verts.shape[0], 5, np.int32)
    rem = np.full(verts.shape[0], 0.5, np.float32)

    rng = np.random.default_rng(7)
    dirs = (rng.normal(size=(256, 3)) * 0.25 +
            np.array([1.0, 0.0, 0.0])).astype(np.float32)   # aim at sphere
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    nat = native.trace_mesh(dirs, np.zeros(3), verts, faces, lab, rem)

    state = TSDFState(tsdf=jnp.asarray(tsdf),
                      weight=jnp.ones(dims, jnp.float32),
                      label=jnp.full(dims, 5, jnp.int32),
                      rem=jnp.full(dims, 0.5, jnp.float32))
    res = raycast_tsdf(state, spec, jnp.asarray(dirs), np.zeros(3),
                       H=16, W=16)
    march_t = np.asarray(res.range).reshape(-1)

    nat_hit = nat.tri >= 0
    march_hit = march_t > 0
    # engines agree on hit/miss except at grazing angles
    assert (nat_hit == march_hit).mean() > 0.95
    both = nat_hit & march_hit
    assert both.mean() > 0.5        # aimed cone: most rays hit
    np.testing.assert_allclose(nat.range[both], march_t[both], atol=voxel)

"""Batched ray/triangle intersection (Möller–Trumbore, JAX).

Parity engine for the reference's triangle raycasters:
  - the legacy brute-force tracer (auxiliary/raytracing.py:17-227, numpy +
    inline CUDA, wiki-cited MT math at :191-227) — ours keeps the
    nearest-hit semantics of the main C++ engine rather than the CUDA
    kernel's first-hit ``break`` quirk (raytracing.py:150; SURVEY.md N10);
  - the C++ BVH engine's attribute conventions (RayTracer.cpp:73-90):
    hit "color"/label from triangle vertex 0, remission = mean of the 3
    vertex remissions (Triangle.h:63-70).

Structure: rays stay resident; triangles stream through in fixed-size
chunks under ``lax.scan`` with a running min-reduce over t — an
XLA-friendly dense sweep instead of BVH pointer chasing (SURVEY.md §2.2 N2:
"pointer-chasing is TPU-hostile"). Intended for parity tests and moderate
meshes; the production synthesis path marches the TSDF directly
(ops/raycast.py). A native C++ BVH oracle lives in native/ for CPU-side
verification of big meshes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-6  # ≡ Triangle.h eps


class MeshHits(NamedTuple):
    t: jax.Array       # (R,) f32 nearest-hit distance; inf = miss
    tri: jax.Array     # (R,) i32 triangle index; -1 = miss
    hit: jax.Array     # (R,) bool


def _mt_chunk(origins, dirs, v0, e1, e2):
    """MT test of all rays against one triangle chunk.
    origins/dirs (R,3); v0/e1/e2 (C,3) -> t (R,C) with inf for misses."""
    # pvec = dir x e2 : (R,C,3)
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])
    det = jnp.sum(pvec * e1[None, :, :], axis=-1)            # (R,C)
    inv_det = jnp.where(jnp.abs(det) > _EPS, 1.0 / det, 0.0)
    tvec = origins[:, None, :] - v0[None, :, :]              # (R,C,3)
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(qvec * dirs[:, None, :], axis=-1) * inv_det
    t = jnp.sum(qvec * e2[None, :, :], axis=-1) * inv_det
    ok = ((jnp.abs(det) > _EPS) & (u >= 0.0) & (v >= 0.0)
          & (u + v <= 1.0) & (t > _EPS))
    return jnp.where(ok, t, jnp.inf)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _raycast_mesh_impl(origins, dirs, verts0, edge1, edge2, chunk):
    T = verts0.shape[0]
    R = origins.shape[0]
    n_chunks = T // chunk

    v0c = verts0.reshape(n_chunks, chunk, 3)
    e1c = edge1.reshape(n_chunks, chunk, 3)
    e2c = edge2.reshape(n_chunks, chunk, 3)

    def step(carry, tri_chunk):
        best_t, best_i, base = carry
        v0, e1, e2 = tri_chunk
        t = _mt_chunk(origins, dirs, v0, e1, e2)             # (R, C)
        tmin = jnp.min(t, axis=1)
        imin = jnp.argmin(t, axis=1).astype(jnp.int32) + base
        closer = tmin < best_t
        best_t = jnp.where(closer, tmin, best_t)
        best_i = jnp.where(closer, imin, best_i)
        return (best_t, best_i, base + chunk), None

    init = (jnp.full((R,), jnp.inf, jnp.float32),
            jnp.full((R,), -1, jnp.int32),
            jnp.int32(0))
    (best_t, best_i, _), _ = jax.lax.scan(step, init, (v0c, e1c, e2c))
    hit = jnp.isfinite(best_t)
    return best_t, jnp.where(hit, best_i, -1), hit


def raycast_mesh(origins, dirs, triangles, chunk: int = 512) -> MeshHits:
    """Nearest-hit raycast of R rays against a triangle soup.

    Args:
      origins:   (R,3) or (3,) f32
      dirs:      (R,3) f32 unit directions
      triangles: (T,3,3) f32 triangle vertices
      chunk:     triangle chunk size (memory/throughput knob)
    """
    dirs = jnp.asarray(dirs, jnp.float32)
    R = dirs.shape[0]
    origins = jnp.broadcast_to(
        jnp.asarray(origins, jnp.float32).reshape(-1, 3), (R, 3))
    tri = np.asarray(triangles, np.float32)
    T = tri.shape[0]
    if T == 0:
        return MeshHits(t=jnp.full((R,), jnp.inf),
                        tri=jnp.full((R,), -1, jnp.int32),
                        hit=jnp.zeros((R,), bool))
    # pad to a chunk multiple with degenerate (never-hit) triangles
    pad = (-T) % chunk
    if pad:
        tri = np.concatenate([tri, np.zeros((pad, 3, 3), np.float32)])
    v0 = jnp.asarray(tri[:, 0])
    e1 = jnp.asarray(tri[:, 1] - tri[:, 0])
    e2 = jnp.asarray(tri[:, 2] - tri[:, 0])
    t, i, hit = _raycast_mesh_impl(origins, dirs, v0, e1, e2, chunk)
    # mask hits on padding (degenerate tris never pass the det test, but be
    # explicit)
    real = i < T
    return MeshHits(t=jnp.where(real, t, jnp.inf),
                    tri=jnp.where(real, i, -1), hit=hit & real)


def mesh_hit_attributes(hits: MeshHits, faces: np.ndarray,
                        vert_labels: np.ndarray, vert_rems: np.ndarray
                        ) -> tuple[np.ndarray, np.ndarray]:
    """Per-ray (label, remission) with the reference's conventions:
    label of vertex 0 (RayTracer.cpp:73-75), mean remission of the 3
    vertices (Triangle.h:63-70). Host-side numpy."""
    tri_idx = np.asarray(hits.tri)
    hit = np.asarray(hits.hit)
    safe = np.where(hit, tri_idx, 0)
    f = faces[safe]                                  # (R, 3)
    label = np.where(hit, vert_labels[f[:, 0]], 0)
    rem = np.where(hit, vert_rems[f].mean(axis=1), 0.0)
    return label.astype(np.int32), rem.astype(np.float32)

"""Rigid transforms on padded point sets (JAX).

Replaces the reference's homogeneous-matmul helpers
(auxiliary/laserscan.py:98-114 ``apply_transformation``/``apply_pose``/
``apply_inv_pose``) with batched, jit-friendly einsums.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_points(points: jax.Array, transform: jax.Array) -> jax.Array:
    """Apply a 4x4 (or (...,4,4)) homogeneous transform to (...,N,3) points.

    Broadcasts over leading batch dims: points (S,N,3) with transforms (S,4,4)
    transforms each scan by its own pose.
    """
    rot = transform[..., :3, :3]
    trans = transform[..., :3, 3]
    # precision="highest": pose math must stay true f32 — the default matmul
    # precision drops to bf16-class on TPU (and its emulation elsewhere),
    # which is a ~0.3% error on rotations, far above LiDAR noise.
    return (jnp.einsum("...ij,...nj->...ni", rot, points,
                       precision="highest")
            + trans[..., None, :])


def inverse_pose(pose: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid 4x4: [R t]^-1 = [R^T, -R^T t]."""
    rot = pose[..., :3, :3]
    trans = pose[..., :3, 3]
    inv_rot = jnp.swapaxes(rot, -1, -2)
    inv_trans = -jnp.einsum("...ij,...j->...i", inv_rot, trans,
                            precision="highest")
    inv = jnp.zeros_like(pose)
    inv = inv.at[..., :3, :3].set(inv_rot)
    inv = inv.at[..., :3, 3].set(inv_trans)
    inv = inv.at[..., 3, 3].set(1.0)
    return inv


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    """Matrix product a @ b with broadcasting over leading dims."""
    return jnp.einsum("...ij,...jk->...ik", a, b, precision="highest")

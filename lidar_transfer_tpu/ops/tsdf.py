"""Class-aware TSDF fusion of range images into a voxel volume (JAX).

TPU-native rebuild of the reference ``TSDFVolume`` + inline CUDA ``integrate``
kernel (auxiliary/fusion_lidar.py:21-392). Key observation: the update is a
pure *gather* — every voxel independently projects into the range image,
reads one pixel, and updates its own state. There are no scatter conflicts,
so the whole fusion is one fused elementwise+gather XLA kernel over the
HBM-resident volume (donated in-place buffers), vectorized over all voxels —
no grid-stride loops, no host↔device copies per call (the reference's
``cuda.InOut`` forced htod+dtoh on every integrate, fusion_lidar.py:274-283).

Parity notes (vs the CUDA kernel, fusion_lidar.py:66-229):
  - The reference packs the semantic label into a float "color" channel as
    ``label * 65536`` (laserscan.py:893-894 + fusion_lidar.py:263-264). That
    packing is bijective, and the kernel only ever *compares* colors for
    equality, so we store the integer label id directly — semantics are
    identical and the confusing float round-trip is gone.
  - The class-aware branch (kernel :191-228) reads ``weight_vol`` as
    ``dist_old`` when classes differ (kernel :198) — i.e. a *new* voxel
    (weight 0) is only written when dist < 0 (voxel behind the surface).
    This quirk is what makes the reference's volumes carve inside surfaces
    only; we reproduce it exactly (documented in SURVEY.md §7 "hard parts").
  - Vertical-FOV rejection compares radian pitch against radian fovs
    (kernel :121-131).
  - ``cam_pose`` is ignored by the reference kernel (poses are pre-applied
    to the points; fusion_lidar.py:253-255) — we drop the argument.

Sharding: the volume's leading (X) axis can be sharded across devices; the
update is embarrassingly parallel over voxels so ``shard_map`` needs no
collectives (each shard gets the full ~0.5MB range image replicated).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TSDFState(NamedTuple):
    """Functional TSDF volume state (all (X,Y,Z) device arrays).

    tsdf:   f32, init 1.0  (truncated signed distance, normalized by margin)
    weight: f32, init 0.0  (obs count; doubles as dist_old in the class-aware
                            rule, matching the reference kernel :198)
    label:  i32, init 0    (semantic label id; replaces packed color)
    rem:    f32, init 0.0  (remission)
    """

    tsdf: jax.Array
    weight: jax.Array
    label: jax.Array
    rem: jax.Array


@dataclasses.dataclass(frozen=True)
class VolumeSpec:
    """Static geometry of a voxel volume.

    Dims are static for XLA; bounds are snapped outward so that
    dims * voxel_size covers the requested bounds, like the reference's
    ceil-adjustment (fusion_lidar.py:34-37).
    """

    origin: tuple[float, float, float]
    voxel_size: float
    dims: tuple[int, int, int]

    @classmethod
    def from_bounds(cls, bounds: np.ndarray, voxel_size: float
                    ) -> "VolumeSpec":
        bounds = np.asarray(bounds, np.float64).reshape(3, 2)
        dims = np.ceil((bounds[:, 1] - bounds[:, 0]) / voxel_size
                       ).astype(int)
        return cls(origin=tuple(float(v) for v in bounds[:, 0]),
                   voxel_size=float(voxel_size),
                   dims=tuple(int(d) for d in dims))

    @property
    def trunc_margin(self) -> float:
        # reference: 5 voxels (fusion_lidar.py:31)
        return self.voxel_size * 5.0

    @property
    def num_voxels(self) -> int:
        return int(np.prod(self.dims))

    @property
    def bounds(self) -> np.ndarray:
        o = np.asarray(self.origin)
        return np.stack([o, o + np.asarray(self.dims) * self.voxel_size],
                        axis=1)

    def world_min(self) -> np.ndarray:
        return np.asarray(self.origin, np.float32)

    def init_state(self, tsdf_dtype=jnp.float32, weight_dtype=None,
                   label_dtype=None, rem_dtype=None) -> TSDFState:
        """Fresh volume state. Pass ``compact=`` dtypes for big volumes.

        The reference's CUDA volumes are 4x float32 = 16 B/voxel, which
        caps the volume size it can fuse (the split-volume TODO at
        fusion_lidar.py:45). ``init_state_compact`` stores 8 B/voxel:
        bf16 tsdf (dist in [-1,1]; ~0.4% quantization ≪ LiDAR noise),
        bf16 weight (obs counts, exact to 256), int16 labels
        (SemanticKITTI ids ≤ 259... int16 max 32767), bf16 remission —
        halving both HBM footprint and integrate/raycast traffic. All
        compute stays f32; only storage narrows.
        """
        d = self.dims
        return TSDFState(
            tsdf=jnp.ones(d, tsdf_dtype),
            weight=jnp.zeros(d, weight_dtype or jnp.float32),
            label=jnp.zeros(d, label_dtype or jnp.int32),
            rem=jnp.zeros(d, rem_dtype or jnp.float32),
        )

    def init_state_compact(self) -> TSDFState:
        """8 B/voxel state for reference-scale volumes (±50 m @ 0.05 m =
        800M voxels = 6.4 GB; the f32 layout would need 12.8 GB)."""
        return self.init_state(tsdf_dtype=jnp.bfloat16,
                               weight_dtype=jnp.bfloat16,
                               label_dtype=jnp.int16,
                               rem_dtype=jnp.bfloat16)


def _integrate_block(state_block: TSDFState, depth_im, label_im, rem_im,
                     fov_up_deg, fov_down_deg, obs_weight,
                     origin, active_dims, x_offset, dims, voxel_size,
                     reset=False, write_weight=True):
    """Class-aware update of one X-slab of the volume (pure function).

    ``x_offset`` shifts the slab's grid-x coordinates; full-volume callers
    pass 0, the chunked path passes the slab start so per-iteration
    temporaries stay slab-sized (full reference-scale volumes — 872M
    voxels — would otherwise materialize ~10 GB of f32 compute temps and
    OOM a 16 GB chip).
    """
    X, Y, Z = dims
    H, W = depth_im.shape

    # voxel corner world coords (reference samples corners too,
    # fusion_lidar.py:100-104); iota must be >=2D on TPU
    gx = (jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 0)
          + x_offset.astype(jnp.float32))
    gy = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 1)
    gz = jax.lax.broadcasted_iota(jnp.float32, (X, Y, Z), 2)
    px_w = origin[0] + gx * voxel_size
    py_w = origin[1] + gy * voxel_size
    pz_w = origin[2] + gz * voxel_size

    fov_up = jnp.deg2rad(fov_up_deg)
    fov_down = jnp.deg2rad(fov_down_deg)
    fov = jnp.abs(fov_up) + jnp.abs(fov_down)

    depth = jnp.sqrt(px_w * px_w + py_w * py_w + pz_w * pz_w)
    safe_depth = jnp.maximum(depth, 1e-12)
    yaw = -jnp.arctan2(py_w, px_w)
    pitch = jnp.arcsin(jnp.clip(pz_w / safe_depth, -1.0, 1.0))

    # vertical-FOV rejection (kernel :129-131)
    in_fov = (pitch <= fov_up) & (pitch >= fov_down)

    u = 0.5 * (yaw / jnp.pi + 1.0) * W
    v = (1.0 - (pitch + jnp.abs(fov_down)) / fov) * H
    pix_x = jnp.clip(jnp.floor(u), 0, W - 1).astype(jnp.int32)
    pix_y = jnp.clip(jnp.floor(v), 0, H - 1).astype(jnp.int32)

    flat_pix = (pix_y * W + pix_x).reshape(-1)
    depth_val = depth_im.reshape(-1)[flat_pix].reshape(X, Y, Z)
    new_label = label_im.reshape(-1)[flat_pix].reshape(X, Y, Z)
    new_rem = rem_im.reshape(-1)[flat_pix].reshape(X, Y, Z)

    trunc = jnp.float32(voxel_size * 5.0)
    depth_diff = depth_val - depth
    dist = jnp.minimum(1.0, depth_diff / trunc)

    # a voxel participates iff: in FOV, pixel has data, and not farther than
    # the truncation margin behind the surface (kernel :152-163, :193-196);
    # voxels beyond the active crop are dead padding
    in_crop = ((gx < active_dims[0]) & (gy < active_dims[1]) &
               (gz < active_dims[2]))
    active = in_crop & in_fov & (depth_val > 0) & (depth_diff >= -trunc)

    tsdf, weight, label, rem = state_block
    # compute in f32 regardless of the storage dtypes (compact volumes
    # store bf16/int16 — see VolumeSpec.init_state_compact)
    if reset:
        # fuse the re-initialization into the first integrate of a frame:
        # prior state is the init constants, so the donated buffers are
        # only WRITTEN — no state read, no 7 GB alloc/free churn per frame
        # (allocating a fresh reference-scale volume every frame thrashes
        # the allocator)
        tsdf_f = jnp.float32(1.0)
        weight_f = jnp.float32(0.0)
        rem_f = jnp.float32(0.0)
        label_i = jnp.int32(0)
    else:
        tsdf_f = tsdf.astype(jnp.float32)
        weight_f = weight.astype(jnp.float32)
        rem_f = rem.astype(jnp.float32)
        label_i = label.astype(jnp.int32)

    same_class = label_i == new_label
    # same-class branch (kernel :202-212): weighted cumulative average
    w_new = weight_f + obs_weight
    tsdf_avg = (tsdf_f * weight_f + dist) / w_new
    rem_avg = (rem_f * weight_f + new_rem) / w_new

    # different-class branch (kernel :213-227): overwrite iff dist < dist_old
    # where dist_old IS the weight value (reference quirk, kernel :198)
    closer = dist < weight_f

    upd_same = active & same_class
    upd_diff = active & ~same_class & closer

    new_tsdf = jnp.where(upd_same, tsdf_avg,
                         jnp.where(upd_diff, dist, tsdf_f))
    new_weight = jnp.where(upd_same, w_new, weight_f)
    new_label_out = jnp.where(upd_diff, new_label, label_i)
    new_rem_out = jnp.where(upd_same, rem_avg,
                            jnp.where(upd_diff, new_rem, rem_f))

    new_tsdf = jnp.broadcast_to(new_tsdf, dims)
    new_label_out = jnp.broadcast_to(new_label_out, dims)
    new_rem_out = jnp.broadcast_to(new_rem_out, dims)
    if write_weight:
        out_weight = jnp.broadcast_to(new_weight, dims).astype(weight.dtype)
    else:
        # single-integrate callers: nothing downstream of a lone integrate
        # reads weight (it only feeds the NEXT integrate's class-aware
        # rule), so pass the buffer through untouched — XLA DCEs the
        # weight computation and skips its full-volume HBM write
        out_weight = weight
    return TSDFState(tsdf=new_tsdf.astype(tsdf.dtype),
                     weight=out_weight,
                     label=new_label_out.astype(label.dtype),
                     rem=new_rem_out.astype(rem.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size", "x_chunk", "reset",
                     "write_weight"),
    donate_argnums=(0,))
def _integrate_impl(state: TSDFState, depth_im, label_im, rem_im,
                    fov_up_deg, fov_down_deg, obs_weight,
                    origin, active_dims, dims, voxel_size,
                    x_chunk=None, reset=False, write_weight=True,
                    x_offset=0):
    # origin and active_dims are *dynamic* operands: per-frame volume
    # placement/cropping must not trigger recompiles (dims are bucketed
    # static shapes; voxels beyond active_dims are masked off so a bucketed
    # volume behaves exactly like the reference's exact-size volume).
    X, Y, Z = dims
    args = (depth_im, label_im, rem_im, fov_up_deg, fov_down_deg,
            obs_weight, origin, active_dims)

    base_off = jnp.asarray(x_offset, jnp.int32)
    if x_chunk is None or x_chunk >= X:
        return _integrate_block(state, *args,
                                x_offset=base_off, dims=dims,
                                voxel_size=voxel_size, reset=reset,
                                write_weight=write_weight)

    # chunked path: bound temporaries to one X-slab. The loop is STATICALLY
    # unrolled with static slice offsets — a fori_loop over
    # dynamic_slice/dynamic_update_slice compiled nondeterministically on
    # the remote TPU compiler (same HLO: one compile ran the 872M-voxel
    # volume in ~5 ms, a later cache-miss recompile took 22.9 s); static
    # update-slices are reliably done in place on the donated buffers.
    offsets = list(range(0, X, x_chunk))
    for x0 in offsets:
        size = min(x_chunk, X - x0)
        block = TSDFState(*(
            jax.lax.slice_in_dim(a, x0, x0 + size, axis=0) for a in state))
        out = _integrate_block(block, *args,
                               x_offset=base_off + jnp.int32(x0),
                               dims=(size, Y, Z), voxel_size=voxel_size,
                               reset=reset, write_weight=write_weight)
        state = TSDFState(*(
            a if (name == "weight" and not write_weight)
            else jax.lax.dynamic_update_slice_in_dim(a, b, x0, 0)
            for name, a, b in zip(TSDFState._fields, state, out)))
    return state


def auto_x_chunk(dims: tuple[int, int, int],
                 slab_voxels: int = 1 << 26) -> int | None:
    """Pick an X-slab size bounding per-iteration temporaries (~64M voxels
    => ~768 MB of f32 compute temps). None = single shot (small volumes)."""
    X, Y, Z = dims
    if X * Y * Z <= slab_voxels:
        return None
    per_x = Y * Z
    chunk = max(8, (slab_voxels // per_x) // 8 * 8)   # sublane-aligned
    return int(min(chunk, X))


def integrate(state: TSDFState, spec: VolumeSpec, depth_im: jax.Array,
              label_im: jax.Array, rem_im: jax.Array, *,
              fov_up_deg, fov_down_deg, obs_weight: float = 1.0,
              origin=None, active_dims=None,
              x_chunk: int | None = "auto", reset: bool = False,
              write_weight: bool = True, x_offset=0) -> TSDFState:
    """Fuse one range image into the volume (class-aware rule; see module
    docstring). Donates ``state`` for in-place HBM update.

    ``x_offset`` (X-sharded volumes, parallel/sharding.integrate_sharded):
    ``state``/``spec.dims`` describe the local X-slab while ``origin`` is
    the GLOBAL volume origin; voxel world positions are computed as
    ``origin + (local_x + x_offset) * voxel`` — the identical f32
    expression the single-device full volume evaluates, so sharded and
    single-device volumes are bit-equal even at voxel sizes that are
    inexact in f32 (a per-shard f32-shifted origin is NOT: the shifted
    add re-rounds). ``active_dims`` is compared against the offset
    (global) x index.

    Args:
      depth_im: (H,W) f32 range image; 0 = no data
      label_im: (H,W) i32 semantic labels
      rem_im:   (H,W) f32 remissions
      fov_up_deg / fov_down_deg: FOV of the *image's* sensor spec
      origin:   optional (3,) dynamic world origin override (defaults to
                spec.origin)
      active_dims: optional (3,) dynamic crop — voxels at/above these grid
                coords are inert (lets one bucketed static shape serve many
                per-frame exact bounds)
      write_weight: False skips the weight-volume update entirely (25% of
                the state write traffic). Only valid when no FURTHER
                integrate will read this state — weight feeds the next
                integrate's class-aware rule and nothing else. The
                returned weight buffer is passed through unchanged.
    """
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    if active_dims is None:
        active_dims = jnp.asarray(spec.dims, jnp.int32)
    if x_chunk == "auto":
        x_chunk = auto_x_chunk(spec.dims)
    return _integrate_impl(
        state, depth_im, label_im.astype(jnp.int32), rem_im,
        jnp.float32(fov_up_deg), jnp.float32(fov_down_deg),
        jnp.float32(obs_weight),
        jnp.asarray(origin, jnp.float32),
        jnp.asarray(active_dims, jnp.float32),
        dims=spec.dims, voxel_size=spec.voxel_size, x_chunk=x_chunk,
        reset=reset, write_weight=write_weight, x_offset=x_offset)


def integrate_reference_numpy(tsdf, weight, label, rem, spec: VolumeSpec,
                              depth_im, label_im, rem_im,
                              fov_up_deg, fov_down_deg, obs_weight=1.0):
    """Plain-numpy oracle of the class-aware CUDA kernel semantics
    (fusion_lidar.py:191-228) for tests. Mutates and returns the arrays."""
    X, Y, Z = spec.dims
    H, W = depth_im.shape
    gx, gy, gz = np.meshgrid(np.arange(X), np.arange(Y), np.arange(Z),
                             indexing="ij")
    pw = np.stack([spec.origin[0] + gx * spec.voxel_size,
                   spec.origin[1] + gy * spec.voxel_size,
                   spec.origin[2] + gz * spec.voxel_size], axis=-1)
    fov_up = np.deg2rad(fov_up_deg)
    fov_down = np.deg2rad(fov_down_deg)
    fov = abs(fov_up) + abs(fov_down)
    depth = np.linalg.norm(pw, axis=-1)
    yaw = -np.arctan2(pw[..., 1], pw[..., 0])
    with np.errstate(invalid="ignore"):
        pitch = np.arcsin(np.clip(pw[..., 2] / np.maximum(depth, 1e-12),
                                  -1, 1))
    in_fov = (pitch <= fov_up) & (pitch >= fov_down)
    u = 0.5 * (yaw / np.pi + 1.0) * W
    v = (1.0 - (pitch + abs(fov_down)) / fov) * H
    px = np.clip(np.floor(u), 0, W - 1).astype(np.int64)
    py = np.clip(np.floor(v), 0, H - 1).astype(np.int64)
    depth_val = depth_im[py, px]
    new_lbl = label_im[py, px]
    new_rem = rem_im[py, px]
    trunc = spec.voxel_size * 5.0
    diff = depth_val - depth
    dist = np.minimum(1.0, diff / trunc)
    active = in_fov & (depth_val > 0) & (diff >= -trunc)

    same = label == new_lbl
    w_new = weight + obs_weight
    closer = dist < weight
    upd_same = active & same
    upd_diff = active & ~same & closer
    tsdf_out = np.where(upd_same, (tsdf * weight + dist) / w_new,
                        np.where(upd_diff, dist, tsdf))
    rem_out = np.where(upd_same, (rem * weight + new_rem) / w_new,
                       np.where(upd_diff, new_rem, rem))
    weight_out = np.where(upd_same, w_new, weight)
    label_out = np.where(upd_diff, new_lbl, label)
    return (tsdf_out.astype(np.float32), weight_out.astype(np.float32),
            label_out.astype(np.int32), rem_out.astype(np.float32))

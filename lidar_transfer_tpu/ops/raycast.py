"""Virtual-scan synthesis: ray generation + direct TSDF raymarching (JAX).

This is the idiomatic TPU replacement (SURVEY.md §7 engine 6a) for the
reference's mesh pipeline (marching cubes -> C++ BVH raytracer,
auxiliary/fusion_lidar.py:403-455 + auxiliary/raytracer/*). Instead of
extracting a triangle mesh and pointer-chasing a BVH (TPU-hostile, SURVEY.md
§2.2 N2), rays march *directly through the TSDF volume*:

  - a coarse occupancy grid (maxpooled "touched voxel" mask, dilated by one
    block) lets rays take block-sized steps through free space — the
    TPU-native analog of BVH empty-space skipping, fully vectorized;
  - inside occupied blocks rays take fine (sub-voxel) steps and detect the
    +/- zero crossing of the TSDF, refining the hit with linear
    interpolation — the same surface the reference's marching_cubes(level=0)
    + exact triangle intersection would find;
  - hit attributes (label, remission) come from the first interior (negative)
    voxel — the analog of the reference's vertex-0 color / vertex-mean
    remission lookup (RayTracer.cpp:73-90, Triangle.h:63-70).

All rays advance in lockstep inside one ``lax.while_loop`` (exits when every
ray is done); gathers from the HBM-resident volume are the only memory
traffic. A mesh-based parity engine lives in ``ops/triangles.py``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.ops.tsdf import TSDFState, VolumeSpec


def generate_rays(H: int, W: int, fov_up_deg: float, fov_down_deg: float,
                  beam_angles=None) -> np.ndarray:
    """(H*W, 3) f32 unit ray directions for a target sensor, row-major (H,W).

    Beam pattern ≡ reference ``create_rays`` (laserscan.py:1092-1119):
    yaw = linspace(0, 360, W) + 180 (wrapped to [0,360]), pitch =
    linspace(fov_up, fov_down, H) converted to colatitude. If
    ``beam_angles`` (radians) is given, it overrides the equidistant pitch
    rows (the reference TODOs this at laserscan.py:1094).
    """
    initial = 180.0
    yaw = np.linspace(0.0, 360.0, W) + initial
    yaw[yaw > 360.0] -= 360.0
    yaw = np.deg2rad(yaw)
    if beam_angles is not None:
        pitch = np.sort(np.asarray(beam_angles, np.float64))[::-1]
        if pitch.shape[0] != H:
            raise ValueError(f"{pitch.shape[0]} beam angles != H={H}")
    else:
        pitch = np.deg2rad(np.linspace(fov_up_deg, fov_down_deg, H))
    colat = np.pi / 2.0 - pitch
    dirs = np.empty((H, W, 3), dtype=np.float64)
    dirs[:, :, 0] = np.sin(colat)[:, None] * np.cos(-yaw)[None, :]
    dirs[:, :, 1] = np.sin(colat)[:, None] * np.sin(-yaw)[None, :]
    dirs[:, :, 2] = np.cos(colat)[:, None]
    return dirs.reshape(-1, 3).astype(np.float32)


def generate_rays_moving(H: int, W: int, fov_up_deg: float,
                         fov_down_deg: float, pose_next: np.ndarray,
                         beam_angles=None, spin_fraction: float = 1.0
                         ) -> tuple[np.ndarray, np.ndarray]:
    """Rolling-shutter ray pattern: per-column sensor pose interpolation.

    A *working* version of the reference's abandoned ``create_rays_moving``
    (laserscan.py:1035-1090, flagged "NOT WORKING ... reflect rolling
    shutter in rays"): a spinning LiDAR fires column w at frame-time
    t = w/W while the ego vehicle moves. Given ``pose_next`` — the rigid
    transform from this scan's sensor frame to the next scan's
    (inv(pose[i]) @ pose[i+1]) — each column's pose is the slerp/lerp
    interpolation at its firing fraction, its rays are rotated by the
    interpolated rotation, and its origin is the interpolated translation.

    The column firing order follows the beam pattern of ``generate_rays``:
    image column w corresponds to yaw (going through the same +180° initial
    offset), fired in image-column order.

    Args:
      pose_next: (4,4) relative pose over one full frame period
      spin_fraction: fraction of the pose covered by one revolution (1.0 =
        the sensor spins exactly once between scans)

    Returns:
      (rays (H*W,3) f32 unit directions, origins (H*W,3) f32) — feed both
      to ``raycast_tsdf`` (it accepts per-ray origins).
    """
    from lidar_transfer_tpu.ops.transforms import interpolate_pose

    base = generate_rays(H, W, fov_up_deg, fov_down_deg,
                         beam_angles=beam_angles).reshape(H, W, 3)
    t = np.linspace(0.0, spin_fraction, W, endpoint=False)
    poses = interpolate_pose(np.eye(4), np.asarray(pose_next, np.float64),
                             t)                                # (W,4,4)
    # rotate each column's direction rows; translate origins
    dirs = np.einsum("wij,hwj->hwi", poses[:, :3, :3], base)
    origins = np.broadcast_to(poses[:, :3, 3], (H, W, 3))
    return (np.ascontiguousarray(dirs.reshape(-1, 3), dtype=np.float32),
            np.ascontiguousarray(origins.reshape(-1, 3), dtype=np.float32))


class RaycastResult(NamedTuple):
    """Per-ray hit data, reshaped to the target image grid (H,W)."""

    range: jax.Array       # f32 distance along unit ray; 0 = miss
    label: jax.Array       # i32 semantic label of hit; 0 = miss
    remission: jax.Array   # f32 remission at hit; 0 = miss
    endpoints: jax.Array   # (H,W,3) f32 hit points; 0 = miss
    hit: jax.Array         # bool


def occupancy_grid(tsdf: jax.Array, block: int = 4) -> jax.Array:
    """Coarse bool grid: block contains any touched voxel, dilated by 1 block.

    A voxel is "touched" iff tsdf != 1 (the class-aware integrate only ever
    writes near-surface voxels; free/unseen space stays at the init value 1,
    see ops/tsdf.py). Dilation guarantees rays switch to fine stepping at
    least one block before any surface band.
    """
    # blockwise any() via reduce_window — NOT a 6D reshape-max: XLA's tiled
    # (8,128) layout pads the tiny minor dims of the 6D view catastrophically
    # (a 2048^2x208 volume ballooned to >100 GB of padded reshape output)
    # compare in the STORAGE dtype: an f32 astype of a reference-scale
    # bf16 volume is a 4.3 GB transient next to the live 8.6 GB state
    # (the OOM deform.py routes around); < 1.0 is exact in any dtype —
    # init is exactly 1.0 and clamped far-band writes are too
    touched = (tsdf < jnp.asarray(1.0, tsdf.dtype)).astype(jnp.bfloat16)
    coarse = jax.lax.reduce_window(
        touched, jnp.bfloat16(0), jax.lax.max,
        window_dimensions=(block, block, block),
        window_strides=(block, block, block),
        padding=[(0, (-tsdf.shape[0]) % block),
                 (0, (-tsdf.shape[1]) % block),
                 (0, (-tsdf.shape[2]) % block)])
    # dilate with a 3^3 max (one coarse cell in every direction)
    coarse = jnp.pad(coarse, 1)
    dil = coarse
    for axis in range(3):
        a = jnp.roll(coarse, 1, axis)
        b = jnp.roll(coarse, -1, axis)
        dil = jnp.maximum(dil, jnp.maximum(a, b))
        coarse = dil
    return (dil[1:-1, 1:-1, 1:-1] > 0)


def occupancy_from_points(points: jax.Array, valid: jax.Array,
                          vol_origin, spec: VolumeSpec, block: int = 4,
                          dilate_cells: int | None = None,
                          pixel_angle_rad: float = 0.0) -> jax.Array:
    """Coarse occupancy directly from the surface points (O(points), not
    O(voxels)).

    The class-aware integrate writes voxels whose PIXEL depth lies within
    the truncation band behind that pixel's winning point — i.e. within
    trunc_margin radially, plus the pixel cone's LATERAL footprint
    (a voxel can sit up to ``range x tan(pixel_angle)`` from the point
    that claimed its pixel; at 70 m and a 64-beam row pitch that is
    already ~0.5 m, and coarser sensors grow it linearly). The default
    dilation covers trunc + that lateral spread (bounded by the volume
    diagonal as the max in-volume range) + one fine-stepping margin cell;
    pass the source's ``pixel_angle_rad`` (max per-pixel angular extent —
    fov/H for uniform rows, the max adjacent-beam gap for beam tables)
    for the bound to hold. Without it (0.0, the legacy radius) long-range
    band voxels of coarse sensors can fall outside the occupancy and the
    marcher would force tsdf=1 inside them (missed crossings).

    Points slightly OUTSIDE the volume still mark their nearest boundary
    cells (their pixel cones can write in-volume voxels near the faces);
    far-outside points drop. All without scanning the full volume
    (872M-voxel volumes took ~76 ms/frame to scan; this is ~1 ms).
    """
    X, Y, Z = spec.dims
    cx = -(-X // block)
    cy = -(-Y // block)
    cz = -(-Z // block)
    cell = spec.voxel_size * block
    if dilate_cells is None:
        margin_m = spec.trunc_margin
        if pixel_angle_rad > 0.0:
            diag = float(np.linalg.norm(
                np.asarray(spec.dims, np.float64) * spec.voxel_size))
            margin_m += diag * float(np.tan(pixel_angle_rad))
        dilate_cells = int(np.ceil(margin_m / cell)) + 1

    g = (points - jnp.asarray(vol_origin, jnp.float32)[None, :]) / cell
    gi = jnp.floor(g).astype(jnp.int32)
    # keep points within dilate_cells OUTSIDE the box (clamped to the
    # boundary cell — their cones can touch in-volume voxels); the
    # dilation radius then covers the remaining distance
    d = dilate_cells
    near = (valid & (gi[:, 0] >= -d) & (gi[:, 0] < cx + d) &
            (gi[:, 1] >= -d) & (gi[:, 1] < cy + d) &
            (gi[:, 2] >= -d) & (gi[:, 2] < cz + d))
    gi = jnp.clip(gi, 0, jnp.asarray([cx - 1, cy - 1, cz - 1]))
    inside = near
    n_cells = cx * cy * cz
    flat = jnp.where(inside, (gi[:, 0] * cy + gi[:, 1]) * cz + gi[:, 2],
                     n_cells)
    occ = jnp.zeros((n_cells + 1,), bool).at[flat].set(
        True, mode="drop")[:n_cells].reshape(cx, cy, cz)
    # dilate in a padded grid so jnp.roll can never wrap occupancy across
    # opposite volume faces (pad > dilate_cells keeps every wrapped lane
    # False); mirrors occupancy_grid's pad-first dilation
    pad = dilate_cells + 1
    occ = jnp.pad(occ, pad)
    for _ in range(dilate_cells):
        d = occ
        for axis in range(3):
            d = d | jnp.roll(occ, 1, axis) | jnp.roll(occ, -1, axis)
            occ = d
    return occ[pad:-pad, pad:-pad, pad:-pad]


def _box_exit_t(origin, dirs, lo, hi):
    """Per-ray slab test: (t_entry, t_exit) of the volume AABB."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) > 1e-12, dirs,
                          jnp.where(dirs >= 0, 1e-12, -1e-12))
    t0 = (lo - origin) * inv
    t1 = (hi - origin) * inv
    t_near = jnp.minimum(t0, t1).max(axis=-1)
    t_far = jnp.maximum(t0, t1).min(axis=-1)
    return t_near, t_far


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size", "block", "fine_step",
                     "max_steps"))
def _raycast_impl(tsdf, label, rem, occ, rays, origin, vorigin,
                  dims, voxel_size, block, fine_step, max_steps):
    X, Y, Z = dims
    R = rays.shape[0]
    # origin: (3,) shared sensor center, or (R,3) per-ray origins (rolling
    # shutter, generate_rays_moving) — normalize to (R,3)
    origin = jnp.broadcast_to(origin.reshape(-1, 3), (R, 3))
    vox = jnp.float32(voxel_size)
    lo = vorigin
    hi = vorigin + jnp.asarray(dims, jnp.float32) * vox

    # keep the volume in its STORAGE dtype (bf16 in the compact layout) and
    # cast per gathered sample — .astype on the full array materializes a
    # second full-volume copy (4.3 GB f32 at reference scale), which OOMs
    # next to the live 8.6 GB state + integrate geometry tables
    tsdf_f = tsdf.reshape(-1)
    label_f = label.reshape(-1)
    rem_f = rem.reshape(-1)
    occ_f = occ.reshape(-1)
    ox, oy, oz = occ.shape

    t_near, t_far = _box_exit_t(origin, rays, lo[None, :], hi[None, :])
    t_far = jnp.minimum(t_far, jnp.float32(1e4))

    dt_fine = vox * jnp.float32(fine_step)
    dt_coarse = vox * jnp.float32(block)

    def sample(t):
        """Gather (tsdf?, occupied, inside) at positions origin + rays*t."""
        pos = origin + rays * t[:, None]
        g = (pos - vorigin[None, :]) / vox
        gi = jnp.floor(g).astype(jnp.int32)
        inside = ((gi[:, 0] >= 0) & (gi[:, 0] < X) &
                  (gi[:, 1] >= 0) & (gi[:, 1] < Y) &
                  (gi[:, 2] >= 0) & (gi[:, 2] < Z))
        gic = jnp.clip(gi, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
        flat = (gic[:, 0] * Y + gic[:, 1]) * Z + gic[:, 2]
        ci = gic // block
        cflat = (ci[:, 0] * oy + ci[:, 1]) * oz + ci[:, 2]
        occ_here = jnp.where(inside, occ_f[cflat], False)
        val = jnp.where(inside & occ_here,
                        tsdf_f[flat].astype(jnp.float32), 1.0)
        return val, occ_here, inside, flat

    def sample_trilinear(t):
        """Trilinearly interpolated TSDF at origin + rays*t (8 gathers).

        TSDF values live at voxel corners (origin + i*voxel — exactly where
        ops/tsdf.py evaluates them), so the continuous field is the
        trilinear blend of the 8 surrounding corners. Used only for hit
        refinement, not in the marching loop.
        """
        pos = origin + rays * t[:, None]
        g = (pos - vorigin[None, :]) / vox
        gi = jnp.clip(jnp.floor(g).astype(jnp.int32), 0,
                      jnp.asarray([X - 2, Y - 2, Z - 2]))
        f = jnp.clip(g - gi.astype(jnp.float32), 0.0, 1.0)
        base = (gi[:, 0] * Y + gi[:, 1]) * Z + gi[:, 2]
        acc = jnp.zeros((R,), jnp.float32)
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    w = ((f[:, 0] if dx else 1.0 - f[:, 0]) *
                         (f[:, 1] if dy else 1.0 - f[:, 1]) *
                         (f[:, 2] if dz else 1.0 - f[:, 2]))
                    corner = tsdf_f[base + (dx * Y + dy) * Z + dz]
                    acc = acc + w * corner.astype(jnp.float32)
        return acc

    t0 = jnp.maximum(t_near, 0.0) + 1e-4
    # seed prev_val from the actual field at t0 (not an assumed free-space
    # +1): a ray that *starts* inside negative space must not fabricate a
    # crossing at t~0 — it only hits once it exits and re-enters a surface
    val0, _, _, _ = sample(t0)
    state0 = dict(
        t=t0,
        prev_t=t0,
        prev_val=val0,
        done=t0 > t_far,
        hit=jnp.zeros((R,), bool),
        hit_t=jnp.zeros((R,), jnp.float32),
        hit_lo=jnp.zeros((R,), jnp.float32),
        hit_hi=jnp.zeros((R,), jnp.float32),
        hit_flat=jnp.zeros((R,), jnp.int32),
        step=jnp.int32(0),
    )

    def cond(s):
        return (s["step"] < max_steps) & ~jnp.all(s["done"])

    def body(s):
        val, occ_here, inside, flat = sample(s["t"])
        # zero crossing between previous (positive) and current
        # (non-positive): val == 0.0 IS the surface — with <0 only, a
        # surface lying exactly on a voxel node would make the next
        # iteration see prev_val == 0 and miss the crossing entirely
        crossing = (s["prev_val"] > 0.0) & (val <= 0.0) & ~s["done"]
        denom = s["prev_val"] - val
        frac = jnp.where(denom > 1e-12, s["prev_val"] / denom, 0.5)
        t_hit = s["prev_t"] + (s["t"] - s["prev_t"]) * frac

        hit = s["hit"] | crossing
        hit_t = jnp.where(crossing, t_hit, s["hit_t"])
        hit_lo = jnp.where(crossing, s["prev_t"], s["hit_lo"])
        hit_hi = jnp.where(crossing, s["t"], s["hit_hi"])
        hit_flat = jnp.where(crossing, flat, s["hit_flat"])

        done = s["done"] | crossing | (s["t"] > t_far)
        dt = jnp.where(occ_here, dt_fine, dt_coarse)
        return dict(
            t=jnp.where(done, s["t"], s["t"] + dt),
            prev_t=s["t"],
            prev_val=val,
            done=done,
            hit=hit,
            hit_t=hit_t,
            hit_lo=hit_lo,
            hit_hi=hit_hi,
            hit_flat=hit_flat,
            step=s["step"] + 1,
        )

    s = jax.lax.while_loop(cond, body, state0)

    hit = s["hit"]

    # sub-voxel refinement: 10 bisection steps on the *trilinear* field
    # (bracket width / 2^10 of the ~4-voxel widened bracket)
    # within the crossing bracket [hit_lo, hit_hi]. The marching loop's
    # floor-voxel sampling localizes the surface to within one step; this
    # recovers the continuous zero crossing (the surface marching
    # tetrahedra + exact triangle intersection would produce).
    # floor sampling shifts the apparent field by up to a voxel diagonal
    # (value of corner i serves all of cell [i, i+1)); widen the bracket by
    # 2 voxels each way so it straddles the *trilinear* zero crossing
    margin = 2.0 * vox
    lo_t = jnp.maximum(s["hit_lo"] - margin, 0.0)
    hi_t = s["hit_hi"] + margin
    f_lo = sample_trilinear(lo_t)
    f_hi = sample_trilinear(hi_t)
    bracket_ok = (f_lo > 0.0) & (f_hi <= 0.0)
    for _ in range(10):
        mid = 0.5 * (lo_t + hi_t)
        f_mid = sample_trilinear(mid)
        same_side = (f_mid > 0.0) == (f_lo > 0.0)
        lo_t = jnp.where(same_side, mid, lo_t)
        f_lo = jnp.where(same_side, f_mid, f_lo)
        hi_t = jnp.where(same_side, hi_t, mid)
    refined = 0.5 * (lo_t + hi_t)
    # trust the refinement only if the widened bracket actually straddled
    # the trilinear surface; otherwise keep the loop's linear estimate
    hit_t = jnp.where(hit & bracket_ok, refined, s["hit_t"])

    rng_out = jnp.where(hit, hit_t, 0.0)
    # storage dtypes may be compact (int16 labels / bf16 rem); results are
    # always i32 / f32
    lbl_out = jnp.where(hit, label_f[s["hit_flat"]].astype(jnp.int32), 0)
    rem_out = jnp.where(hit, rem_f[s["hit_flat"]].astype(jnp.float32), 0.0)
    ends = jnp.where(hit[:, None], origin + rays * rng_out[:, None],
                     0.0)
    return rng_out, lbl_out, rem_out, ends, hit


def raycast_tsdf(state: TSDFState, spec: VolumeSpec, rays: jax.Array,
                 origin: jax.Array, H: int, W: int, *,
                 occ: jax.Array | None = None, block: int = 4,
                 fine_step: float = 0.5, max_steps: int | None = None,
                 vol_origin=None) -> RaycastResult:
    """March target-sensor rays through the fused TSDF volume.

    Replaces ``TSDFVolume.throw_rays_at_mesh`` (fusion_lidar.py:426-455):
    same inputs (rays, origin, target dims), same outputs (endpoints, labels,
    range image, remission image) — without the mesh.

    Args:
      rays:   (H*W, 3) f32 unit directions (see ``generate_rays``)
      origin: (3,) f32 sensor origin (the reference uses [0,0,0],
              laserscan.py:986)
      occ:    optional precomputed occupancy (reused across frames when the
              volume is reused)
      block:  coarse block edge in voxels (empty-space skip distance)
      fine_step: fine step in voxels (0.5 = half-voxel sampling)
    """
    if max_steps is None:
        # enough fine steps to cross the volume diagonal even for a
        # grazing ray marching entirely inside the occupancy halo — a
        # fixed 4096 silently truncated the march (reported as a miss)
        # on reference-scale volumes at sub-voxel fine steps
        diag = float(np.linalg.norm(spec.dims))
        max_steps = int(np.ceil(diag / max(fine_step, 1e-3))) + 64
    if occ is None:
        occ = occupancy_grid(state.tsdf, block=block)
    origin = jnp.asarray(origin, jnp.float32)
    if vol_origin is None:
        vol_origin = jnp.asarray(spec.origin, jnp.float32)
    rng_out, lbl, rem, ends, hit = _raycast_impl(
        state.tsdf, state.label, state.rem, occ, rays, origin,
        jnp.asarray(vol_origin, jnp.float32),
        dims=spec.dims, voxel_size=spec.voxel_size,
        block=block, fine_step=fine_step, max_steps=max_steps)
    return RaycastResult(
        range=rng_out.reshape(H, W),
        label=lbl.reshape(H, W),
        remission=rem.reshape(H, W),
        endpoints=ends.reshape(H, W, 3),
        hit=hit.reshape(H, W),
    )

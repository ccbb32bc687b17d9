"""Spherical range-image projection ops (JAX, jit-compiled, static shapes).

This is the TPU-native replacement for the reference's LaserScan projection
methods (auxiliary/laserscan.py):

  - ``range_project``  ≡ ``do_range_projection_new(method="depth")``
    (laserscan.py:294-391). The reference's per-point Python z-buffer loop
    (:372-382, the dominant CPU hot loop per SURVEY.md §3) is replaced by
    ONE stable lexicographic sort by (pixel, depth) whose run starts are
    the winners — reproducing the loop's nearest-point, first-come-
    tie-break semantics exactly (the two-``segment_min``-scatter variant
    is kept only as a semantics cross-check, ``method="segment"``;
    the sort measured ~2.5x faster on TPU, docs/PERF.md).
  - ``reverse_project`` ≡ ``do_reverse_projection_new`` (laserscan.py:475-501)
    including the ``preserve_float`` option.
  - beam-angle snapping ≡ the per-point nearest-beam loop
    (laserscan.py:233-238/322-327), vectorized as an argmin over a (N,B)
    broadcast.

All point arrays are fixed-capacity padded; a boolean ``valid`` mask marks
real points. Zero-depth padding matches the reference's removal of
zero-depth points (laserscan.py:307-310).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_INT32_MAX = jnp.iinfo(jnp.int32).max


class RangeImage(NamedTuple):
    """Result of projecting a point set into a spherical range image.

    Image-plane fields (H,W):
      range:      f32 range per pixel; 0 where no data
                  (reference inits ``range_image`` to 0, laserscan.py:366)
      index:      i32 index into the (padded) point arrays; -1 where no data
      remission:  f32; -1 where no data (reference init, laserscan.py:369)
      label:      i32 semantic label; 0 where no data
      u_float:    f32 unclamped pixel x of the winning point, in [0, W]
      v_float:    f32 unclamped pixel y of the winning point, in [0, H]
                  (reference ``proj_x_float``/``proj_y_float``,
                   laserscan.py:387-388)

    Per-point fields (N,):
      point_valid: bool — point survived depth>0 and vertical-FOV filters
                   (``remove=True`` semantics, laserscan.py:334-342)
      point_u:     i32 clamped pixel x per point
      point_v:     i32 clamped pixel y per point
      point_depth: f32 per-point range (``unproj_range``)
    """

    range: jax.Array
    index: jax.Array
    remission: jax.Array
    label: jax.Array
    u_float: jax.Array
    v_float: jax.Array
    point_valid: jax.Array
    point_u: jax.Array
    point_v: jax.Array
    point_depth: jax.Array

    @property
    def mask(self) -> jax.Array:
        """(H,W) bool: pixel has data."""
        return self.index >= 0

    @property
    def H(self) -> int:
        return self.range.shape[0]

    @property
    def W(self) -> int:
        return self.range.shape[1]

    @property
    def u_int(self) -> jax.Array:
        """(H,W) i32 clamped integer pixel x of winning points.

        Equals the reference's ``proj_x`` image (= proj_x_cl[index],
        laserscan.py:385); 0 where no data.
        """
        w = self.range.shape[1]
        u = jnp.clip(jnp.floor(self.u_float), 0, w - 1).astype(jnp.int32)
        return jnp.where(self.mask, u, 0)

    @property
    def v_int(self) -> jax.Array:
        h = self.range.shape[0]
        v = jnp.clip(jnp.floor(self.v_float), 0, h - 1).astype(jnp.int32)
        return jnp.where(self.mask, v, 0)


def spherical_angles(points: jax.Array) -> tuple[jax.Array, jax.Array,
                                                 jax.Array]:
    """(N,3) points -> (depth, yaw, pitch).

    Angle conventions exactly as the reference (laserscan.py:229-230):
    yaw = -atan2(y, x), pitch = asin(z / depth).
    """
    depth = jnp.linalg.norm(points, axis=-1)
    yaw = -jnp.arctan2(points[..., 1], points[..., 0])
    safe_depth = jnp.where(depth > 0, depth, 1.0)
    pitch = jnp.arcsin(jnp.clip(points[..., 2] / safe_depth, -1.0, 1.0))
    return depth, yaw, pitch


def snap_to_beams(pitch: jax.Array, beam_angles: jax.Array) -> jax.Array:
    """Snap pitch angles to the nearest hardware beam angle.

    Vectorized equivalent of the reference's per-point loop
    (laserscan.py:322-327): argmin over |pitch - beam_angles|.
    beam_angles: (B,) radians.
    """
    diff = jnp.abs(pitch[..., None] - beam_angles)          # (N, B)
    return beam_angles[jnp.argmin(diff, axis=-1)]


def project_uv(points: jax.Array, fov_up_deg: jax.Array,
               fov_down_deg: jax.Array,
               beam_angles: jax.Array | None = None
               ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(N,3) points -> (u, v, depth) in normalized [0,1] image coords.

    u = 0.5*(yaw/pi + 1), v = 1 - (pitch + |fov_down|)/fov
    (reference laserscan.py:330-331).
    """
    fov_up = jnp.deg2rad(fov_up_deg)
    fov_down = jnp.deg2rad(fov_down_deg)
    fov = jnp.abs(fov_down) + jnp.abs(fov_up)
    depth, yaw, pitch = spherical_angles(points)
    if beam_angles is not None:
        pitch = snap_to_beams(pitch, beam_angles)
    u = 0.5 * (yaw / jnp.pi + 1.0)
    v = 1.0 - (pitch + jnp.abs(fov_down)) / fov
    return u, v, depth


def _pixel_keys(points, valid, fov_up_deg, fov_down_deg, beam_angles,
                H, W, beam_rows, winner):
    """Per-point pixel assignment + z-buffer sort key (shared by the image
    projection and the winner-flag projection).

    Returns (pix, depth_key, depth, uf, vf, px, py, valid) — ``pix`` is
    ``npix`` (= H*W, the overflow segment) for invalid points so they can
    never win a pixel.
    """
    if beam_rows:
        # TARGET-grid semantics for sensors with explicit beam angles:
        # image row i IS beam i (descending pitch), matching
        # raycast.generate_rays — NOT the reference's snap-then-
        # equidistant-row source projection (laserscan.py:233-242), which
        # collides non-uniform beams into shared rows. Points assign to
        # the row of their nearest beam.
        depth, yaw, pitch = spherical_angles(points)
        ba_desc = -jnp.sort(-beam_angles)                   # row 0 = top
        row = jnp.argmin(jnp.abs(pitch[:, None] - ba_desc[None, :]),
                         axis=1).astype(jnp.int32)
        valid = valid & (depth > 0.0)
        u = 0.5 * (yaw / jnp.pi + 1.0)
        uf = u * W
        vf = row.astype(jnp.float32) + 0.5
        px = jnp.clip(jnp.floor(uf), 0, W - 1).astype(jnp.int32)
        py = row
    else:
        u, v, depth = project_uv(points, fov_up_deg, fov_down_deg,
                                 beam_angles)

        # remove zero-depth (padding + degenerate) points —
        # laserscan.py:307-310
        valid = valid & (depth > 0.0)
        # remove=True: drop points outside vertical FOV —
        # laserscan.py:334-342
        valid = valid & (v >= 0.0) & (v <= 1.0)

        uf = u * W                                         # in [0, W]
        vf = v * H                                         # in [0, H]
        # floor + clamp exactly as laserscan.py:352-357
        px = jnp.clip(jnp.floor(uf), 0, W - 1).astype(jnp.int32)
        py = jnp.clip(jnp.floor(vf), 0, H - 1).astype(jnp.int32)

    npix = H * W
    # invalid points scatter into an overflow segment
    pix = jnp.where(valid, py * W + px, npix)
    if winner == "pdist":
        # reference method="pdist" (laserscan.py:393-418): the pixel's
        # winner is the point whose FLOAT image coords lie closest to the
        # pixel CENTER (strict '<' against an init of 1000 -> first-come
        # ties), not the nearest-in-depth point. The SQUARED distance is
        # used as the sort key — sqrt is monotone, so the winner set is
        # identical and the per-point transcendental is free (near-tie
        # float disagreements vs the reference's f64 norm exist either
        # way and are covered by the parity test's epsilon).
        dyp = vf - (py.astype(jnp.float32) + 0.5)
        dxp = uf - (px.astype(jnp.float32) + 0.5)
        key = dyp * dyp + dxp * dxp
    else:
        key = depth
    depth_key = jnp.where(valid, key, jnp.inf)
    return pix, depth_key, depth, uf, vf, px, py, valid


def _winner_sort(pix, key, npix):
    """THE z-buffer: one stable lexicographic sort by (pixel, key); the
    first element of each pixel run is the winner.

    Shared by every winner-selection path (``_range_project_impl``,
    ``_winner_flags_impl``, ``_winner_order_impl``,
    ``ops.splat._target_assemble``) so the tie-break and overflow-segment
    semantics cannot diverge: the sort is STABLE (lax.sort default), so
    exact-key ties keep original order and the run start is the lowest
    original index — byte-identical to the reference loop's strict '<'
    z-buffer (laserscan.py:376-377) with the index riding as payload.
    ~2.5x faster than scatter-min on TPU (collision-heavy scatter
    serializes; sort is a vectorized bitonic network). Invalid points
    carry ``pix == npix`` (the overflow segment) and are masked out of
    ``is_first``.

    Returns (sp, si, is_first): pixels in sorted order, the permutation
    into original point order, and the run-start (winner) flags.
    """
    n = pix.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    sp, _, si = jax.lax.sort((pix, key, idx), num_keys=2)
    is_first = jnp.concatenate(
        [jnp.ones((1,), bool), sp[1:] != sp[:-1]]) & (sp < npix)
    return sp, si, is_first


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "method", "beam_rows",
                                    "winner"))
def _range_project_impl(points, remissions, labels, valid,
                        fov_up_deg, fov_down_deg, beam_angles, H, W,
                        method="sort", beam_rows=False, winner="depth"):
    n = points.shape[0]
    npix = H * W
    pix, depth_key, depth, uf, vf, px, py, valid = _pixel_keys(
        points, valid, fov_up_deg, fov_down_deg, beam_angles,
        H, W, beam_rows, winner)
    idx = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)

    if method == "sort":
        sp, si, is_first = _winner_sort(pix, depth_key, npix)
        tgt = jnp.where(is_first, sp, npix)
        win_idx = jnp.full((npix + 1,), _INT32_MAX, jnp.int32).at[tgt].set(
            jnp.where(is_first, si, _INT32_MAX), mode="drop")[:npix]
    else:
        # two-pass segment-min (kept as a semantics cross-check)
        min_depth = jax.ops.segment_min(depth_key, pix,
                                        num_segments=npix + 1)
        is_winner = valid & (depth_key == min_depth[pix])
        idx_key = jnp.where(is_winner, idx, _INT32_MAX)
        win_idx = jax.ops.segment_min(idx_key, pix,
                                      num_segments=npix + 1)[:npix]

    has = win_idx != _INT32_MAX
    index = jnp.where(has, win_idx, -1).reshape(H, W)
    gidx = jnp.where(has, win_idx, 0)

    # ONE (N,5) int32 ROW gather instead of five 1-D gathers: the remote
    # compiler lowers 1-D gathers through a ~8.5 ns/index scalar path but
    # vectorizes 2-D row gathers (~20x, docs/PERF.md). Floats ride as
    # BITCAST int32 lanes — the integer path cannot flush subnormal bit
    # patterns, so the round-trip is bit-exact for any value (unlike
    # ints-as-float-values, which cap at 2^24, or floats gathered as
    # floats... which are fine; the bitcast is for the label column).
    as_i = lambda a: jax.lax.bitcast_convert_type(  # noqa: E731
        a.astype(jnp.float32), jnp.int32)
    stacked = jnp.stack(
        [as_i(depth), as_i(remissions), as_i(uf), as_i(vf),
         labels.astype(jnp.int32)], axis=1)              # (N, 5) i32
    wa = stacked[gidx]                                   # ONE row gather
    as_f = lambda c: jax.lax.bitcast_convert_type(  # noqa: E731
        wa[:, c], jnp.float32)

    rng = jnp.where(has, as_f(0), 0.0).reshape(H, W)
    rem = jnp.where(has, as_f(1), -1.0).reshape(H, W)
    lbl = jnp.where(has, wa[:, 4], 0).reshape(H, W)
    ufi = jnp.where(has, as_f(2), 0.0).reshape(H, W)
    vfi = jnp.where(has, as_f(3), 0.0).reshape(H, W)

    return RangeImage(
        range=rng, index=index, remission=rem.astype(jnp.float32), label=lbl,
        u_float=ufi, v_float=vfi,
        point_valid=valid, point_u=px, point_v=py,
        point_depth=depth.astype(jnp.float32))


def _check_beam_rows(beam_rows, beam_angles, H):
    """beam_rows assigns row = nearest beam: the image height must equal
    the beam-table length or points silently vanish into the overflow
    segment (rows >= H) / rows [B, H) never fill."""
    if beam_rows:
        if beam_angles is None:
            raise ValueError("beam_rows=True requires beam_angles")
        if beam_angles.shape[0] != H:
            raise ValueError(
                f"beam_rows: image height H={H} != {beam_angles.shape[0]} "
                "beam angles")


def range_project(points: jax.Array, remissions: jax.Array,
                  labels: jax.Array, valid: jax.Array, *,
                  H: int, W: int, fov_up_deg, fov_down_deg,
                  beam_angles=None, method: str = "sort",
                  beam_rows: bool = False,
                  winner: str = "depth") -> RangeImage:
    """Project a padded point set into an (H,W) spherical range image.

    Nearest-point-per-pixel z-buffer semantics identical to the reference's
    ``do_range_projection_new(..., method="depth", remove=True)``
    (laserscan.py:294-391). See module docstring.

    The reference's OTHER projection variants map here as follows:
      - ``do_range_projection_new(method="pdist")`` (laserscan.py:393-418):
        pass ``winner="pdist"`` — per-pixel winner by smallest distance of
        the float image coords to the pixel center instead of smallest
        depth (first-come ties, exactly like the loop's strict '<').
        Deviation: the reference's pdist loop never fills its remission
        image (left at -1, an apparent oversight); we fill it from the
        winning point like every other variant (PARITY.md quirks table).
      - ``do_range_projection_new(method="depthfast")`` (laserscan.py:
        420-439) and the legacy ``do_range_projection`` far-to-near
        overwrite scatter (laserscan.py:274-292) select the SAME winner
        set as ``winner="depth"``: points sorted by decreasing depth and
        scattered means each pixel keeps its minimum-depth point. Their
        only semantic difference is at exact depth ties, where numpy's
        unstable introsort makes the reference's choice arbitrary; our
        stable sort resolves ties to the lowest original index
        (tests/test_reference_parity.py covers both).

    Args:
      points:     (N,3) f32 (padded; padding at origin)
      remissions: (N,)  f32
      labels:     (N,)  i32
      valid:      (N,)  bool
      H, W:       static target image dims
      fov_up_deg / fov_down_deg: scalar sensor FOV in degrees
      beam_angles: optional (B,) array of beam pitch angles in radians
      winner:     "depth" (nearest point wins) or "pdist" (closest to
                  pixel center wins)
    """
    if winner not in ("depth", "pdist"):
        raise ValueError(f"unknown winner rule {winner!r}")
    fov_up_deg = jnp.asarray(fov_up_deg, jnp.float32)
    fov_down_deg = jnp.asarray(fov_down_deg, jnp.float32)
    if beam_angles is not None:
        beam_angles = jnp.asarray(beam_angles, jnp.float32)
    _check_beam_rows(beam_rows, beam_angles, H)
    return _range_project_impl(points, remissions, labels, valid,
                               fov_up_deg, fov_down_deg, beam_angles,
                               H, W, method, beam_rows, winner)


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "beam_rows", "winner"))
def _winner_flags_impl(points, valid, fov_up_deg, fov_down_deg,
                       beam_angles, H, W, beam_rows, winner):
    n = points.shape[0]
    npix = H * W
    pix, depth_key, depth, _, _, _, _, valid = _pixel_keys(
        points, valid, fov_up_deg, fov_down_deg, beam_angles,
        H, W, beam_rows, winner)
    _, si, is_first = _winner_sort(pix, depth_key, npix)
    # si is a permutation of [0, n): one scatter maps the run-start flags
    # back to original point order
    is_winner = jnp.zeros((n,), bool).at[si].set(is_first)
    return is_winner, depth


@functools.partial(jax.jit,
                   static_argnames=("H", "W", "beam_rows", "winner"))
def _winner_order_impl(points, valid, fov_up_deg, fov_down_deg,
                       beam_angles, H, W, beam_rows, winner):
    n = points.shape[0]
    npix = H * W
    pix, depth_key, depth, _, _, _, _, valid = _pixel_keys(
        points, valid, fov_up_deg, fov_down_deg, beam_angles,
        H, W, beam_rows, winner)
    sp, si, is_first = _winner_sort(pix, depth_key, npix)
    return sp, si, is_first, depth


def project_winner_order(points: jax.Array, valid: jax.Array, *,
                         H: int, W: int, fov_up_deg, fov_down_deg,
                         beam_angles=None, beam_rows: bool = False,
                         winner: str = "depth",
                         return_pixels: bool = False):
    """Winner flags in SORTED (pixel, depth) order — no scatter at all.

    Same winner set as ``project_winners`` but returned as
    ``(si, is_first, depth)``: ``si[j]`` is the original index of the
    j-th point in the z-buffer sort order and ``is_first[j]`` marks the
    run starts (= the winners). A consumer fetches per-point attributes
    in sorted order with ONE row gather of a stacked matrix
    (``attrs[si]`` — the vectorized 2-D gather path) instead of
    scattering flags back to point order; candidate order then matches
    the classic image path's source-pixel order, including exact-tie
    resolution. ``depth`` is per-point (original order).

    ``return_pixels=True`` prepends ``sp`` (the sorted pixel index of
    each entry, ``npix`` for invalid points): ``(sp, si, is_first,
    depth)``. With it a consumer can densify winner rows into image
    raster order with ONE row scatter (``img.at[sp].set(rows)`` where
    ``is_first``) — the fast upsampling body uses this to hand the
    chord interpolation an image-gridded view without assembling a
    RangeImage.
    """
    if winner not in ("depth", "pdist"):
        raise ValueError(f"unknown winner rule {winner!r}")
    fov_up_deg = jnp.asarray(fov_up_deg, jnp.float32)
    fov_down_deg = jnp.asarray(fov_down_deg, jnp.float32)
    if beam_angles is not None:
        beam_angles = jnp.asarray(beam_angles, jnp.float32)
    _check_beam_rows(beam_rows, beam_angles, H)
    out = _winner_order_impl(points, valid, fov_up_deg, fov_down_deg,
                             beam_angles, H, W, beam_rows, winner)
    return out if return_pixels else out[1:]


def project_winners(points: jax.Array, valid: jax.Array, *,
                    H: int, W: int, fov_up_deg, fov_down_deg,
                    beam_angles=None, beam_rows: bool = False,
                    winner: str = "depth"
                    ) -> tuple[jax.Array, jax.Array]:
    """Per-point z-buffer winner flags — the gather-free projection.

    Selects exactly ``range_project``'s winner set (same ``_pixel_keys`` +
    stable sort) but returns a per-POINT boolean instead of pixel-indexed
    images: ``is_winner[i]`` ⇔ point i is its pixel's nearest (first-come
    on exact ties) point. Costs one sort plus ONE permutation scatter —
    no winner-attribute gathers. Under the remote compiler's scalar-gather
    regime the image projection's five ``attr[win_idx]`` gathers dominate
    the whole mergemesh frame (~5 ms of 9 ms at 64x2048, see
    docs/PERF.md); consumers that only need the winning POINTS (the splat
    synthesis hot path) use this instead and keep attributes in original
    point order.

    Returns:
      (is_winner (N,) bool, depth (N,) f32 per-point range)
    """
    if winner not in ("depth", "pdist"):
        raise ValueError(f"unknown winner rule {winner!r}")
    fov_up_deg = jnp.asarray(fov_up_deg, jnp.float32)
    fov_down_deg = jnp.asarray(fov_down_deg, jnp.float32)
    if beam_angles is not None:
        beam_angles = jnp.asarray(beam_angles, jnp.float32)
    _check_beam_rows(beam_rows, beam_angles, H)
    return _winner_flags_impl(points, valid, fov_up_deg, fov_down_deg,
                              beam_angles, H, W, beam_rows, winner)


@functools.partial(jax.jit, static_argnames=("preserve_float",))
def _reverse_project_impl(rng_image, u_float, v_float, mask,
                          fov_up_deg, fov_down_deg, preserve_float):
    H, W = rng_image.shape
    fov_up = jnp.deg2rad(fov_up_deg)
    fov_down = jnp.deg2rad(fov_down_deg)
    fov = jnp.abs(fov_down) + jnp.abs(fov_up)

    if preserve_float:
        u = u_float / W
        v = v_float / H
    else:
        u = jnp.clip(jnp.floor(u_float), 0, W - 1) / W
        v = jnp.clip(jnp.floor(v_float), 0, H - 1) / H
        u = jnp.where(mask, u, 0.0)
        v = jnp.where(mask, v, 0.0)

    depth = rng_image
    # inverse spherical mapping — laserscan.py:492-497
    yaw = (u * 2.0 - 1.0) * jnp.pi
    pitch = jnp.pi / 2.0 - (fov - v * fov - jnp.abs(fov_down))
    x = depth * jnp.sin(pitch) * jnp.cos(-yaw)
    y = depth * jnp.sin(pitch) * jnp.sin(-yaw)
    z = depth * jnp.cos(pitch)
    return jnp.stack([x, y, z], axis=-1).reshape(-1, 3)


def reverse_project(image: RangeImage, *, fov_up_deg, fov_down_deg,
                    preserve_float: bool = False) -> jax.Array:
    """Back-project a range image to 3D points (H*W, 3).

    ≡ reference ``do_reverse_projection_new`` (laserscan.py:475-501).
    The legacy ``do_reverse_projection`` (laserscan.py:444-473) applies
    the same inverse spherical mapping through clamped integer pixel
    coords — exactly this function with ``preserve_float=False``.
    Pixels without data have range 0 and map to the origin; the dataset
    writer drops them (≡ laserscan.py:1151).
    """
    fov_up_deg = jnp.asarray(fov_up_deg, jnp.float32)
    fov_down_deg = jnp.asarray(fov_down_deg, jnp.float32)
    return _reverse_project_impl(image.range, image.u_float, image.v_float,
                                 image.mask, fov_up_deg, fov_down_deg,
                                 preserve_float)


def mask_classes(labels: jax.Array, valid: jax.Array,
                 classes: tuple[int, ...]) -> jax.Array:
    """Invalidate points whose label is in ``classes``.

    Mask-based equivalent of the reference's physical removal
    (``remove_classes``, laserscan.py:658-670): masked points can never win
    a pixel, which matches removal semantics exactly.
    """
    if not classes:
        return valid
    drop = jnp.zeros_like(valid)
    for c in classes:
        drop = drop | (labels == c)
    return valid & ~drop

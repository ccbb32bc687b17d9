"""Virtual-scan synthesis by truncation-band splatting (JAX, gather-light).

Second synthesis engine beside the TSDF raymarcher (ops/raycast.py). The
marcher advances all rays in a lockstep ``while_loop`` with one volume
gather per step — hundreds of sequential gathers per frame. XLA:TPU's
gather lowering proved compile-nondeterministic at production scale
(metrics/confusion.py documents the probes), so the marcher's worst case
is seconds per frame. This engine restructures synthesis so the gather
count is tiny and fixed:

  1. every *source* range-image pixel spawns K samples along its ray
     through the truncation band behind the surface — by construction
     exactly the voxels the class-aware integrate wrote
     (ops/tsdf.py parity notes; K = trunc/voxel = 5);
  2. sample attributes (tsdf, label, remission) come from the source
     image itself on the hot paths (``_band_samples_image`` for one
     fused image, ``_band_samples_fold`` replaying the class-aware
     collision rule for S images) — ZERO volume reads; only the
     materialized path (``_band_samples``) gathers from the volume,
     ~K x H x W gathers once per frame, not per marching step.
     Each ray further collapses to its ONE minimum-depth in-band sample
     (min-over-partition argument below), so the target z-buffer sees
     HW candidates, not K x HW;
  3. candidates are z-buffered into the TARGET image by the same stable
     (pixel, depth) sort used everywhere (``_target_assemble``, winner
     set exactly ``range_project``'s), with all winner attributes
     fetched by one row gather of a stacked (N, 8) matrix;
  4. the winning sample's stored TSDF value converts its depth to the
     zero-crossing depth: the sensor sits at the origin of both the
     source and target spherical grids, so the sample lies ON its target
     ray and ``t_surface = t_sample + tsdf * trunc_margin`` exactly.

Equivalence to the raymarcher: both locate the +1 -> negative crossing of
the same volume; the splat finds it from behind (band samples) and
corrects by the stored distance; validated against the raymarcher and the
native mesh oracle in tests/test_splat.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops.tsdf import TSDFState, VolumeSpec

_INT32_MAX = jnp.iinfo(jnp.int32).max

#: the largest row count at which the remote compiler's 2-D row gather
#: reliably drew the fast (~1.8 ns/row) lowering in round-5 traces; at
#: 262144 rows the SAME formulation drew ~11 ns/row inside the stream
#: body (xplane, docs/PERF.md round 5)
_GATHER_FAST_ROWS = 131072


def _gather_split_for(npix: int) -> int:
    """Row-gather chunk count for an npix-long index vector.

    The remote compiler's (P, 8) row-gather lowering degrades ~6x per
    row somewhere between 131k and 262k index rows (measured IN the
    stream body: identity point 1.8 ns/row vs upsample point 11.0
    ns/row, same formulation — xplane traces, round 5). Chunking the
    INDEX vector to <=131072 rows per gather dodges it: the measured
    same-tunnel-window fresh-cache A/B at the 128x2048 upsample point
    is 150.5/153.0 scans/s split vs 122.7/123.8 unsplit (+24%, 40.1
    Mrays/s at stream 128). Output is bit-identical.

    LT_ASSEMBLE_GATHER_SPLIT overrides (1 = never split, k = force k
    when divisible) for A/B re-probes — lowering regimes move between
    rounds. PROCESS-SCOPED: the value is read at trace time and baked
    into every compiled program, and it is NOT part of any jit cache
    key — toggling it after a shape has traced silently reuses the old
    program. Set it before the first trace; A/B runs must use separate
    processes (the fresh-compile-cache campaigns do).
    """
    env = os.environ.get("LT_ASSEMBLE_GATHER_SPLIT")
    if env is not None:
        k = int(env)
        return k if k > 1 and npix % k == 0 else 1
    if npix <= _GATHER_FAST_ROWS:
        return 1
    k = -(-npix // _GATHER_FAST_ROWS)        # ceil
    return k if npix % k == 0 else 1


def _chunked_row_gather(table, idx, split: int):
    """``table[idx]`` as ``split`` equal row-chunks (see above)."""
    if split <= 1:
        return table[idx]
    c = idx.shape[0] // split
    return jnp.concatenate(
        [table[idx[i * c:(i + 1) * c]] for i in range(split)], axis=0)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "beam_rows", "trunc"))
def _target_assemble(pos, tsdf_v, label_v, rem_v, valid,
                     fov_up_deg, fov_down_deg, beam_angles,
                     H, W, beam_rows, trunc):
    """Candidate z-buffer + winner-attribute fetch + zero-crossing output.

    Winner selection is exactly ``range_project``'s (same ``_pixel_keys``
    + stable (pixel, depth) sort), but the per-pixel attribute fetch is
    ONE row gather of a stacked (N, 8) attribute matrix instead of five
    separate 1-D gathers: the remote compiler lowers 1-D gathers through
    a ~8.5 ns/index scalar path while 2-D ROW gathers vectorize
    (~20x faster at 65k rows — docs/PERF.md). All arithmetic on the
    fetched values is identical to the previous range_project-based tail,
    so outputs are bit-equal.
    """
    n = pos.shape[0]
    npix = H * W
    P._check_beam_rows(beam_rows, beam_angles, H)
    pix, key, depth, uf, _, _, _, valid = P._pixel_keys(
        pos, valid, fov_up_deg, fov_down_deg, beam_angles,
        H, W, beam_rows, "depth")
    sp, si, is_first = P._winner_sort(pix, key, npix)
    tgt = jnp.where(is_first, sp, npix)
    win_idx = jnp.full((npix + 1,), _INT32_MAX, jnp.int32).at[tgt].set(
        jnp.where(is_first, si, _INT32_MAX), mode="drop")[:npix]
    has = (win_idx != _INT32_MAX).reshape(H, W)
    gidx = jnp.where(win_idx != _INT32_MAX, win_idx, 0)

    # labels ride as float VALUES (exact for ids < 2^24; semantic labels
    # are < 2^16) — NOT a bitcast: small ints reinterpreted as f32 are
    # subnormals and the TPU float path flushes them to zero
    stacked = jnp.concatenate(
        [pos, depth[:, None], uf[:, None], tsdf_v[:, None],
         rem_v[:, None],
         label_v.astype(jnp.float32)[:, None]],
        axis=1)                                            # (N, 8)
    wa = _chunked_row_gather(stacked, gidx, _gather_split_for(npix))
    pos_w = wa[:, 0:3].reshape(H, W, 3)
    depth_w = wa[:, 3].reshape(H, W)
    uf_w = wa[:, 4].reshape(H, W)
    tsdf_w = wa[:, 5].reshape(H, W)
    rem_w = wa[:, 6].reshape(H, W)
    lbl_w = jnp.rint(wa[:, 7]).astype(jnp.int32).reshape(H, W)

    # zero-crossing correction along the (co-centered) target ray:
    # t_surface = t_sample + tsdf * trunc  (tsdf <= 0 pulls toward sensor)
    rng = jnp.where(has,
                    jnp.maximum(depth_w + tsdf_w * jnp.float32(trunc),
                                0.0), 0.0)
    if beam_angles is not None:
        # rows are exact hardware beams (generate_rays convention):
        # endpoints lie ON the beam directions, not on the winning
        # sample's (within-capture-zone) source ray
        ba_desc = -jnp.sort(-jnp.asarray(beam_angles, jnp.float32))
        pitch = ba_desc[:, None]                           # (H, 1)
        yaw = (uf_w / W * 2.0 - 1.0) * jnp.pi
        cp, sp_ = jnp.cos(pitch), jnp.sin(pitch)
        dirs = jnp.stack([cp * jnp.cos(-yaw), cp * jnp.sin(-yaw),
                          jnp.broadcast_to(sp_, yaw.shape)], axis=-1)
        endpoints = dirs * rng[..., None]
    else:
        # has-mask: missing pixels carry dummy row-0 attributes (gidx=0)
        # and must produce zero endpoints like the old range_project tail
        scale = jnp.where(has & (depth_w > 0),
                          rng / jnp.maximum(depth_w, 1e-6), 0.0)
        endpoints = pos_w * scale[..., None]
    return (rng, jnp.where(has, lbl_w, 0),
            jnp.where(has, jnp.maximum(rem_w, 0.0), 0.0),
            endpoints, has)


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size", "samples_per_ray"))
def _band_samples_image(label_flat, rem_flat, rng_flat, pts_flat,
                        valid_flat, vol_origin, active_dims, dims,
                        voxel_size, samples_per_ray, trunc_margin):
    """Image-attributed band candidates: zero volume gathers, ONE
    candidate per source pixel (not K).

    Valid ONLY when a single image was fused (mergemesh): every band voxel
    was written by exactly this image, so each sample's tsdf is the known
    per-step distance -(k+0.5)*step/trunc and label/remission are its
    pixel's. (With multiple fused images the volume's class-aware blending
    can differ at collisions — use ``_band_samples`` then.)

    Why one candidate suffices: the sensor sits at the origin of both
    grids, so ALL K samples of a source ray share its direction and land
    in the SAME target pixel; the z-buffer's per-pixel min over the K*HW
    expansion therefore equals a min over per-ray minima, and a ray's
    minimum-depth valid sample is simply its smallest in-volume k. This
    collapses the downstream target projection from K*HW to HW elements
    (the sort was the #1 synthesis cost). Equivalent by the
    min-over-partition argument, up to one arbitrary-but-deterministic
    detail: ties at EXACTLY equal candidate depth now resolve by source
    pixel order instead of sample-k order (analytic synthetic scenes do
    produce exact ties; real LiDAR effectively never).
    """
    del dims      # clip uses active_dims only (kept for signature parity
    #               with _band_samples, whose full-dims clip needs it)
    K = samples_per_ray
    vox = jnp.float32(voxel_size)
    # single source of truth: VolumeSpec.trunc_margin (5 voxels,
    # fusion_lidar.py:31) — must equal _target_assemble's correction
    trunc = jnp.float32(trunc_margin)
    step = vox * 0.5

    safe_rng = jnp.maximum(rng_flat, 1e-6)
    dirs = pts_flat / safe_rng[:, None]

    # smallest k whose sample falls inside the (cropped) volume —
    # unrolled elementwise scan over the K half-voxel offsets
    found = jnp.zeros_like(valid_flat)
    kmin = jnp.zeros_like(rng_flat)
    for k in range(K):
        kd = jnp.float32((k + 0.5) * step)
        pos_k = dirs * (rng_flat + kd)[:, None]
        gi = jnp.round((pos_k - vol_origin[None, :]) / vox
                       ).astype(jnp.int32)
        inside = ((gi[:, 0] >= 0) & (gi[:, 0] < active_dims[0]) &
                  (gi[:, 1] >= 0) & (gi[:, 1] < active_dims[1]) &
                  (gi[:, 2] >= 0) & (gi[:, 2] < active_dims[2]))
        kmin = jnp.where(inside & ~found, jnp.float32(k), kmin)
        found = found | inside

    kd = (kmin + 0.5) * step
    t = rng_flat + kd
    pos = dirs * t[:, None]
    tsdf_v = -kd / trunc
    # band membership is geometric only — label-0 (unlabeled) surfaces
    # stay opaque, matching the fold / label_probe=False volume paths
    # and the reference, whose get_mesh marches the full tsdf without
    # label filtering (fusion_lidar.py:403-424); ignore-classes are
    # masked out of the window long before this (apply_class_masks)
    valid = valid_flat & found
    return pos, t, tsdf_v, label_flat.astype(jnp.int32), rem_flat, valid


@functools.partial(
    jax.jit, static_argnames=("dims", "voxel_size", "samples_per_ray"))
def _band_samples_fold(rng_s, pts_s, valid_s, label_s, rem_s,
                       vol_origin, active_dims, dims, voxel_size,
                       samples_per_ray, trunc_margin):
    """Volume-FREE band candidates with EXACT class-aware collision
    semantics for S fused images on a shared grid (the mesh adaption).

    Key structural fact: the mesh adaption projects every scan into the
    SAME spherical grid (source spec, primary-frame origin —
    laserscan.py:875-879), so a voxel's image pixel (u, v) is identical
    for all S integrates. The class-aware fold the volume would hold at
    any band sample is therefore a function of the S images AT THE
    SAMPLE'S OWN SOURCE PIXEL: fold the reference update rule
    (fusion_lidar.py:191-228, including the weight-as-dist quirk) over
    the S aligned observations elementwise. No volume is read or even
    written — this generalizes the mergemesh deferred-volume design
    (``_band_samples_image`` is exactly the S == 1 case) to per-scan
    fusion, replacing ~6 K*HW lane_pick gathers (~100 ms/frame at
    reference scale) with ~60M VPU flops (~1 ms).

    Deviation vs the materialized-volume probe (``_band_samples``): the
    fold evaluates the CONTINUOUS field at the sample's ray distance
    instead of the voxel-center-quantized value at round(pos/voxel), so
    band boundaries can shift by up to half a voxel and pixel-boundary
    voxels may fold a neighboring column — the same sub-voxel class of
    deviation the zero-crossing correction already accepts, and it
    matches the reference's own CPU/GPU paths more closely (they too
    evaluate diff at the exact voxel distance, not a quantized one).

    Args: (S, HW) stacks of range/valid/label/rem and (S, HW, 3) points
    per fused image. Returns flat (S*HW,) candidate arrays like
    ``_band_samples``.
    """
    S, HW = rng_s.shape
    K = samples_per_ray
    vox = jnp.float32(voxel_size)
    # single source of truth: VolumeSpec.trunc_margin (5 voxels,
    # fusion_lidar.py:31) — must equal _target_assemble's correction
    trunc = jnp.float32(trunc_margin)
    step = vox * 0.5

    safe = jnp.maximum(rng_s, 1e-6)
    dirs = pts_s / safe[..., None]                        # (S, HW, 3)
    k = (jnp.arange(K, dtype=jnp.float32) + 0.5) * step
    t = rng_s[None] + k[:, None, None]                    # (K, S, HW)
    pos = dirs[None] * t[..., None]                       # (K, S, HW, 3)
    gi = jnp.round((pos - vol_origin) / vox).astype(jnp.int32)
    inside = ((gi[..., 0] >= 0) & (gi[..., 0] < active_dims[0]) &
              (gi[..., 1] >= 0) & (gi[..., 1] < active_dims[1]) &
              (gi[..., 2] >= 0) & (gi[..., 2] < active_dims[2]))

    # fold the reference's class-aware rule over the S observers, in
    # integrate order — identical arithmetic to the Pallas kernel
    # (ops/tsdf_pallas._kernel_plane), f32 throughout
    tsdf_f = jnp.ones_like(t)
    weight_f = jnp.zeros_like(t)
    label_f = jnp.zeros_like(t)
    rem_f = jnp.zeros_like(t)
    for sp in range(S):
        depth_val = rng_s[sp]                             # (HW,)
        new_label = label_s[sp].astype(jnp.float32)
        new_rem = rem_s[sp]
        obs_ok = valid_s[sp] & (depth_val > 0.0)
        diff = depth_val - t                              # (K, S, HW)
        dist = jnp.minimum(1.0, diff / trunc)
        active = obs_ok & (diff >= -trunc)

        same = label_f == new_label
        w_new = weight_f + 1.0
        tsdf_avg = (tsdf_f * weight_f + dist) / w_new
        rem_avg = (rem_f * weight_f + new_rem) / w_new
        closer = dist < weight_f
        upd_same = active & same
        upd_diff = active & (~same) & closer
        tsdf_f = jnp.where(upd_same, tsdf_avg,
                           jnp.where(upd_diff, dist, tsdf_f))
        label_f = jnp.where(upd_diff, new_label, label_f)
        rem_f = jnp.where(upd_same, rem_avg,
                          jnp.where(upd_diff, new_rem, rem_f))
        weight_f = jnp.where(upd_same, w_new, weight_f)

    # usable sample: spawner-valid, in the (cropped) volume, in the
    # folded written band (tsdf <= 0; raymarcher label-0 semantics —
    # the label is whatever the fold left, possibly 0)
    ok = valid_s[None] & inside & (tsdf_f <= 0.0)

    # first usable k per (scan, ray) — the min-over-partition collapse
    kmin = jnp.argmax(ok, axis=0)                         # (S, HW)
    found = jnp.any(ok, axis=0)
    selm = (jax.lax.broadcasted_iota(jnp.int32, (K, S, HW), 0)
            == kmin[None])

    def pick(a):
        return jnp.sum(jnp.where(selm, a, jnp.zeros((), a.dtype)), axis=0)

    t_c = pick(t)
    tsdf_c = pick(tsdf_f)
    label_c = pick(label_f)
    rem_c = pick(rem_f)
    pos_c = dirs * t_c[..., None]
    return (pos_c.reshape(-1, 3), t_c.reshape(-1), tsdf_c.reshape(-1),
            label_c.astype(jnp.int32).reshape(-1), rem_c.reshape(-1),
            found.reshape(-1))


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size", "samples_per_ray",
                     "label_probe"))
def _band_samples(tsdf, label, rem, rng_flat, pts_flat, valid_flat,
                  vol_origin, active_dims, dims, voxel_size,
                  samples_per_ray, label_probe=False, x_offset=None):
    """Per source pixel: K positions through the band + volume attributes.

    Returns flat arrays of length K * HW: positions (N,3), depth (N,),
    tsdf value, label, remission, valid mask.

    ``x_offset`` (X-sharded volumes, parallel/sharding.sharded_band_probe):
    when set, ``vol_origin`` must be the GLOBAL volume origin and
    ``tsdf``/``label``/``rem``/``dims``/``active_dims`` the local X-slab;
    voxel indices are computed against the global origin (the identical
    f32 expression on every shard — bit-equal results) and then shifted
    by the integer ``x_offset`` before the inside test and gather.
    Deriving ownership from a per-shard f32 origin instead would not
    partition exactly: round((pos - origin - k*slab*vox)/vox) need not
    equal round((pos - origin)/vox) - k*slab (f32 rounding of the
    shifted origin, and half-to-even ties are not shift-invariant), so a
    slab-boundary sample could be claimed by both neighbors (psum then
    doubles its attributes) or by neither (candidate lost).

    ``label_probe``: True additionally requires label > 0 of every band
    sample (a K*HW label gather — measured ~39 ms/frame at reference
    scale over 3 sources); False uses the raymarcher's semantics — band
    membership is tsdf <= 0 alone, and the label is read once at the
    CHOSEN sample (it may be 0 for label-0 source pixels, exactly as a
    raymarcher hit on such a surface would report; the reference's mesh
    path likewise keeps label-0 surfaces, they ray-occlude and carry
    label 0 through the color round-trip, laserscan.py:1001-1004).
    Outputs differ only at rays whose surface came from a label-0 pixel.
    """
    X, Y, Z = dims
    K = samples_per_ray
    vox = jnp.float32(voxel_size)

    safe_rng = jnp.maximum(rng_flat, 1e-6)
    dirs = pts_flat / safe_rng[:, None]                      # unit rays

    # half-voxel spacing through the band behind the surface: at grazing
    # incidence the written carpet is thinner than one voxel normal to the
    # surface, so coarse sampling walks right past its corners
    k = (jnp.arange(K, dtype=jnp.float32) + 0.5) * (vox * 0.5)
    t = rng_flat[None, :] + k[:, None]                       # (K, HW)
    pos = dirs[None, :, :] * t[..., None]                    # (K, HW, 3)

    pos = pos.reshape(-1, 3)
    t = t.reshape(-1)
    valid = jnp.broadcast_to(valid_flat[None, :],
                             (K, valid_flat.shape[0])).reshape(-1)

    g = (pos - vol_origin[None, :]) / vox
    # NEAREST corner, not floor: integrate evaluates voxel values at grid
    # corners (origin + i*vox), so round() reads the closest value sample —
    # floor() systematically reads one corner below/behind thin bands
    gi = jnp.round(g).astype(jnp.int32)
    if x_offset is not None:
        # global -> slab-local X index (exact integer shift; see the
        # docstring's ownership argument)
        gi = gi.at[:, 0].add(-jnp.asarray(x_offset, jnp.int32))
    inside = ((gi[:, 0] >= 0) & (gi[:, 0] < active_dims[0]) &
              (gi[:, 1] >= 0) & (gi[:, 1] < active_dims[1]) &
              (gi[:, 2] >= 0) & (gi[:, 2] < active_dims[2]))
    gic = jnp.clip(gi, 0, jnp.asarray([X - 1, Y - 1, Z - 1]))
    flat = (gic[:, 0] * Y + gic[:, 1]) * Z + gic[:, 2]

    from lidar_transfer_tpu.ops.gather import lane_pick

    # lane_pick: 2x the scalar-lowered 1-D gather at these index counts
    # (ops/gather.py) — these three fetches were ~60% of the mesh
    # adaption's frame time
    tsdf_v = lane_pick(tsdf.reshape(-1), flat).astype(jnp.float32)

    # a usable sample: inside the (cropped) volume and in the written band
    # (tsdf <= 0 — integrate only writes dist<0 voxels on first touch);
    # with label_probe it must additionally carry a real label
    ok = valid & inside & (tsdf_v <= 0.0)
    if label_probe:
        label_v = lane_pick(label.reshape(-1), flat).astype(jnp.int32)
        ok = ok & (label_v > 0)

    # collapse K samples -> ONE candidate per ray (the image path's
    # min-over-partition argument, _band_samples_image: all K samples of
    # a ray share its target pixel and depth grows with k, so the
    # z-buffer's per-pixel min over the K*HW expansion equals a min over
    # per-ray minima — the smallest usable k). Downstream sort/scatter
    # shrink K-fold, and the remission volume is only read at the CHOSEN
    # sample instead of all K (2/3 fewer band gathers; tie-breaks at
    # exactly equal depth resolve by ray order, as on the image path).
    HW = rng_flat.shape[0]
    okK = ok.reshape(K, HW)
    kmin = jnp.argmax(okK, axis=0)                  # first usable k
    found = jnp.any(okK, axis=0)
    selm = (jax.lax.broadcasted_iota(jnp.int32, (K, HW), 0)
            == kmin[None, :])

    def pick(aK):
        """Select the chosen sample's value per ray (exact: exactly one
        row survives the mask; dtype preserved — flat indices exceed
        f32's 2^24 integer range, so no float round-trips)."""
        a = aK.reshape(K, HW)
        return jnp.sum(jnp.where(selm, a, jnp.zeros((), a.dtype)),
                       axis=0)

    t_c = pick(t)
    tsdf_c = pick(tsdf_v)
    flat_c = pick(flat)
    if label_probe:
        label_c = pick(label_v)
    else:
        # one label fetch at the chosen sample only (HW, not K*HW)
        label_c = lane_pick(label.reshape(-1), flat_c).astype(jnp.int32)
    pos_c = dirs * t_c[:, None]
    rem_c = lane_pick(rem.reshape(-1), flat_c).astype(jnp.float32)
    return pos_c, t_c, tsdf_c, label_c, rem_c, found


@functools.partial(jax.jit, static_argnames=("H", "W", "m_v", "m_u",
                                             "voxel_size", "v_span"))
def _interp_candidates(rng_flat, pts_flat, valid_flat, label_flat,
                       rem_flat, vol_origin, active_f, thresh, tan_min,
                       *, H, W, m_v, m_u, voxel_size, v_span=1):
    """Chord-interpolated candidates between adjacent source returns —
    the splat's equivalent of the reference's mesh interpolation.

    The reference's raycast hits TRIANGLE INTERIORS of the marched
    surface (RayTracer.cpp:62-92), so a target grid DENSER than the
    source still gets interior returns between adjacent source beams.
    A one-candidate-per-source-ray splat cannot cover those pixels
    (every candidate lands on a source ray direction). This emits
    ``m_v`` extra candidates along the 3-D chord between vertically
    adjacent valid pixels and ``m_u`` along horizontally adjacent ones
    (with yaw wrap-around), gated by the connectivity the marched
    TSDF surface effectively has: two returns are connected iff
    (a) their truncation bands overlap along the rays
    (|r_a - r_b| <= trunc_margin), OR (b) the chord between them makes
    a grazing-surface angle with the far ray — the classic range-image
    criterion beta = atan2(r_near sin dtheta, r_far - r_near cos dtheta)
    (Bogoslavskyi & Stachniss' ground/segment test): a continuous
    surface seen at grazing incidence (road ahead) has beta of several
    degrees even when |r_a - r_b| is many truncation margins (its band
    carpet is CONTIGUOUS laterally, which is exactly why the raymarcher
    and the reference's mesh hit it), while a real depth discontinuity
    (object edge against background) has beta -> 0. ``tan_min`` is
    tan(beta_threshold).

    Interpolated candidates are ON the surface (tsdf = 0, so the
    zero-crossing correction is a no-op), carry the NEARER-half
    endpoint's label (the reference's mesh takes vertex-0's —
    RayTracer.cpp:75 — both are 'a corner of the interpolated cell'),
    and lerp remission (the reference means the 3 vertices,
    Triangle.h:63-70).

    Every interpolated position is gated on lying INSIDE the active
    volume (same round-to-voxel test as every other candidate source)
    — the marched surface the reference interpolates only exists
    within the fused volume, so chords between returns beyond clipped
    bounds must not synthesize phantom returns there.

    ``v_span`` > 1 additionally emits vertical chords between rows
    2..v_span apart with ((m_v+1)*d - 1) interior samples each: a
    snapped source beam table (projection row = linear map of the
    SNAPPED angle) can leave empty interleaved rows, where strictly
    adjacent-row chords never find two valid endpoints.

    Returns the standard candidate tuple (pos (N,3), depth (N,),
    tsdf (N,), label int32 (N,), rem (N,), valid (N,)) with static
    N = sum_d ((m_v+1)d-1)*(H-d)*W + m_u*H*W + (min(m_v, m_u)*(H-1)*W
    if both axes upsample — the cell-diagonal chords).
    """
    img_r = rng_flat.reshape(H, W)
    img_p = pts_flat.reshape(H, W, 3)
    img_v = valid_flat.reshape(H, W)
    img_l = label_flat.reshape(H, W).astype(jnp.int32)
    img_e = rem_flat.reshape(H, W)
    parts = []

    def emit(sl_a, sl_b, m):
        ra, rb = sl_a(img_r), sl_b(img_r)
        pa, pb = sl_a(img_p), sl_b(img_p)
        # band overlap OR grazing-surface angle (docstring)
        sa = jnp.maximum(ra, 1e-6)[..., None]
        sb = jnp.maximum(rb, 1e-6)[..., None]
        cosd = jnp.clip(jnp.sum((pa / sa) * (pb / sb), axis=-1),
                        -1.0, 1.0)
        sind = jnp.sqrt(jnp.maximum(0.0, 1.0 - cosd * cosd))
        rn = jnp.minimum(ra, rb)
        rf = jnp.maximum(ra, rb)
        den = rf - rn * cosd
        beta_ok = (den <= 0.0) | (rn * sind >= tan_min * den)
        ok = (sl_a(img_v) & sl_b(img_v)
              & (beta_ok | (jnp.abs(ra - rb) <= thresh))).reshape(-1)
        la, lb = sl_a(img_l).reshape(-1), sl_b(img_l).reshape(-1)
        ea, eb = sl_a(img_e).reshape(-1), sl_b(img_e).reshape(-1)
        for j in range(1, m + 1):
            f = j / (m + 1)
            pos = (pa + f * (pb - pa)).reshape(-1, 3)
            gi = jnp.round((pos - vol_origin[None, :]) /
                           jnp.float32(voxel_size))
            inside = ((gi[:, 0] >= 0) & (gi[:, 0] < active_f[0]) &
                      (gi[:, 1] >= 0) & (gi[:, 1] < active_f[1]) &
                      (gi[:, 2] >= 0) & (gi[:, 2] < active_f[2]))
            z = jnp.zeros(pos.shape[:1], pos.dtype)
            # depth slot (index 1) is unread by splat_synthesize; tsdf
            # is 0 (candidates sit ON the surface)
            parts.append((pos, z, z,
                          la if f <= 0.5 else lb,
                          ea + f * (eb - ea), ok & inside))

    if m_v:
        # v_span > 1: a snapped beam table leaves empty interleaved rows
        # — chords must also bridge rows d apart (both endpoints valid
        # only at actually occupied rows), with enough interior samples
        # to cover the proportionally larger target-row gap
        for d in range(1, v_span + 1):
            emit(lambda a, d=d: a[:-d], lambda a, d=d: a[d:],
                 (m_v + 1) * d - 1)
    if m_u:
        emit(lambda a: a, lambda a: jnp.roll(a, -1, axis=1), m_u)
    if m_v and m_u:
        # both axes upsampled: diagonal interior pixels of each 2x2
        # source cell get neither a vertical nor a horizontal chord —
        # emit candidates along the cell DIAGONAL (the cell's two
        # triangles share it in any triangulation of the grid, so these
        # lie on the mesh the reference would raycast)
        emit(lambda a: a[:-1], lambda a: jnp.roll(a, -1, axis=1)[1:],
             min(m_v, m_u))
    return tuple(jnp.concatenate([p[i] for p in parts])
                 for i in range(6))


def splat_synthesize(state: TSDFState, spec: VolumeSpec, sources, *,
                     target_H: int, target_W: int,
                     fov_up_deg: float, fov_down_deg: float,
                     vol_origin, active_dims=None, beam_angles=None,
                     samples_per_ray: int = 8, attrs: str = "auto",
                     label_probe: bool = False, interp=None,
                     interp_sources=None):
    """Synthesize a target-spec virtual scan from the fused volume.

    Args:
      sources: list of (range_flat (HW,), points_flat (HW,3), valid (HW,),
        label_flat (HW,), rem_flat (HW,)) per integrated source image —
        the band is seeded from every image that was fused (one for
        mergemesh, nscans for mesh).
      target_*: target sensor grid/fov.
      vol_origin / active_dims: the volume placement used at integrate.
      attrs: "volume" gathers sample attributes from the fused volume
        (voxel-quantized class-aware semantics); "image" derives them
        from the source pixel (zero volume gathers — exact when a single
        image was fused); "fold" computes the class-aware collision fold
        from the S aligned images elementwise (zero gathers, valid
        whenever all sources share the projection grid/origin — the mesh
        adaption; see ``_band_samples_fold``); "auto" picks image iff
        len(sources) == 1 else the conservative volume probe. The fold
        must be requested EXPLICITLY because its shared-grid
        precondition cannot be checked here — off-grid sources would
        fold against the wrong pixels silently.
      label_probe: volume path only — see ``_band_samples`` (the False
        default = raymarcher label-0 semantics, drops the K-sample
        label gather; matches the engine's ``band_label_probe`` and the
        sharded twin ``parallel.sharding.splat_synthesize_sharded``).
      interp: None, or (H, W, m_v, m_u, tan_min[, v_span]) — source-
        image dims, the interior interpolation counts, the connectivity
        angle tangent for UPSAMPLING targets, and optionally the
        occupied-row gap ``v_span`` chords may bridge (defaults to 1 =
        adjacent rows; the engine passes ``_interp_vspan`` for snapped
        beam tables with empty interleaved rows — see
        ``_interp_candidates``; requires flat arrays in (H, W)
        row-major image order).
      interp_sources: optional list of image-ORDERED source tuples to
        feed ``_interp_candidates`` when ``sources`` itself is not in
        image order (the z-buffer-ordered fast body densifies its
        winners into raster order with one row scatter and passes the
        result here). Defaults to ``sources``.

    Returns a RangeImage-like tuple:
      (range (H,W), label (H,W), remission (H,W), endpoints (H,W,3),
       mask (H,W)).
    """
    if active_dims is None:
        active_dims = jnp.asarray(spec.dims, jnp.int32)
    vol_origin = jnp.asarray(vol_origin, jnp.float32)
    active_f = jnp.asarray(active_dims, jnp.float32)
    if attrs == "auto":
        attrs = "image" if len(sources) == 1 else "volume"
    if attrs not in ("image", "fold", "volume"):
        raise ValueError(
            f"unknown attrs {attrs!r} (expected 'auto', 'image', 'fold' "
            "or 'volume') — a typo here would silently change band "
            "semantics")

    if attrs == "image":
        parts = [
            _band_samples_image(lf, rf, r, p, v, vol_origin, active_f,
                                dims=spec.dims,
                                voxel_size=spec.voxel_size,
                                samples_per_ray=samples_per_ray,
                                trunc_margin=spec.trunc_margin)
            for (r, p, v, lf, rf) in sources
        ]
    elif attrs == "fold":
        parts = [_band_samples_fold(
            jnp.stack([r for (r, _, _, _, _) in sources]),
            jnp.stack([p for (_, p, _, _, _) in sources]),
            jnp.stack([v for (_, _, v, _, _) in sources]),
            jnp.stack([lf for (_, _, _, lf, _) in sources]),
            jnp.stack([rf for (_, _, _, _, rf) in sources]),
            vol_origin, active_f, dims=spec.dims,
            voxel_size=spec.voxel_size,
            samples_per_ray=samples_per_ray,
            trunc_margin=spec.trunc_margin)]
    else:
        parts = [
            _band_samples(state.tsdf, state.label, state.rem, r, p, v,
                          vol_origin, active_f, dims=spec.dims,
                          voxel_size=spec.voxel_size,
                          samples_per_ray=samples_per_ray,
                          label_probe=label_probe)
            for (r, p, v, _, _) in sources
        ]
    if interp is not None:
        iH, iW, m_v, m_u, tan_min, *rest = interp
        v_span = rest[0] if rest else 1
        if m_v or m_u:
            parts.extend(
                _interp_candidates(r, p, v, lf, rf,
                                   vol_origin, active_f,
                                   jnp.float32(spec.trunc_margin),
                                   jnp.float32(tan_min),
                                   H=iH, W=iW, m_v=m_v, m_u=m_u,
                                   voxel_size=float(spec.voxel_size),
                                   v_span=v_span)
                for (r, p, v, lf, rf) in (
                    sources if interp_sources is None
                    else interp_sources))
    return assemble_candidate_parts(
        parts, fov_up_deg=fov_up_deg, fov_down_deg=fov_down_deg,
        beam_angles=beam_angles, target_H=target_H, target_W=target_W,
        trunc=float(spec.trunc_margin))


def assemble_candidate_parts(parts, *, fov_up_deg, fov_down_deg,
                             beam_angles, target_H, target_W,
                             trunc: float):
    """Shared synthesis tail: concat per-source candidate tuples and
    z-buffer them into the target grid (``_target_assemble``).

    The ONLY marshalling of candidate parts into _target_assemble —
    used by ``splat_synthesize`` and the distributed twin
    (``parallel.sharding.splat_synthesize_sharded``) so a change to the
    candidate columns cannot silently break their bit-identical parity.
    ``parts``: tuples of (pos, t, tsdf, label, rem, valid).
    """
    pos = jnp.concatenate([a[0] for a in parts])
    tsdf_v = jnp.concatenate([a[2] for a in parts])
    label_v = jnp.concatenate([a[3] for a in parts])
    rem_v = jnp.concatenate([a[4] for a in parts])
    valid = jnp.concatenate([a[5] for a in parts])

    if beam_angles is not None:
        beam_angles = jnp.asarray(beam_angles, jnp.float32)
    return _target_assemble(
        pos, tsdf_v, label_v.astype(jnp.int32),
        rem_v.astype(jnp.float32), valid,
        jnp.asarray(fov_up_deg, jnp.float32),
        jnp.asarray(fov_down_deg, jnp.float32), beam_angles,
        H=target_H, W=target_W,
        # row i = beam i, matching generate_rays
        beam_rows=beam_angles is not None,
        trunc=trunc)

"""Pallas TPU kernel for class-aware TSDF integration.

Why a hand-written kernel: the XLA formulation (ops/tsdf.py) fetches each
voxel's range-image pixel with a per-element gather, and XLA:TPU's gather
lowering is unreliable at this scale — measured 8.8 ns/element (scalar) on
some compiles of the exact same HLO that other compiles run ~1000x faster.
At reference-scale volumes (872M voxels, ±50 m @ 0.05 m) that is the
difference between ~8 ms and ~23 s per fusion.

The kernel removes the big gather entirely using the structure of the
problem (SURVEY.md §2.2 N9):

  - a voxel's image COLUMN u depends only on its (x, y) — yaw is constant
    along z. Stage 1 (``_build_cols_impl``, its own jit) fetches each
    (x, y)'s column values as one contiguous 128-lane row of a transposed
    image table — depth in lanes [0,64), a packed label*16384 + 14-bit
    remission f32 (exact in the 23-bit mantissa) in [64,128) — yielding a
    lane-minor (X, Y, 128) array with no transposes and no HBM tile
    padding;
  - stage 2 (the pallas_call, its own jit) gives each grid step one
    x-plane's y-tile of the volume plus its col rows in VMEM. The only
    gather left is ``take_along_axis`` over the 128-lane col rows (row v
    for depth, v+64 for the packed value) — a lane-local dynamic gather
    Mosaic supports natively (operand and index minor dims must match and
    stay <= 128);
  - everything else (spherical geometry, FOV/crop masks, the reference's
    class-aware update rule, fusion_lidar.py:191-228) is elementwise VPU
    work, and the state tiles are updated in place via
    input_output_aliases.

Why two separate jits (round-2 finding, scripts/probe_integrate_ablate.py
+ probe_alias.py + probe_pallas_write.py): each stage is fast alone
(~6 ms cols + ~10 ms kernel at 268M voxels) but the remote XLA:TPU
compiler lowers the SAME gather ~5x slower when it feeds the pallas_call
inside one program. Eagerly the two dispatches pipeline to ~12 ms at
268M voxels / ~26 ms at the reference-scale 1.07G (41 Gvoxel/s, ~4x over
the round-1 single-program form); traced callers inline both stages.
Also: never put a blocking host read (int(jnp.max(...))) on the per-frame
path — one sync serializes the whole dispatch stream (~30 ms each).

Two geometry modes share the same kernel body:
  - in-kernel: pitch via a minimax atan polynomial (Mosaic lowers no
    asin/atan2/atan) — works for any per-frame volume placement;
  - precomputed v-table (i8; -1 = out of FOV) from
    ``precompute_geometry`` — skips the atan chain when the placement is
    frame-invariant (fixed_bounds), leaving one sqrt per voxel.
"""

from __future__ import annotations

import atexit
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_transfer_tpu.ops.tsdf import TSDFState, VolumeSpec

_PW = 128      # processing width: full (8,128) VPU register lanes


def _atan_poly(x):
    """arctan for any real x; Mosaic has no asin/atan2/atan lowering.

    Odd minimax polynomial on [0,1] + the reflection
    atan(x) = pi/2 - atan(1/x) for |x| > 1. Max abs error ~1e-5 rad —
    three orders below one image row (64 rows over ~0.5 rad). Consequence:
    voxels whose pitch lies within ~1e-5 rad of an FOV boundary may decide
    in_fov differently from the exact-asin XLA path (measured ~1 voxel per
    tens of millions); the differential tests tolerate exactly that band."""
    ax = jnp.abs(x)
    inv = ax > 1.0
    z = jnp.where(inv, 1.0 / jnp.maximum(ax, 1e-30), ax)
    z2 = z * z
    p = z * (0.99997726 + z2 * (-0.33262347 + z2 * (
        0.19354346 + z2 * (-0.11643287 + z2 * (
            0.05265332 + z2 * -0.01172120)))))
    p = jnp.where(inv, jnp.float32(np.pi / 2) - p, p)
    return jnp.where(x < 0, -p, p)


def _kernel(params_ref, *all_refs,
            Z, H, CW, R, BX, voxel_size, trunc, reset, has_vtab,
            write_weight, fused_cols, S=1):
    """One grid step: update BX x-planes' (y-tile) slabs of the volume.

    all_refs = S scans' col refs (per scan: 1 fused (BX,R,2CW) ref when
    ``fused_cols`` — depth in lanes [0,CW), packed label+rem in [CW,2CW)
    — else 2 separate (BX,R,128) refs) + ([v_ref] if has_vtab) + 4
    state-in refs + 4-or-3 state-out refs (forwarded untouched to
    _kernel_plane, which unpacks them; weight has no out ref when
    write_weight is False).
    BX > 1 amortizes the per-grid-step overhead (~20 us each through the
    remote runtime) over more voxels; bounded by VMEM.
    S > 1 = the fused CHAIN: S sequential class-aware integrates of the
    same volume applied in registers with ONE state write — exactly
    equivalent to S chained calls (reset on the first), at 1/S the state
    HBM traffic (the mesh adaption's per-scan loop, laserscan.py:863-918).
    """
    ncol = S if fused_cols else 2 * S
    col_refs = all_refs[:ncol]
    refs = all_refs[ncol:]
    if fused_cols:
        scan_cols = tuple((r, None) for r in col_refs)
    else:
        scan_cols = tuple((col_refs[2 * s], col_refs[2 * s + 1])
                          for s in range(S))
    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    fov_up = params_ref[0, 3]
    fov_down = params_ref[0, 4]
    obs_w = params_ref[0, 5]
    ay = params_ref[0, 6]        # active crop (y, z, x)
    az = params_ref[0, 7]
    ax = params_ref[1, 0]
    fov = jnp.abs(fov_up) + jnp.abs(fov_down)

    y0 = pl.program_id(1) * R
    gy = (y0 + jax.lax.broadcasted_iota(jnp.int32, (R, _PW), 0)
          ).astype(jnp.float32)

    for bx in range(BX):
        _kernel_plane(params_ref, scan_cols, refs, bx,
                      gy, ox, oy, oz, fov_up, fov_down, fov, obs_w,
                      ax, ay, az, Z=Z, H=H, CW=CW, R=R, BX=BX,
                      voxel_size=voxel_size, trunc=trunc, reset=reset,
                      has_vtab=has_vtab, write_weight=write_weight)


def _kernel_plane(params_ref, scan_cols, refs, bx, gy,
                  ox, oy, oz, fov_up, fov_down, fov, obs_w, ax, ay, az,
                  *, Z, H, CW, R, BX, voxel_size, trunc, reset,
                  has_vtab, write_weight):
    if has_vtab:
        v_ref, refs = refs[0], refs[1:]
    tsdf_ref, w_ref, lab_ref, rem_ref = refs[0:4]
    if write_weight:
        out_tsdf, out_w, out_lab, out_rem = refs[4:8]
    else:
        out_tsdf, out_lab, out_rem = refs[4:7]
        out_w = None

    gx = (jnp.float32(pl.program_id(0)) * BX + bx)
    px = ox + gx * voxel_size
    py = oy + gy * voxel_size
    rxy2 = px * px + py * py
    in_crop_xy = (gx < ax) & (gy < ay)

    # cols arrive (R, 128)-shaped per plane, lane-minor and register-wide:
    # no in-kernel transpose, no padding. With a fused ref (CW=64), lanes
    # [0,64) hold the depth column and [64,128) the packed label+rem
    # column; take_along_axis picks row v from the depth half and v+CW
    # from the packed half of the SAME operand.
    cols = [(d[bx], lr[bx] if lr is not None else None)
            for d, lr in scan_cols]

    for zc in range(0, Z, _PW):
        width = min(_PW, Z - zc)

        def load(ref, w=width, b=bx):
            blk = ref[b, :, zc:zc + w]
            if w < _PW:
                blk = jnp.pad(blk, ((0, 0), (0, _PW - w)))
            return blk

        gz = (jax.lax.broadcasted_iota(jnp.int32, (R, _PW), 1)
              + zc).astype(jnp.float32)
        pz = oz + gz * voxel_size
        depth = jnp.sqrt(rxy2 + pz * pz)
        if has_vtab:
            v_raw = load(v_ref).astype(jnp.int32)
            in_fov = v_raw >= 0
            v = jnp.maximum(v_raw, 0)
        else:
            # asin(pz / depth) == atan(pz / r_xy) for r_xy >= 0
            pitch = _atan_poly(pz / jnp.maximum(jnp.sqrt(rxy2), 1e-12))
            in_fov = (pitch <= fov_up) & (pitch >= fov_down)
            vf = (1.0 - (pitch + jnp.abs(fov_down)) / fov) * H
            v = jnp.clip(jnp.floor(vf), 0, H - 1).astype(jnp.int32)

        base_active = in_crop_xy & (gz < az) & in_fov

        if reset:
            tsdf_f = jnp.zeros((R, _PW), jnp.float32) + 1.0
            weight_f = jnp.zeros((R, _PW), jnp.float32)
            rem_f = jnp.zeros((R, _PW), jnp.float32)
            label_f = jnp.zeros((R, _PW), jnp.float32)
        else:
            tsdf_f = load(tsdf_ref).astype(jnp.float32)
            weight_f = load(w_ref).astype(jnp.float32)
            rem_f = load(rem_ref).astype(jnp.float32)
            label_f = load(lab_ref).astype(jnp.float32)

        for dcol, lrcol in cols:
            depth_val = jnp.take_along_axis(dcol, v, axis=1)
            if lrcol is None:
                lr = jnp.take_along_axis(dcol, v + CW, axis=1)
            else:
                lr = jnp.take_along_axis(lrcol, v, axis=1)
            new_label = jnp.floor(lr * (1.0 / 16384.0))
            new_rem = (lr - new_label * 16384.0) * (1.0 / 16383.0)

            diff = depth_val - depth
            dist = jnp.minimum(1.0, diff / trunc)
            active = base_active & (depth_val > 0.0) & (diff >= -trunc)

            # the reference's class-aware rule (fusion_lidar.py:191-228);
            # label ids compared as f32 (ids <= 259, exact)
            same = label_f == new_label
            w_new = weight_f + obs_w
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

        out_tsdf[bx, :, zc:zc + width] = \
            tsdf_f[:, :width].astype(out_tsdf.dtype)
        if write_weight:
            out_w[bx, :, zc:zc + width] = \
                weight_f[:, :width].astype(out_w.dtype)
        out_lab[bx, :, zc:zc + width] = \
            label_f[:, :width].astype(out_lab.dtype)
        out_rem[bx, :, zc:zc + width] = \
            rem_f[:, :width].astype(out_rem.dtype)


def _geom_kernel(params_ref, v_out, *, Z, H, R, voxel_size):
    """Write per-voxel image row v (i8; -1 = out of FOV) — the expensive
    (atan) frame-invariant part of the integrate geometry. Runs once per
    volume placement; depth itself stays in-kernel (one sqrt)."""
    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    fov_up = params_ref[0, 3]
    fov_down = params_ref[0, 4]
    fov = jnp.abs(fov_up) + jnp.abs(fov_down)

    gx = jnp.float32(pl.program_id(0))
    y0 = pl.program_id(1) * R
    gy = (y0 + jax.lax.broadcasted_iota(jnp.int32, (R, _PW), 0)
          ).astype(jnp.float32)
    px = ox + gx * voxel_size
    py = oy + gy * voxel_size
    rxy2 = px * px + py * py

    for zc in range(0, Z, _PW):
        width = min(_PW, Z - zc)
        gz = (jax.lax.broadcasted_iota(jnp.int32, (R, _PW), 1)
              + zc).astype(jnp.float32)
        pz = oz + gz * voxel_size
        pitch = _atan_poly(pz / jnp.maximum(jnp.sqrt(rxy2), 1e-12))
        in_fov = (pitch <= fov_up) & (pitch >= fov_down)
        vf = (1.0 - (pitch + jnp.abs(fov_down)) / fov) * H
        v = jnp.clip(jnp.floor(vf), 0, H - 1).astype(jnp.int32)
        v = jnp.where(in_fov, v, -1)
        v_out[0, :, zc:zc + width] = v[:, :width].astype(jnp.int8)


def _col_width(H: int) -> int:
    if H <= 64:
        return 64
    if H <= 128:
        return 128
    raise ValueError(f"pallas integrate supports H <= 128 beams, got {H}")


def supports(spec: VolumeSpec, H: int) -> bool:
    """Can the pallas integrate run this volume/image combination?

    Includes the TPU Mosaic aliasing constraint (compact bf16 state
    tiles can only alias in place when the minor dim is a 128 multiple —
    CLAUDE.md) so callers don't have to re-implement eligibility;
    interpret mode (CPU backend) has no such constraint.
    """
    X, Y, Z = spec.dims
    if H > 128 or Y % min(Y, 1024) != 0:
        return False
    if jax.default_backend() == "tpu" and Z % 128 != 0:
        return False
    return True


def _params(origin, fov_up_deg, fov_down_deg, obs_weight, active_dims):
    p = jnp.zeros((2, 8), jnp.float32)
    p = p.at[0, :].set(jnp.stack([
        origin[0], origin[1], origin[2],
        jnp.deg2rad(fov_up_deg), jnp.deg2rad(fov_down_deg),
        obs_weight, active_dims[1], active_dims[2]]))
    return p.at[1, 0].set(active_dims[0])


def _specs(Z, BY, BX=1):
    state_spec = pl.BlockSpec((BX, BY, Z), lambda x, y: (x, y, 0),
                              memory_space=pltpu.VMEM)
    # col arrays are (X, Y, 128) lane-minor (fused depth|packed when
    # CW=64); blocks are full 128-lane rows — no transpose, no padding
    col_spec = pl.BlockSpec((BX, BY, _PW), lambda x, y: (x, y, 0),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((2, 8), lambda x, y: (0, 0),
                             memory_space=pltpu.SMEM)
    return state_spec, col_spec, smem_spec


@functools.partial(
    jax.jit, static_argnames=("dims", "voxel_size", "H", "W"))
def _build_cols_impl(depth_im, label_im, rem_im, origin,
                     dims, voxel_size, H, W):
    """Stage 1: per-(x,y) image column values as (X, Y, 128) lane-minor
    arrays (fused depth|packed table when H <= 64).

    u depends only on (x, y) — yaw is constant along z — so each (x, y)
    fetches one contiguous 128-lane ROW of a transposed image table via a
    single advanced-index gather: no giant transposes, no tiled-lane
    padding in HBM, no per-plane .T inside the kernel.

    This stage is a SEPARATE jit from the kernel stage on purpose: the
    remote XLA:TPU compiler reliably lowers the row gather fast as its own
    program (~6 ms at 268M voxels) but pathologically (~5x whole-program
    slowdown) when the same gather feeds the pallas_call inside one
    program (scripts/probe_integrate_ablate.py). Eager callers therefore
    pay two pipelined dispatches; traced callers inline both stages and
    take their chances with the compiler regime.
    """
    X, Y = dims[0], dims[1]
    CW = _col_width(H)
    gx = jax.lax.broadcasted_iota(jnp.float32, (X, Y), 0)
    gy = jax.lax.broadcasted_iota(jnp.float32, (X, Y), 1)
    px = origin[0] + gx * voxel_size
    py = origin[1] + gy * voxel_size
    yaw = -jnp.arctan2(py, px)
    u = jnp.clip(jnp.floor(0.5 * (yaw / jnp.pi + 1.0) * W),
                 0, W - 1).astype(jnp.int32)

    def padded_T(img):
        img = img.astype(jnp.float32)
        if CW > H:
            img = jnp.pad(img, ((0, CW - H), (0, 0)))
        return img.T                                         # (W, CW)

    # pack label + 14-bit remission into one f32 column (one fewer
    # in-kernel gather and ~1 GB less HBM at reference scale)
    packed = (label_im.astype(jnp.float32) * 16384.0
              + jnp.round(jnp.clip(rem_im, 0.0, 1.0) * 16383.0))
    if CW == 64:
        # one fused table: lanes [0,64) depth, [64,128) packed
        img2T = jnp.concatenate([padded_T(depth_im), padded_T(packed)],
                                axis=1)                      # (W, 128)
        return (img2T[u],)                                   # (X, Y, 128)
    # H in (64,128]: two full-width tables (take_along operands are
    # capped at 128 lanes, so they cannot fuse)
    return (padded_T(depth_im)[u], padded_T(packed)[u])


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size", "H", "reset", "has_vtab",
                     "write_weight", "interpret", "S"),
    donate_argnums=(0,))
def _integrate_kernel_impl(state: TSDFState, col_args,
                           fov_up_deg, fov_down_deg, obs_weight,
                           origin, active_dims, v_tab,
                           dims, voxel_size, H, reset, has_vtab,
                           write_weight, interpret, S=1):
    """Stage 2: the Pallas kernel over the volume, fed materialized cols.

    ``S`` > 1: col_args holds S scans' cols (flattened, in scan order) and
    the kernel applies the S observations sequentially in registers with
    one state read/write — the fused chain (see _kernel)."""
    X, Y, Z = dims
    CW = _col_width(H)
    BY = min(Y, 1024)
    # reset mode keeps the aliased inputs out of VMEM, leaving room to
    # process 2 x-planes per grid step (halves per-step overhead)
    BX = 2 if (reset and X % 2 == 0) else 1

    params = _params(origin, fov_up_deg, fov_down_deg, obs_weight,
                     active_dims)
    state_spec, col_spec, smem_spec = _specs(Z, BY, BX)
    # reset mode never reads prior state: leave the aliased inputs in HBM
    # (ANY) so the pipeline skips 4 full-volume DMA reads per frame
    state_in_spec = (pl.BlockSpec(memory_space=pl.ANY) if reset
                     else state_spec)

    kernel = functools.partial(
        _kernel, Z=Z, H=H, CW=CW, R=BY, BX=BX,
        voxel_size=float(voxel_size), trunc=float(voxel_size) * 5.0,
        reset=reset, has_vtab=has_vtab, write_weight=write_weight,
        fused_cols=len(col_args) == S, S=S)

    vtab_specs = [state_spec] if has_vtab else []
    vtab_args = (v_tab,) if has_vtab else ()
    # state inputs sit after params + col arrays + optional vtab
    alias_base = 1 + len(col_args) + len(vtab_specs)
    # write_weight=False drops the weight volume from the outputs (and its
    # full-volume HBM write); its state index 1 aliases nothing and the
    # input buffer is returned untouched
    out_state_idx = (0, 1, 2, 3) if write_weight else (0, 2, 3)
    out = pl.pallas_call(
        kernel,
        grid=(X // BX, Y // BY),
        in_specs=[smem_spec, *([col_spec] * len(col_args)), *vtab_specs,
                  *([state_in_spec] * 4)],
        out_specs=(state_spec,) * len(out_state_idx),
        out_shape=tuple(
            jax.ShapeDtypeStruct((X, Y, Z), state[i].dtype)
            for i in out_state_idx),
        input_output_aliases={
            alias_base + si: oi for oi, si in enumerate(out_state_idx)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            # BX=2 sits ~28 KB over the default 16 MB scoped budget
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(params, *col_args, *vtab_args, *state)
    if write_weight:
        return TSDFState(*out)
    return TSDFState(out[0], state.weight, out[1], out[2])


@functools.partial(
    jax.jit,
    static_argnames=("dims", "voxel_size", "H", "interpret"))
def _precompute_geometry_impl(fov_up_deg, fov_down_deg, origin,
                              dims, voxel_size, H, interpret):
    X, Y, Z = dims
    BY = min(Y, 1024)
    params = _params(origin, fov_up_deg, fov_down_deg,
                     jnp.float32(0.0), jnp.zeros(3, jnp.float32))
    state_spec, _, smem_spec = _specs(Z, BY)
    kernel = functools.partial(
        _geom_kernel, Z=Z, H=H, R=BY, voxel_size=float(voxel_size))
    return pl.pallas_call(
        kernel,
        grid=(X, Y // BY),
        in_specs=[smem_spec],
        out_specs=state_spec,
        out_shape=jax.ShapeDtypeStruct((X, Y, Z), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=interpret,
    )(params)


def precompute_geometry(spec: VolumeSpec, fov_up_deg, fov_down_deg, H,
                        origin=None, interpret: bool = False):
    """v (i8) frame-invariant row table for ``integrate_pallas``.

    Valid while the volume placement (origin) and image FOV/rows stay
    fixed — exactly the fixed_bounds production configuration.
    1 B/voxel of HBM.
    """
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    return _precompute_geometry_impl(
        jnp.float32(fov_up_deg), jnp.float32(fov_down_deg),
        jnp.asarray(origin, jnp.float32),
        dims=spec.dims, voxel_size=spec.voxel_size, H=H,
        interpret=interpret)


def _verify_check(kind, arr) -> None:
    if kind == "label":
        bad = int(arr)                  # blocks until the reduction is ready
        if bad >= 512:
            raise ValueError(
                "integrate_pallas packs label+remission into one f32 "
                f"column: label ids must be < 512, got {bad}")
    else:                               # "rem": stacked [min, max]
        import numpy as np

        lo, hi = np.asarray(arr)
        if lo < -1e-6 or hi > 1.0 + 1e-6:
            # WARN, don't abort: the window-level reduction sees every
            # valid point, but only each pixel's WINNER gets packed (and
            # the kernel clips it) — stray out-of-range remissions on
            # occluded points are harmless. The warning still surfaces
            # the pallas/XLA divergence on genuinely unnormalized data.
            import sys

            if not getattr(_verify_check, "_rem_warned", False):
                _verify_check._rem_warned = True
                print(
                    "lidar-transfer-tpu: remissions outside [0, 1] "
                    f"(range [{lo}, {hi}]) — the pallas integrate packs "
                    "remission into 14 bits clipped to [0, 1]; normalize "
                    "(the converters do) or pass "
                    "use_pallas_integrate=False for raw-intensity data",
                    file=sys.stderr)


def drain_label_checks(timeout: float | None = None) -> None:
    """Verify every pending max-label reduction.

    The eager-call polling in ``integrate_pallas`` only inspects checks
    enqueued by *earlier* calls, so the final integrate(s) of a run are
    never validated by it.  Call this at a natural sync point (a
    ``fused_state()`` materialization, bench end) to close that window —
    labels >= 512 then raise instead of silently corrupting labels and
    remissions.

    ``timeout``: None blocks until all reductions are ready (sync
    points). A float bounds the wait — used by the ``atexit`` hook so a
    sick device tunnel cannot hang interpreter shutdown; entries still
    unready at the bound are reported unverified on stderr.
    """
    import sys
    import time

    pending = getattr(integrate_pallas, "_pending_label_checks", None)
    if timeout is None:
        while pending:
            _verify_check(*pending.pop(0))
        return
    deadline = time.monotonic() + timeout
    while pending and time.monotonic() < deadline:
        ready = [e for e in pending if e[1].is_ready()]
        for e in ready:
            pending.remove(e)
            _verify_check(*e)
        if pending:
            time.sleep(0.05)
    if pending:
        print(f"lidar-transfer-tpu: {len(pending)} async label-range "
              "guard(s) still unverified at exit (device not responding "
              f"within {timeout:.0f}s) — labels >= 512 in the final "
              "integrates would have gone undetected", file=sys.stderr)


def _drain_at_exit() -> None:
    try:
        drain_label_checks(timeout=5.0)
    except ValueError as e:
        # an atexit exception cannot change the exit code; a corrupted
        # label volume must not look like success
        import os
        import sys
        print(f"lidar-transfer-tpu: FATAL {e}", file=sys.stderr)
        sys.stderr.flush()
        os._exit(70)


atexit.register(_drain_at_exit)


def _pending_queue():
    pending = getattr(integrate_pallas, "_pending_label_checks", None)
    if pending is None:
        pending = []
        integrate_pallas._pending_label_checks = pending
    return pending


def enqueue_input_guard(labels, remissions, valid) -> None:
    """Window-level packed-column guard, enqueued at the EAGER boundary.

    The per-image guard inside ``integrate_pallas`` cannot enqueue when
    the integrate runs under an outer trace (the fixed-bounds whole-frame
    jits, e.g. the materialized mergemesh body) — the inputs are tracers
    there and the guard is silently inert. Engines therefore call this on
    the CONCRETE window arrays before jitting: window labels/remissions
    bound everything the integrate can ever see. Async like the per-image
    guard (two tiny reductions; verified at the next eager call, a
    ``drain_label_checks`` sync point, or atexit)."""
    if isinstance(labels, jax.core.Tracer):
        return
    pending = _pending_queue()
    pending.append(("label", jnp.max(jnp.where(valid, labels, 0))))
    r = jnp.where(valid, remissions, 0.0)
    pending.append(("rem", jnp.stack([jnp.min(r), jnp.max(r)])))
    while len(pending) > 64:
        _verify_check(*pending.pop(0))


def _enqueue_label_check(depth_im, label_im) -> None:
    """Enqueue an async max-label guard for the packed f32 column (exact
    only for ids < 512) — see the comment at the integrate_pallas call
    site; drained by ``drain_label_checks``."""
    if isinstance(label_im, jax.core.Tracer):
        return
    pending = _pending_queue()
    for e in pending[:]:
        if e[1].is_ready():
            pending.remove(e)
            _verify_check(*e)
    try:
        mx = jnp.max(jnp.where(depth_im > 0, label_im, 0))
        if not isinstance(mx, jax.core.Tracer):
            pending.append(("label", mx))
            # Bound the queue by VERIFYING the oldest entries, never by
            # dropping them unchecked. The bound is high enough that the
            # oldest entry is essentially always ready (the device can't
            # be 64 dispatches behind), so this does NOT put a blocking
            # ~30 ms host read on the per-frame path (CLAUDE.md rule) —
            # unlike the previous bound of 8, which a few pipelined
            # 3-scan frames could overflow.
            while len(pending) > 64:
                _verify_check(*pending.pop(0))
    except jax.errors.ConcretizationTypeError:
        pass                            # inside an outer trace


def integrate_pallas(state: TSDFState, spec: VolumeSpec, depth_im, label_im,
                     rem_im, *, fov_up_deg, fov_down_deg,
                     obs_weight: float = 1.0, origin=None, active_dims=None,
                     reset: bool = False, geom=None,
                     write_weight: bool = True,
                     interpret: bool = False) -> TSDFState:
    """Pallas-backed drop-in for ops.tsdf.integrate (same semantics).

    ``geom``: optional v-table from ``precompute_geometry`` — skips the
    per-voxel atan chain when the volume placement is frame-invariant
    (fixed_bounds).
    ``write_weight``: False skips the weight-volume write (see
    ops.tsdf.integrate — only valid when no further integrate chains on
    this state); the returned weight buffer passes through unchanged.
    """
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    if active_dims is None:
        active_dims = jnp.asarray(spec.dims, jnp.int32)
    H, W = depth_im.shape
    if not supports(spec, H):
        raise ValueError(
            f"unsupported dims {spec.dims} / H {H} for the pallas "
            "integrate (need H<=128, Y % min(Y,1024) == 0)")
    # the packed label*16384 + 14-bit remission column is exact in the f32
    # mantissa only for label ids < 512 (SemanticKITTI: <= 259); larger ids
    # would silently corrupt labels AND remissions. Checked ASYNCHRONOUSLY:
    # a blocking int(jnp.max(...)) per call costs the full ~30 ms remote
    # round-trip and serializes the pipelined dispatch stream (measured
    # 12 -> 43 ms/integrate at 268M voxels). Instead each eager call
    # enqueues its max-label reduction and inspects previously enqueued
    # ones that have become ready — a violation raises within a frame or
    # two, with zero added synchronization.
    _enqueue_label_check(depth_im, label_im)
    has_vtab = geom is not None
    v_tab = geom if has_vtab else jnp.zeros((), jnp.int8)
    # two pipelined dispatches when called eagerly — see _build_cols_impl
    # for why the col gather and the kernel must not share one program
    cols = _build_cols_impl(
        depth_im, label_im.astype(jnp.int32), rem_im,
        jnp.asarray(origin, jnp.float32),
        dims=spec.dims, voxel_size=spec.voxel_size, H=H, W=W)
    return _integrate_kernel_impl(
        state, cols,
        jnp.float32(fov_up_deg), jnp.float32(fov_down_deg),
        jnp.float32(obs_weight), jnp.asarray(origin, jnp.float32),
        jnp.asarray(active_dims, jnp.float32), v_tab,
        dims=spec.dims, voxel_size=spec.voxel_size, H=H,
        reset=reset, has_vtab=has_vtab, write_weight=write_weight,
        interpret=interpret)


def integrate_pallas_chain(state: TSDFState, spec: VolumeSpec,
                           depth_ims, label_ims, rem_ims, *,
                           fov_up_deg, fov_down_deg,
                           obs_weight: float = 1.0, origin=None,
                           active_dims=None, geom=None,
                           write_weight: bool = True,
                           interpret: bool = False) -> TSDFState:
    """Fused S-scan chained integrate: equivalent to S sequential
    ``integrate_pallas`` calls with ``reset`` on the first (the mesh
    adaption's per-scan loop, laserscan.py:863-918), at ~1/S the state
    HBM traffic — the S observations apply in VPU registers with one
    final state write. Bit-exact vs the sequential chain for f32 states;
    for compact (bf16) states the fused chain is strictly MORE precise
    (no intermediate bf16 rounding between scans).

    ``depth_ims``/``label_ims``/``rem_ims``: (S, H, W) stacks, all
    integrated with the same fov/origin (the mesh adaption's invariant —
    every scan is re-projected into the primary sensor frame first).
    """
    S, H, W = depth_ims.shape
    if origin is None:
        origin = jnp.asarray(spec.origin, jnp.float32)
    if active_dims is None:
        active_dims = jnp.asarray(spec.dims, jnp.int32)
    if not supports(spec, H):
        raise ValueError(
            f"unsupported dims {spec.dims} / H {H} for the pallas "
            "integrate (need H<=128, Y % min(Y,1024) == 0)")
    _enqueue_label_check(depth_ims, label_ims)
    has_vtab = geom is not None
    v_tab = geom if has_vtab else jnp.zeros((), jnp.int8)
    # one col-build dispatch per scan + one kernel dispatch — all
    # pipelined when called eagerly (see _build_cols_impl)
    cols = []
    for s in range(S):
        cols.extend(_build_cols_impl(
            depth_ims[s], label_ims[s].astype(jnp.int32), rem_ims[s],
            jnp.asarray(origin, jnp.float32),
            dims=spec.dims, voxel_size=spec.voxel_size, H=H, W=W))
    return _integrate_kernel_impl(
        state, tuple(cols),
        jnp.float32(fov_up_deg), jnp.float32(fov_down_deg),
        jnp.float32(obs_weight), jnp.asarray(origin, jnp.float32),
        jnp.asarray(active_dims, jnp.float32), v_tab,
        dims=spec.dims, voxel_size=spec.voxel_size, H=H,
        reset=True, has_vtab=has_vtab, write_weight=write_weight,
        interpret=interpret, S=S)

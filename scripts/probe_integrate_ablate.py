#!/usr/bin/env python3
"""Probe 8: ablate the REAL integrate_pallas to find the missing ~30 ms.

Variants (268M voxels, reset, write_weight=False, vtab):
  real      — integrate_pallas as shipped           (baseline ~47 ms)
  precols   — pallas_call only, cols precomputed    (isolates wrapper XLA)
  nodiv     — precols + divisions replaced by mults (isolates VPU divides)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lidar_transfer_tpu.ops import tsdf as TS
from lidar_transfer_tpu.ops import tsdf_pallas as TP

dims = (1024, 1024, 256)
X, Y, Z = dims
H, W = 64, 2048
CW = 64
BY = 1024
BX = 2


def build_cols(depth_im, label_im, rem_im, origin, voxel_size):
    gx = jax.lax.broadcasted_iota(jnp.float32, (X, Y), 0)
    gy = jax.lax.broadcasted_iota(jnp.float32, (X, Y), 1)
    px = origin[0] + gx * voxel_size
    py = origin[1] + gy * voxel_size
    yaw = -jnp.arctan2(py, px)
    u = jnp.clip(jnp.floor(0.5 * (yaw / jnp.pi + 1.0) * W),
                 0, W - 1).astype(jnp.int32)

    def cols_of(img):
        img = img.astype(jnp.float32)
        if CW > H:
            img = jnp.pad(img, ((0, CW - H), (0, 0)))
        c = jnp.take(img, u, axis=1)
        return jnp.transpose(c, (1, 0, 2))

    dcol = cols_of(depth_im)
    packed = (label_im.astype(jnp.float32) * 16384.0
              + jnp.round(jnp.clip(rem_im, 0.0, 1.0) * 16383.0))
    lrcol = cols_of(packed)
    return dcol, lrcol


def kernel_call(kern_fn, params, dcol, lrcol, v_tab, state, dtypes):
    state_spec, col_spec, smem_spec = TP._specs(Z, BY, BX)
    state_in_spec = pl.BlockSpec(memory_space=pl.ANY)
    out_state_idx = (0, 2, 3)
    return pl.pallas_call(
        kern_fn,
        grid=(X // BX, Y // BY),
        in_specs=[smem_spec, col_spec, col_spec, state_spec,
                  *([state_in_spec] * 4)],
        out_specs=(state_spec,) * 3,
        out_shape=tuple(jax.ShapeDtypeStruct((X, Y, Z), dt)
                        for dt in dtypes),
        input_output_aliases={4 + si: oi
                              for oi, si in enumerate(out_state_idx)},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=64 * 1024 * 1024),
    )(params, dcol, lrcol, v_tab, *state)


def nodiv_kernel(params_ref, dcol_ref, lrcol_ref, v_ref, *refs,
                 trunc):
    """Real kernel body, reset mode, but divisions -> multiplications."""
    tsdf_ref, w_ref, lab_ref, rem_ref = refs[0:4]
    out_tsdf, out_lab, out_rem = refs[4:7]
    obs_w = params_ref[0, 5]
    ay = params_ref[0, 6]
    az = params_ref[0, 7]
    ax = params_ref[1, 0]
    y0 = pl.program_id(1) * BY
    gy = (y0 + jax.lax.broadcasted_iota(jnp.int32, (BY, 128), 0)
          ).astype(jnp.float32)
    ox = params_ref[0, 0]
    oy = params_ref[0, 1]
    oz = params_ref[0, 2]
    voxel_size = jnp.float32(0.05)
    inv_obs = 1.0 / obs_w
    for bx in range(BX):
        gx = (jnp.float32(pl.program_id(0)) * BX + bx)
        px = ox + gx * voxel_size
        py = oy + gy * voxel_size
        rxy2 = px * px + py * py
        in_crop_xy = (gx < ax) & (gy < ay)
        dcol = dcol_ref[bx].T
        lrcol = lrcol_ref[bx].T
        if CW < 128:
            pad = ((0, 0), (0, 128 - CW))
            dcol = jnp.pad(dcol, pad)
            lrcol = jnp.pad(lrcol, pad)
        for zc in range(0, Z, 128):
            width = min(128, Z - zc)
            gz = (jax.lax.broadcasted_iota(jnp.int32, (BY, 128), 1)
                  + zc).astype(jnp.float32)
            pz = oz + gz * voxel_size
            depth = jnp.sqrt(rxy2 + pz * pz)
            v_raw = v_ref[bx, :, zc:zc + width]
            if width < 128:
                v_raw = jnp.pad(v_raw, ((0, 0), (0, 128 - width)))
            v_raw = v_raw.astype(jnp.int32)
            in_fov = v_raw >= 0
            v = jnp.maximum(v_raw, 0)
            depth_val = jnp.take_along_axis(dcol, v, axis=1)
            lr = jnp.take_along_axis(lrcol, v, axis=1)
            new_label = jnp.floor(lr * (1.0 / 16384.0))
            new_rem = (lr - new_label * 16384.0) * (1.0 / 16383.0)
            diff = depth_val - depth
            dist = jnp.minimum(1.0, diff * (1.0 / trunc))
            active = (in_crop_xy & (gz < az) & in_fov & (depth_val > 0.0)
                      & (diff >= -trunc))
            # reset: tsdf=1, weight=0, rem=0, label=0
            same = new_label == 0.0
            tsdf_avg = dist * inv_obs * obs_w      # == dist (no divide)
            rem_avg = new_rem
            closer = dist < 0.0
            upd_same = active & same
            upd_diff = active & (~same) & closer
            new_tsdf = jnp.where(upd_same, tsdf_avg,
                                 jnp.where(upd_diff, dist, 1.0))
            new_lab = jnp.where(upd_diff, new_label, 0.0)
            new_remv = jnp.where(upd_same, rem_avg,
                                 jnp.where(upd_diff, new_rem, 0.0))
            out_tsdf[bx, :, zc:zc + width] = \
                new_tsdf[:, :width].astype(out_tsdf.dtype)
            out_lab[bx, :, zc:zc + width] = \
                new_lab[:, :width].astype(out_lab.dtype)
            out_rem[bx, :, zc:zc + width] = \
                new_remv[:, :width].astype(out_rem.dtype)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))
    rng = np.random.default_rng(0)
    spec = TS.VolumeSpec(origin=(-25.6, -25.6, -6.4), voxel_size=0.05,
                         dims=dims)
    depth_im = jnp.asarray((rng.random((H, W)) * 20 + 2), jnp.float32)
    label_im = jnp.asarray(rng.integers(1, 20, (H, W)), jnp.int32)
    rem_im = jnp.asarray(rng.random((H, W)), jnp.float32)
    geom = TP.precompute_geometry(spec, 3.0, -25.0, H)
    origin = jnp.asarray(spec.origin, jnp.float32)
    jax.block_until_ready(geom)

    # ---- real ----
    def real_run(st):
        return TP.integrate_pallas(st, spec, depth_im, label_im, rem_im,
                                   fov_up_deg=3.0, fov_down_deg=-25.0,
                                   reset=True, geom=geom,
                                   write_weight=False)
    st = spec.init_state_compact()
    st = real_run(st)
    jax.block_until_ready(st.tsdf)
    t0 = time.perf_counter()
    for _ in range(6):
        st = real_run(st)
    jax.block_until_ready(st.tsdf)
    print(f"real          : {(time.perf_counter()-t0)/6*1e3:7.2f} ms",
          flush=True)

    # ---- precols: time cols build alone, then kernel alone ----
    @jax.jit
    def cols_only(d, l, r):
        return build_cols(d, l, r, origin, 0.05)
    dcol, lrcol = cols_only(depth_im, label_im, rem_im)
    jax.block_until_ready(dcol)
    t0 = time.perf_counter()
    for _ in range(6):
        out = cols_only(depth_im, label_im, rem_im)
    jax.block_until_ready(out)
    print(f"cols_of alone : {(time.perf_counter()-t0)/6*1e3:7.2f} ms",
          flush=True)

    params = TP._params(origin, jnp.float32(3.0), jnp.float32(-25.0),
                        jnp.float32(1.0),
                        jnp.asarray(dims, jnp.float32))
    kern = functools.partial(
        TP._kernel, Z=Z, H=H, CW=CW, R=BY, BX=BX,
        voxel_size=0.05, trunc=0.25, reset=True, has_vtab=True,
        write_weight=False)
    dtypes = (jnp.bfloat16, jnp.int16, jnp.bfloat16)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def kernel_only(state, dcol, lrcol, geom):
        out = kernel_call(kern, params, dcol, lrcol, geom, state, dtypes)
        return TS.TSDFState(out[0], state[1], out[1], out[2])
    st = spec.init_state_compact()
    st = kernel_only(st, dcol, lrcol, geom)
    jax.block_until_ready(st.tsdf)
    t0 = time.perf_counter()
    for _ in range(6):
        st = kernel_only(st, dcol, lrcol, geom)
    jax.block_until_ready(st.tsdf)
    print(f"real kernel only (precols): {(time.perf_counter()-t0)/6*1e3:7.2f} ms",
          flush=True)

    kern2 = functools.partial(nodiv_kernel, trunc=0.25)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def kernel_nodiv(state, dcol, lrcol, geom):
        out = kernel_call(kern2, params, dcol, lrcol, geom, state, dtypes)
        return TS.TSDFState(out[0], state[1], out[1], out[2])
    st = spec.init_state_compact()
    st = kernel_nodiv(st, dcol, lrcol, geom)
    jax.block_until_ready(st.tsdf)
    t0 = time.perf_counter()
    for _ in range(6):
        st = kernel_nodiv(st, dcol, lrcol, geom)
    jax.block_until_ready(st.tsdf)
    print(f"nodiv kernel only (precols): {(time.perf_counter()-t0)/6*1e3:7.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()

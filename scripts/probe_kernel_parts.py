#!/usr/bin/env python3
"""Probe 4: isolate cost centers INSIDE the Pallas integrate kernel.

Variants of a stripped copy of the integrate kernel body with pieces
disabled, chained 4x inside one jit (dispatch-free):
  full      — geometry + take_along_axis gathers + class rule + 3 writes
  nogather  — take_along_axis replaced by a broadcast of column 0
  nogeom    — no sqrt/geometry; dist = constant
  writeonly — kernel only writes constants (floor)
  onewrite  — full compute, single output buffer
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PW = 128


def make_kernel(variant, Y, Z, H, CW, R, BX, voxel_size, trunc, n_out):
    def kernel(params_ref, dcol_ref, lrcol_ref, *outs):
        ox = params_ref[0, 0]
        oy = params_ref[0, 1]
        oz = params_ref[0, 2]
        fov_up = params_ref[0, 3]
        fov_down = params_ref[0, 4]
        fov = jnp.abs(fov_up) + jnp.abs(fov_down)
        y0 = pl.program_id(1) * R
        gy = (y0 + jax.lax.broadcasted_iota(jnp.int32, (R, _PW), 0)
              ).astype(jnp.float32)
        for bx in range(BX):
            gx = (jnp.float32(pl.program_id(0)) * BX + bx)
            px = ox + gx * voxel_size
            py = oy + gy * voxel_size
            rxy2 = px * px + py * py

            dcol = dcol_ref[bx].T
            lrcol = lrcol_ref[bx].T
            if CW < _PW:
                pad = ((0, 0), (0, _PW - CW))
                dcol = jnp.pad(dcol, pad)
                lrcol = jnp.pad(lrcol, pad)

            for zc in range(0, Z, _PW):
                width = min(_PW, Z - zc)
                gz = (jax.lax.broadcasted_iota(jnp.int32, (R, _PW), 1)
                      + zc).astype(jnp.float32)
                if variant == "writeonly":
                    for i, o in enumerate(outs):
                        o[bx, :, zc:zc + width] = jnp.full(
                            (R, width), i + 1, o.dtype)
                    continue
                pz = oz + gz * voxel_size
                if variant == "nogeom":
                    depth = gz
                    v = jnp.minimum(gz.astype(jnp.int32), H - 1)
                    in_fov = gz > 1.0
                else:
                    depth = jnp.sqrt(rxy2 + pz * pz)
                    # emulate the vtab path: v from a cheap poly of pz/r
                    r = jnp.sqrt(rxy2)
                    t = pz / jnp.maximum(r, 1e-12)
                    pitch = t * (1.0 - 0.33 * t * t)
                    in_fov = (pitch <= fov_up) & (pitch >= fov_down)
                    vf = (1.0 - (pitch + jnp.abs(fov_down)) / fov) * H
                    v = jnp.clip(jnp.floor(vf), 0, H - 1).astype(jnp.int32)
                if variant == "nogather":
                    depth_val = dcol[:, 0:1] + 0.0 * depth
                    lr = lrcol[:, 0:1] + 0.0 * depth
                else:
                    depth_val = jnp.take_along_axis(dcol, v, axis=1)
                    lr = jnp.take_along_axis(lrcol, v, axis=1)
                new_label = jnp.floor(lr * (1.0 / 16384.0))
                new_rem = (lr - new_label * 16384.0) * (1.0 / 16383.0)
                diff = depth_val - depth
                dist = jnp.minimum(1.0, diff / trunc)
                active = in_fov & (depth_val > 0.0) & (diff >= -trunc)
                upd = active & (dist < 0.0)
                new_tsdf = jnp.where(upd, dist, 1.0)
                new_lab = jnp.where(upd, new_label, 0.0)
                new_remv = jnp.where(upd, new_rem, 0.0)
                vals = [new_tsdf, new_lab, new_remv][:n_out]
                for o, val in zip(outs, vals):
                    o[bx, :, zc:zc + width] = \
                        val[:, :width].astype(o.dtype)
    return kernel


def probe(variant, dims=(1024, 1024, 256), BX=2, n_out=3):
    X, Y, Z = dims
    H, W, CW = 64, 2048, 64
    BY = min(Y, 1024)
    rng = np.random.default_rng(0)
    dcol = jnp.asarray(rng.random((X, CW, Y)), jnp.float32)
    lrcol = jnp.asarray(rng.random((X, CW, Y)) * 16384, jnp.float32)
    params = jnp.zeros((2, 8), jnp.float32).at[0, 3].set(0.05).at[0, 4].set(
        -0.44).at[0, 0].set(-25.6).at[0, 1].set(-25.6).at[0, 2].set(-6.4)

    state_spec = pl.BlockSpec((BX, BY, Z), lambda x, y: (x, y, 0),
                              memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((BX, CW, BY), lambda x, y: (x, 0, y),
                            memory_space=pltpu.VMEM)
    smem_spec = pl.BlockSpec((2, 8), lambda x, y: (0, 0),
                             memory_space=pltpu.SMEM)
    dtypes = [jnp.bfloat16, jnp.int16, jnp.bfloat16][:n_out]
    kernel = make_kernel(variant, Y, Z, H, CW, BY, BX, 0.05, 0.25, n_out)

    @jax.jit
    def run(d, lr):
        return pl.pallas_call(
            kernel,
            grid=(X // BX, Y // BY),
            in_specs=[smem_spec, col_spec, col_spec],
            out_specs=(state_spec,) * n_out,
            out_shape=tuple(jax.ShapeDtypeStruct((X, Y, Z), dt)
                            for dt in dtypes),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024),
        )(params, d, lr)

    out = run(dcol, lrcol)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    iters = 6
    for _ in range(iters):
        out = run(dcol, lrcol)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    nvox = X * Y * Z
    print(f"{variant:10s} BX{BX} out x{n_out}: {dt*1e3:7.2f} ms  "
          f"{nvox/dt/1e9:6.2f} Gvox/s  "
          f"({dt/ (X//BX * Y//BY) * 1e6:6.1f} us/step)", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))
    for variant in ["writeonly", "nogeom", "nogather", "full"]:
        probe(variant)
    probe("full", n_out=1)
    probe("full", BX=4)
    probe("full", BX=8)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Probe Pallas output-write bandwidth under different DMA configurations.

Round-1 measured ~113 GB/s for Pallas kernel OUTPUT writes regardless of
shape (XLA writes the same buffers at ~900 GB/s), which pins the
materialized TSDF integrate at ~76 ms/frame. This probe isolates the write
path: a kernel that writes constants (no input DMA, no compute) across a
grid, varying block shape, x-planes per step, dtype, and output count.

Timing protocol per CLAUDE.md: issue N calls asynchronously, sync once —
per-call dispatch through the axon tunnel is ~30 ms of pure latency.
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_write_kernel(n_out):
    def kernel(*refs):
        for i, ref in enumerate(refs):
            ref[...] = jnp.full(ref.shape, i + 1, ref.dtype)
    return kernel


def bench(fn, args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / iters


def probe(X, Y, Z, BX, BY, dtype, n_out, semantics="parallel",
          z_block=None):
    ZB = z_block or Z
    spec = pl.BlockSpec((BX, BY, ZB), lambda x, y: (x, y, 0),
                        memory_space=pltpu.VMEM)
    kern = make_write_kernel(n_out)

    @jax.jit
    def run():
        return pl.pallas_call(
            kern,
            grid=(X // BX, Y // BY),
            in_specs=[],
            out_specs=(spec,) * n_out,
            out_shape=tuple(jax.ShapeDtypeStruct((X, Y, Z), dtype)
                            for _ in range(n_out)),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=(semantics, semantics),
                vmem_limit_bytes=100 * 1024 * 1024),
        )()

    dt = bench(run, ())
    nbytes = X * Y * Z * np.dtype(dtype).itemsize * n_out
    gbs = nbytes / dt / 1e9
    print(f"X{X} Y{Y} Z{Z} BX{BX} BY{BY} {np.dtype(dtype).name} "
          f"out x{n_out} {semantics[:3]}: {dt*1e3:7.2f} ms  "
          f"{gbs:7.1f} GB/s", flush=True)
    return gbs


def probe_xla_write(X, Y, Z, dtype, n_out):
    @jax.jit
    def run():
        return tuple(jnp.full((X, Y, Z), i + 1, dtype)
                     for i in range(n_out))
    dt = bench(run, ())
    nbytes = X * Y * Z * np.dtype(dtype).itemsize * n_out
    print(f"XLA full write {np.dtype(dtype).name} x{n_out}: {dt*1e3:7.2f} ms "
          f" {nbytes/dt/1e9:7.1f} GB/s", flush=True)


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))  # warm transfer path

    # reference-scale-ish footprint but smaller for probe speed:
    X, Y, Z = 1024, 1024, 256        # 268M voxels; bf16 = 0.5 GB/buffer

    print("--- XLA baseline ---", flush=True)
    probe_xla_write(X, Y, Z, jnp.bfloat16, 1)
    probe_xla_write(X, Y, Z, jnp.bfloat16, 3)
    probe_xla_write(X, Y, Z, jnp.float32, 1)

    print("--- pallas: vary BX/BY (bf16, 1 output) ---", flush=True)
    for BX, BY in [(1, 1024), (2, 1024), (4, 1024), (8, 1024),
                   (8, 512), (16, 256), (1, 512), (4, 512)]:
        try:
            probe(X, Y, Z, BX, BY, jnp.bfloat16, 1)
        except Exception as e:
            print(f"BX{BX} BY{BY}: {type(e).__name__} {e}", flush=True)

    print("--- pallas: dtype ---", flush=True)
    probe(X, Y, Z, 4, 1024, jnp.float32, 1)
    probe(X, Y, Z, 4, 1024, jnp.int32, 1)
    probe(X, Y, Z, 4, 1024, jnp.int8, 1)

    print("--- pallas: multiple outputs ---", flush=True)
    probe(X, Y, Z, 4, 1024, jnp.bfloat16, 3)
    probe(X, Y, Z, 2, 1024, jnp.bfloat16, 3)

    print("--- pallas: arbitrary semantics ---", flush=True)
    probe(X, Y, Z, 4, 1024, jnp.bfloat16, 1, semantics="arbitrary")

    print("--- pallas: flat 2D layout (X*Y, Z) ---", flush=True)
    XY = X * Y

    def probe2d(BR, dtype, n_out):
        spec = pl.BlockSpec((BR, Z), lambda r: (r, 0),
                            memory_space=pltpu.VMEM)
        kern = make_write_kernel(n_out)

        @jax.jit
        def run():
            return pl.pallas_call(
                kern, grid=(XY // BR,),
                in_specs=[], out_specs=(spec,) * n_out,
                out_shape=tuple(jax.ShapeDtypeStruct((XY, Z), dtype)
                                for _ in range(n_out)),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",),
                    vmem_limit_bytes=100 * 1024 * 1024),
            )()
        dt = bench(run, ())
        nbytes = XY * Z * np.dtype(dtype).itemsize * n_out
        print(f"2D rows BR{BR} {np.dtype(dtype).name} x{n_out}: "
              f"{dt*1e3:7.2f} ms  {nbytes/dt/1e9:7.1f} GB/s", flush=True)

    for BR in [1024, 4096, 8192]:
        probe2d(BR, jnp.bfloat16, 1)


if __name__ == "__main__":
    main()

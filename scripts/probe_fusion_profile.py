#!/usr/bin/env python3
"""Round-3 probe: where do the 266 ms of the reference-scale materialized
integrate go? (bench.py --fusion measured 3.76/s fetch-synced in a healthy
tunnel window; the bandwidth bound is ~80-100 ms.)

Times the PRODUCTION ``integrate_pallas`` (reset, vtab geom,
write_weight=False — exactly the bench's fusion loop) at 1.07G voxels:
  a) end-to-end pipelined (5 eager calls, fetch-sync once)
  b) kernel stage only (cols prebuilt, 5 pipelined _integrate_kernel_impl)
  c) cols stage only (5 pipelined _build_cols_impl, distinct images to
     defeat CSE)
then wraps the full loop in a jax.profiler trace and prints the per-op
xplane table (docs/PERF.md recipe).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_fusion_profile.py
"""

import os
import sys
import time

os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

import jax
import jax.numpy as jnp
import numpy as np

# join the SAME persistent compile cache bench.py uses (it defaults to
# /tmp/jax_cache_lt when LT_JAX_CACHE is unset), to time the exact
# executables a bench run would replay (the remote compiler is
# nondeterministic between cache misses — a bad draw is pinned forever
# by the cache)
from lidar_transfer_tpu.utils import setup_compile_cache  # noqa: E402

setup_compile_cache()

from lidar_transfer_tpu.ops.tsdf import VolumeSpec
from lidar_transfer_tpu.ops import tsdf_pallas as tp

DIMS = (2048, 2048, 256)
VOX = 0.05
H, W = 64, 2048
FOV_UP, FOV_DOWN = 3.0, -25.0


def sync(x):
    np.asarray(jax.device_get(x[0, 0, :1]))


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))          # arm the sync machinery
    spec = VolumeSpec(origin=(-51.2, -51.2, -6.4), voxel_size=VOX,
                      dims=DIMS)
    state = spec.init_state_compact()
    geom = tp.precompute_geometry(spec, FOV_UP, FOV_DOWN, H)
    rng = np.random.default_rng(0)
    depth = jnp.asarray(rng.random((H, W)) * 40 + 2, jnp.float32)
    label = jnp.asarray(rng.integers(0, 260, (H, W)), jnp.int32)
    rem = jnp.asarray(rng.random((H, W)), jnp.float32)

    def integrate(st, d):
        return tp.integrate_pallas(
            st, spec, d, label, rem, fov_up_deg=FOV_UP,
            fov_down_deg=FOV_DOWN, reset=True, geom=geom,
            write_weight=False)

    t0 = time.perf_counter()
    state = integrate(state, depth)
    sync(state.tsdf)
    print(f"warmup+compile: {time.perf_counter()-t0:.1f}s", flush=True)

    # (a) end-to-end pipelined
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state = integrate(state, depth)
    sync(state.tsdf)
    dt = (time.perf_counter() - t0) / n
    print(f"a) end-to-end: {dt*1e3:7.1f} ms/integrate "
          f"({np.prod(DIMS)/dt/1e9:.1f} Gvox/s)", flush=True)

    # (b) kernel stage only, cols prebuilt
    cols = tp._build_cols_impl(depth, label, rem,
                               jnp.asarray(spec.origin, jnp.float32),
                               dims=DIMS, voxel_size=VOX, H=H, W=W)
    jax.block_until_ready(cols)
    fu = jnp.float32(FOV_UP)
    fd = jnp.float32(FOV_DOWN)
    ow = jnp.float32(1.0)
    org = jnp.asarray(spec.origin, jnp.float32)
    act = jnp.asarray(DIMS, jnp.float32)
    t0 = time.perf_counter()
    for _ in range(n):
        state = tp._integrate_kernel_impl(
            state, cols, fu, fd, ow, org, act, geom,
            dims=DIMS, voxel_size=VOX, H=H, reset=True, has_vtab=True,
            write_weight=False, interpret=False)
    sync(state.tsdf)
    dt = (time.perf_counter() - t0) / n
    print(f"b) kernel-only: {dt*1e3:7.1f} ms/integrate "
          f"({np.prod(DIMS)/dt/1e9:.1f} Gvox/s)", flush=True)

    # (c) cols stage only — distinct depth images to defeat CSE. Only 3
    # col sets (2.1 GB each) fit next to the 8.6 GB state + vtab.
    del cols
    nc = 3
    depths = [jnp.asarray(rng.random((H, W)) * 40 + 2, jnp.float32)
              for _ in range(nc)]
    jax.block_until_ready(depths)
    t0 = time.perf_counter()
    outs = [tp._build_cols_impl(d, label, rem, org,
                                dims=DIMS, voxel_size=VOX, H=H, W=W)
            for d in depths]
    for o in outs:
        sync(o[0])
    dt = (time.perf_counter() - t0) / nc
    print(f"c) cols-only:  {dt*1e3:7.1f} ms/build", flush=True)
    del outs, depths

    # (d) xplane trace of the full loop
    trace_dir = "/tmp/fusion_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            state = integrate(state, depth)
        sync(state.tsdf)
    import glob
    fs = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    if not fs:
        print("no xplane captured", flush=True)
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(fs[-1], "rb").read())
    per_op = {}
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        md = {m.id: m.name for m in plane.event_metadata.values()}
        for line in plane.lines:
            if "XLA Ops" not in line.name:
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                per_op[name] = per_op.get(name, 0) + ev.duration_ps
    total = sum(per_op.values())
    print(f"\nxplane per-op (5 integrates, total {total/1e12*1e3:.1f} ms):",
          flush=True)
    for name, ps in sorted(per_op.items(), key=lambda kv: -kv[1])[:15]:
        print(f"  {ps/1e12*1e3/n:8.2f} ms/int  {name[:90]}", flush=True)


if __name__ == "__main__":
    main()

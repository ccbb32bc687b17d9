#!/usr/bin/env python3
"""Round-3 probe: device-side surface extraction at reference scale.

Compares the two mesh-export routes on a 1.07G-voxel fused volume:
  classic — fetch the FULL tsdf volume host-side (what the reference's
            TSDFVolume.get_volume does, fusion_lidar.py:395-400), then
            host marching;
  cells   — ops/surface.extract_surface_cells (packed-bit candidate
            fetch + on-device corner gathers) + the volume-free
            marching_tetrahedra_cells.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/probe_surface_scale.py [--skip-classic]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.ops import tsdf_pallas as tp
from lidar_transfer_tpu.ops.marching import (marching_tetrahedra,
                                             marching_tetrahedra_cells)
from lidar_transfer_tpu.ops.surface import extract_surface_cells
from lidar_transfer_tpu.ops.tsdf import VolumeSpec
from lidar_transfer_tpu.utils import setup_compile_cache

DIMS = (2048, 2048, 256)
VOX = 0.05
H, W = 64, 2048
FOV_UP, FOV_DOWN = 3.0, -25.0


def main():
    setup_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))
    spec = VolumeSpec(origin=(-51.2, -51.2, -6.4), voxel_size=VOX,
                      dims=DIMS)
    state = spec.init_state_compact()
    geom = tp.precompute_geometry(spec, FOV_UP, FOV_DOWN, H)
    # smooth synthetic scan: ~20 m shell with gentle relief (realistic
    # single-crossing surface, not white noise)
    u = np.linspace(0, 2 * np.pi, W, endpoint=False)[None, :]
    v = np.linspace(0, 1, H)[:, None]
    depth = (20.0 + 3.0 * np.sin(3 * u) + 2.0 * v).astype(np.float32)
    label = (1 + (np.sin(5 * u) > 0).astype(np.int32)
             + 2 * (v > 0.5)).astype(np.int32) * np.ones((H, W), np.int32)
    rem = (0.5 + 0.4 * np.sin(7 * u) * np.ones((H, W))).astype(np.float32)

    t0 = time.perf_counter()
    state = tp.integrate_pallas(
        state, spec, jnp.asarray(depth), jnp.asarray(label),
        jnp.asarray(rem), fov_up_deg=FOV_UP, fov_down_deg=FOV_DOWN,
        reset=True, geom=geom, write_weight=False)
    np.asarray(state.tsdf[0, 0, :1])
    print(f"fused volume ready: {time.perf_counter()-t0:.1f}s", flush=True)

    # cells route
    t0 = time.perf_counter()
    cells = extract_surface_cells(state.tsdf, state.label, state.rem,
                                  want_labels=True, want_rems=True)
    t_extract = time.perf_counter() - t0
    print(f"cells extraction: {t_extract:.1f}s for {cells.idx.shape[0]:,} "
          f"cells ({cells.idx.shape[0]*60/1e6:.0f} MB shipped vs "
          f"8590 MB full state)", flush=True)
    t0 = time.perf_counter()
    tri = marching_tetrahedra_cells(cells.idx, cells.vals, 0.0)
    t_march = time.perf_counter() - t0
    print(f"cells marching: {t_march:.1f}s -> {tri.shape[0]:,} triangles",
          flush=True)

    if "--skip-classic" in sys.argv:
        return
    # classic route (the full fetch alone, then host marching)
    t0 = time.perf_counter()
    tsdf_host = np.asarray(state.tsdf, np.float32)
    t_fetch = time.perf_counter() - t0
    print(f"classic full-volume fetch: {t_fetch:.1f}s", flush=True)
    t0 = time.perf_counter()
    tri_ref = marching_tetrahedra(tsdf_host, 0.0)
    t_march_ref = time.perf_counter() - t0
    print(f"classic marching: {t_march_ref:.1f}s -> {tri_ref.shape[0]:,} "
          f"triangles", flush=True)
    same = tri_ref.shape[0] == tri.shape[0]
    print(f"triangle count match: {same}", flush=True)
    print(f"SPEEDUP: {(t_fetch+t_march_ref)/(t_extract+t_march):.1f}x "
          f"({t_fetch+t_march_ref:.0f}s -> {t_extract+t_march:.0f}s)",
          flush=True)


if __name__ == "__main__":
    main()

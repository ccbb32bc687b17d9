#!/usr/bin/env python3
"""Probe: rolling-shutter resynthesis at reference scale (voxel 0.05 m,
bounds +-50 m, 64x2048). Regression check for the OOM where
resynthesize_rolling_shutter let raycast_tsdf build occupancy from the
full 1.07G-voxel volume instead of the fused sources' endpoints.

Usage: python scripts/probe_rolling_shutter.py [--bounds 50] [--cpu]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


ap = argparse.ArgumentParser()
ap.add_argument("--bounds", type=float, default=50.0)
ap.add_argument("--voxel", type=float, default=0.05)
ap.add_argument("--cpu", action="store_true")
args = ap.parse_args()
if args.cpu:
    os.environ["JAX_PLATFORMS"] = "cpu"

import jax                      # noqa: E402
import jax.numpy as jnp         # noqa: E402
import numpy as np              # noqa: E402

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
from lidar_transfer_tpu.utils import setup_compile_cache  # noqa: E402
setup_compile_cache()

from lidar_transfer_tpu.config import HDL64, TransferConfig  # noqa: E402
from lidar_transfer_tpu.datasets import kitti, synthetic     # noqa: E402
from lidar_transfer_tpu.pipeline import TransferEngine       # noqa: E402
from lidar_transfer_tpu.pipeline.multiscan import ScanWindow  # noqa: E402

log(f"devices: {jax.devices()}")
np.asarray(jnp.zeros((8, 128), jnp.float32))    # warm transfer path

b = args.bounds
cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                     voxel_size=args.voxel,
                     voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
scene = synthetic.Scene.default()
poses = synthetic.straight_line_poses(2, step=1.0)
cap = 139264
pts, rem, lbl = synthetic.simulate_scan(scene, HDL64, poses[0])
p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
window = ScanWindow(
    points=jnp.asarray(p[None]), remissions=jnp.asarray(r[None]),
    labels=jnp.asarray(l[None]), valid=jnp.asarray(m[None]),
    rel_pose=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
    primary_index=0)

eng = TransferEngine(HDL64, HDL64, cfg, cap, fixed_bounds=True,
                     compact_volume=True)
log(f"volume dims {eng.vol_dims} ({np.prod(eng.vol_dims)/1e6:.1f}M voxels)")

vs, _ = eng.transfer(window)
jax.block_until_ready(vs.range)
log(f"transfer done, hit rate {np.asarray(vs.mask).mean():.3f}")

pose_next = np.linalg.inv(poses[0]) @ poses[1]

# --- splat rolling path (transfer_fast stash -> moving-origin reproject)
vs_f = eng.transfer_fast(window)
jax.block_until_ready(vs_f.range)
t0 = time.perf_counter()
rs = eng.resynthesize_rolling_shutter(pose_next)
jax.block_until_ready(rs.range)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(10):
    rs = eng.resynthesize_rolling_shutter(pose_next)
jax.block_until_ready(rs.range)
t_warm = (time.perf_counter() - t0) / 10
hit = float(np.asarray(rs.mask).mean())
both = np.asarray(rs.mask) & np.asarray(vs_f.mask)
dr = np.abs(np.asarray(rs.range) - np.asarray(vs_f.range))[both]
lblfill = float((np.asarray(rs.label)[np.asarray(rs.mask)] > 0).mean())
log(f"SPLAT rolling: first {t_first:.2f}s (compile), warm "
    f"{t_warm*1e3:.1f} ms, hit rate {hit:.3f}, label fill {lblfill:.4f}, "
    f"median |dr| vs static {np.median(dr):.3f} m")
assert hit > 0.5 and lblfill > 0.999

# --- volume-band path (round 4: classic transfer leaves no stashed
# window, engine="auto" probes the fused volume's band for the surface
# points and runs the shared moving-origin reprojection tail)
vs, _ = eng.transfer(window)
jax.block_until_ready(vs.range)
t0 = time.perf_counter()
rs_v = eng.resynthesize_rolling_shutter(pose_next)
jax.block_until_ready(rs_v.range)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
for _ in range(5):
    rs_v = eng.resynthesize_rolling_shutter(pose_next)
jax.block_until_ready(rs_v.range)
t_warm = (time.perf_counter() - t0) / 5
hit_v = float(np.asarray(rs_v.mask).mean())
both = np.asarray(rs_v.mask) & np.asarray(rs.mask)
dr = np.abs(np.asarray(rs_v.range) - np.asarray(rs.range))[both]
log(f"VOLUME-BAND rolling: first {t_first:.2f}s (compile), warm "
    f"{t_warm*1e3:.1f} ms, hit rate {hit_v:.3f}, median |dr| vs splat "
    f"{np.median(dr):.3f} m")
assert hit_v > 0.5, f"rolling-shutter hit rate collapsed: {hit_v}"

# --- raymarcher path (engine='raymarch': per-ray-origin TSDF march —
# the general validation engine, kept for parity)
t0 = time.perf_counter()
rs_m = eng.resynthesize_rolling_shutter(pose_next, engine="raymarch")
jax.block_until_ready(rs_m.range)
t_first = time.perf_counter() - t0
t0 = time.perf_counter()
rs_m = eng.resynthesize_rolling_shutter(pose_next, engine="raymarch")
jax.block_until_ready(rs_m.range)
t_warm = time.perf_counter() - t0
hit_m = float(np.asarray(rs_m.mask).mean())
both = np.asarray(rs_m.mask) & np.asarray(rs_v.mask)
dr = np.abs(np.asarray(rs_m.range) - np.asarray(rs_v.range))[both]
log(f"RAYMARCH rolling: first {t_first:.2f}s (compile), warm "
    f"{t_warm*1e3:.1f} ms, hit rate {hit_m:.3f}, median |dr| vs "
    f"volume-band {np.median(dr):.3f} m")
assert hit_m > 0.5, f"rolling-shutter hit rate collapsed: {hit_m}"
print("OK")

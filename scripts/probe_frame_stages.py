#!/usr/bin/env python3
"""Probe 5: where the ~10.5 ms on-chip mergemesh frame goes.

Chained (dispatch-free) timings of cumulative prefixes of the deferred
mergemesh frame body at the bench operating point (64x2048 source,
32x2048 target, nscans 1, +-50 m bounds):

  P0  merge_window only
  P1  + source-dims range_project (the 139k sort z-buffer)
  P2  + reverse_project + band candidate construction
  P3  + target range_project (second z-buffer)  == full frame
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from lidar_transfer_tpu.config import HDL64, SensorSpec, TransferConfig
from lidar_transfer_tpu.datasets import kitti, synthetic
from lidar_transfer_tpu.ops import projection as P
from lidar_transfer_tpu.ops.splat import _band_samples_image
from lidar_transfer_tpu.pipeline import TransferEngine
from lidar_transfer_tpu.pipeline.multiscan import ScanWindow, merge_window

N_CHAIN = 10


def chain(fn, window, label):
    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    @jax.jit
    def run(w):
        def body(_, w):
            out = fn(w)
            # perturb the input so iterations can't collapse
            return ScanWindow(points=w.points + out * 0.0,
                              remissions=w.remissions, labels=w.labels,
                              valid=w.valid, rel_pose=w.rel_pose,
                              primary_index=w.primary_index)
        return jax.lax.fori_loop(0, N_CHAIN, body, w)

    out = run(window)
    jax.block_until_ready(out.points)
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        out = run(out)
    jax.block_until_ready(out.points)
    dt = (time.perf_counter() - t0) / (reps * N_CHAIN)
    print(f"{label}: {dt*1e3:7.3f} ms/frame", flush=True)
    return dt


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.zeros((8, 128)))

    source = HDL64
    target = SensorSpec(name="t32", beams=32, fov_up=3.0, fov_down=-25.0,
                        angle_res_hor=360.0 / 2048.0)
    b = 50.0
    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.05,
                         voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
    scene = synthetic.Scene.default()
    poses = synthetic.straight_line_poses(1, step=1.0)
    cap = 139264
    pts, rem, lbl = synthetic.simulate_scan(scene, source, poses[0])
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    window = ScanWindow(
        points=jnp.asarray(p)[None], remissions=jnp.asarray(r)[None],
        labels=jnp.asarray(l)[None], valid=jnp.asarray(m)[None],
        rel_pose=jnp.eye(4, dtype=jnp.float32)[None], primary_index=0)

    eng = TransferEngine(source, target, cfg, cap, fixed_bounds=True,
                         compact_volume=True)
    spec = eng.vol_spec

    def p0(w):
        pts, rem, lbl, valid = merge_window(w)
        return pts.sum()

    def p1(w):
        pts, rem, lbl, valid = merge_window(w)
        ri = P.range_project(pts, rem, lbl, valid, H=source.H, W=source.W,
                             fov_up_deg=target.fov_up,
                             fov_down_deg=target.fov_down)
        return ri.range.sum()

    def band(w):
        pts, rem, lbl, valid = merge_window(w)
        ri = P.range_project(pts, rem, lbl, valid, H=source.H, W=source.W,
                             fov_up_deg=target.fov_up,
                             fov_down_deg=target.fov_down)
        back = P.reverse_project(ri, fov_up_deg=target.fov_up,
                                 fov_down_deg=target.fov_down,
                                 preserve_float=True)
        origin = jnp.asarray(spec.origin, jnp.float32)
        active = jnp.asarray(spec.dims, jnp.float32)
        return _band_samples_image(
            ri.label.reshape(-1), jnp.maximum(ri.remission, 0.0).reshape(-1),
            ri.range.reshape(-1), back, ri.mask.reshape(-1), origin, active,
            dims=spec.dims, voxel_size=spec.voxel_size, samples_per_ray=8)

    def p2(w):
        pos, t, tsdf_v, lblv, remv, valid = band(w)
        return pos.sum() + t.sum()

    def p3(w):
        pos, t, tsdf_v, lblv, remv, valid = band(w)
        ri = P.range_project(pos, remv, lblv, valid, H=target.H, W=target.W,
                             fov_up_deg=target.fov_up,
                             fov_down_deg=target.fov_down)
        win = jnp.maximum(ri.index, 0).reshape(-1)
        tsdf_win = tsdf_v[win].reshape(target.H, target.W)
        rng = jnp.where(ri.mask,
                        jnp.maximum(ri.range + tsdf_win * spec.trunc_margin,
                                    0.0), 0.0)
        return rng.sum()

    def full(w):
        out = eng._mergemesh_core_deferred(w)
        return out[0].sum()

    chain(p0, window, "P0 merge only            ")
    chain(p1, window, "P1 + src project (sort)  ")
    chain(p2, window, "P2 + band candidates     ")
    chain(p3, window, "P3 + tgt project (full)  ")
    chain(full, window, "FULL _mergemesh_core_def ")


if __name__ == "__main__":
    main()

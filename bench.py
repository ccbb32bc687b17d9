#!/usr/bin/env python3
"""Headline benchmark: virtual scans/sec/chip, 64-beam -> 32-beam transfer.

Protocol per BASELINE.md: source 64 x 2048 (HDL64-like), target 32 beams,
voxel 0.05 m, mergemesh adaption (the reference's main path, SURVEY.md §3.1).
The scene is the procedural synthetic world (the reference's minimal.zip
fixture is not shipped); point counts (~130k/scan) match SemanticKITTI.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "scans/sec", "vs_baseline": N}
vs_baseline is against the BASELINE.json north star of 50 scans/sec/chip.

Usage: python bench.py [--frames N] [--warmup N] [--voxel V] [--cpu]
"""

import argparse
import json
import os
import sys
import time


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--voxel", type=float, default=0.05)
    ap.add_argument("--nscans", type=int, default=1)
    ap.add_argument("--stream", type=int, default=16,
                    help="Frames per device program (lax.scan mini-batch) "
                         "for the headline throughput; 0 = per-frame "
                         "dispatch only.")
    ap.add_argument("--identity", action="store_true",
                    help="identity 64x2048 target instead of 32 beams "
                         "(BASELINE.md protocol's second operating point)")
    ap.add_argument("--adaption", default="mergemesh",
                    choices=["mergemesh", "mesh", "cp"],
                    help="mesh = per-scan integrates (staged dispatch; "
                         "measures the materialized-fusion pipeline); "
                         "cp = pure projection resampling (no volume)")
    ap.add_argument("--bounds", type=float, default=50.0,
                    help="Half-extent of the xy voxel bounds in meters "
                         "(50 = the reference's config/lidar_transfer.yaml "
                         "operating point).")
    ap.add_argument("--no-compact", action="store_true",
                    help="f32 volumes instead of the 8 B/voxel compact "
                         "layout (needs small --bounds to fit HBM).")
    ap.add_argument("--fusion", action="store_true",
                    help="Also measure materialized TSDF-integrate "
                         "throughput (the reference's 'fusion FPS' printed "
                         "field; the transfer itself defers this write).")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()

    from lidar_transfer_tpu.config import (HDL64, SensorSpec, TransferConfig)
    from lidar_transfer_tpu.datasets import kitti, synthetic
    from lidar_transfer_tpu.pipeline import TransferEngine
    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    log(f"devices: {jax.devices()}")
    # warm the device->host transfer path NOW: the first transfer in a
    # process can take minutes through the axon tunnel (it compiles/warms a
    # transfer program); do it on a tiny buffer before anything is timed
    t0 = time.time()
    np.asarray(jnp.zeros((8, 128), jnp.float32))
    np.asarray(jnp.zeros((8, 128), bool))
    log(f"transfer-path warmup: {time.time()-t0:.1f}s")

    source = HDL64
    if args.identity:
        target = source          # 64x2048 -> 64x2048 (protocol's 2nd point)
    else:
        target = SensorSpec(name="HDL32-like", beams=32, fov_up=3.0,
                            fov_down=-25.0, angle_res_hor=360.0 / 2048.0)
    b = args.bounds
    cfg = TransferConfig(
        adaption=args.adaption, number_of_scans=args.nscans,
        voxel_size=args.voxel,
        voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))

    # synthetic scans at slightly different poses (static shapes: capacity
    # fits the 64x2048 = 131k max return count)
    scene = synthetic.Scene.default()
    poses = synthetic.straight_line_poses(args.nscans, step=1.0)
    cap = 139264  # 64*2048 = 131072 returns, rounded up one 8k bucket

    pts_l, rem_l, lbl_l, val_l, rel_l = [], [], [], [], []
    inv0 = np.linalg.inv(poses[0])
    for i in range(args.nscans):
        pts, rem, lbl = synthetic.simulate_scan(scene, source, poses[i])
        p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
        pts_l.append(p)
        rem_l.append(r)
        lbl_l.append(l)
        val_l.append(m)
        rel_l.append((inv0 @ poses[i]).astype(np.float32))
    window = ScanWindow(
        points=jnp.asarray(np.stack(pts_l)),
        remissions=jnp.asarray(np.stack(rem_l)),
        labels=jnp.asarray(np.stack(lbl_l)),
        valid=jnp.asarray(np.stack(val_l)),
        rel_pose=jnp.asarray(np.stack(rel_l)),
        primary_index=0,
    )
    log(f"window: {window.nscans} scans x {cap} capacity, "
        f"{int(np.stack(val_l).sum())} real points")

    eng = TransferEngine(source, target, cfg, cap, fixed_bounds=True,
                         compact_volume=not args.no_compact)
    log(f"volume dims {eng.vol_dims} "
        f"({np.prod(eng.vol_dims)/1e6:.1f}M voxels)")

    def run_frame(w):
        # the production throughput entry: no per-frame RangeImage
        # assembly (its winner-attribute gathers dominated the frame
        # under the remote compiler's scalar-gather lowering)
        return eng.transfer_fast(w)

    # warmup (compile)
    t0 = time.perf_counter()
    for _ in range(args.warmup):
        vs = run_frame(window)
        jax.block_until_ready(vs.range)
    log(f"warmup+compile: {time.perf_counter()-t0:.1f}s")

    # single-frame LATENCY: block after every frame (pays the tunnel's
    # per-dispatch round-trip in full — ~30 ms through the remote runtime
    # in this environment, unrelated to on-chip time)
    t0 = time.perf_counter()
    for i in range(args.frames):
        vs = run_frame(window)
        jax.block_until_ready(vs.range)
    lat_ms = (time.perf_counter() - t0) / args.frames * 1e3
    log(f"latency (sync per frame): {lat_ms:.1f} ms/frame")

    # THROUGHPUT: stream frames asynchronously — issue all, sync once.
    # JAX dispatch is async, so the tunnel round-trip overlaps with device
    # execution exactly as a production pipeline over a scan stream would;
    # device work is serialized either way.
    t0 = time.perf_counter()
    outs = [run_frame(window) for _ in range(args.frames)]
    jax.block_until_ready(outs[-1].range)
    dt = time.perf_counter() - t0
    vs = outs[-1]
    scans_per_sec = args.frames / dt
    rays = target.H * target.W
    log(f"{args.frames} frames in {dt:.2f}s -> {scans_per_sec:.2f} scans/s "
        f"(pipelined), {scans_per_sec*rays/1e6:.1f} Mrays/s synthesized, "
        f"hit rate {np.asarray(vs.mask).mean():.3f}")

    # STREAMED throughput (the headline with --stream F): F frames per
    # device program via TransferEngine.transfer_stream — after the
    # gather-free rewrite the per-program launch overhead (~1.8 ms
    # through the remote runtime) dominates the 2.6 ms device frame;
    # mini-batching amortizes it.
    stream_note = ""
    if args.stream > 0:
        F = args.stream
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (F,) + x.shape), window)
        sv = eng.transfer_stream(stacked)          # compile
        jax.block_until_ready(sv.range)
        # ≥3 pipelined batches so one batch's launch/sync can't dominate
        n_batches = max(3, args.frames // F)
        t0 = time.perf_counter()
        souts = [eng.transfer_stream(stacked) for _ in range(n_batches)]
        jax.block_until_ready(souts[-1].range)
        s_dt = time.perf_counter() - t0
        s_sps = n_batches * F / s_dt
        if s_sps > scans_per_sec:
            scans_per_sec = s_sps
            stream_note = f", stream {F}"
        log(f"{n_batches}x{F} streamed frames in {s_dt:.2f}s -> "
            f"{s_sps:.2f} scans/s, "
            f"{s_sps*rays/1e6:.1f} Mrays/s synthesized, "
            f"hit rate {np.asarray(sv.mask[-1]).mean():.3f}")

    # semantic sanity: every hit pixel must carry a label (the band
    # candidates require label>0) — catches TPU-only data corruption the
    # CPU tests can't (e.g. subnormal-flush of bitcast label bits)
    hitm = np.asarray(vs.mask)
    if hitm.any():
        lbl_fill = float((np.asarray(vs.label)[hitm] > 0).mean())
        log(f"label fill over hit pixels: {lbl_fill:.4f}")
        assert lbl_fill > 0.999, (
            f"labels lost on device (fill {lbl_fill}) — see splat.py "
            "subnormal note")

    # per-cause miss accounting (untimed; VERDICT r1 weak #5): every
    # no-data pixel attributed to out-of-source-FOV / empty direction /
    # outside volume bounds / genuine synthesis miss
    from lidar_transfer_tpu.metrics.diagnostics import miss_decomposition
    from lidar_transfer_tpu.pipeline.multiscan import merge_window
    mpts, _, _, mvalid = merge_window(window)
    dec = miss_decomposition(
        mpts, mvalid, vs.mask, target_H=target.H, target_W=target.W,
        t_fov_up=target.fov_up, t_fov_down=target.fov_down,
        s_fov_up=source.fov_up, s_fov_down=source.fov_down,
        vol_bounds=cfg.voxel_bounds_array)
    log("miss decomposition: " + json.dumps(
        {k: round(v, 4) for k, v in dec.rates().items()}))

    if args.fusion and args.adaption != "mergemesh":
        log("--fusion measures the deferred mergemesh integrate; the mesh "
            "adaption already materializes per scan — skipping")
    elif args.fusion:
        # fusion FPS ≡ the reference's printed field (laserscan.py:971-977)
        # — the class-aware integrate at full volume scale (materialized;
        # the transfer itself never reads it and defers this write)
        state = eng.fused_state()       # builds geom + compiles once
        ri, fov_up, fov_down, origin, active = eng._pending_fusion
        geom = eng._ensure_geom(fov_up, fov_down, ri.range.shape[0])
        n_f = 5
        t0 = time.perf_counter()
        st = eng._take_state()
        for _ in range(n_f):
            st = eng._integrate(st, ri, fov_up, fov_down, origin, active,
                                reset=True, geom=geom, write_weight=False)
        jax.block_until_ready(st.tsdf)
        eng._keep_state(st)
        f_dt = (time.perf_counter() - t0) / n_f
        log(f"fusion: {1.0/f_dt:.2f} integrates/s "
            f"({np.prod(eng.vol_dims)/f_dt/1e9:.2f} Gvoxel/s, "
            f"{f_dt*1e3:.1f} ms per full-volume class-aware integrate)")

    print(json.dumps({
        "metric": f"virtual scans/sec/chip (64x2048 -> "
                  f"{target.H}x{target.W}, "
                  f"{args.adaption}, "
                  f"voxel {args.voxel}m, bounds +-{args.bounds:g}m, "
                  f"nscans {args.nscans}{stream_note})",
        "value": round(scans_per_sec, 2),
        "unit": "scans/sec",
        "vs_baseline": round(scans_per_sec / 50.0, 3),
    }))


if __name__ == "__main__":
    main()

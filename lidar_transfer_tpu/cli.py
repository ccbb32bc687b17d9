"""Command-line driver for batch scan transfer.

Drop-in workflow equivalent of the reference ``lidar_deform.py``
(lidar_deform.py:77-483) with the same flags:

  lt-transfer -d DATASET [-c CFG.yaml] [-s SEQ] [-t TARGET.yaml]
              [-o OFFSET] [-p OUT] [-b] [-w] [--one_scan]

plus TPU-era extras (--frames, --fixed-bounds, --metrics-json). The
interactive vispy viewer of the reference is replaced by offline PNG export
(see utils/images.py; SURVEY.md §7 step 9 does viz last) — batch mode is the
production path.

Printed metric lines keep the reference's field names ("IoU:", "Acc:",
"MSE: ", "Took: ...s" — laserscan.py:1231-1261, lidar_deform.py:422) so
humans and scripts see familiar output; the structured per-frame metrics are
also written to --metrics-json (the reference's grid search had to scrape
stdout by line offset, grid_search_nframes_voxelsize.py:83-89 — ours reads
the JSON).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from shutil import copy2

import numpy as np



def _pack_compare(res, jnp):
    """compare_scans result -> ONE concatenated device vector so a whole
    comparison costs a single device->host read (~30 ms round trip per
    read through this environment's remote runtime). Layout consumed by
    ``_unpack_compare`` — keep the two in sync ONLY here."""
    return jnp.concatenate([res.iou_per_class,
                            res.present.astype(jnp.float32),
                            jnp.stack([res.mean_iou, res.mean_acc,
                                       res.mse])])


def _unpack_compare(row, nc):
    return dict(iou_per_class=row[:nc], present=row[nc:2 * nc] > 0.5,
                iou=float(row[2 * nc]), acc=float(row[2 * nc + 1]),
                mse=float(row[2 * nc + 2]))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("lt-transfer")
    p.add_argument("--dataset", "-d", type=str, required=True,
                   help="Dataset root to adapt (KITTI layout).")
    p.add_argument("--config", "-c", type=str, default=None,
                   help="Tool config yaml (defaults to built-in "
                        "SemanticKITTI mergemesh config).")
    p.add_argument("--sequence", "-s", type=str, default="00")
    p.add_argument("--target", "-t", type=str, default="",
                   help="Target sensor yaml. Defaults to the dataset's "
                        "config.yaml (identity transfer).")
    p.add_argument("--offset", "-o", type=int, default=0)
    p.add_argument("--output", "-p", type=str, default="output/")
    p.add_argument("--batch", "-b", action="store_true",
                   help="Batch mode (no visualization export).")
    p.add_argument("--write", "-w", action="store_true",
                   help="Write transferred dataset.")
    p.add_argument("--one_scan", action="store_true", help="Run only once.")
    p.add_argument("--frames", type=int, default=None,
                   help="Max frames to process.")
    p.add_argument("--fixed-bounds", action="store_true",
                   help="Use full config-bounds volume (fastest on TPU; "
                        "skips per-frame cloud clipping).")
    p.add_argument("--metrics-json", type=str, default=None,
                   help="Write per-frame metrics to this JSON file.")
    p.add_argument("--png", action="store_true",
                   help="Export label/range PNGs of each virtual scan.")
    p.add_argument("--stream", type=int, default=0, metavar="N",
                   help="Process N frames per device program "
                        "(TransferEngine.transfer_stream) — amortizes "
                        "per-program launch overhead for batch "
                        "conversion. 0 = per-frame (default). Ignored "
                        "with --rolling-shutter/--ply.")
    p.add_argument("--rolling-shutter", action="store_true",
                   help="Model ego motion within each frame: target rays "
                        "originate at the per-column interpolated sensor "
                        "pose (uses the next scan's pose).")
    p.add_argument("--ply", type=str, default=None,
                   help="Export the fused surface mesh of each frame as "
                        "PLY into this directory (opt-in; the reference "
                        "unconditionally wrote test.ply per frame).")
    p.add_argument("--html", type=str, default=None, metavar="OUT.html",
                   help="Write a standalone interactive WebGL viewer of "
                        "the first --html-frames transfers (linked "
                        "source|virtual 3D views, image rows, label "
                        "diff, IoU/Acc/MSE title; n/b/q/1/2/3 keys). "
                        "Runs in any browser — the executable "
                        "equivalent of the reference's LaserScanVis.")
    p.add_argument("--html-frames", type=int, default=4,
                   help="Frames embedded in --html (default 4).")
    p.add_argument("--html-max-points", type=int, default=300_000,
                   help="Per-cloud point cap embedded in --html.")
    p.add_argument("--profile", type=str, default=None,
                   help="Capture a jax profiler trace of the run into "
                        "this directory (view with TensorBoard). Replaces "
                        "the reference's print-based timing, SURVEY.md §5.")
    p.add_argument("--cpu", action="store_true",
                   help="Force the CPU backend.")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from lidar_transfer_tpu.utils import setup_compile_cache, StageTimer
    setup_compile_cache()

    import jax.numpy as jnp
    from lidar_transfer_tpu.config import SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets import KittiSequence, kitti
    from lidar_transfer_tpu.metrics import compare_scans
    from lidar_transfer_tpu.ops import projection as P
    from lidar_transfer_tpu.pipeline import TransferEngine, load_window
    from lidar_transfer_tpu.pipeline.multiscan import (max_end_index,
        min_start_index)
    from lidar_transfer_tpu.pipeline.writer import write_virtual_scan

    # ---- configs (3 layers, ≡ lidar_deform.py:153-325)
    cfg = (TransferConfig.from_yaml(args.config) if args.config
           else TransferConfig())
    source_cfg_path = os.path.join(args.dataset, "config.yaml")
    source = SensorSpec.from_yaml(source_cfg_path)
    target_path = args.target or source_cfg_path
    target = SensorSpec.from_yaml(target_path)

    print("*" * 60)
    print(f"Source {source.name}: {source.H} x {source.W} "
          f"fov [{source.fov_up}, {source.fov_down}]")
    print(f"Target {target.name}: {target.H} x {target.W} "
          f"fov [{target.fov_up}, {target.fov_down}]")
    print(f"Adaption {cfg.adaption}, nscans {cfg.number_of_scans}, "
          f"voxel {cfg.voxel_size}, preserve_float {cfg.preserve_float}")
    print("*" * 60)

    seq = KittiSequence.open(args.dataset, args.sequence)
    if len(seq) == 0:
        print("Empty sequence! Exiting...")
        return 1

    # capacity: largest scan in the sequence, bucketed (static shapes)
    probe = max(os.path.getsize(f) // 16 for f in seq.scan_files)
    capacity = kitti.scan_capacity(probe)

    out_path = None
    if args.write or args.png:
        out_path = kitti.make_output_dirs(args.output, args.sequence,
                                          write_png=args.png)
        copy2(target_path, out_path)
        if args.config:
            copy2(args.config, out_path)
        cfg.to_yaml(os.path.join(out_path, "lidar_transfer.yaml"))

    eng = TransferEngine(source, target, cfg, capacity,
                         fixed_bounds=args.fixed_bounds)

    same_dims = (source.H, source.W) == (target.H, target.W)
    idx = max(args.offset, min_start_index(cfg.number_of_scans))
    if idx != args.offset:
        print(f"Automatic offset {idx}")
    end = max_end_index(cfg.number_of_scans, len(seq))
    increment = cfg.batch_interval if args.batch else 1
    frames_done = 0
    all_metrics = []

    profiler_ctx = None
    if args.profile:
        jax.profiler.start_trace(args.profile)
        profiler_ctx = args.profile

    # plan the frame indices up front so the loader can run ahead
    plan = []
    j = idx
    while j < end:
        if args.frames is not None and len(plan) >= args.frames:
            break                      # exact cap (incl. --frames 0)
        plan.append(j)
        if args.one_scan:
            break
        j += increment
    from lidar_transfer_tpu.utils.prefetch import Prefetcher
    windows_ahead = Prefetcher(
        lambda i: load_window(seq, cfg, i, capacity), plan, depth=2)

    # --stream N: N frames per device program (transfer_stream).
    # Incompatible with per-frame lazy-volume consumers (the stash holds
    # only the batch's LAST frame).
    stream = args.stream
    if stream < 0:
        raise SystemExit(f"--stream must be >= 0, got {stream}")
    if stream and (args.rolling_shutter or args.ply or args.html):
        print("--stream disabled: --rolling-shutter/--ply/--html need "
              "the per-frame path")
        stream = 0

    # batched-SYNC metrics for the stream path: the per-frame loop's
    # float() reads each pay this environment's ~30 ms device->host
    # round-trip (BASELINE.md). Here every frame's source projection and
    # compare dispatch ASYNC — bit-identical to the per-frame path
    # (fusing the projection into one big program would re-round pixel
    # coords, the cp() FMA effect) — and the stream syncs ONCE per
    # batch. The source scan is the window's PRIMARY scan (window_indices
    # puts it first), so no re-read from disk is needed.
    def batch_metrics(bufwins, sv):
        futures = []
        for k, w in enumerate(bufwins):
            val = P.mask_classes(w.labels[0], w.valid[0],
                                 cfg.ignore_classes)
            src = P.range_project(
                w.points[0], w.remissions[0], w.labels[0], val,
                H=source.H, W=source.W, fov_up_deg=source.fov_up,
                fov_down_deg=source.fov_down,
                beam_angles=eng.s_beam_angles)
            futures.append(compare_scans(
                src.label, src.mask, src.range,
                jnp.maximum(src.remission, 0.0),
                sv.label[k], sv.range[k], sv.remission[k]))
        # ONE device->host read for the whole batch: each read through
        # this environment's remote runtime costs a full ~30 ms round
        # trip even when the value is ready, so per-frame scalar reads
        # dominated end-to-end conversion
        nc = futures[0].iou_per_class.shape[0]
        packed = np.asarray(jnp.stack(
            [_pack_compare(r, jnp) for r in futures]))
        return [_unpack_compare(row, nc) for row in packed]

    def frame_results():
        """Yield (idx, VirtualScan, timer, t0, pre_metrics) per frame —
        either the per-frame path (pre_metrics None) or sliced out of a
        streamed mini-batch (metrics batch-computed)."""
        from lidar_transfer_tpu.pipeline.deform import VirtualScan
        from lidar_transfer_tpu.pipeline.multiscan import stack_windows

        if not stream:
            for idx, window in windows_ahead:
                timer = StageTimer()
                t0 = time.time()
                with timer.span("transfer", 1):
                    # throughput entry — no per-frame RangeImage
                    # (nothing in this loop reads it; fused_state()
                    # rebuilds it lazily for --ply / --rolling-shutter).
                    # cp keeps its dispatch-split exact-identity path
                    # per frame (deform.cp docstring); --stream opts
                    # into the fused body explicitly.
                    if cfg.adaption == "cp":
                        vs, _ = eng.transfer(window)
                    else:
                        vs = eng.transfer_fast(window)
                    if (args.rolling_shutter and idx + 1 < len(seq)
                            and cfg.adaption in ("mesh", "mergemesh")):
                        import numpy as _np

                        pose_next = (_np.linalg.inv(seq.poses[idx])
                                     @ seq.poses[idx + 1])
                        vs = eng.resynthesize_rolling_shutter(pose_next)
                    # fetch-sync, not just block_until_ready: until a
                    # process's first device->host transfer the barrier
                    # is an async ACK on this runtime (CLAUDE.md) and
                    # "Took" would record dispatch rate
                    np.asarray(jax.device_get(vs.range[:1, :1]))
                yield idx, vs, timer, t0, None, window
            return

        buf = []

        def flush():
            if not buf:
                return
            # a FRESH timer per yielded frame: a shared one would
            # give every frame the whole batch span and accumulate the
            # write spans across the batch (~8x overstated stage sums);
            # the batch-level transfer span rides on frame 0's timer
            # with count=len(buf)
            timers = [StageTimer() for _ in buf]
            timer = timers[0]
            t0 = time.time()
            stacked = stack_windows([w for _, w in buf])
            with timer.span("transfer_stream", len(buf)):
                sv = eng.transfer_stream(stacked)
                jax.block_until_ready(sv.range)
            pre = ([None] * len(buf) if not same_dims
                   else batch_metrics([w for _, w in buf], sv))
            # pull the batch outputs in FIVE device->host reads total —
            # per-frame reads each cost a ~30 ms tunnel round trip
            rng_np = np.asarray(sv.range)
            lbl_np = np.asarray(sv.label)
            rem_np = np.asarray(sv.remission)
            pts_np = np.asarray(sv.points)
            msk_np = np.asarray(sv.mask)
            for k, (i, _) in enumerate(buf):
                vs_k = VirtualScan(
                    range=rng_np[k], label=lbl_np[k],
                    remission=rem_np[k], points=pts_np[k],
                    mask=msk_np[k], adaption=sv.adaption)
                yield i, vs_k, timers[k], t0, pre[k], None
                t0 = time.time()       # amortized per-frame wall
            buf.clear()

        for idx, window in windows_ahead:
            buf.append((idx, window))
            if len(buf) == stream:
                yield from flush()
        yield from flush()

    html_frames: list = []

    # an exception mid-run must still finalize the trace, or the
    # profile directory is left unreadable (--profile try/finally)
    try:
        for idx, vs, timer, t0, pre, window in frame_results():
            frame_metrics = {"index": idx}
            if pre is not None:
                iou, present = pre["iou_per_class"], pre["present"]
                print("IoU class: ", (iou[present] * 100).astype(int))
                print("IoU: ", pre["iou"])
                print("Acc: ", pre["acc"])
                print("MSE: ", pre["mse"])
                frame_metrics.update(iou=pre["iou"], acc=pre["acc"],
                                     mse=pre["mse"])
            src = None
            if pre is None and same_dims:
                # source reference scan (≡ lidar_deform.py:403-409) —
                # from the prefetched window's primary slot (raw points
                # + ignore-masked valid), not a second disk read
                src = P.range_project(
                    window.points[0], window.remissions[0],
                    window.labels[0], window.valid[0],
                    H=source.H, W=source.W, fov_up_deg=source.fov_up,
                    fov_down_deg=source.fov_down,
                    beam_angles=eng.s_beam_angles)
                res = compare_scans(src.label, src.mask, src.range,
                                    jnp.maximum(src.remission, 0.0),
                                    vs.label, vs.range, vs.remission)
                # ONE packed device->host read (each read costs a full
                # ~30 ms tunnel round trip; this was 5 separate ones)
                nc = res.iou_per_class.shape[0]
                m = _unpack_compare(
                    np.asarray(_pack_compare(res, jnp)), nc)
                iou, present = m["iou_per_class"], m["present"]
                print("IoU class: ", (iou[present] * 100).astype(int))
                print("IoU: ", m["iou"])
                print("Acc: ", m["acc"])
                print("MSE: ", m["mse"])
                frame_metrics.update(iou=m["iou"], acc=m["acc"],
                                     mse=m["mse"])

            if args.write:
                with timer.span("write", 1):
                    n = write_virtual_scan(out_path, idx, vs)
                frame_metrics["points_written"] = n
            if args.png:
                # independent of --write (the flag promises PNG export)
                os.makedirs(out_path, exist_ok=True)
                from lidar_transfer_tpu.utils.images import (
                    save_virtual_scan_pngs)
                save_virtual_scan_pngs(out_path, idx, vs, cfg)

            if (args.html and window is not None
                    and len(html_frames) < args.html_frames):
                from lidar_transfer_tpu.interactive import frame_payload

                # reuse the metrics branch's source projection when it
                # already ran (identity dims) — it is the same image
                src_ri = src if src is not None else P.range_project(
                    window.points[0], window.remissions[0],
                    window.labels[0], window.valid[0],
                    H=source.H, W=source.W, fov_up_deg=source.fov_up,
                    fov_down_deg=source.fov_down,
                    beam_angles=eng.s_beam_angles)
                val = np.asarray(window.valid[0])
                html_frames.append((
                    f"{args.sequence}_{idx:06d}",
                    frame_payload(
                        src_ri, cfg, virtual=vs,
                        source_points=np.asarray(window.points[0])[val],
                        source_labels=np.asarray(window.labels[0])[val])))

            if args.ply and cfg.adaption in ("mesh", "mergemesh"):
                os.makedirs(args.ply, exist_ok=True)
                from lidar_transfer_tpu.config import make_color_lut
                lut = (make_color_lut(cfg.color_map_bgr)[:, ::-1]
                       * 255).astype("uint8")
                n_tri = eng.export_mesh(
                    os.path.join(args.ply, f"{idx:06d}.ply"), colorize=lut)
                frame_metrics["triangles"] = n_tri

            s = time.time() - t0
            print("Took: %.2fs" % s)
            frame_metrics["seconds"] = s
            frame_metrics["stages"] = timer.report()
            all_metrics.append(frame_metrics)
            frames_done += 1
            if frames_done < len(plan):
                print("#" * 30, args.sequence, "-", idx + increment, "/",
                      len(seq), "#" * 30)

    finally:
        windows_ahead.close()
        if profiler_ctx:
            jax.profiler.stop_trace()
            print(f"profiler trace in {profiler_ctx}")


    if args.html and html_frames:
        from lidar_transfer_tpu.webviewer import export_html
        out = export_html(
            html_frames, args.html,
            title=f"{source.name} → {target.name} ({cfg.adaption})",
            max_points=args.html_max_points)
        print(f"wrote {out} ({os.path.getsize(out) / 1e6:.1f} MB, "
              f"{len(html_frames)} frames)")

    if args.metrics_json:
        with open(args.metrics_json, "w") as f:
            json.dump(all_metrics, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())

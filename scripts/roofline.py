#!/usr/bin/env python3
"""Efficiency denominators: roofline / MFU vs the chip (VERDICT r4 #2).

Every perf claim so far is scans/s vs the >=50 target or vs the
reference; this script pins each workload against the SILICON:

  * train_step MFU — XLA cost-analysis FLOPs / measured step time /
    peak matmul throughput, for darknet21/darknet53 at 64x2048x5,
    batch 2 and 4;
  * TSDF integrate — modeled HBM state traffic (read+write of the
    4-array compact volume) / measured integrate time / peak HBM BW;
  * transfer stream frame — analytic bytes-touched lower bound /
    measured streamed frame time / the MEASURED multi-stream write
    ceiling (~275 GB/s, scripts/probe_pallas_write.py), plus the HBM
    peak for reference.

TPU v5e (v5 lite) datasheet constants, annotated inline:
  peak bf16 matmul  197 TFLOP/s
  peak HBM BW       819 GB/s
  HBM capacity      16 GB

Writes experiments_artifacts/roofline_r05.json and prints one summary
line per workload. Run on the real TPU (no flags) after a healthy
tunnel check; every timed loop is fetch-synced and pre-warmed per
CLAUDE.md's measurement rules.

Usage: python scripts/roofline.py [--skip train,integrate,transfer]
       [--out PATH]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_FLOPS = 197e12       # TPU v5e peak bf16 matmul
PEAK_HBM_GBPS = 819.0          # TPU v5e HBM bandwidth
MEASURED_WRITE_GBPS = 275.0    # probe_pallas_write.py round-4 re-measure


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _sync(jax, np, x):
    jax.block_until_ready(x)
    leaf = jax.tree.leaves(x)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def _warm_transfer(jnp, np):
    t0 = time.time()
    np.asarray(jnp.zeros((8, 128)))
    log(f"transfer warmup {time.time()-t0:.1f}s")


def measure_train(jax, jnp, np, results, tiny=False):
    from lidar_transfer_tpu.models import RangeNet, RangeNetConfig
    from lidar_transfer_tpu.models.rangenet import (make_train_state,
                                                    train_step)

    h, w = (16, 64) if tiny else (64, 2048)
    rows = []
    for arch in (("tiny",) if tiny else ("darknet21", "darknet53")):
        cfg = getattr(RangeNetConfig, arch)(num_classes=34)
        model = RangeNet(cfg)
        params, opt_state, tx = make_train_state(
            model, jax.random.PRNGKey(0), (1, h, w, cfg.input_channels))
        for batch_n in (2, 4):
            batch = dict(
                features=jnp.ones((batch_n, h, w, cfg.input_channels),
                                  jnp.float32),
                labels=jnp.zeros((batch_n, h, w), jnp.int32),
                weights=jnp.ones((batch_n, h, w), jnp.float32))
            # XLA's own cost analysis of the COMPILED step
            lowered = jax.jit(
                lambda p, o, b: train_step(model, tx, p, o, b)
            ).lower(params, opt_state, batch)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = float(cost.get("flops", 0.0))
            bytes_acc = float(cost.get("bytes accessed", 0.0))
            p2, o2, loss = train_step(model, tx, params, opt_state, batch)
            _sync(jax, np, loss)
            n_it = 10
            t0 = time.perf_counter()
            p_t, o_t = params, opt_state
            for _ in range(n_it):
                p_t, o_t, loss = train_step(model, tx, p_t, o_t, batch)
            _sync(jax, np, loss)
            dt = (time.perf_counter() - t0) / n_it
            mfu = flops / dt / PEAK_BF16_FLOPS
            row = {"arch": arch, "batch": batch_n, "h": h, "w": w,
                   "flops_per_step": flops, "step_ms": round(dt * 1e3, 2),
                   "tflops_achieved": round(flops / dt / 1e12, 2),
                   "mfu_vs_bf16_peak": round(mfu, 4),
                   # the memory-roofline side: logical bytes accessed
                   # per XLA cost analysis -> bandwidth-bound floor;
                   # when measured step_ms ~ this floor the MFU figure
                   # is an arithmetic-intensity ceiling, not headroom
                   "bytes_accessed_gb": round(bytes_acc / 1e9, 2),
                   "hbm_bound_floor_ms": round(
                       bytes_acc / (PEAK_HBM_GBPS * 1e9) * 1e3, 1),
                   "mxu_bound_floor_ms": round(
                       flops / PEAK_BF16_FLOPS * 1e3, 1)}
            rows.append(row)
            log(f"train {arch} b{batch_n}: {dt*1e3:.1f} ms/step, "
                f"{flops/1e12:.2f} TF/step -> "
                f"{flops/dt/1e12:.1f} TFLOP/s = {mfu*100:.1f}% MFU")
    results["train"] = {"peak_bf16_tflops": PEAK_BF16_FLOPS / 1e12,
                        "rows": rows}


def measure_integrate(jax, jnp, np, results):
    from lidar_transfer_tpu.config import (HDL64, SensorSpec,
                                           TransferConfig)
    from lidar_transfer_tpu.datasets import kitti, synthetic
    from lidar_transfer_tpu.pipeline import TransferEngine
    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    source = HDL64
    b = 50.0
    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.05,
                         voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
    scene = synthetic.Scene.default()
    pose = np.eye(4)
    cap = 139264
    pts, rem, lbl = synthetic.simulate_scan(scene, source, pose)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    window = ScanWindow(
        points=jnp.asarray(p[None]), remissions=jnp.asarray(r[None]),
        labels=jnp.asarray(l[None]), valid=jnp.asarray(m[None]),
        rel_pose=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        primary_index=0)
    eng = TransferEngine(source, source, cfg, cap, fixed_bounds=True,
                         compact_volume=True)
    n_vox = int(np.prod(eng.vol_dims))
    log(f"volume dims {eng.vol_dims} ({n_vox/1e9:.2f}G voxels)")
    eng.transfer_fast(window)
    state = eng.fused_state()            # compiles the integrate
    ri, fov_up, fov_down, origin, active = eng._pending_fusion
    geom = eng._ensure_geom(fov_up, fov_down, ri.range.shape[0])
    _sync(jax, np, state.tsdf)
    n_it = 5
    t0 = time.perf_counter()
    st = eng._take_state()
    for _ in range(n_it):
        st = eng._integrate(st, ri, fov_up, fov_down, origin, active,
                            reset=True, geom=geom, write_weight=False)
    _sync(jax, np, st.tsdf)
    eng._keep_state(st)
    dt = (time.perf_counter() - t0) / n_it
    # traffic model (lower bound): the two-stage kernel reads the 4
    # compact arrays (bf16+bf16+i16+bf16 = 8 B/voxel) once and writes
    # tsdf/label/rem (weight skipped, write_weight=False: 6 B/voxel);
    # range-image reads are negligible (1 MB vs GBs)
    bytes_per_vox = 8 + 6
    gb = n_vox * bytes_per_vox / 1e9
    gbps = gb / dt
    results["integrate"] = {
        "n_voxels": n_vox, "ms_per_integrate": round(dt * 1e3, 1),
        "modeled_traffic_gb": round(gb, 2),
        "achieved_gbps": round(gbps, 1),
        "peak_hbm_gbps": PEAK_HBM_GBPS,
        "fraction_of_hbm_peak": round(gbps / PEAK_HBM_GBPS, 3)}
    log(f"integrate: {dt*1e3:.1f} ms for {gb:.1f} GB modeled -> "
        f"{gbps:.0f} GB/s = {gbps/PEAK_HBM_GBPS*100:.0f}% of HBM peak")


def measure_transfer(jax, jnp, np, results):
    from lidar_transfer_tpu.config import (HDL64, SensorSpec,
                                           TransferConfig)
    from lidar_transfer_tpu.datasets import kitti, synthetic
    from lidar_transfer_tpu.pipeline import TransferEngine
    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    source = HDL64
    target = SensorSpec(name="HDL32-like", beams=32, fov_up=3.0,
                        fov_down=-25.0, angle_res_hor=360.0 / 2048.0)
    b = 50.0
    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.05,
                         voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
    scene = synthetic.Scene.default()
    cap = 139264
    pts, rem, lbl = synthetic.simulate_scan(scene, source, np.eye(4))
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    window = ScanWindow(
        points=jnp.asarray(p[None]), remissions=jnp.asarray(r[None]),
        labels=jnp.asarray(l[None]), valid=jnp.asarray(m[None]),
        rel_pose=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        primary_index=0)
    eng = TransferEngine(source, target, cfg, cap, fixed_bounds=True,
                         compact_volume=True)
    F = 64
    stacked = jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (F,) + x.shape), window)
    sv = eng.transfer_stream(stacked)
    _sync(jax, np, sv.range)
    n_batches = 6
    t0 = time.perf_counter()
    outs = [eng.transfer_stream(stacked) for _ in range(n_batches)]
    _sync(jax, np, outs[-1].range)
    dt = (time.perf_counter() - t0) / (n_batches * F)
    # analytic bytes-touched LOWER BOUND per frame (round-3-close trace,
    # docs/PERF.md "streamed frame's per-op floor"): the frame is sorts/
    # scatter/gather over per-point rows — model the dominant arrays,
    # each read+written once per pass:
    N = cap
    rays = target.H * target.W
    sort_passes = 2           # winner-order sort + candidate sort
    # per point: key f32 + idx i32 + 3x f32 xyz + rem + lbl ~ 28 B/row
    row_bytes = 28
    frame_gb = (sort_passes * 2 * N * row_bytes      # sort read+write
                + 2 * N * row_bytes                  # band candidates
                + rays * (4 * 4 + 2 * row_bytes)     # target assemble
                ) / 1e9
    gbps = frame_gb / dt
    results["transfer"] = {
        "ms_per_frame_streamed": round(dt * 1e3, 3),
        "modeled_bytes_lower_bound_gb": round(frame_gb, 4),
        "achieved_gbps_lower_bound": round(gbps, 1),
        "measured_multistream_ceiling_gbps": MEASURED_WRITE_GBPS,
        "peak_hbm_gbps": PEAK_HBM_GBPS,
        "fraction_of_measured_ceiling": round(
            gbps / MEASURED_WRITE_GBPS, 3),
        "note": "bytes model is a LOWER bound (each pass counted once; "
                "XLA materializes intermediates) — see the xplane op "
                "table in docs/PERF.md for the trace-backed view"}
    log(f"transfer stream: {dt*1e3:.2f} ms/frame, modeled >= "
        f"{frame_gb*1e3:.0f} MB -> {gbps:.0f} GB/s "
        f"({gbps/MEASURED_WRITE_GBPS*100:.0f}% of the measured ceiling)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="",
                    help="comma list: train,integrate,transfer")
    ap.add_argument("--tiny", action="store_true",
                    help="CPU smoke mode: tiny arch/shapes, numbers "
                         "meaningless — validates the harness only")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out",
                    default="experiments_artifacts/roofline_r05.json")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()
    log(f"devices: {jax.devices()}")
    _warm_transfer(jnp, np)

    results = {"constants": {"peak_bf16_tflops": PEAK_BF16_FLOPS / 1e12,
                             "peak_hbm_gbps": PEAK_HBM_GBPS,
                             "measured_write_ceiling_gbps":
                                 MEASURED_WRITE_GBPS,
                             "chip": "TPU v5e (v5 lite)"}}
    for name, fn in (("train", measure_train),
                     ("integrate", measure_integrate),
                     ("transfer", measure_transfer)):
        if name in skip:
            continue
        log(f"=== {name} ===")
        t0 = time.time()
        try:
            if name == "train":
                fn(jax, jnp, np, results, tiny=args.tiny)
            else:
                fn(jax, jnp, np, results)
        except Exception as e:                      # partial results win
            log(f"{name} FAILED: {e!r}")
            results[name] = {"error": repr(e)[:300]}
        log(f"{name} took {time.time()-t0:.0f}s")
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps({k: v for k, v in results.items()
                      if k != "constants"}, indent=2))


if __name__ == "__main__":
    main()

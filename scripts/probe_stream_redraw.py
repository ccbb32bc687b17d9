#!/usr/bin/env python3
"""Does RECOMPILING rescue a slow compile-regime draw of the stream body?

The remote compiler's lowering is nondeterministic per compile (CLAUDE.md,
docs/PERF.md): the upsampling stream body draws a ~25%-slower scalar-gather
regime roughly 1-in-5 fresh-cache runs (91.8 vs 123.5 scans/s across three
floor campaigns). If a *redraw within the same process* is independent —
i.e. compiling the same per-frame program again under a trivially perturbed
batch shape (F-1 frames) re-rolls the lowering — then a bounded
measure-and-redraw autotune at stream setup collapses the floor.

This probe answers that question empirically. One process = one cache dir
= one sample; it compiles and fetch-sync-times the upsampling stream body
at several batch sizes (each a distinct program → distinct draw) and
prints one JSON line with the per-draw ms/frame. Run it N times with fresh
LT_JAX_CACHE dirs (``--campaign N`` does this via subprocesses) and look
at the joint distribution: slow draws should appear independently across
the batch-size columns.

Reference context: the operating point is bench.py --upsample
(64x2048 -> 128x2048 mergemesh, voxel 0.05, ±50 m), the one point whose
fresh-cache floor still spreads >10% (BASELINE.md).
"""

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def sample(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()

    from lidar_transfer_tpu.config import HDL64, SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets import kitti, synthetic
    from lidar_transfer_tpu.pipeline import TransferEngine
    from lidar_transfer_tpu.pipeline.multiscan import ScanWindow

    print(f"# devices: {jax.devices()}", flush=True)
    t0 = time.monotonic()
    np.asarray(jnp.zeros((8, 128), jnp.float32))  # transfer-path warmup
    print(f"# transfer warmup {time.monotonic()-t0:.1f}s", flush=True)

    source = HDL64
    target = SensorSpec(name="HDL64x2", beams=128, fov_up=source.fov_up,
                        fov_down=source.fov_down,
                        angle_res_hor=source.angle_res_hor)
    b = 50.0
    cfg = TransferConfig(adaption="mergemesh", number_of_scans=1,
                         voxel_size=0.05,
                         voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
    cap = 139264
    scene = synthetic.Scene.default()
    pose = synthetic.straight_line_poses(1, step=1.0)[0]
    pts, rem, lbl = synthetic.simulate_scan(scene, source, pose)
    p, r, l, m = kitti.pad_points(pts, rem, lbl, cap)
    window = ScanWindow(
        points=jnp.asarray(p[None]), remissions=jnp.asarray(r[None]),
        labels=jnp.asarray(l[None]), valid=jnp.asarray(m[None]),
        rel_pose=jnp.asarray(np.eye(4, dtype=np.float32)[None]),
        primary_index=0)

    eng = TransferEngine(source, target, cfg, cap, fixed_bounds=True,
                         compact_volume=True)

    def sync(x):
        jax.block_until_ready(x)
        np.asarray(jax.device_get(x[:1, :1]))

    rows = []
    for F in args.batches:
        stacked = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (F,) + x.shape), window)
        t0 = time.monotonic()
        sv = eng.transfer_stream(stacked)       # compile (fresh draw)
        sync(sv.range)                          # includes sync-expr compile
        compile_s = time.monotonic() - t0
        t0 = time.perf_counter()
        outs = [eng.transfer_stream(stacked) for _ in range(args.timed)]
        sync(outs[-1].range)
        dt = time.perf_counter() - t0
        ms = dt / (args.timed * F) * 1e3
        rows.append({"F": F, "ms_per_frame": round(ms, 3),
                     "scans_per_sec": round(args.timed * F / dt, 1),
                     "compile_s": round(compile_s, 1)})
        print(f"# F={F}: {ms:.2f} ms/frame "
              f"({rows[-1]['scans_per_sec']} scans/s), "
              f"compile {compile_s:.0f}s", flush=True)
        # jit caches by shape: a repeated F would silently reuse this
        # compile and fake an "independent draw" — drop the callable
        eng._mm_jit_stream = None
    print("SAMPLE " + json.dumps({"rows": rows}), flush=True)


def campaign(args):
    import shutil
    import subprocess
    import tempfile

    all_rows = []
    for i in range(args.campaign):
        cache = tempfile.mkdtemp(prefix=f"lt_redraw_{i}_")
        env = dict(os.environ)
        env["LT_JAX_CACHE"] = cache
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--timed", str(args.timed),
                 "--batches", ",".join(map(str, args.batches))],
                env=env, capture_output=True, text=True,
                timeout=args.deadline)
            for ln in proc.stdout.splitlines():
                print(f"[{i}] {ln}", flush=True)
            line = [ln for ln in proc.stdout.splitlines()
                    if ln.startswith("SAMPLE ")]
            rec = (json.loads(line[-1][len("SAMPLE "):])
                   if line else {"error": proc.stderr[-300:]})
        except subprocess.TimeoutExpired:
            rec = {"error": "timeout"}
        finally:
            shutil.rmtree(cache, ignore_errors=True)
        rec["sample"] = i
        all_rows.append(rec)
        print("CAMPAIGN_ROW " + json.dumps(rec), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"samples": all_rows,
                       "batches": args.batches,
                       "timed": args.timed}, f, indent=1)
        print(f"# wrote {args.out}", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=lambda s: [int(x) for x in
                                                 s.split(",")],
                    default=[128, 127, 126])
    ap.add_argument("--timed", type=int, default=3,
                    help="timed batches per draw (after 1 warm batch)")
    ap.add_argument("--campaign", type=int, default=0,
                    help="run N fresh-cache subprocess samples")
    ap.add_argument("--deadline", type=float, default=900.0)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.campaign:
        campaign(args)
    else:
        sample(args)


if __name__ == "__main__":
    main()

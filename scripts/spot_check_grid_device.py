#!/usr/bin/env python3
"""On-device spot-check of the committed quality grid (VERDICT r4 #9).

`grid_search_full_r04` ran with --cpu; device/CPU parity is separately
tested at small scale, but the headline quality artifact should have a
few cells reproduced by the TPU path it advertises. This re-runs chosen
cells of the SAME deterministic dataset (Scene.default, HDL64, 24
scans — regenerated if absent) on the default (TPU) backend and commits
the per-cell comparison.

Usage: python scripts/spot_check_grid_device.py
       [--cells 1:0.25 20:0.05 5:0.04] [--ref PATH] [--out PATH]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cells", nargs="+",
                    default=["1:0.25", "20:0.05", "5:0.04", "1:0.04"],
                    help="frames:voxel pairs")
    ap.add_argument("--ref",
                    default="experiments_artifacts/grid_search_full_r04/"
                            "grid_search.json")
    ap.add_argument("--out",
                    default="experiments_artifacts/"
                            "grid_device_spotcheck_r05.json")
    ap.add_argument("--dataset", default="/tmp/grid_ds64")
    ap.add_argument("--n-scans", type=int, default=24)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()
    print(f"devices: {jax.devices()}", flush=True)
    # warm the device->host transfer path (CLAUDE.md)
    import jax.numpy as jnp
    t0 = time.time()
    np.asarray(jnp.zeros((8, 128)))
    print(f"transfer warmup {time.time()-t0:.1f}s", flush=True)

    from lidar_transfer_tpu.config import HDL64, TransferConfig
    from lidar_transfer_tpu.datasets import synthetic
    from lidar_transfer_tpu.experiments.grid_search import evaluate_transfer

    if not os.path.exists(os.path.join(args.dataset, "config.yaml")):
        print(f"regenerating {args.n_scans}-scan dataset", flush=True)
        synthetic.write_kitti_dataset(args.dataset,
                                      synthetic.Scene.default(), HDL64,
                                      n_scans=args.n_scans)

    ref = json.load(open(args.ref))
    ref_cells = {(c["number_of_scans"], c["voxel_size"]): c
                 for c in ref["cells"]}
    base = TransferConfig()
    rows = []
    for spec in args.cells:
        frames_s, voxel_s = spec.split(":")
        nscans, voxel = int(frames_s), float(voxel_s)
        rc = ref_cells.get((nscans, voxel))
        if rc is None:
            print(f"cell {spec} not in the reference artifact — skipped",
                  flush=True)
            continue
        cfg = dataclasses.replace(base, adaption="mergemesh",
                                  number_of_scans=nscans,
                                  voxel_size=voxel)
        t0 = time.time()
        r = evaluate_transfer(args.dataset, cfg, sequence="00", offset=0,
                              frames=2)
        row = {"number_of_scans": nscans, "voxel_size": voxel,
               "device": {k: r[k] for k in ("iou", "acc", "mse")},
               "cpu_artifact": {k: rc[k] for k in ("iou", "acc", "mse")},
               "abs_diff": {k: abs(r[k] - rc[k])
                            for k in ("iou", "acc", "mse")},
               "seconds": round(time.time() - t0, 1)}
        rows.append(row)
        print(f"cell {spec}: device iou {r['iou']:.4f} vs cpu "
              f"{rc['iou']:.4f} (|d|={row['abs_diff']['iou']:.4f}), "
              f"acc |d|={row['abs_diff']['acc']:.4f} "
              f"[{row['seconds']}s]", flush=True)
        with open(args.out, "w") as f:
            json.dump({"ref_artifact": args.ref,
                       "backend": str(jax.devices()[0]),
                       "cells": rows}, f, indent=2)
    if not rows:
        print("no requested cell matched the reference artifact "
              "(check --cells against the grid's axes)", file=sys.stderr)
        sys.exit(2)
    print(json.dumps({"max_iou_diff": max(r["abs_diff"]["iou"]
                                          for r in rows),
                      "max_acc_diff": max(r["abs_diff"]["acc"]
                                          for r in rows)}))


if __name__ == "__main__":
    main()

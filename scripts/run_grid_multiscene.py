#!/usr/bin/env python3
"""Multi-scene quality grid: mean ± spread over N seeded urban scenes
(round 5, VERDICT r4 #3).

The reference means its grid metrics over 11 KITTI sequences
(experiments/grid_search_nframes_voxelsize.py:52-58,66-94); the
committed r04 surface was a single synthetic scene with no variance
estimate. This runner writes one KITTI tree with N sequences — sequence
``0i`` generated from ``synthetic.Scene.urban(seed=i)`` (>=12 semantic
classes, movers, varied buildings) — and sweeps the reference axes with
``grid_search(sequences=...)``, whose cells now carry
``{metric}_std/min/max`` scene-variance columns.

Usage: python scripts/run_grid_multiscene.py [--out DIR] [--cpu]
       [--scenes 3] [--frames-list ...] [--voxel-sizes ...]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out",
                    default="experiments_artifacts/grid_multiscene_r05")
    ap.add_argument("--dataset", default="/tmp/grid_ds64_multiscene")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--frames-list", type=int, nargs="+",
                    default=[1, 2, 3, 4, 5, 10, 20])
    ap.add_argument("--voxel-sizes", type=float, nargs="+",
                    default=[0.25, 0.1, 0.075, 0.05, 0.04])
    ap.add_argument("--frames-per-cell", type=int, default=1)
    ap.add_argument("--n-scans", type=int, default=24)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()

    from lidar_transfer_tpu.config import HDL64
    from lidar_transfer_tpu.datasets import synthetic
    from lidar_transfer_tpu.experiments.grid_search import grid_search

    sequences = [f"{i:02d}" for i in range(args.scenes)]
    for i, seq in enumerate(sequences):
        marker = os.path.join(args.dataset, "sequences", seq, "poses.txt")
        if not os.path.exists(marker):
            print(f"generating urban(seed={i}) 64x2048 sequence {seq}",
                  flush=True)
            synthetic.write_kitti_dataset(
                args.dataset, synthetic.Scene.urban(i), HDL64,
                n_scans=args.n_scans, sequence=seq)

    t0 = time.time()
    res = grid_search(args.dataset,
                      frames_list=args.frames_list,
                      voxel_sizes=args.voxel_sizes,
                      frames_per_cell=args.frames_per_cell,
                      sequences=tuple(sequences),
                      offset=0, adaption="mergemesh",
                      out_dir=args.out, verbose=True)
    print(f"wrote {args.out}/grid_search.json ({len(res['cells'])} cells "
          f"x {args.scenes} scenes in {time.time()-t0:.0f}s)", flush=True)


if __name__ == "__main__":
    main()

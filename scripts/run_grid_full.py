#!/usr/bin/env python3
"""Quality grid at the FULL reference axes (round 4, VERDICT r3 #3).

The reference sweeps frames [1,2,3,4,5,10,20] x voxel [0.25,0.1,0.075,
0.05,0.04] (experiments/grid_search_nframes_voxelsize.py:48-49); the
committed round-2/3 surfaces stopped at frames 5 / voxel 0.05. This
runner regenerates the identity 64x2048 mergemesh surface on the
production-dims synthetic dataset at every reference cell.

Usage: python scripts/run_grid_full.py [--out DIR] [--cpu]
       [--frames-list ...] [--voxel-sizes ...]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="experiments_artifacts/grid_search_full_r04")
    ap.add_argument("--dataset", default="/tmp/grid_ds64")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--frames-list", type=int, nargs="+",
                    default=[1, 2, 3, 4, 5, 10, 20])
    ap.add_argument("--voxel-sizes", type=float, nargs="+",
                    default=[0.25, 0.1, 0.075, 0.05, 0.04])
    ap.add_argument("--frames-per-cell", type=int, default=2)
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

    if not os.path.exists(os.path.join(args.dataset, "config.yaml")):
        print(f"generating {args.n_scans}-scan 64x2048 dataset at "
              f"{args.dataset}", flush=True)
        synthetic.write_kitti_dataset(
            args.dataset, synthetic.Scene.default(), HDL64,
            n_scans=args.n_scans)

    res = grid_search(args.dataset,
                      frames_list=args.frames_list,
                      voxel_sizes=args.voxel_sizes,
                      frames_per_cell=args.frames_per_cell,
                      offset=0, adaption="mergemesh",
                      out_dir=args.out, verbose=True)
    print(f"wrote {args.out}/grid_search.json "
          f"({len(res['cells'])} cells)", flush=True)


if __name__ == "__main__":
    main()

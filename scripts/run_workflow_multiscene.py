#!/usr/bin/env python3
"""Multi-scene workflow rows: mean ± spread over seeded urban scenes
(round 5, VERDICT r4 #3).

Re-runs the three cross-geometry workflow rows
(scripts/run_crossgeo_workflow.py — the reference paper's
train-on-fake/deploy-on-real claim, run_*.sh) once per seeded
``synthetic.Scene.urban(i)`` scene and reports each metric as
mean ± std over scenes — the analog of the reference's 11-sequence
mean. Each scene is its own sequence ``0i`` of one dataset tree, with
its own training + evaluation (nothing is pooled across scenes).

Writes experiments_artifacts/workflow_multiscene_r05/<row>.json with
the per-scene rows + aggregate.

Usage: python scripts/run_workflow_multiscene.py [--scenes 3]
       [--steps 300] [--cpu] [--rows fake_on_real,...]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

ROWS = (
    ("fake_on_real", "fake_on_real", "hdl32"),
    ("real_on_fake_identity", "real_on_fake", None),
    ("real_on_fake", "real_on_fake", "hdl32"),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=3)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--bounds", type=float, default=80.0,
                    help="scene-covering volume bounds (see the r03 "
                         "GroupNorm-shift lesson in CLAUDE.md)")
    ap.add_argument("--rows", default=None,
                    help="comma list of row names to run (default all)")
    ap.add_argument("--work", default="/tmp/wf_multiscene")
    ap.add_argument("--out",
                    default="experiments_artifacts/workflow_multiscene_r05")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()
    import jax

    from lidar_transfer_tpu.config import SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets import synthetic
    from lidar_transfer_tpu.experiments.workflows import run_workflow

    spec64 = SensorSpec(name="syn64", beams=64, fov_up=5.0,
                        fov_down=-24.0,
                        angle_res_hor=360.0 / args.width)
    os.makedirs(args.work, exist_ok=True)
    ds64 = os.path.join(args.work, "real64")
    sequences = [f"{i:02d}" for i in range(args.scenes)]
    for i, seq in enumerate(sequences):
        marker = os.path.join(ds64, "sequences", seq, "poses.txt")
        if not os.path.exists(marker):
            print(f"generating urban(seed={i}) sequence {seq}", flush=True)
            synthetic.write_kitti_dataset(
                ds64, synthetic.Scene.urban(i), spec64,
                n_scans=args.frames, step=1.5, sequence=seq)

    b = args.bounds
    cfg = TransferConfig(
        adaption="mergemesh", number_of_scans=1,
        voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
    hdl32 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "hdl32.yaml")

    only = set(args.rows.split(",")) if args.rows else None
    os.makedirs(args.out, exist_ok=True)
    for name, kind, target in ROWS:
        if only and name not in only:
            continue
        target_yaml = hdl32 if target == "hdl32" else None
        per_scene = []
        for i, seq in enumerate(sequences):
            print(f"=== {name} scene {i} (seq {seq}) ===", flush=True)
            res = run_workflow(
                kind, ds64, os.path.join(args.work, f"{name}_s{i}"),
                cfg, sequence=seq, target_yaml=target_yaml,
                steps=args.steps, batch_size=args.batch_size)
            res.update(scene_seed=i, sequence=seq)
            per_scene.append(res)
        agg = {"row": name, "kind": kind,
               "target": os.path.basename(target_yaml) if target_yaml
               else None,
               "scenes": args.scenes, "steps": args.steps,
               "backend": jax.default_backend(),
               "bounds": b, "width": args.width,
               "world": "synthetic.Scene.urban (>=12 classes, movers)",
               "per_scene": per_scene}
        for key in ("miou", "miou_present", "acc"):
            vals = [r[key] for r in per_scene if key in r]
            if vals:
                agg[key] = float(np.mean(vals))
                agg[key + "_std"] = float(np.std(vals))
                agg[key + "_min"] = float(np.min(vals))
                agg[key + "_max"] = float(np.max(vals))
        with open(os.path.join(args.out, f"{name}.json"), "w") as f:
            json.dump(agg, f, indent=2)
        print(f"{name}: miou_present {agg['miou_present']:.4f} "
              f"± {agg['miou_present_std']:.4f}  acc {agg['acc']:.4f} "
              f"± {agg['acc_std']:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())

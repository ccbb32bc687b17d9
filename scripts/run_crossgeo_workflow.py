#!/usr/bin/env python3
"""Cross-geometry workflow rows at SCENE-COVERING volume bounds.

Re-runs the three `experiments_artifacts/workflow_r03/` rows (the
reference paper's train-on-fake/deploy-on-real claim, run_*.sh) with
voxel bounds that cover the synthetic world (+-80 m; the scene's
max_range is 80 m):

  fake_on_real            train on 32x2048 HDL32 fake, eval on 64x2048
  real_on_fake (identity) realism check - train real, eval identity fake
  real_on_fake (hdl32)    cross-geometry - train real, eval 32-beam fake

Why bounds matter (measured, run_upsample_workflow.py --bounds): the
splat only synthesizes returns INSIDE the fused volume, so bounds
smaller than the scene clip the fake scans' far field; the train/eval
feature-range mismatch then shifts RangeNet's GroupNorm statistics
globally (+-16 bounds on the 80 m scene: eval acc 0.46 vs 0.96 at
covering bounds). The original r03 rows ran at the +-50 m default.

Usage: python scripts/run_crossgeo_workflow.py [--steps 300] [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--width", type=int, default=2048)
    ap.add_argument("--bounds", type=float, default=80.0)
    ap.add_argument("--work", default="/tmp/wf_crossgeo")
    ap.add_argument("--out", default="experiments_artifacts/workflow_r03")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    from lidar_transfer_tpu.utils import setup_compile_cache
    setup_compile_cache()

    from lidar_transfer_tpu.config import SensorSpec, TransferConfig
    from lidar_transfer_tpu.datasets import synthetic
    from lidar_transfer_tpu.experiments.workflows import run_workflow

    spec64 = SensorSpec(name="syn64", beams=64, fov_up=5.0,
                        fov_down=-24.0,
                        angle_res_hor=360.0 / args.width)
    scene = synthetic.Scene.default()
    os.makedirs(args.work, exist_ok=True)
    ds64 = os.path.join(args.work, "real64")
    synthetic.write_kitti_dataset(ds64, scene, spec64,
                                  n_scans=args.frames, step=1.5)

    b = args.bounds
    cfg = TransferConfig(
        adaption="mergemesh", number_of_scans=1,
        voxel_bounds=((-b, b), (-b, b), (-5.0, 5.0)))
    hdl32 = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs", "hdl32.yaml")

    os.makedirs(args.out, exist_ok=True)
    rows = (
        ("fake_on_real", "fake_on_real", hdl32),
        ("real_on_fake_identity", "real_on_fake", None),
        ("real_on_fake", "real_on_fake", hdl32),
    )
    for name, kind, target in rows:
        res = run_workflow(
            kind, ds64, os.path.join(args.work, name), cfg,
            target_yaml=target, steps=args.steps,
            batch_size=args.batch_size)
        res.update(bounds=b, width=args.width, steps=args.steps,
                   target=os.path.basename(target) if target else None)
        with open(os.path.join(args.out, f"{name}.json"), "w") as f:
            json.dump(res, f, indent=2)
        print(f"{name}: miou_present {res['miou_present']:.4f} "
              f"acc {res['acc']:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env bash
# End-to-end smoke of every CLI surface on a generated synthetic dataset.
# Usage: scripts/smoke.sh [workdir]   (CPU-only; ~3-4 minutes warm)
set -euo pipefail
W="${1:-$(mktemp -d)}"
cd "$(dirname "$0")/.."
echo "workdir: $W"

python - "$W" <<'PY'
import sys, os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax; jax.config.update("jax_platforms", "cpu")
from lidar_transfer_tpu.datasets import synthetic
from lidar_transfer_tpu.config import SensorSpec
spec = SensorSpec(name="smoke32", beams=32, fov_up=5.0, fov_down=-24.0,
                  angle_res_hor=360.0/512.0)
synthetic.write_kitti_dataset(sys.argv[1] + "/ds", synthetic.Scene.default(),
                              spec, n_scans=4)
PY

cat > "$W/cfg.yaml" <<'YML'
adaption: mergemesh
number_of_scans: 1
voxel_size: 0.25
voxel_bounds:
- [-16.0, 16.0]
- [-16.0, 16.0]
- [-4.0, 4.0]
YML

run() { echo "== $*"; python -m "$@"; }

run lidar_transfer_tpu.cli --cpu -d "$W/ds" -c "$W/cfg.yaml" --one_scan -b \
    -w -p "$W/out" --ply "$W/ply" --metrics-json "$W/m.json"
run lidar_transfer_tpu.cli --cpu -d "$W/ds" -c "$W/cfg.yaml" --one_scan -b \
    --rolling-shutter
run lidar_transfer_tpu.cli --cpu -d "$W/ds" -c "$W/cfg.yaml" -b --frames 3 \
    --fixed-bounds --stream 2 -w -p "$W/out_stream"
run lidar_transfer_tpu.visualize -d "$W/ds" --out "$W/viz" --frames 1
run lidar_transfer_tpu.experiments.grid_search --cpu -d "$W/ds" \
    --frames-list 1 --voxel-sizes 0.25 --adaption cp -c "$W/cfg.yaml" \
    --out "$W/grid"
run lidar_transfer_tpu.experiments.segmentation train --cpu --tiny \
    -d "$W/ds" --steps 2 --out "$W/seg.pkl"
run lidar_transfer_tpu.experiments.segmentation infer --cpu -d "$W/ds" \
    -m "$W/seg.pkl" -p "$W/pred"
run lidar_transfer_tpu.experiments.segmentation eval -d "$W/ds" \
    -p "$W/pred"
run lidar_transfer_tpu.experiments.compare_datasets real="$W/ds" \
    fake="$W/out" --out "$W/cmp"
run lidar_transfer_tpu.visualize -d "$W/ds" --out "$W/vizp" -p "$W/pred"

echo "SMOKE OK ($W)"

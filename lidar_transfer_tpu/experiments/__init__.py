"""Experiment harness (rebuild of the reference's ``experiments/``).

The reference drives experiments through shell scripts + a grid search that
mutates YAML on disk, subprocesses the CLI, and scrapes metrics from stdout
line offsets (experiments/grid_search_nframes_voxelsize.py:73-89 —
SURVEY.md §2.1 C15 calls the contract "fragile"). Here everything runs
in-process with structured results:

  grid_search       frames x voxel-size sweep -> JSON + SVG heatmaps
  segmentation      RangeNet train / infer / eval (replaces the external
                    lidar-bonnetal + semantic-kitti-api dependency)
  compare_datasets  per-class point histograms across datasets
  workflows         fake_on_fake / fake_on_real / real_on_fake pipelines
"""

from lidar_transfer_tpu.experiments.grid_search import (  # noqa: F401
    grid_search, evaluate_transfer)
from lidar_transfer_tpu.experiments.segmentation import (  # noqa: F401
    LabelMapper, train_segmentation, write_predictions, evaluate_semantics)

"""lidar_transfer_tpu — TPU-native (JAX/XLA/Pallas) LiDAR scan transfer framework.

Re-implementation of the capabilities of PRBonn/lidar_transfer (Langer et al.,
IROS 2020) as a TPU-first framework: SemanticKITTI point-cloud labels are
transferred to other LiDAR sensor geometries by aggregating multiple posed
scans, fusing them into a TSDF voxel volume, and ray-casting that volume with
the target sensor's beam pattern to synthesize "virtual scans" with per-point
semantic labels, remissions, and range.

Layer map (mirrors reference SURVEY.md §1, rebuilt TPU-first):
  - config / datasets : sensor specs, KITTI IO, YAML config layers
  - ops               : jitted JAX + Pallas compute (projection, TSDF, raycast)
  - metrics           : on-device confusion-matrix IoU + scan comparison
  - pipeline          : cp / mesh / mergemesh adaption strategies + writers
  - parallel          : jax.sharding mesh utilities, batch/volume sharding
  - models            : flax RangeNet-style range-image segmentation
"""

__version__ = "0.1.0"

from lidar_transfer_tpu.config import SensorSpec, TransferConfig  # noqa: F401

from lidar_transfer_tpu.ops.projection import (  # noqa: F401
    RangeImage,
    range_project,
    reverse_project,
    mask_classes,
)
from lidar_transfer_tpu.ops.transforms import (  # noqa: F401
    transform_points,
    inverse_pose,
)

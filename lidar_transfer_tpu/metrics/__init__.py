from lidar_transfer_tpu.metrics.ioueval import (  # noqa: F401
    IoUEval,
    confusion_matrix,
    iou_from_confusion,
    acc_from_confusion,
)
from lidar_transfer_tpu.metrics.compare import compare_scans  # noqa: F401

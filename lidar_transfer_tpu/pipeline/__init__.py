from lidar_transfer_tpu.pipeline.multiscan import ScanWindow, load_window  # noqa: F401
from lidar_transfer_tpu.pipeline.deform import (  # noqa: F401
    TransferEngine,
    VirtualScan,
)

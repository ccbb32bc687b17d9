from lidar_transfer_tpu.datasets.kitti import (  # noqa: F401
    KittiSequence,
    parse_calibration,
    parse_poses,
    read_label_file,
    read_scan_file,
    write_label_file,
    write_scan_file,
)

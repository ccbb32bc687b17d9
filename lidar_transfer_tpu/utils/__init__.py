from lidar_transfer_tpu.utils.runtime import (  # noqa: F401
    setup_compile_cache,
    StageTimer,
)

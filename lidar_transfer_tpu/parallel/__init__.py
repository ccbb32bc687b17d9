from lidar_transfer_tpu.parallel.sharding import (  # noqa: F401
    make_mesh,
    shard_params_tp,
    sharded_train_step,
    sharded_confusion,
    integrate_sharded,
    sharded_band_probe,
    splat_synthesize_sharded,
)

from lidar_transfer_tpu.models.rangenet import (  # noqa: F401
    RangeNet,
    RangeNetConfig,
    make_train_state,
    train_step,
    infer,
)

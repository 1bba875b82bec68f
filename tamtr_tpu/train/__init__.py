from tamtr_tpu.train.trainer import (  # noqa: F401
    TrainConfig,
    TrainState,
    create_train_state,
    make_train_step,
)

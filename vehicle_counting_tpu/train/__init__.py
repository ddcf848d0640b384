from vehicle_counting_tpu.train.reid_train import (
    ReidTrainConfig,
    create_train_state,
    train_step,
    eval_step,
    fit,
)

from beso_tpu.train.trainer import (
    TrainState,
    Trainer,
    evaluate_mse,
    make_optimizer,
    make_train_step,
    step_lr_schedule,
)

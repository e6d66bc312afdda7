from emernerf_tpu.train.optim import chained_lr_schedule, make_adam
from emernerf_tpu.train.state import TrainState
from emernerf_tpu.train.step import TrainStepConfig, build_train_step

__all__ = [
    "chained_lr_schedule",
    "make_adam",
    "TrainState",
    "TrainStepConfig",
    "build_train_step",
]

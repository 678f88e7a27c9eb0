from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    mil_freeze_ladder,
    relative_lr_schedule,
    torch_adam,
    wrap_optimizer,
)
from multimodalbrainsurvival_tpu.train.loop import (
    TrainingPreempted,
    TrainSettings,
    build_train_step,
    evaluate,
    train_model,
)

__all__ = [
    "torch_adam",
    "build_grouped_optimizer",
    "mil_freeze_ladder",
    "relative_lr_schedule",
    "wrap_optimizer",
    "TrainSettings",
    "TrainingPreempted",
    "build_train_step",
    "train_model",
    "evaluate",
]

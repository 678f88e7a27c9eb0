from multimodalbrainsurvival_tpu.train.optim import (
    build_grouped_optimizer,
    mil_freeze_ladder,
    torch_adam,
)
from multimodalbrainsurvival_tpu.train.loop import (
    TrainingPreempted,
    TrainSettings,
    evaluate,
    train_model,
)

__all__ = [
    "torch_adam",
    "build_grouped_optimizer",
    "mil_freeze_ladder",
    "TrainSettings",
    "TrainingPreempted",
    "train_model",
    "evaluate",
]

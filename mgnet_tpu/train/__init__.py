from mgnet_tpu.train.state import TrainState, create_train_state
from mgnet_tpu.train.step import (
    compute_losses,
    make_eval_step,
    make_train_step,
    normalize_images,
)

__all__ = [
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
    "compute_losses",
    "normalize_images",
]

"""Training: state, steps, optimizers, schedules, checkpointing, loops."""
from .optimizers import OPTIMIZER_REGISTRY, adam_l2, build_optimizer, sgd
from .schedules import SCHEDULE_REGISTRY, constant, warmup_cosine, warmup_staircase
from .state import TrainState, eval_step, init_state, train_step

__all__ = [
    "OPTIMIZER_REGISTRY",
    "SCHEDULE_REGISTRY",
    "TrainState",
    "adam_l2",
    "build_optimizer",
    "constant",
    "eval_step",
    "init_state",
    "sgd",
    "train_step",
    "warmup_cosine",
    "warmup_staircase",
]

from .auc import StreamingAUC
from .lr_schedule import large_batch_schedule, linear_scaled_lr, warmup_schedule
from .metrics import Gini, LogLoss, RocAucScore
from .train_step import (
    TrainState,
    create_optimizer,
    gather_batch,
    init_state,
    make_eval_step,
    make_train_step,
)
from .resilient import Preempted, Resilience, TrainingDiverged
from .trainer import Trainer, batch_indices

__all__ = [
    "Preempted",
    "Resilience",
    "TrainingDiverged",
    "Gini",
    "LogLoss",
    "RocAucScore",
    "StreamingAUC",
    "large_batch_schedule",
    "linear_scaled_lr",
    "warmup_schedule",
    "TrainState",
    "Trainer",
    "batch_indices",
    "create_optimizer",
    "gather_batch",
    "init_state",
    "make_eval_step",
    "make_train_step",
]

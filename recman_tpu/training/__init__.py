from .auc import StreamingAUC
from .metrics import Gini, LogLoss, RocAucScore
from .train_step import (
    TrainState,
    create_optimizer,
    gather_batch,
    init_state,
    make_eval_step,
    make_train_step,
)
from .trainer import Trainer, batch_indices

__all__ = [
    "Gini",
    "LogLoss",
    "RocAucScore",
    "StreamingAUC",
    "TrainState",
    "Trainer",
    "batch_indices",
    "create_optimizer",
    "gather_batch",
    "init_state",
    "make_eval_step",
    "make_train_step",
]

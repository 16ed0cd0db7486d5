from .checkpoint import (
    load_feat_dict,
    load_hparams,
    restore_checkpoint,
    save_checkpoint,
)

from .transfer import warm_start_embeddings

__all__ = [
    "load_feat_dict",
    "load_hparams",
    "restore_checkpoint",
    "save_checkpoint",
    "warm_start_embeddings",
]

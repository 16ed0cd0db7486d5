from .checkpoint import (
    load_feat_dict,
    load_hparams,
    restore_checkpoint,
    save_checkpoint,
)

__all__ = ["load_feat_dict", "load_hparams", "restore_checkpoint", "save_checkpoint"]

from .hparams import (
    AFMHyperParams,
    BaseHyperParameters,
    DCNHyperParams,
    DINHyperParams,
    DeepFMHyperParams,
    FMHyperParams,
    HParam,
    xDeepFMHyperParams,
)

__all__ = [
    "AFMHyperParams",
    "BaseHyperParameters",
    "DCNHyperParams",
    "DINHyperParams",
    "DeepFMHyperParams",
    "FMHyperParams",
    "HParam",
    "xDeepFMHyperParams",
]

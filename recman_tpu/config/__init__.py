from .hparams import (
    AFMHyperParams,
    AutoIntHyperParams,
    BaseHyperParameters,
    DCNHyperParams,
    DCNv2HyperParams,
    DINHyperParams,
    DeepFMHyperParams,
    FMHyperParams,
    HParam,
    xDeepFMHyperParams,
)

__all__ = [
    "AFMHyperParams",
    "AutoIntHyperParams",
    "BaseHyperParameters",
    "DCNHyperParams",
    "DCNv2HyperParams",
    "DINHyperParams",
    "DeepFMHyperParams",
    "FMHyperParams",
    "HParam",
    "xDeepFMHyperParams",
]

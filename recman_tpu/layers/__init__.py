from .afm import AFMLayer
from .batchnorm import BatchNormalization
from .cin import CIN
from .common import ACTIVATIONS, dice, dropout, leaky_relu, resolve_activation, split_rng
from .cross import CrossNet
from .cross_v2 import CrossNetV2
from .autoint import InteractingLayer
from .din_attention import ASPLayer
from .dnn import DNN, dnn_combine
from .embedding import EmbeddingLayer, sqrtn_combine
from .fm import FMLayer
from .linear import LinearLayer, SparseLinearLayer
from .prediction import PredictionLayer

__all__ = [
    "ACTIVATIONS",
    "AFMLayer",
    "BatchNormalization",
    "ASPLayer",
    "CIN",
    "CrossNet",
    "CrossNetV2",
    "InteractingLayer",
    "DNN",
    "EmbeddingLayer",
    "FMLayer",
    "LinearLayer",
    "PredictionLayer",
    "SparseLinearLayer",
    "dice",
    "dnn_combine",
    "dropout",
    "leaky_relu",
    "resolve_activation",
    "split_rng",
    "sqrtn_combine",
]

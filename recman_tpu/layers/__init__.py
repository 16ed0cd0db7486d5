from .afm import AFMLayer
from .batchnorm import BatchNormalization
from .bi_interaction import BiInteractionPooling
from .cin import CIN
from .common import ACTIVATIONS, dice, dropout, leaky_relu, resolve_activation, split_rng
from .cross import CrossNet
from .cross_v2 import CrossNetV2
from .autoint import InteractingLayer
from .din_attention import ASPLayer
from .dnn import DNN, dnn_combine
from .embedding import EmbeddingLayer, sqrtn_combine
from .final_mlp import FeatureSelectionGate, InteractionAggregation, MLPBlock
from .fm import FMLayer, FwFMLayer
from .masknet import LayerNorm, MaskBlock
from .linear import LinearLayer, SparseLinearLayer
from .prediction import PredictionLayer
from .product import ProductLayer
from .senet import BilinearInteraction, SENETLayer

__all__ = [
    "ACTIVATIONS",
    "AFMLayer",
    "BatchNormalization",
    "ASPLayer",
    "BiInteractionPooling",
    "BilinearInteraction",
    "CIN",
    "CrossNet",
    "CrossNetV2",
    "InteractingLayer",
    "DNN",
    "EmbeddingLayer",
    "FMLayer",
    "FwFMLayer",
    "LinearLayer",
    "PredictionLayer",
    "ProductLayer",
    "SENETLayer",
    "SparseLinearLayer",
    "dice",
    "dnn_combine",
    "dropout",
    "leaky_relu",
    "resolve_activation",
    "split_rng",
    "sqrtn_combine",
]

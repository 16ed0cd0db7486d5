from .criteo import (
    CAT_NAMES,
    INT_NAMES,
    create_criteo_features,
    load_criteo_tsv,
    synthetic_criteo_arrays,
)
from .ml_100k import create_ml_features, get_data, get_ml_dataset
from .native_loader import load_criteo_tsv_native

__all__ = [
    "CAT_NAMES",
    "INT_NAMES",
    "create_criteo_features",
    "create_ml_features",
    "get_data",
    "get_ml_dataset",
    "load_criteo_tsv",
    "load_criteo_tsv_native",
    "synthetic_criteo_arrays",
]

from .criteo import (
    CAT_NAMES,
    calibrated_criteo_arrays,
    INT_NAMES,
    create_criteo_features,
    load_criteo_tsv,
    synthetic_criteo_arrays,
)
from .ml_100k import (
    add_history_feature,
    create_ml_features,
    create_ml_sequence_features,
    get_data,
    get_ml_dataset,
)
from .native_loader import load_criteo_tsv_native, load_criteo_tsv_range_native
from .streaming import iter_array_chunks, iter_criteo_chunks

__all__ = [
    "CAT_NAMES",
    "INT_NAMES",
    "calibrated_criteo_arrays",
    "create_criteo_features",
    "add_history_feature",
    "create_ml_features",
    "create_ml_sequence_features",
    "get_data",
    "get_ml_dataset",
    "iter_array_chunks",
    "iter_criteo_chunks",
    "load_criteo_tsv",
    "load_criteo_tsv_native",
    "load_criteo_tsv_range_native",
    "synthetic_criteo_arrays",
]

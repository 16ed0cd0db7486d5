from .encoders import (
    OOV_ID,
    PAD_ID,
    MinMaxScaler,
    MultiValVocabEncoder,
    StandardScaler,
    VocabEncoder,
    hash_bucket,
)
from .schema import (
    DenseFeat,
    Feature,
    FeatureSet,
    HashedSparseFeat,
    MultiValCsvFeat,
    MultiValSparseFeat,
    SequenceFeat,
    SparseFeat,
    SparseValueFeat,
)
from .serialize import schema_from_json, schema_to_json

__all__ = [
    "OOV_ID",
    "PAD_ID",
    "MinMaxScaler",
    "MultiValVocabEncoder",
    "StandardScaler",
    "VocabEncoder",
    "hash_bucket",
    "DenseFeat",
    "Feature",
    "FeatureSet",
    "HashedSparseFeat",
    "MultiValCsvFeat",
    "MultiValSparseFeat",
    "SequenceFeat",
    "SparseFeat",
    "SparseValueFeat",
    "schema_from_json",
    "schema_to_json",
]

"""JSON (de)serialization of feature schemas.

Serving artifacts must be loadable without executing arbitrary code:
pickle-based schema sidecars (the reference's implied flow dill-pickles
feat_dict, BestModelFinder.py:61-68) run attacker-controlled bytecode at
load time. This module serializes a fitted FeatureSet to plain JSON —
every encoder/scaler in this package keeps only simple state (class lists,
tag tables, scalar moments) — so ``ExportedPredictor.load`` never unpickles.

Only the built-in feature/encoder/scaler types round-trip; user-supplied
custom encoder or scaler objects raise a clear error (fall back to the
trusted-source pickle sidecar for those).
"""

from __future__ import annotations

import json

import numpy as np

from .encoders import (
    MinMaxScaler,
    MultiValVocabEncoder,
    StandardScaler,
    VocabEncoder,
)
from .schema import (
    DenseFeat,
    FeatureSet,
    HashedSparseFeat,
    MultiValCsvFeat,
    MultiValSparseFeat,
    SequenceFeat,
    SparseFeat,
    SparseValueFeat,
)

__all__ = ["schema_to_json", "schema_from_json"]

SCHEMA_VERSION = 1


def _classes_to_json(classes: np.ndarray | None):
    if classes is None:
        return None
    kind = classes.dtype.kind
    if kind in ("i", "u"):
        return {"kind": "int", "values": [int(v) for v in classes.tolist()]}
    if kind == "f":
        return {"kind": "float", "values": [float(v) for v in classes.tolist()]}
    if kind == "O":
        # An object array holding non-str values (e.g. a pandas object
        # column of ints) would round-trip with *string* keys and silently
        # encode everything to OOV=0 after a JSON save/load. Refuse here so
        # the caller falls back to the pickle sidecar instead.
        bad = [v for v in classes.tolist() if not isinstance(v, str)]
        if bad:
            raise TypeError(
                "object-dtype vocabulary contains non-str values "
                f"(e.g. {bad[0]!r}); not JSON-serializable without changing "
                "key types — use the pickle sidecar"
            )
    return {"kind": "str", "values": [str(v) for v in classes.tolist()]}


def _classes_from_json(obj) -> np.ndarray | None:
    if obj is None:
        return None
    if obj["kind"] == "int":
        return np.asarray(obj["values"], dtype=np.int64)
    if obj["kind"] == "float":
        return np.asarray(obj["values"], dtype=np.float64)
    return np.asarray(obj["values"], dtype=object)


def _vocab_encoder_to_json(enc: VocabEncoder):
    if type(enc) is not VocabEncoder:
        raise TypeError(
            f"custom encoder {type(enc).__name__} is not JSON-serializable; "
            "use the pickle sidecar (trusted sources only)"
        )
    out = {"classes": _classes_to_json(enc.classes_)}
    if getattr(enc, "shuffle_seed", None) is not None:
        out["shuffle_seed"] = enc.shuffle_seed
    if getattr(enc, "min_count", None) is not None:
        out["min_count"] = enc.min_count
    return out


def _vocab_encoder_from_json(obj) -> VocabEncoder:
    enc = VocabEncoder(shuffle_seed=obj.get("shuffle_seed"),
                       min_count=obj.get("min_count"))
    classes = _classes_from_json(obj["classes"])
    if classes is not None:
        enc.classes_ = classes
        enc._index = {v: i + 1 for i, v in enumerate(classes.tolist())}
    return enc


def _scaler_to_json(scaler):
    if scaler is None:
        return None
    if isinstance(scaler, StandardScaler):
        return {"type": "standard", "mean": scaler.mean_, "std": scaler.std_}
    if isinstance(scaler, MinMaxScaler):
        return {"type": "minmax", "min": scaler.min_, "range": scaler.range_}
    raise TypeError(
        f"custom scaler {type(scaler).__name__} is not JSON-serializable; "
        "use the pickle sidecar (trusted sources only)"
    )


def _scaler_from_json(obj):
    if obj is None:
        return None
    if obj["type"] == "standard":
        s = StandardScaler()
        s.mean_, s.std_ = float(obj["mean"]), float(obj["std"])
        return s
    s = MinMaxScaler()
    s.min_, s.range_ = float(obj["min"]), float(obj["range"])
    return s


def _weights_to_json(w):
    """Override dicts keyed by original values — stored as pairs so int
    keys survive (JSON object keys are always strings)."""
    if w is None:
        return None
    if isinstance(w, dict):
        return {"kind": "dict", "items": [[k, float(v)] for k, v in w.items()]}
    return {"kind": "scalar", "value": float(w)}


def _weights_from_json(obj):
    if obj is None:
        return None
    if obj["kind"] == "scalar":
        return obj["value"]
    return {k: v for k, v in obj["items"]}


def _feature_to_json(feat) -> dict:
    d = {"name": feat.name, "description": feat.description}
    # NOTE: HashedSparseFeat subclasses SparseFeat — check it first
    if isinstance(feat, HashedSparseFeat):
        d["type"] = "hashed_sparse"
        d["num_buckets"] = feat.num_buckets
        if feat.qr_collisions is not None:
            d["qr_collisions"] = int(feat.qr_collisions)
    elif isinstance(feat, SparseFeat):
        d["type"] = "sparse"
        d["feat_size"] = feat.feat_size
        d["encoder"] = _vocab_encoder_to_json(feat.encoder)
        d["weights"] = _weights_to_json(feat._weights)
        if feat.qr_collisions is not None:
            d["qr_collisions"] = int(feat.qr_collisions)
    elif isinstance(feat, SparseValueFeat):
        d["type"] = "sparse_value"
        d["feat_size"] = feat.feat_size
        d["encoder"] = _vocab_encoder_to_json(feat.encoder)
        d["weights"] = _weights_to_json(feat._weights)
    elif isinstance(feat, DenseFeat):
        d["type"] = "dense"
        d["scaler"] = _scaler_to_json(feat.scaler)
        d["weights"] = _weights_to_json(feat._weights)
    elif isinstance(feat, MultiValCsvFeat):
        d["type"] = "multi_val_csv"
        d["tags"] = list(feat.tags)
        d["weights"] = _weights_to_json(feat._weights)
    elif isinstance(feat, SequenceFeat):
        d["type"] = "sequence"
        d["id_feat"] = feat.id_feat.name
        d["max_len"] = feat.max_len
    elif isinstance(feat, MultiValSparseFeat):
        d["type"] = "multi_val_sparse"
        d["feat_size"] = feat.feat_size
        d["max_len"] = feat.max_len
        if not isinstance(feat.encoder, MultiValVocabEncoder):
            raise TypeError(
                f"custom encoder {type(feat.encoder).__name__} is not "
                "JSON-serializable"
            )
        d["encoder"] = _vocab_encoder_to_json(feat.encoder._encoder)
    else:
        raise TypeError(
            f"feature type {type(feat).__name__} is not JSON-serializable; "
            "use the pickle sidecar (trusted sources only)"
        )
    return d


def schema_to_json(feat_dict: FeatureSet) -> str:
    """Serialize a fitted FeatureSet (ordering preserved) to a JSON string."""
    return json.dumps(
        {
            "version": SCHEMA_VERSION,
            "features": [_feature_to_json(f) for f in feat_dict.values()],
        },
        indent=2,
    )


def schema_from_json(s: str) -> FeatureSet:
    """Rebuild a FeatureSet from ``schema_to_json`` output. Pure data — no
    code execution."""
    obj = json.loads(s)
    if obj.get("version") != SCHEMA_VERSION:
        # not an assert: must survive `python -O`
        raise ValueError(f"unknown schema version: {obj.get('version')}")
    fs = FeatureSet()
    for d in obj["features"]:
        t = d["type"]
        name, desc = d["name"], d.get("description")
        if t == "sparse":
            f = SparseFeat(name, description=desc,
                           qr_collisions=d.get("qr_collisions"))
            f.encoder = _vocab_encoder_from_json(d["encoder"])
            f.feat_size = d["feat_size"]
            f._weights = _weights_from_json(d.get("weights"))
        elif t == "hashed_sparse":
            f = HashedSparseFeat(name, d["num_buckets"], description=desc,
                                 qr_collisions=d.get("qr_collisions"))
        elif t == "sparse_value":
            f = SparseValueFeat(name, description=desc)
            f.encoder = _vocab_encoder_from_json(d["encoder"])
            f.feat_size = d["feat_size"]
            f._weights = _weights_from_json(d.get("weights"))
        elif t == "dense":
            f = DenseFeat(name, scaler=None, description=desc)
            f.scaler = _scaler_from_json(d.get("scaler"))
            f._weights = _weights_from_json(d.get("weights"))
        elif t == "multi_val_csv":
            f = MultiValCsvFeat(name, tags=tuple(d["tags"]), description=desc)
            f._weights = _weights_from_json(d.get("weights"))
        elif t == "sequence":
            f = SequenceFeat(name, id_feat=fs[d["id_feat"]], max_len=d["max_len"], description=desc)
        elif t == "multi_val_sparse":
            f = MultiValSparseFeat(name, max_len=d["max_len"], description=desc)
            f.encoder = MultiValVocabEncoder(_vocab_encoder_from_json(d["encoder"]))
            f.feat_size = d["feat_size"]
        else:
            raise ValueError(f"unknown feature type in schema JSON: {t}")
        fs[name] = f
    return fs

"""Feature schema: typed feature definitions + the FeatureSet registry.

TPU-native counterpart of the reference feature system
(recman/tf/inputs.py:8-467). Differences by design:

- ``transform`` runs ONCE over a whole dataframe/column and returns dense
  numpy arrays; the training loop slices device arrays instead of re-running
  sklearn encoders per batch (the reference encodes inside the hot loop via
  DataInputs.load, inputs.py:53-58 — a host bottleneck).
- variable-length features are padded with PAD_ID (-1), keeping padding
  distinct from the OOV id 0; string processing (pipe-splitting of CSV tag
  features) happens on host at transform time, never in-graph — TPUs have no
  string ops.
- every categorical ``feat_size`` is ``cardinality + 1`` with row 0 reserved
  for OOV, exactly like the reference (inputs.py:166,234,340,391).

Batch layout produced by ``FeatureSet.transform``:

====================  =========================================
feature               batch keys (numpy arrays)
====================  =========================================
SparseFeat            name -> (N,) int32
SparseValueFeat       name -> (N,) int32, name+":value" -> (N,) float32
DenseFeat             name -> (N,) float32
MultiValSparseFeat    name -> (N, max_len) int32 (PAD_ID padded)
MultiValCsvFeat       name -> (N, len(tags)) int32 (PAD_ID padded)
SequenceFeat          name -> (N, max_len) int32 (PAD_ID padded)
====================  =========================================
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np

from .encoders import (
    PAD_ID,
    MinMaxScaler,
    MultiValVocabEncoder,
    StandardScaler,
    VocabEncoder,
    hash_bucket,
)

__all__ = [
    "Feature",
    "SparseFeat",
    "SparseValueFeat",
    "DenseFeat",
    "MultiValSparseFeat",
    "MultiValCsvFeat",
    "SequenceFeat",
    "FeatureSet",
]


def _as_list_column(X):
    """Normalize a pandas Series / ndarray / list of lists to a python list of lists."""
    if hasattr(X, "tolist"):
        return X.tolist()
    return list(X)


class Feature:
    """Base feature definition."""

    def __init__(self, name: str, description: str | None = None):
        self.name = name
        self.description = description
        self._weights = None
        self._weights_cache = None

    # -- inference-time weight override (reference inputs.py:170-189) ------
    def set_weights(self, val: dict | float | None):
        """Set per-value linear-weight overrides applied at inference.

        The signature counterfactual-control feature of the reference
        (xDeepFM_test.py:124-128): overrides are added to the linear tower's
        weight vector when predicting with training=False.
        """
        self._weights = val
        self._weights_cache = None

    @property
    def weights(self) -> np.ndarray:
        return np.zeros((self.feat_size,), dtype=np.float32)

    def initialize(self, X):  # fit encoders/scalers; default no-op
        pass

    def __repr__(self):
        return f"{type(self).__name__}({self.name}, {self.feat_size})"


class SparseFeat(Feature):
    """Single categorical field -> one id per row.

    Reference: inputs.py:148-210. ``feat_size`` argument is the raw
    cardinality; the stored size is +1 for the OOV row.
    """

    def __init__(self, name, feat_size=None, weights=None, encoder=None,
                 description=None, qr_collisions=None):
        super().__init__(name, description)
        self.encoder = encoder if encoder is not None else VocabEncoder()
        self._declared_size = feat_size
        self.feat_size = (feat_size + 1) if feat_size is not None else None
        self._weights = weights
        # QR compositional embedding (Shi et al. 2019, arXiv:1909.02107 —
        # the DLRM-companion memory-reduction technique): when set to q,
        # the embedding layer stores TWO tables — quotient (ceil(V/q), k)
        # and remainder (q, k) — and a row is their SUM at (id//q, id%q).
        # Memory shrinks ~q/2x for q ≈ sqrt(V) while every id keeps a
        # UNIQUE composed vector (unlike plain hashing, which aliases
        # rows). Embedding-table memory is THE CTR scale axis; this
        # complements int8 serving, rowwise-Adam moments, and row
        # sharding. Single-id sparse features only.
        self.qr_collisions = qr_collisions

    def initialize(self, X):
        self.encoder.fit(np.asarray(X))
        if self.feat_size is None:
            self.feat_size = self.encoder.vocab_size

    def transform(self, X) -> dict[str, np.ndarray]:
        return {self.name: self.encoder.transform(np.asarray(X))}

    def decode(self, ids):
        return self.encoder.inverse_transform(ids)

    @property
    def weights(self) -> np.ndarray:
        """Dense (feat_size,) override vector (reference inputs.py:170-182)."""
        if not self._weights:
            return np.zeros((self.feat_size,), dtype=np.float32)
        if self._weights_cache is None:
            w = np.zeros((self.feat_size,), dtype=np.float32)
            ids = self.encoder.transform(np.asarray(list(self._weights.keys())))
            for idx, val in zip(ids, self._weights.values()):
                w[idx] = val
            self._weights_cache = w
        return self._weights_cache


class HashedSparseFeat(SparseFeat):
    """Categorical field hashed into a fixed bucket count — the hashed-vocab
    path for very large cardinalities (Criteo's 26 categorical fields).

    Reference precedent: inputs.py:361-371 (to_hash_bucket_fast). No encoder
    fit is needed; ids are stable FNV-1a hashes mod (feat_size - 1), shifted
    by 1 so row 0 stays a dedicated null/missing slot.
    """

    def __init__(self, name, num_buckets, description=None, qr_collisions=None):
        Feature.__init__(self, name, description)
        self.encoder = None
        self.feat_size = num_buckets + 1
        self.num_buckets = num_buckets
        self.qr_collisions = qr_collisions  # see SparseFeat

    def initialize(self, X):
        pass

    def transform(self, X) -> dict[str, np.ndarray]:
        vals = np.asarray(X)
        ids = hash_bucket(vals, self.num_buckets) + 1
        # empty / missing values map to the null row 0
        missing = np.asarray([v is None or v != v or v == "" for v in vals.tolist()])
        if missing.any():
            ids = np.where(missing, 0, ids)
        return {self.name: ids.astype(np.int32)}

    @property
    def weights(self) -> np.ndarray:
        return np.zeros((self.feat_size,), dtype=np.float32)


class SparseValueFeat(Feature):
    """Categorical id paired with a scalar value; the embedding and the
    linear one-hot are both scaled by the value.

    Reference: inputs.py:213-278 (input rows are [id, value] pairs),
    layers.py:129-142 (embedding x value), utils.py:66-67 (one-hot x value).
    """

    def __init__(self, name, feat_size=None, weights=None, encoder=None, description=None):
        super().__init__(name, description)
        self.encoder = encoder if encoder is not None else VocabEncoder()
        self.feat_size = (feat_size + 1) if feat_size is not None else None
        self._weights = weights

    @property
    def value_key(self) -> str:
        return f"{self.name}:value"

    def _split(self, X):
        arr = np.asarray(_as_list_column(X), dtype=object)
        ids = np.asarray([row[0] for row in arr])
        vals = np.asarray([row[1] for row in arr], dtype=np.float32)
        return ids, vals

    def initialize(self, X):
        ids, _ = self._split(X)
        self.encoder.fit(ids)
        if self.feat_size is None:
            self.feat_size = self.encoder.vocab_size

    def transform(self, X) -> dict[str, np.ndarray]:
        ids, vals = self._split(X)
        return {self.name: self.encoder.transform(ids), self.value_key: vals}

    @property
    def weights(self) -> np.ndarray:
        if not self._weights:
            return np.zeros((self.feat_size,), dtype=np.float32)
        if self._weights_cache is None:
            w = np.zeros((self.feat_size,), dtype=np.float32)
            ids = self.encoder.transform(np.asarray(list(self._weights.keys())))
            for idx, val in zip(ids, self._weights.values()):
                w[idx] = val
            self._weights_cache = w
        return self._weights_cache


class DenseFeat(Feature):
    """Continuous field with a fitted scaler (reference inputs.py:281-322)."""

    feat_size = 1

    def __init__(self, name, weights=None, scaler="standard", description=None):
        super().__init__(name, description)
        if scaler == "standard":
            scaler = StandardScaler()
        elif scaler == "minmax":
            scaler = MinMaxScaler()
        self.scaler = scaler
        self._weights = weights

    def initialize(self, X):
        if self.scaler is not None:
            self.scaler.fit(np.asarray(X, dtype=np.float64))

    def transform(self, X) -> dict[str, np.ndarray]:
        x = np.asarray(X, dtype=np.float32)
        if self.scaler is not None:
            x = self.scaler.transform(x)
        return {self.name: x.astype(np.float32)}

    @property
    def weights(self) -> np.ndarray:
        """Scalar override (reference inputs.py:297-299)."""
        return np.asarray(
            [self._weights if self._weights is not None else 0.0], dtype=np.float32
        )


class MultiValSparseFeat(Feature):
    """List-valued categorical, encoded and padded to ``max_len``.

    Reference: inputs.py:325-377. Embedding lookups combine present ids with
    the "sqrtn" combiner (layers.py:144-169); padding uses PAD_ID so the
    combiner can mask it exactly.
    """

    def __init__(self, name, feat_size=None, max_len=10, encoder=None, description=None):
        super().__init__(name, description)
        self.max_len = max_len
        self.encoder = encoder if encoder is not None else MultiValVocabEncoder()
        self.feat_size = (feat_size + 1) if feat_size is not None else None

    def initialize(self, X):
        self.encoder.fit(_as_list_column(X))
        if self.feat_size is None:
            self.feat_size = self.encoder.vocab_size

    def transform(self, X) -> dict[str, np.ndarray]:
        return {self.name: self.encoder.transform_padded(_as_list_column(X), self.max_len)}


class MultiValCsvFeat(Feature):
    """Pipe-delimited tag string with a fixed tag vocabulary.

    Reference: inputs.py:380-425 + utils.py:70-107. The reference splits the
    string inside the TF graph via a StaticHashTable; here the split happens
    on host at transform time. Known tags map to 1..len(tags); unknown tags
    map to OOV id 0 and — matching the reference exactly — participate in
    embedding combines (utils.py:117-123 keeps them) but are excluded from
    the linear one-hot (utils.py:106-107 zeroes column 0).
    """

    def __init__(self, name, tags=(), weights=None, description=None):
        super().__init__(name, description)
        self.tags = tuple(tags)
        self.tag_hash_table = {tag: idx + 1 for idx, tag in enumerate(self.tags)}
        self.feat_size = len(self.tags) + 1
        self._weights = weights

    @property
    def max_len(self) -> int:
        return max(len(self.tags), 1)

    def transform(self, X) -> dict[str, np.ndarray]:
        rows = np.asarray(X).tolist()
        out = np.full((len(rows), self.max_len), PAD_ID, dtype=np.int32)
        table = self.tag_hash_table
        for i, s in enumerate(rows):
            if not s:
                continue
            ids = [table.get(t, 0) for t in str(s).split("|")][: self.max_len]
            out[i, : len(ids)] = ids
        return {self.name: out}

    @property
    def weights(self) -> np.ndarray:
        """Override vector keyed by tag name (reference inputs.py:408-419)."""
        if not self._weights:
            return np.zeros((self.feat_size,), dtype=np.float32)
        if self._weights_cache is None:
            w = np.zeros((self.feat_size,), dtype=np.float32)
            for tag, weight in self._weights.items():
                if tag in self.tag_hash_table:
                    w[self.tag_hash_table[tag]] = weight
            self._weights_cache = w
        return self._weights_cache


class SequenceFeat(Feature):
    """Behavior-sequence feature tied to an id feature's embedding table.

    The reference declares this but raises NotImplementedError
    (inputs.py:428-443); we implement it fully — it is what DIN's attention
    sequence pooling consumes. The vocabulary (and at lookup time the
    embedding table) is shared with ``id_feat``.
    """

    def __init__(self, name, id_feat: SparseFeat, max_len=10, description=None):
        assert id_feat is not None
        super().__init__(name, description)
        self.id_feat = id_feat
        self.max_len = max_len
        self.encoder = MultiValVocabEncoder(id_feat.encoder)

    @property
    def feat_size(self):
        return self.id_feat.feat_size

    def initialize(self, X):
        pass  # vocabulary owned by id_feat

    def transform(self, X) -> dict[str, np.ndarray]:
        return {self.name: self.encoder.transform_padded(_as_list_column(X), self.max_len)}


class FeatureSet(OrderedDict):
    """Ordered name -> Feature registry with typed accessors.

    Reference: FeatureDictionary (inputs.py:8-43). Accessor names match.
    """

    @property
    def embedding_feats(self):
        return [f for f in self.values() if not isinstance(f, DenseFeat)]

    @property
    def sparse_feats(self):
        return [f for f in self.values() if isinstance(f, SparseFeat)]

    @property
    def sparse_val_feats(self):
        return [f for f in self.values() if isinstance(f, SparseValueFeat)]

    @property
    def dense_feats(self):
        return [f for f in self.values() if isinstance(f, DenseFeat)]

    @property
    def multi_val_csv_feats(self):
        return [f for f in self.values() if isinstance(f, MultiValCsvFeat)]

    @property
    def multi_val_sparse_feats(self):
        return [f for f in self.values() if isinstance(f, MultiValSparseFeat)]

    @property
    def sequence_feats(self):
        return [f for f in self.values() if isinstance(f, SequenceFeat)]

    def add(self, feat: Feature) -> Feature:
        self[feat.name] = feat
        return feat

    def initialize(self, X, shuffle_vocab: int | None = None):
        """Fit every feature's encoder/scaler on dataframe ``X``
        (reference inputs.py:41-43).

        ``shuffle_vocab``: when an int, every not-yet-fitted VocabEncoder
        gets a deterministic per-feature ``shuffle_seed`` derived from it
        before fitting — the one-switch form of the shuffled-vocabulary
        scaling lever (see encoders.VocabEncoder): id assignment becomes a
        seeded permutation so range-partitioned row-sharded tables spread
        hot rows uniformly and the dedup exchange wins regardless of value
        ranking. Neutral for quality (a relabeling of rows under iid init)
        but changes encodings: fix the seed for reproducibility.
        """
        if shuffle_vocab is not None:
            import zlib

            from .encoders import MultiValVocabEncoder, VocabEncoder

            for feat in self.values():
                enc = getattr(feat, "encoder", None)
                if isinstance(enc, MultiValVocabEncoder) and enc.need_fit:
                    enc = enc._encoder
                if (
                    isinstance(enc, VocabEncoder)
                    and enc.classes_ is None
                ):
                    enc.shuffle_seed = (
                        shuffle_vocab + zlib.crc32(feat.name.encode())
                    ) % (2**31)
        for feat in self.values():
            feat.initialize(X[feat.name])

    def transform(self, X, y=None) -> dict[str, np.ndarray]:
        """Encode a whole dataframe into the flat batch-array dict.

        The one-shot replacement for the reference's per-batch
        DataInputs.load (inputs.py:53-58).
        """
        out: dict[str, np.ndarray] = {}
        for feat in self.values():
            out.update(feat.transform(X[feat.name]))
        if y is not None:
            out["y"] = np.asarray(y, dtype=np.float32)
        return out

    def linear_features(self, selector=None):
        """Resolve the linear-tower feature list (reference utils.py:27-36).

        ``selector`` may be a comma-separated name string, an iterable of
        names, or falsy for the default ordering: sparse, sparse-value,
        multi-val-csv, dense.
        """
        if selector:
            names = selector.split(",") if isinstance(selector, str) else list(selector)
            return [self[n] for n in names]
        return (
            self.sparse_feats
            + self.sparse_val_feats
            + self.multi_val_csv_feats
            + self.dense_feats
        )

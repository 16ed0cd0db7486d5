"""Host-side categorical encoders and scalers.

Mirrors the behavior of the reference encoders
(recman/tf/inputs.py:93-145) with numpy-first implementations:

- index 0 is reserved for the out-of-vocabulary sentinel, so every encoded
  vocabulary has size ``n_classes + 1`` (reference: ResilientLabelEncoder,
  inputs.py:116-145 — classes are prepended with "-----" at fit time and
  unknown values map to 0 at transform time).
- multi-valued columns are encoded against the union of their values
  (reference: MultiValLabelEncoder, inputs.py:93-113), optionally sharing an
  existing encoder to tie vocabularies (used by SequenceFeat).

Unlike the reference these run exactly once over the full dataset; the
training hot loop only ever sees pre-encoded integer arrays.
"""

from __future__ import annotations

import numpy as np

PAD_ID = -1  # padding sentinel for variable-length id lists (never a valid row)
OOV_ID = 0  # out-of-vocabulary id — row 0 of every embedding table


class VocabEncoder:
    """Label encoder reserving id 0 for unseen values.

    Equivalent of the reference's ResilientLabelEncoder (inputs.py:116-145):
    ``fit`` learns sorted unique classes mapped to 1..n, ``transform`` maps
    unknown values to 0.

    ``shuffle_seed``: when set, the fitted id assignment is a seeded
    PERMUTATION of the sorted order (OOV stays 0). This is the
    sharded-embedding scaling lever: contiguous range partitioning of a
    frequency- or lexicographically-RANKED vocabulary concentrates the hot
    rows on one model shard (measured 4.7x unique-row skew at S=8 —
    docs/sharding_guide.md), which defeats the capacity-bounded dedup
    exchange; a shuffled assignment makes EVERY vocabulary behave like a
    hashed one (1.15x skew, measured dedup:psum byte ratio 0.51) for any
    mesh size. Encode-side relabeling keeps every consumer — lookups,
    linear-w slices, weight overrides, checkpoints, serving artifacts —
    consistent by construction, with zero device-side cost (the
    alternative, physically permuting table rows per mesh, would need
    id remapping at every lookup and break linear_w range slices).
    Reference precedent for encode-side relabeling: the hash-bucket path,
    inputs.py:361-371.
    """

    def __init__(self, shuffle_seed: int | None = None,
                 min_count: int | None = None):
        self.classes_: np.ndarray | None = None
        self._index: dict | None = None
        self.shuffle_seed = shuffle_seed
        # frequency floor: values seen fewer than min_count times at fit
        # map to OOV (standard CTR vocab pruning — rare ids' embeddings
        # never train past their init anyway and waste table rows)
        self.min_count = min_count

    @property
    def vocab_size(self) -> int:
        """Number of encoded ids including the OOV slot (n_classes + 1)."""
        assert self.classes_ is not None, "encoder not fitted"
        return len(self.classes_) + 1

    def fit(self, values) -> "VocabEncoder":
        values = np.asarray(values)
        if self.min_count is not None and self.min_count > 1:
            uniq, counts = np.unique(values, return_counts=True)
            self.classes_ = uniq[counts >= self.min_count]
        else:
            self.classes_ = np.unique(values)
        if self.shuffle_seed is not None:
            rs = np.random.RandomState(self.shuffle_seed)
            self.classes_ = self.classes_[rs.permutation(len(self.classes_))]
        self._index = {v: i + 1 for i, v in enumerate(self.classes_.tolist())}
        return self

    def transform(self, values) -> np.ndarray:
        assert self._index is not None, "encoder not fitted"
        values = np.asarray(values)
        idx = self._index
        out = np.fromiter(
            (idx.get(v, OOV_ID) for v in values.tolist()),
            dtype=np.int32,
            count=len(values),
        )
        return out

    def fit_transform(self, values) -> np.ndarray:
        return self.fit(values).transform(values)

    def inverse_transform(self, ids) -> np.ndarray:
        assert self.classes_ is not None, "encoder not fitted"
        ids = np.asarray(ids)
        out = np.empty(ids.shape, dtype=object)
        known = ids > 0
        out[known] = self.classes_[ids[known] - 1]
        out[~known] = None
        return out


class MultiValVocabEncoder:
    """Encoder for list-valued columns over the union of their values.

    Equivalent of MultiValLabelEncoder (inputs.py:93-113). When ``encoder``
    is given, its vocabulary is shared (tied-vocab mechanism used by
    SequenceFeat, inputs.py:439-441) and ``fit`` is a no-op.
    """

    def __init__(self, encoder: VocabEncoder | None = None,
                 shuffle_seed: int | None = None):
        self.need_fit = encoder is None
        self._encoder = (
            encoder if encoder is not None else VocabEncoder(shuffle_seed)
        )

    @property
    def vocab_size(self) -> int:
        return self._encoder.vocab_size

    def fit(self, lists) -> "MultiValVocabEncoder":
        if self.need_fit:
            flat = [v for row in lists for v in row]
            self._encoder.fit(np.asarray(flat))
        return self

    def transform_padded(self, lists, max_len: int) -> np.ndarray:
        """Encode each list and pad/truncate to ``max_len`` with PAD_ID.

        The reference pads with 0 via keras pad_sequences (inputs.py:353),
        conflating padding with OOV; we keep them distinct so device-side
        combiners can mask padding exactly.
        """
        out = np.full((len(lists), max_len), PAD_ID, dtype=np.int32)
        for i, row in enumerate(lists):
            ids = self._encoder.transform(np.asarray(row)[:max_len])
            out[i, : len(ids)] = ids
        return out

    def fit_transform_padded(self, lists, max_len: int) -> np.ndarray:
        return self.fit(lists).transform_padded(lists, max_len)


class StandardScaler:
    """Fit/transform z-scaling (reference default for DenseFeat, inputs.py:293)."""

    def __init__(self):
        self.mean_ = 0.0
        self.std_ = 1.0

    def fit(self, values) -> "StandardScaler":
        values = np.asarray(values, dtype=np.float64)
        self.mean_ = float(values.mean())
        std = float(values.std())
        self.std_ = std if std > 0 else 1.0
        return self

    def transform(self, values) -> np.ndarray:
        values = np.asarray(values, dtype=np.float64)
        return ((values - self.mean_) / self.std_).astype(np.float32)


class MinMaxScaler:
    """Fit/transform min-max scaling (used by the ML-100K example features,
    reference examples/utils.py:58-67)."""

    def __init__(self):
        self.min_ = 0.0
        self.range_ = 1.0

    def fit(self, values) -> "MinMaxScaler":
        values = np.asarray(values, dtype=np.float64)
        self.min_ = float(values.min())
        rng = float(values.max()) - self.min_
        self.range_ = rng if rng > 0 else 1.0
        return self

    def transform(self, values) -> np.ndarray:
        values = np.asarray(values, dtype=np.float64)
        return ((values - self.min_) / self.range_).astype(np.float32)


def hash_bucket(values, num_buckets: int) -> np.ndarray:
    """Deterministic string/int hashing into ``num_buckets`` buckets.

    The hashed-vocab mechanism for very large cardinalities (Criteo).
    Reference precedent: MultiValSparseFeat.to_sparse_tensor hashes values
    with strings.to_hash_bucket_fast (inputs.py:361-371). Uses pandas'
    vectorized siphash with a FIXED key (stable across processes, unlike
    Python's randomized hash()) and categorize=True so heavy-tailed id
    columns hash each distinct value once; falls back to a pure-python
    FNV-1a loop if pandas is unavailable.
    """
    values = np.asarray(values)
    try:
        import pandas as pd

        hashed = pd.util.hash_array(
            values if values.dtype == object else values.astype(object),
            categorize=True,
        )
        return (hashed % np.uint64(num_buckets)).astype(np.int32)
    except ImportError:  # pragma: no cover
        out = np.empty(len(values), dtype=np.int64)
        for i, v in enumerate(values.tolist()):
            data = v if isinstance(v, bytes) else str(v).encode("utf-8")
            h = 0xCBF29CE484222325
            for b in data:
                h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
            out[i] = h % num_buckets
        return out.astype(np.int32)

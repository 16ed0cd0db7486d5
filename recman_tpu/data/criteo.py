"""Criteo Display-Advertising pipeline: hashed 26-cat + 13-dense schema.

The reference has no Criteo loader (SURVEY.md §6); this supplies the
BASELINE.json configs 3-5. Format: label \\t I1..I13 (ints, may be empty)
\\t C1..C26 (hex strings, may be empty). Standard preprocessing:

- integer features: missing -> 0, then log1p compression (counts are
  heavy-tailed); scaler-free so the transform is streamable
- categorical features: FNV-1a hash into fixed buckets (the reference's
  hashed-vocab mechanism, inputs.py:361-371, generalized) — no vocab fit
  pass needed, so multi-hundred-GB inputs stream straight to arrays

Also provides a deterministic synthetic generator with Zipf-distributed
ids for benchmarks when the real dataset isn't on disk.
"""

from __future__ import annotations

import numpy as np

from ..features import DenseFeat, FeatureSet, HashedSparseFeat

NUM_INT_FEATURES = 13
NUM_CAT_FEATURES = 26
INT_NAMES = tuple(f"I{i+1}" for i in range(NUM_INT_FEATURES))
CAT_NAMES = tuple(f"C{i+1}" for i in range(NUM_CAT_FEATURES))

# per-feature bucket sizes; a single knob keeps the demo configs small while
# production uses the full counts
DEFAULT_BUCKETS = 100_000


class _Log1pScaler:
    """Stateless log1p 'scaler' matching the DenseFeat scaler protocol."""

    def fit(self, values):
        return self

    def transform(self, values):
        v = np.maximum(np.asarray(values, dtype=np.float64), 0.0)
        return np.log1p(v).astype(np.float32)


def create_criteo_features(num_buckets=DEFAULT_BUCKETS) -> FeatureSet:
    """26 HashedSparseFeat + 13 log1p DenseFeat."""
    fs = FeatureSet()
    for name in CAT_NAMES:
        fs[name] = HashedSparseFeat(name, num_buckets=num_buckets)
    for name in INT_NAMES:
        fs[name] = DenseFeat(name, scaler=_Log1pScaler())
    return fs


def load_criteo_tsv(path, max_rows=None, chunksize=1_000_000) -> dict[str, np.ndarray]:
    """Load a Criteo TSV into raw column arrays (label, ints, cat strings).

    Vectorized via pandas' C engine in chunks (a Python line loop is ~50x
    slower — full Criteo is ~4.4B lines). Returns {'y', 'I1'.., 'C1'..}
    with ints as float32 (missing -> 0) and cats as object arrays
    (missing -> ''). Feed through FeatureSet.transform to hash/scale.
    """
    import pandas as pd

    names = ["y"] + list(INT_NAMES) + list(CAT_NAMES)
    dtype = {n: np.float32 for n in INT_NAMES}
    dtype["y"] = np.float32
    chunks = []
    read = 0
    for chunk in pd.read_csv(
        path, sep="\t", header=None, names=names, dtype=dtype,
        chunksize=chunksize, engine="c", na_filter=True,
    ):
        if max_rows is not None and read + len(chunk) > max_rows:
            chunk = chunk.iloc[: max_rows - read]
        chunks.append(chunk)
        read += len(chunk)
        if max_rows is not None and read >= max_rows:
            break
    df = pd.concat(chunks, ignore_index=True) if len(chunks) > 1 else chunks[0]

    out = {"y": df["y"].to_numpy(dtype=np.float32)}
    for name in INT_NAMES:
        out[name] = np.nan_to_num(
            df[name].to_numpy(dtype=np.float32), nan=0.0
        )
    for name in CAT_NAMES:
        col = df[name].fillna("").to_numpy(dtype=object)
        out[name] = col
    return out


def synthetic_criteo_arrays(
    n_rows, num_buckets=DEFAULT_BUCKETS, seed=2019
) -> dict[str, np.ndarray]:
    """Deterministic Criteo-shaped ENCODED arrays (skips string hashing) for
    benchmarks: Zipf(1.2) categorical ids — the heavy-tailed id distribution
    embedding lookups see in production — and log-normal-ish dense columns.
    A synthetic logit ties labels to a few id buckets so AUC is learnable.
    """
    rs = np.random.RandomState(seed)
    data: dict[str, np.ndarray] = {}
    logit = np.zeros(n_rows, dtype=np.float64)
    for j, name in enumerate(CAT_NAMES):
        ids = rs.zipf(1.2, size=n_rows) % num_buckets + 1
        data[name] = ids.astype(np.int32)
        if j < 4:  # a few informative fields
            logit += ((ids % 7) - 3) * 0.3
    for name in INT_NAMES:
        v = np.log1p(rs.lognormal(0.0, 2.0, size=n_rows))
        data[name] = v.astype(np.float32)
    logit += rs.randn(n_rows)
    data["y"] = (logit > 0).astype(np.float32)
    return data

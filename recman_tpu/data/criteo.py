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


# Approximate per-field unique-value counts of the Kaggle Criteo
# Display-Advertising train split (the counts the public DLRM Kaggle
# config uses; treated as approximate here — no Criteo data ships in this
# environment to re-derive them from).
KAGGLE_CAT_CARDINALITIES = (
    1460, 583, 10_131_227, 2_202_608, 305, 24, 12_517, 633, 3, 93_145,
    5_683, 8_351_593, 3_194, 27, 14_992, 5_461_306, 10, 5_652, 2_173, 4,
    7_046_547, 18, 15, 286_181, 105, 142_572,
)
# Assumed per-field missing probabilities (Criteo fields are missing at
# wildly different rates; these are plausible stand-ins, documented as
# assumptions, heavier for the huge-cardinality fields).
KAGGLE_CAT_MISSING = (
    .00, .00, .04, .04, .00, .12, .00, .00, .00, .00,
    .00, .04, .00, .00, .00, .04, .00, .00, .44, .44,
    .04, .76, .00, .04, .44, .04,
)
KAGGLE_INT_MISSING = (
    .45, .00, .21, .21, .03, .22, .04, .00, .04, .45, .04, .76, .21,
)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (deterministic per-id effects
    without materializing teacher tables for 10M-cardinality fields)."""
    x = np.asarray(x, dtype=np.uint64).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


def _unit(x: np.ndarray) -> np.ndarray:
    """uint64 -> uniform (0, 1)."""
    return (_mix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def _id_effect(field: int, ids: np.ndarray, salt: int) -> np.ndarray:
    """Deterministic per-(field, id) standard-normal effect via Box-Muller
    over two hash-derived uniforms."""
    with np.errstate(over="ignore"):  # uint64 wraparound is the hash
        base = ids.astype(np.uint64) + np.uint64(field) * np.uint64(
            0x9E3779B97F4A7C15
        )
        u1 = np.clip(_unit(base + np.uint64(salt)), 1e-12, 1.0)
        u2 = _unit(base + np.uint64(salt + 1))
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def calibrated_criteo_arrays(
    n_rows, num_buckets=DEFAULT_BUCKETS, seed=2019, noise=1.4
) -> dict[str, np.ndarray]:
    """Criteo-shaped ENCODED synthetic data calibrated to published stats.

    Differences from ``synthetic_criteo_arrays`` (which is kept unchanged
    as the perf-bench workload): per-field raw cardinalities follow the
    Kaggle counts above; per-field missing rates (missing -> id 0, dense
    -> 0); ids are Zipf(1.1)-ranked within each field's cardinality then
    bucket-hashed (so big fields collide exactly like the real hashed
    pipeline); labels come from a deterministic "teacher" — per-(field,
    raw-id) effects + dense effects + logistic noise — whose scale is set
    so the Bayes-optimal AUC is ~0.84 (measured 0.8413 at noise=1.4,
    n=300k), putting a well-trained model in the ~0.80 band of the xDeepFM
    paper's Criteo anchor (README.md:7-8: AUC ~0.8052), with base rate
    ~0.26 like real CTR data. A proxy for recipe validation, NOT a claim
    of real-data equivalence.
    """
    rs = np.random.RandomState(seed)
    data: dict[str, np.ndarray] = {}
    logit = np.zeros(n_rows, dtype=np.float64)

    for j, name in enumerate(CAT_NAMES):
        card = KAGGLE_CAT_CARDINALITIES[j]
        # Zipf(1.1) over the field's raw id space (rank-ordered)
        raw = rs.zipf(1.1, size=n_rows).astype(np.uint64)
        raw = (raw - 1) % np.uint64(card) + np.uint64(1)
        present = rs.rand(n_rows) >= KAGGLE_CAT_MISSING[j]
        # per-raw-id teacher effect; scaled down for huge-cardinality
        # fields (mirrors how sparse tail ids carry less learnable signal)
        sigma = 0.55 if card <= 100_000 else 0.3
        logit += np.where(present, sigma * _id_effect(j, raw, 12345), 0.0)
        # encode like the real pipeline: hash raw id into buckets, OOV=0
        with np.errstate(over="ignore"):
            ids = (_mix64(raw + np.uint64(j) * np.uint64(0xD1B54A32D192ED03))
                   % np.uint64(num_buckets)).astype(np.int32) + 1
        data[name] = np.where(present, ids, 0).astype(np.int32)

    for j, name in enumerate(INT_NAMES):
        v = rs.lognormal(0.0, 2.0, size=n_rows)
        present = rs.rand(n_rows) >= KAGGLE_INT_MISSING[j]
        v = np.where(present, v, 0.0)
        enc = np.log1p(np.maximum(v, 0.0))
        data[name] = enc.astype(np.float32)
        if j < 6:  # a few informative dense fields
            logit += 0.18 * (enc - enc.mean())

    logit -= logit.mean() + 1.45  # intercept -> base rate ~0.26 (real CTR)
    logit += noise * rs.randn(n_rows)  # sets the Bayes ceiling
    data["y"] = (rs.rand(n_rows) < 1.0 / (1.0 + np.exp(-logit))).astype(
        np.float32
    )
    return data

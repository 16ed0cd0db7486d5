"""Device-side streaming AUC for evaluation at scale.

The reference computes AUC on host with sklearn over the full prediction
vector (metrics/roc_auc.py) — fine for ML-100K, impossible for full Criteo
across hosts. This is the standard thresholded/bucketed estimator (the same
approach as tf.keras.metrics.AUC): accumulate TP/FP counts at B score
buckets, then trapezoid-integrate the ROC curve. State is a small (2, B+1)
array that is psum-reducible across data-parallel shards.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def init_state(num_buckets: int = 2048) -> jnp.ndarray:
    """(2, num_buckets) float32: row 0 = positive counts, row 1 = negatives."""
    return jnp.zeros((2, num_buckets), dtype=jnp.float32)


@partial(jax.jit, static_argnames=("num_buckets",))
def update(state, y_true, y_pred, weights=None, num_buckets: int = 2048):
    """Accumulate a batch of probabilities into the histogram state."""
    bucket = jnp.clip(
        (y_pred * num_buckets).astype(jnp.int32), 0, num_buckets - 1
    )
    w = jnp.ones_like(y_pred) if weights is None else weights
    pos = jnp.zeros((num_buckets,), jnp.float32).at[bucket].add(w * y_true)
    neg = jnp.zeros((num_buckets,), jnp.float32).at[bucket].add(w * (1.0 - y_true))
    return state + jnp.stack([pos, neg])


def merge(*states):
    """Combine shard states (an all-reduce in SPMD settings)."""
    out = states[0]
    for s in states[1:]:
        out = out + s
    return out


@jax.jit
def compute(state) -> jnp.ndarray:
    """Trapezoidal AUC from the accumulated histograms."""
    pos, neg = state[0], state[1]
    # descending-threshold cumulative sums -> ROC points
    tp = jnp.cumsum(pos[::-1])
    fp = jnp.cumsum(neg[::-1])
    total_pos = jnp.maximum(tp[-1], 1.0)
    total_neg = jnp.maximum(fp[-1], 1.0)
    tpr = jnp.concatenate([jnp.zeros(1), tp / total_pos])
    fpr = jnp.concatenate([jnp.zeros(1), fp / total_neg])
    return jnp.sum((fpr[1:] - fpr[:-1]) * 0.5 * (tpr[1:] + tpr[:-1]))


class StreamingAUC:
    """Metric-protocol wrapper (higher_the_better) around the functional API.

    Usable as a drop-in for RocAucScore when predictions don't fit on host;
    also exposes update/result for incremental use from the eval loop.
    """

    def __init__(self, num_buckets: int = 2048):
        self.num_buckets = num_buckets
        self.reset()

    def reset(self):
        self._state = init_state(self.num_buckets)

    def update(self, y_true, y_pred, weights=None):
        self._state = update(
            self._state, jnp.asarray(y_true, jnp.float32),
            jnp.asarray(y_pred, jnp.float32),
            None if weights is None else jnp.asarray(weights, jnp.float32),
            num_buckets=self.num_buckets,
        )

    def result(self) -> float:
        return float(compute(self._state))

    def __call__(self, y_true, y_pred):
        self.reset()
        self.update(y_true, y_pred)
        return self.result()

    def __str__(self):
        return "roc_auc"

    __repr__ = __str__

    @property
    def higher_the_better(self):
        return True

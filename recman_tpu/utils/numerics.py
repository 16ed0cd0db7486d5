"""Loss / regularization / sizing helpers (reference recman/tf/core/utils.py)."""

from __future__ import annotations

import jax.numpy as jnp


def l2_loss(x) -> jnp.ndarray:
    """sum(x^2)/2 — tf.nn.l2_loss semantics, used by every layer's l2()
    (e.g. reference layers.py:188-193)."""
    return 0.5 * jnp.sum(jnp.square(x))


def bce_per_example(y_true, y_pred, eps=1e-7) -> jnp.ndarray:
    """Per-example BCE over probabilities (keras epsilon clipping). The
    explicit SPMD step (parallel/train_explicit.py) sums these locally and
    psums across data shards; binary_cross_entropy is the weighted mean."""
    p = jnp.clip(y_pred, eps, 1.0 - eps)
    return -(y_true * jnp.log(p) + (1.0 - y_true) * jnp.log(1.0 - p))


def mse_per_example(y_true, y_pred) -> jnp.ndarray:
    """Per-example squared error (see bce_per_example)."""
    return jnp.square(y_true - y_pred)


def binary_cross_entropy(y_true, y_pred, weights=None, eps=1e-7) -> jnp.ndarray:
    """Mean BCE over probabilities (reference utils.py:192-194 via
    tf.losses.binary_crossentropy, which clips by keras epsilon 1e-7).

    ``weights`` masks padded examples in fixed-shape batches: weighted mean.
    """
    per_ex = bce_per_example(y_true, y_pred, eps)
    if weights is None:
        return jnp.mean(per_ex)
    return jnp.sum(per_ex * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def mean_squared_error(y_true, y_pred, weights=None) -> jnp.ndarray:
    """Regression loss (reference utils.py:195-196)."""
    per_ex = mse_per_example(y_true, y_pred)
    if weights is None:
        return jnp.mean(per_ex)
    return jnp.sum(per_ex * weights) / jnp.maximum(jnp.sum(weights), 1.0)


def compute_hidden_units_s1(num_hidden_layers, input_neurons, output_neurons=1):
    """Geometric-pyramid sizing (reference utils.py:126-132)."""
    r = (input_neurons + output_neurons) ** (1 / (num_hidden_layers + 1))
    return [round(output_neurons * (r**i)) for i in range(num_hidden_layers, 0, -1)]


def compute_hidden_units_s2(num_hidden_layers, input_neurons, output_neurons=1):
    """2/3-rule sizing used for None entries in hidden_units
    (reference utils.py:135-139, consumed at layers.py:581-585)."""
    return [round((input_neurons + output_neurons) * 2 / 3) for _ in range(num_hidden_layers)]


def count_parameters(params: dict) -> int:
    """Total parameter count over a flat params dict (reference utils.py:216-225)."""
    return sum(int(v.size) for v in params.values())


def split_train_test(df_all, frac=0.8, random_seed=2019):
    """Train/valid/test split by sampling (reference utils.py:11-24):
    frac to train, half the remainder each to valid and test."""
    df_train = df_all.sample(frac=frac, random_state=random_seed)
    df_rest = df_all.drop(df_train.index)
    df_valid = df_rest.sample(frac=0.5, random_state=random_seed)
    df_test = df_rest.drop(df_valid.index)
    return df_train, df_valid, df_test

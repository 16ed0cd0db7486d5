"""Shared layer utilities: keep-prob dropout, activations (incl. Dice).

Dropout arguments throughout this framework are KEEP probabilities, matching
the reference convention (applied as rate=1-p, e.g. reference
layers.py:461,466,589): keep=1.0 is a no-op, keep=0.8 keeps 80% of units.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dropout(rng, x, keep_prob: float, training: bool):
    """Inverted dropout with keep-probability semantics.

    No-op when not training or keep_prob >= 1 (the reference flips dropout
    lists to all-ones at inference, xDeepFM.py:78-79,91-93).
    """
    if not training or keep_prob >= 1.0 or rng is None:
        return x
    keep = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(keep, x / keep_prob, 0.0)


def split_rng(rng, n: int):
    """Split an optional PRNG key into n subkeys (Nones when rng is None)."""
    if rng is None:
        return (None,) * n
    return tuple(jax.random.split(rng, n))


# -- activations ------------------------------------------------------------

def leaky_relu(x):
    """Default activation of the reference configs (hparams/xDeepFM.py:30,33
    via tf.nn.leaky_relu, alpha=0.2)."""
    return jax.nn.leaky_relu(x, negative_slope=0.2)


def batch_moments(x):
    """Per-unit mean/variance over the batch axis — the normalization
    statistics Dice uses during training."""
    return jnp.mean(x, axis=0), jnp.var(x, axis=0)


def dice(x, alpha, mean=None, var=None, eps=1e-8):
    """Dice activation from the DIN paper (arXiv:1706.06978 §4.3).

    p = sigmoid(norm(x)); out = p*x + (1-p)*alpha*x. The reference's
    Dice is half-written and non-functional (activation.py:8-50); this is a
    working implementation.

    ``mean``/``var``: the normalization moments. Pass None for batch
    moments (training, the paper's E[s]/Var[s] over the mini-batch); pass
    stored moments for inference so predictions are independent of batch
    composition (layers holding ``*_dice_mean_*`` params do this — see
    ASPLayer/DNN and Trainer.calibrate)."""
    if mean is None or var is None:
        mean, var = batch_moments(x)
    p = jax.nn.sigmoid((x - mean) * jax.lax.rsqrt(var + eps))
    return p * x + (1.0 - p) * alpha * x


ACTIVATIONS = {
    "relu": jax.nn.relu,
    "leaky_relu": leaky_relu,
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
    "identity": lambda x: x,
}


def resolve_activation(act):
    """Accept either a callable or a registry name."""
    if callable(act):
        return act
    return ACTIVATIONS[act]

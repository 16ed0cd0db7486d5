"""Batch normalization over 2-D activations.

The reference defines a hand-rolled BN (layers.py:26-65) that no model
uses (dead code, SURVEY.md §2.2) and that has no running statistics. This
is a working version: batch moments during training with an EMA carried in
a separate ``bn_state`` dict (pure-functional equivalent of TF's moving
averages), EMA moments at inference. Param names match the reference:
``{prefix}scale`` / ``{prefix}beta``.
"""

from __future__ import annotations

import jax.numpy as jnp


class BatchNormalization:
    def __init__(self, units, epsilon=1e-3, momentum=0.99, prefix=""):
        self.units = units
        self.epsilon = epsilon
        self.momentum = momentum
        self.prefix = prefix

    def init(self, key=None) -> dict:
        return {
            f"{self.prefix}scale": jnp.ones((self.units,), dtype=jnp.float32),
            f"{self.prefix}beta": jnp.zeros((self.units,), dtype=jnp.float32),
        }

    def init_state(self) -> dict:
        return {
            f"{self.prefix}bn_mean": jnp.zeros((self.units,), dtype=jnp.float32),
            f"{self.prefix}bn_var": jnp.ones((self.units,), dtype=jnp.float32),
        }

    def apply(self, params, state, inputs, training=True):
        """Returns (normalized, new_state)."""
        assert inputs.ndim == 2
        if training:
            mean = jnp.mean(inputs, axis=0)
            var = jnp.var(inputs, axis=0)
            m = self.momentum
            state = {
                f"{self.prefix}bn_mean": m * state[f"{self.prefix}bn_mean"] + (1 - m) * mean,
                f"{self.prefix}bn_var": m * state[f"{self.prefix}bn_var"] + (1 - m) * var,
            }
        else:
            mean = state[f"{self.prefix}bn_mean"]
            var = state[f"{self.prefix}bn_var"]
        inv = jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        out = (inputs - mean) * inv * params[f"{self.prefix}scale"] + params[f"{self.prefix}beta"]
        return out, state

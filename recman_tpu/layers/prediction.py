"""Prediction head (reference recman/tf/core/layers.py:780-808)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


class PredictionLayer:
    """Optional global bias; sigmoid iff task == "classification";
    reshape to (B,). Param name matches the reference: ``global_bias``."""

    def __init__(self, task="classification", use_bias=False, prefix=""):
        assert task in ("classification", "regression")
        self.task = task
        self.use_bias = use_bias
        self.prefix = prefix

    def init(self, key=None) -> dict:
        if self.use_bias:
            return {f"{self.prefix}global_bias": jnp.zeros((1,), dtype=jnp.float32)}
        return {}

    def apply(self, params, logits):
        out = logits
        if self.use_bias:
            out = out + params[f"{self.prefix}global_bias"]
        if self.task == "classification":
            out = jax.nn.sigmoid(out)
        return out.reshape(-1)

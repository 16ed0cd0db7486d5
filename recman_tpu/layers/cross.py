"""CrossNet — the Deep & Cross Network's cross tower (arXiv:1708.05123).

The reference's DCN model imports a CrossNet that no longer exists in its
layer library (DCN.py:8 comments it out; see SURVEY.md §2.2) — the math here
comes from the paper:

    x_{l+1} = x_0 * (x_l . w_l) + b_l + x_l        (w_l, b_l in R^d)

followed by a 1-logit head so the tower composes additively with the linear
and DNN towers (the reference's stale driver sums tower logits,
DCN.py:135-142; we fix its double-added dnn_logit bug by summing each tower
exactly once).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import split_rng


class CrossNet:
    """Params: ``cross_w_{i}`` (d,), ``cross_b_{i}`` (d,), head ``cross_w``
    (d, 1), ``cross_w0`` (1,)."""

    def __init__(self, input_dim, num_layers=3, l2_reg=0.0, prefix=""):
        assert num_layers > 0
        self.input_dim = input_dim
        self.num_layers = num_layers
        self.l2_reg = l2_reg
        self.prefix = prefix

    def init(self, key) -> dict:
        keys = split_rng(key, self.num_layers + 1)
        params = {}
        for i in range(self.num_layers):
            params[f"{self.prefix}cross_w_{i}"] = glorot_normal(
                keys[i], (self.input_dim, 1)
            )[:, 0]
            params[f"{self.prefix}cross_b_{i}"] = jnp.zeros(
                (self.input_dim,), dtype=jnp.float32
            )
        params[f"{self.prefix}cross_w"] = glorot_normal(keys[-1], (self.input_dim, 1))
        params[f"{self.prefix}cross_w0"] = jnp.zeros((1,), dtype=jnp.float32)
        return params

    def apply(self, params, inputs, training=True, rng=None):
        assert inputs.ndim == 2  # (B, d)
        x0 = inputs
        x = inputs
        for i in range(self.num_layers):
            w = params[f"{self.prefix}cross_w_{i}"]
            b = params[f"{self.prefix}cross_b_{i}"]
            # x0 * (x . w): rank-1 update, O(B*d)
            x = x0 * (x @ w)[:, None] + b + x
        return x @ params[f"{self.prefix}cross_w"] + params[f"{self.prefix}cross_w0"]

    def l2(self, params):
        total = self.l2_reg * l2_loss(params[f"{self.prefix}cross_w"])
        for i in range(self.num_layers):
            total += self.l2_reg * l2_loss(params[f"{self.prefix}cross_w_{i}"])
        return total

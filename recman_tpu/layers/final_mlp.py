"""FinalMLP building blocks (arXiv:2304.00902).

Beyond-reference layers for the two-stream MLP model:

- ``MLPBlock`` — a hidden-layer stack WITHOUT the 1-logit head (unlike
  layers/dnn.py DNN); its output is the stream's representation vector.
- ``FeatureSelectionGate`` — stream-level gating (paper §3.2): a small
  MLP over a gate context produces ``2*sigmoid`` element weights on the
  flattened field embeddings. The context is either a learnable vector
  (context-free, the paper's default when no fields are nominated) or
  the concatenation of nominated fields' embeddings (context-aware).
- ``InteractionAggregation`` — multi-head bilinear fusion (paper eq. 5):
  logit = b + o1·w1 + o2·w2 + Σ_h o1_h^T W_h o2_h, a single batched
  einsum over the head-split streams.

All shapes are static and batch-major; the bilinear term is one
(B, H, d1/H) x (H, d1/H, d2/H) x (B, H, d2/H) contraction on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import dropout, resolve_activation, split_rng


class MLPBlock:
    """Hidden stack only: (B, input_dim) -> (B, hidden_units[-1])."""

    def __init__(
        self,
        input_dim: int,
        hidden_units,
        dropout_keep,
        activation,
        l2_reg: float = 0.0,
        prefix: str = "mlp_",
    ):
        assert len(hidden_units) > 0
        assert len(hidden_units) == len(dropout_keep), (
            "MLPBlock dropout_keep is per hidden layer (no input dropout)"
        )
        self.input_dim = int(input_dim)
        self.hidden_units = tuple(int(u) for u in hidden_units)
        self.dropout_keep = tuple(dropout_keep)
        self.activation = resolve_activation(activation)
        self.l2_reg = float(l2_reg)
        self.prefix = prefix

    @property
    def output_dim(self) -> int:
        return self.hidden_units[-1]

    def init(self, key) -> dict:
        dims = (self.input_dim,) + self.hidden_units
        keys = split_rng(key, len(self.hidden_units))
        params = {}
        for i in range(len(self.hidden_units)):
            params[f"{self.prefix}layer_{i}_weights"] = glorot_normal(
                keys[i], (dims[i], dims[i + 1])
            )
            params[f"{self.prefix}layer_{i}_bias"] = jnp.zeros(
                (dims[i + 1],), dtype=jnp.float32
            )
        return params

    def apply(self, params, x, training=True, rng=None) -> jnp.ndarray:
        rngs = split_rng(rng, len(self.hidden_units))
        y = x
        for i in range(len(self.hidden_units)):
            y = (
                y @ params[f"{self.prefix}layer_{i}_weights"]
                + params[f"{self.prefix}layer_{i}_bias"]
            )
            y = self.activation(y)
            y = dropout(rngs[i], y, self.dropout_keep[i], training)
        return y

    def l2(self, params):
        if self.l2_reg == 0.0:
            return 0.0
        return self.l2_reg * sum(
            l2_loss(params[f"{self.prefix}layer_{i}_weights"])
            for i in range(len(self.hidden_units))
        )


class FeatureSelectionGate:
    """2*sigmoid(MLP(context)) element gate over the flat embeddings."""

    def __init__(
        self,
        target_dim: int,
        context_dim: int,
        hidden_dim: int,
        context_free: bool,
        l2_reg: float = 0.0,
        prefix: str = "fs_",
    ):
        self.target_dim = int(target_dim)
        self.context_dim = int(context_dim)
        self.hidden_dim = int(hidden_dim)
        self.context_free = bool(context_free)
        self.l2_reg = float(l2_reg)
        self.prefix = prefix

    def init(self, key) -> dict:
        k_ctx, k1, k2 = split_rng(key, 3)
        params = {
            f"{self.prefix}gate_w1": glorot_normal(
                k1, (self.context_dim, self.hidden_dim)
            ),
            f"{self.prefix}gate_b1": jnp.zeros((self.hidden_dim,), jnp.float32),
            f"{self.prefix}gate_w2": glorot_normal(
                k2, (self.hidden_dim, self.target_dim)
            ),
            f"{self.prefix}gate_b2": jnp.zeros((self.target_dim,), jnp.float32),
        }
        if self.context_free:
            # learnable context vector, small init like an embedding row
            params[f"{self.prefix}ctx"] = 0.01 * glorot_normal(
                k_ctx, (1, self.context_dim)
            )
        return params

    def gate(self, params, context=None) -> jnp.ndarray:
        """-> (1 or B, target_dim) multiplicative weights in (0, 2)."""
        ctx = params[f"{self.prefix}ctx"] if self.context_free else context
        assert ctx is not None and ctx.ndim == 2
        h = jnp.maximum(
            ctx @ params[f"{self.prefix}gate_w1"] + params[f"{self.prefix}gate_b1"],
            0.0,
        )
        logits = h @ params[f"{self.prefix}gate_w2"] + params[f"{self.prefix}gate_b2"]
        return 2.0 * jnp.reciprocal(1.0 + jnp.exp(-logits))

    def apply(self, params, flat_embeds, context=None) -> jnp.ndarray:
        return flat_embeds * self.gate(params, context)

    def l2(self, params):
        if self.l2_reg == 0.0:
            return 0.0
        return self.l2_reg * (
            l2_loss(params[f"{self.prefix}gate_w1"])
            + l2_loss(params[f"{self.prefix}gate_w2"])
        )


class InteractionAggregation:
    """Multi-head bilinear fusion of two stream outputs -> (B, 1) logit."""

    def __init__(
        self,
        dim1: int,
        dim2: int,
        num_heads: int = 1,
        l2_reg: float = 0.0,
        prefix: str = "agg_",
    ):
        assert dim1 % num_heads == 0 and dim2 % num_heads == 0, (
            f"stream dims ({dim1}, {dim2}) must divide num_heads={num_heads}"
        )
        self.dim1 = int(dim1)
        self.dim2 = int(dim2)
        self.num_heads = int(num_heads)
        self.head1 = self.dim1 // self.num_heads
        self.head2 = self.dim2 // self.num_heads
        self.l2_reg = float(l2_reg)
        self.prefix = prefix

    def init(self, key) -> dict:
        k1, k2, kw = split_rng(key, 3)
        return {
            f"{self.prefix}w1": glorot_normal(k1, (self.dim1, 1)),
            f"{self.prefix}w2": glorot_normal(k2, (self.dim2, 1)),
            f"{self.prefix}w12": glorot_normal(
                kw, (self.num_heads, self.head1, self.head2)
            ),
            f"{self.prefix}bias": jnp.zeros((1,), dtype=jnp.float32),
        }

    def apply(self, params, o1, o2) -> jnp.ndarray:
        B = o1.shape[0]
        logit = (
            o1 @ params[f"{self.prefix}w1"]
            + o2 @ params[f"{self.prefix}w2"]
            + params[f"{self.prefix}bias"]
        )  # (B, 1)
        h1 = o1.reshape(B, self.num_heads, self.head1)
        h2 = o2.reshape(B, self.num_heads, self.head2)
        bilinear = jnp.einsum(
            "bhi,hij,bhj->b", h1, params[f"{self.prefix}w12"], h2
        )
        return logit + bilinear[:, None]

    def l2(self, params):
        if self.l2_reg == 0.0:
            return 0.0
        return self.l2_reg * (
            l2_loss(params[f"{self.prefix}w1"])
            + l2_loss(params[f"{self.prefix}w2"])
            + l2_loss(params[f"{self.prefix}w12"])
        )

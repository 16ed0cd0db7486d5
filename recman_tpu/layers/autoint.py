"""InteractingLayer — AutoInt's multi-head self-attention over fields
(arXiv:1810.11921).

Beyond-reference addition: each layer projects the (B, F, d) field
embeddings to multi-head query/key/value, attends ACROSS FIELDS
(softmax over the F axis — feature-interaction weights, not sequence
attention), concatenates heads, and adds a (projected) residual with a
ReLU. Everything is batched matmuls over (B, F, ·) — MXU-native, no
gathers, no dynamic shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import dropout, split_rng


class InteractingLayer:
    """Params per layer i: ``autoint_{i}_wq/wk/wv`` (d_in, H*dh),
    ``autoint_{i}_wres`` (d_in, H*dh) when use_residual. Output dim is
    H*dh per layer."""

    def __init__(self, input_dim, num_layers=3, num_heads=2, head_size=8,
                 use_residual=True, dropout_keep=1.0, l2_reg=0.0, prefix=""):
        assert num_layers > 0 and num_heads > 0 and head_size > 0
        self.input_dim = input_dim
        self.num_layers = num_layers
        self.num_heads = num_heads
        self.head_size = head_size
        self.use_residual = use_residual
        self.dropout_keep = dropout_keep
        self.l2_reg = l2_reg
        self.prefix = prefix
        self.output_dim = num_heads * head_size

    def _dims(self):
        d = self.input_dim
        out = self.output_dim
        for _ in range(self.num_layers):
            yield d, out
            d = out

    def _names(self, i):
        names = [f"{self.prefix}autoint_{i}_w{x}" for x in ("q", "k", "v")]
        if self.use_residual:
            names.append(f"{self.prefix}autoint_{i}_wres")
        return names

    def init(self, key) -> dict:
        keys = split_rng(key, self.num_layers * 4)
        ki = iter(keys)
        params = {}
        for i, (d_in, d_out) in enumerate(self._dims()):
            for name in self._names(i):
                params[name] = glorot_normal(next(ki), (d_in, d_out))
        return params

    def apply(self, params, inputs, training=True, rng=None):
        """(B, F, d_in) -> (B, F, H*dh) after num_layers rounds."""
        assert inputs.ndim == 3
        h, dh = self.num_heads, self.head_size
        rngs = split_rng(rng, self.num_layers)
        x = inputs
        for i in range(self.num_layers):
            q = x @ params[f"{self.prefix}autoint_{i}_wq"]  # (B, F, H*dh)
            k = x @ params[f"{self.prefix}autoint_{i}_wk"]
            v = x @ params[f"{self.prefix}autoint_{i}_wv"]
            b, f, _ = q.shape
            # (B, H, F, dh)
            q = q.reshape(b, f, h, dh).transpose(0, 2, 1, 3)
            k = k.reshape(b, f, h, dh).transpose(0, 2, 1, 3)
            v = v.reshape(b, f, h, dh).transpose(0, 2, 1, 3)
            att = jax.nn.softmax(
                jnp.einsum("bhfd,bhgd->bhfg", q, k), axis=-1
            )  # field-interaction weights (paper uses unscaled dot)
            att = dropout(rngs[i], att, self.dropout_keep, training)
            out = jnp.einsum("bhfg,bhgd->bhfd", att, v)
            out = out.transpose(0, 2, 1, 3).reshape(b, f, h * dh)
            if self.use_residual:
                out = out + x @ params[f"{self.prefix}autoint_{i}_wres"]
            x = jax.nn.relu(out)
        return x

    def l2(self, params):
        total = 0.0
        for i in range(self.num_layers):
            for name in self._names(i):
                total += self.l2_reg * l2_loss(params[name])
        return total

"""Masked transformer encoder layer for BST (arXiv:1905.06874).

Beyond-reference layer. Standard pre-residual encoder block with the
pieces BST needs that AutoInt's InteractingLayer (layers/autoint.py)
deliberately lacks: scaled dot-product attention, KEY MASKING for padded
sequence positions (PAD_ID=-1 rows must not receive attention), an
output projection back to the model width so residuals add without a
reshape, LayerNorm (layers/masknet.py), and a pointwise FFN:

    a = MHA(x, mask);      x = LN1(x + dropout(a))
    f = W2 φ(W1 x + b1)+b2; x = LN2(x + dropout(f))

Everything is (B, S, k) batched matmuls — MXU-native, static S (the
schema's max_len + 1 candidate slot). Dropout follows the framework's
keep-probability convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import dropout, resolve_activation, split_rng
from .masknet import LayerNorm

_NEG_INF = -1e9


class TransformerEncoderLayer:
    """(B, S, k), key mask (B, S) -> (B, S, k)."""

    def __init__(self, model_dim: int, num_heads: int = 2, ff_hidden: int = 32,
                 dropout_keep: float = 1.0, activation: str = "leaky_relu",
                 l2_reg: float = 0.0, prefix: str = "bst_"):
        assert model_dim % num_heads == 0, (
            f"model_dim={model_dim} must divide num_heads={num_heads}"
        )
        self.model_dim = int(model_dim)
        self.num_heads = int(num_heads)
        self.head_dim = self.model_dim // self.num_heads
        self.ff_hidden = int(ff_hidden)
        self.dropout_keep = float(dropout_keep)
        self.activation = resolve_activation(activation)
        self.l2_reg = float(l2_reg)
        self.prefix = prefix
        self.ln1 = LayerNorm(self.model_dim, prefix=f"{prefix}att_")
        self.ln2 = LayerNorm(self.model_dim, prefix=f"{prefix}ffn_")

    def _w_names(self):
        return [f"{self.prefix}{n}" for n in
                ("wq", "wk", "wv", "wo", "ff_w1", "ff_w2")]

    def init(self, key) -> dict:
        d, ff = self.model_dim, self.ff_hidden
        shapes = [(d, d), (d, d), (d, d), (d, d), (d, ff), (ff, d)]
        keys = split_rng(key, len(shapes))
        params = {
            name: glorot_normal(k, shape)
            for name, k, shape in zip(self._w_names(), keys, shapes)
        }
        params[f"{self.prefix}ff_b1"] = jnp.zeros((ff,), jnp.float32)
        params[f"{self.prefix}ff_b2"] = jnp.zeros((d,), jnp.float32)
        params.update(self.ln1.init())
        params.update(self.ln2.init())
        return params

    def apply(self, params, x, mask, training=True, rng=None) -> jnp.ndarray:
        assert x.ndim == 3 and mask.ndim == 2
        b, s, d = x.shape
        h, dh = self.num_heads, self.head_dim
        r_att, r_ffn = split_rng(rng, 2)

        q = (x @ params[f"{self.prefix}wq"]).reshape(b, s, h, dh)
        k = (x @ params[f"{self.prefix}wk"]).reshape(b, s, h, dh)
        v = (x @ params[f"{self.prefix}wv"]).reshape(b, s, h, dh)
        scores = jnp.einsum("bshd,bthd->bhst", q, k) / jnp.sqrt(
            jnp.asarray(dh, x.dtype)
        )
        # padded KEYS receive no attention mass from anyone
        scores = scores + jnp.where(mask, 0.0, _NEG_INF)[:, None, None, :]
        att = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhst,bthd->bshd", att, v).reshape(b, s, d)
        out = out @ params[f"{self.prefix}wo"]
        x = self.ln1.apply(params, x + dropout(r_att, out, self.dropout_keep,
                                               training))

        f = self.activation(
            x @ params[f"{self.prefix}ff_w1"] + params[f"{self.prefix}ff_b1"]
        ) @ params[f"{self.prefix}ff_w2"] + params[f"{self.prefix}ff_b2"]
        return self.ln2.apply(params, x + dropout(r_ffn, f, self.dropout_keep,
                                                  training))

    def l2(self, params):
        if self.l2_reg == 0.0:
            return 0.0
        return self.l2_reg * sum(l2_loss(params[n]) for n in self._w_names())

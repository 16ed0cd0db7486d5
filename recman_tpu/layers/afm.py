"""Attentional Factorization Machine layer (arXiv:1708.04617).

The reference's AFM model references an AFMLayer that no longer exists in
its layer library (AFM.py:120; see SURVEY.md §2.2) — the math here comes
from the paper:

    pair_{ij} = e_i * e_j                      (element-wise, i < j)
    a'_{ij}   = h . relu(W pair_{ij} + b)      (attention net, factor t)
    a_{ij}    = softmax over pairs
    out       = p . sum_{ij} a_{ij} pair_{ij}  (1 logit)

with dropout (keep-prob) on the attention-weighted pair sum, configured by
the stale reference ctor's att_factor / att_dropout args (AFM.py:20-60).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import dropout, split_rng


class AFMLayer:
    """Params: ``afm_att_w`` (k, t), ``afm_att_b`` (t,), ``afm_att_h`` (t,),
    ``afm_p`` (k, 1)."""

    def __init__(self, field_size, embedding_size, att_factor=4, att_dropout=1.0,
                 l2_reg=0.0, prefix=""):
        self.field_size = field_size
        self.embedding_size = embedding_size
        self.att_factor = att_factor
        self.att_dropout = att_dropout
        self.l2_reg = l2_reg
        self.prefix = prefix
        # static upper-triangular pair indices
        iu = np.triu_indices(field_size, k=1)
        self._pair_i = np.asarray(iu[0])
        self._pair_j = np.asarray(iu[1])

    def init(self, key) -> dict:
        k1, k2, k3 = split_rng(key, 3)
        return {
            f"{self.prefix}afm_att_w": glorot_normal(
                k1, (self.embedding_size, self.att_factor)
            ),
            f"{self.prefix}afm_att_b": jnp.zeros((self.att_factor,), dtype=jnp.float32),
            f"{self.prefix}afm_att_h": glorot_normal(k2, (self.att_factor, 1))[:, 0],
            f"{self.prefix}afm_p": glorot_normal(k3, (self.embedding_size, 1)),
        }

    def apply(self, params, embeddings, training=True, rng=None):
        assert embeddings.ndim == 3  # (B, F, k)
        ei = embeddings[:, self._pair_i, :]  # (B, P, k)
        ej = embeddings[:, self._pair_j, :]
        pairs = ei * ej

        att = jax.nn.relu(
            jnp.einsum("bpk,kt->bpt", pairs, params[f"{self.prefix}afm_att_w"])
            + params[f"{self.prefix}afm_att_b"]
        )
        scores = jnp.einsum("bpt,t->bp", att, params[f"{self.prefix}afm_att_h"])
        probs = jax.nn.softmax(scores, axis=1)

        pooled = jnp.einsum("bp,bpk->bk", probs, pairs)  # (B, k)
        pooled = dropout(rng, pooled, self.att_dropout, training)
        return pooled @ params[f"{self.prefix}afm_p"]  # (B, 1)

    def l2(self, params):
        return self.l2_reg * (
            l2_loss(params[f"{self.prefix}afm_att_w"])
            + l2_loss(params[f"{self.prefix}afm_p"])
        )

"""Factorization Machine layer (reference recman/tf/core/layers.py:449-481)."""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import l2_loss
from .common import dropout, split_rng


class FMLayer:
    """FM pairwise-interaction tower. Parameter-free; consumes the shared
    field embeddings and their bias embeddings.

    - first-order term: dropout(keep[0]) on bias embeddings, summed over
      fields (reference layers.py:461-462)
    - second-order term: dropout(keep[1]) on embeddings, then the O(F*k)
      identity 0.5*((sum_f v)^2 - sum_f v^2) summed over k
      (reference layers.py:466-476)

    Returns logit (B, 1).
    """

    def __init__(self, dropout_keep=(1.0, 1.0)):
        self.dropout_keep = tuple(dropout_keep)

    def init(self, key=None) -> dict:
        return {}

    def apply(self, params, embeddings, embedding_bias, training=True, rng=None):
        assert embeddings.ndim == 3
        r0, r1 = split_rng(rng, 2)

        bias = dropout(r0, embedding_bias, self.dropout_keep[0], training)
        y_first = jnp.sum(bias, axis=1)  # (B, 1)

        emb = dropout(r1, embeddings, self.dropout_keep[1], training)
        sum_emb = jnp.sum(emb, axis=1, keepdims=True)  # (B, 1, k)
        square_of_sum = jnp.square(sum_emb)
        sum_of_square = jnp.sum(jnp.square(emb), axis=1, keepdims=True)
        y_second = 0.5 * (square_of_sum - sum_of_square)
        y_second = jnp.sum(y_second, axis=2)  # (B, 1)

        return y_first + y_second

    def l2(self, params):
        return jnp.float32(0.0)  # reference layers.py:480-481


class FwFMLayer:
    """Field-weighted FM interaction (FwFM, arXiv:1806.03514 eq. 4).

    Beyond-reference layer: the pairwise term Σ_{i<j} r_ij <v_i, v_j> with
    one learned scalar r per FIELD pair. Computed as one bfk,bgk->bfg
    gram einsum masked by a static upper-triangular r matrix — F² scalars,
    so the whole interaction stays a single MXU contraction plus a (B,)
    reduction.
    """

    def __init__(self, num_fields: int, l2_reg: float = 0.0,
                 prefix: str = "fwfm_"):
        self.num_fields = int(num_fields)
        self.l2_reg = float(l2_reg)
        self.prefix = prefix

    def init(self, key=None) -> dict:
        import numpy as np

        # init at the plain-FM point (r=1 on i<j pairs) so FwFM starts as FM
        r0 = jnp.asarray(np.triu(np.ones((self.num_fields,) * 2), k=1),
                         dtype=jnp.float32)
        return {f"{self.prefix}r": r0}

    def apply(self, params, embeddings) -> jnp.ndarray:
        assert embeddings.ndim == 3
        f = self.num_fields
        gram = jnp.einsum("bfk,bgk->bfg", embeddings, embeddings)
        mask = jnp.triu(jnp.ones((f, f), dtype=embeddings.dtype), k=1)
        r = params[f"{self.prefix}r"] * mask
        return jnp.sum(gram * r[None, :, :], axis=(1, 2))[:, None]  # (B, 1)

    def l2(self, params):
        return self.l2_reg * l2_loss(params[f"{self.prefix}r"])

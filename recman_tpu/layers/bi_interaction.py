"""Bi-Interaction pooling (NFM, arXiv:1708.05027 eq. 4).

Beyond-reference layer: the reference's FMLayer (recman/tf/core/
layers.py:449-481) sums the pairwise term over k into a scalar; NFM keeps
the k-vector ½[(Σ_f v_f)² − Σ_f v_f²] and feeds it to a DNN. Same O(F·k)
identity, so it rides the VPU on full (B, k) lanes — no pairwise
materialization.
"""

from __future__ import annotations

import jax.numpy as jnp

from .common import dropout, split_rng


class BiInteractionPooling:
    """(B, F, k) field embeddings -> (B, k) pooled interaction vector.

    Parameter-free. ``dropout_keep`` is a KEEP probability applied to the
    pooled output (the NFM paper's dropout-on-bilinear-output, §3.2).
    """

    def __init__(self, dropout_keep=1.0):
        self.dropout_keep = float(dropout_keep)

    def init(self, key=None) -> dict:
        return {}

    def apply(self, params, embeddings, training=True, rng=None):
        assert embeddings.ndim == 3
        (r0,) = split_rng(rng, 1)
        sum_emb = jnp.sum(embeddings, axis=1)  # (B, k)
        sum_sq = jnp.sum(jnp.square(embeddings), axis=1)
        pooled = 0.5 * (jnp.square(sum_emb) - sum_sq)
        return dropout(r0, pooled, self.dropout_keep, training)

    def l2(self, params):
        return jnp.float32(0.0)

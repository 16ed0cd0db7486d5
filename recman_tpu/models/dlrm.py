"""DLRM — Deep Learning Recommendation Model (arXiv:1906.00091).

Beyond-reference model and the canonical accelerator CTR architecture:
a bottom MLP projects the dense features to the embedding dim (becoming
one extra "field"), pairwise DOT interactions couple all fields (one
bfk,bgk->bfg gram einsum + static upper-triangle gather — the same
MXU-shaped formulation as layers/product.py), and a top MLP consumes
[bottom output ‖ interactions]. No linear/wide tower, per the paper.
Sparse tables row-shard over the `model` mesh axis unchanged (the
DLRM-style EP placement parallel/sharding.py implements).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..config import DLRMHyperParams as HP
from ..layers import DNN, EmbeddingLayer, PredictionLayer, split_rng
from ..layers.common import resolve_activation
from ..utils import glorot_normal, l2_loss
from .base import Model


class DLRM(Model):
    name = "dlrm"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        k = hp[HP.EmbeddingSize]

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        self.n_dense = len(feat_dict.dense_feats)
        # bottom MLP exists only with dense features; its last width must
        # be k so the dense vector joins the dot interaction as a field
        self.bot_units = tuple(hp[HP.BotHiddenUnits]) + (k,) if self.n_dense else ()
        self.bot_activation = resolve_activation(hp[HP.BotActivation])
        self.bot_l2 = hp[HP.BotL2Reg]

        self.num_fields = self.embeddings.field_size + (1 if self.n_dense else 0)
        iu = np.triu_indices(self.num_fields, k=1)
        self._rows = jnp.asarray(iu[0], dtype=jnp.int32)
        self._cols = jnp.asarray(iu[1], dtype=jnp.int32)
        n_pairs = len(iu[0])

        top_input = (k if self.n_dense else 0) + n_pairs
        self.top = DNN(
            input_dim=top_input,
            hidden_units=hp[HP.TopHiddenUnits],
            dropout_keep=hp[HP.TopDropOut],
            activation=hp[HP.TopActivation],
            l2_reg=hp[HP.TopL2Reg],
            prefix="top_",
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k_emb, k_bot, k_top = split_rng(rng, 3)
        params = {}
        params.update(self.embeddings.init(k_emb))
        dims = (self.n_dense,) + self.bot_units
        keys = split_rng(k_bot, max(len(self.bot_units), 1))
        for i in range(len(self.bot_units)):
            params[f"dlrm_bot_{i}_weights"] = glorot_normal(
                keys[i], (dims[i], dims[i + 1])
            )
            params[f"dlrm_bot_{i}_bias"] = jnp.zeros(
                (dims[i + 1],), dtype=jnp.float32
            )
        params.update(self.top.init(k_top))
        params.update(self.head.init())
        return params

    def _bottom(self, params, batch):
        x = jnp.concatenate(
            [batch[f.name][:, None] for f in self.feat_dict.dense_feats], axis=1
        )
        for i in range(len(self.bot_units)):
            x = x @ params[f"dlrm_bot_{i}_weights"] + params[f"dlrm_bot_{i}_bias"]
            x = self.bot_activation(x)
        return x  # (B, k)

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        (r_top,) = split_rng(rng, 1)
        feat_embeds, _ = self.embeddings.apply(params, batch)  # (B, F, k)
        fields = feat_embeds
        top_parts = []
        if self.n_dense:
            dense_vec = self._bottom(params, batch)  # (B, k)
            fields = jnp.concatenate([fields, dense_vec[:, None, :]], axis=1)
            top_parts.append(dense_vec)
        gram = jnp.einsum("bfk,bgk->bfg", fields, fields)
        top_parts.append(gram[:, self._rows, self._cols])  # (B, P)
        top_input = jnp.concatenate(top_parts, axis=1)
        logit = self.top.apply(params, top_input, training=training, rng=r_top)
        return self.head.apply(params, logit)

    def l2(self, params):
        total = self.embeddings.l2(params) + self.top.l2(params)
        for i in range(len(self.bot_units)):
            total = total + self.bot_l2 * l2_loss(params[f"dlrm_bot_{i}_weights"])
        return total

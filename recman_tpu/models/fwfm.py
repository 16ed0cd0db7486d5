"""FwFM — Field-weighted Factorization Machine (arXiv:1806.03514).

Beyond-reference model: logit = linear + first-order bias +
Σ_{i<j} r_ij <v_i, v_j> with one learned scalar per field pair
(layers/fm.py FwFMLayer). r initializes at 1 on all pairs, so step 0 is
exactly the FM model.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FwFMHyperParams as HP
from ..layers import EmbeddingLayer, LinearLayer, PredictionLayer, split_rng
from ..layers.fm import FwFMLayer
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class FwFM(Model):
    name = "fwfm"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp

        self.embeddings = EmbeddingLayer(
            feat_dict, hp[HP.EmbeddingSize], hp[HP.EmbeddingL2Reg], use_bias=True
        )
        self.linear = LinearLayer(
            feat_dict.linear_features(hp[HP.LinearFeatures]), hp[HP.LinearL2Reg]
        )
        self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        self.fwfm = FwFMLayer(
            num_fields=self.embeddings.field_size, l2_reg=hp[HP.FieldWeightL2Reg]
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        params = {}
        params.update(self.embeddings.init(rng))
        params.update(self.linear.init())
        params.update(self.fwfm.init())
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        feat_embeds, feat_bias, linear_logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        first_order = jnp.sum(feat_bias, axis=1)  # (B, 1)
        pair_logit = self.fwfm.apply(params, feat_embeds)
        return self.head.apply(params, linear_logit + first_order + pair_logit)

    def l2(self, params):
        return (
            self.embeddings.l2(params)
            + self.linear.l2(params)
            + self.fwfm.l2(params)
        )

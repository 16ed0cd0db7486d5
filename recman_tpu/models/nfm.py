"""NFM — Neural Factorization Machine (arXiv:1708.05027).

Beyond-reference model: linear tower + Bi-Interaction pooling
(layers/bi_interaction.py — the FM pairwise identity kept as a (B, k)
vector) feeding an MLP; logit = linear + first-order bias + DNN(pooled).
Dense features join the DNN input alongside the pooled vector.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import NFMHyperParams as HP
from ..layers import DNN, EmbeddingLayer, LinearLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.bi_interaction import BiInteractionPooling
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class NFM(Model):
    name = "nfm"

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
        self.bi = BiInteractionPooling(dropout_keep=hp[HP.BiDropOut])
        dnn_input_dim = hp[HP.EmbeddingSize] + len(feat_dict.dense_feats)
        self.dnn = DNN(
            input_dim=dnn_input_dim,
            hidden_units=hp[HP.DeepHiddenUnits],
            dropout_keep=hp[HP.DeepDropOut],
            activation=hp[HP.DeepActivation],
            l2_reg=hp[HP.DeepL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k_emb, k_dnn = split_rng(rng, 2)
        params = {}
        params.update(self.embeddings.init(k_emb))
        params.update(self.linear.init())
        params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        r_bi, r_dnn = split_rng(rng, 2)
        feat_embeds, feat_bias, linear_logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        first_order = jnp.sum(feat_bias, axis=1)  # (B, 1), NFM eq. 2's Σw_i x_i
        pooled = self.bi.apply(params, feat_embeds, training=training, rng=r_bi)
        dnn_input = dnn_combine([pooled] + self.dense_columns(batch))
        deep_logit = self.dnn.apply(params, dnn_input, training=training, rng=r_dnn)
        return self.head.apply(params, linear_logit + first_order + deep_logit)

    def l2(self, params):
        return self.embeddings.l2(params) + self.linear.l2(params) + self.dnn.l2(params)

"""AFM — Attentional Factorization Machine (arXiv:1708.04617).

Capability spec from the stale reference AFM.py:20-186: linear + AFM
attention tower over shared embeddings (AFM.py:111-127).
"""

from __future__ import annotations

from ..config import AFMHyperParams as HP
from ..layers import AFMLayer, EmbeddingLayer, LinearLayer, PredictionLayer, split_rng
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class AFM(Model):
    name = "afm"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp

        self.embeddings = EmbeddingLayer(
            feat_dict, hp[HP.EmbeddingSize], hp[HP.EmbeddingL2Reg], use_bias=False
        )
        self.linear = LinearLayer(
            feat_dict.linear_features(hp[HP.LinearFeatures]), hp[HP.LinearL2Reg]
        )
        self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        self.afm = AFMLayer(
            field_size=self.embeddings.field_size,
            embedding_size=hp[HP.EmbeddingSize],
            att_factor=hp[HP.AttFactor],
            att_dropout=hp[HP.AttDropOut],
            l2_reg=hp[HP.AttL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k_emb, k_afm = split_rng(rng, 2)
        params = {}
        params.update(self.embeddings.init(k_emb))
        params.update(self.linear.init())
        params.update(self.afm.init(k_afm))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        feat_embeds, _, linear_logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        afm_logit = self.afm.apply(params, feat_embeds, training=training, rng=rng)
        return self.head.apply(params, linear_logit + afm_logit)

    def l2(self, params):
        return (
            self.embeddings.l2(params) + self.linear.l2(params) + self.afm.l2(params)
        )

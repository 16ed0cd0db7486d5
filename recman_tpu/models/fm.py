"""FM — factorization machine (Rendle 2010).

Capability spec from the stale reference FM.py:20-171 (TF1-era, broken in
the reference; see SURVEY.md §2.3): logit = linear + FMLayer over shared
embeddings (with bias tables providing the first-order term).
"""

from __future__ import annotations

from ..config import FMHyperParams as HP
from ..layers import EmbeddingLayer, FMLayer, LinearLayer, PredictionLayer, split_rng
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class FM(Model):
    name = "fm"

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
        self.fm = FMLayer(dropout_keep=hp[HP.FMDropOut])
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        params = {}
        params.update(self.embeddings.init(rng))
        params.update(self.linear.init())
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        feat_embeds, feat_bias, linear_logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        fm_logit = self.fm.apply(
            params, feat_embeds, feat_bias, training=training, rng=rng
        )
        return self.head.apply(params, linear_logit + fm_logit)

    def l2(self, params):
        return self.embeddings.l2(params) + self.linear.l2(params)

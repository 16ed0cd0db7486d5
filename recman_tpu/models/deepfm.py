"""DeepFM (arXiv:1703.04247).

Capability spec from the stale reference DeepFM.py:24-226: linear + FM +
DNN towers over SHARED embeddings, with use_fm / use_deep toggles
(DeepFM.py:128-158).
"""

from __future__ import annotations

from ..config import DeepFMHyperParams as HP
from ..layers import (
    DNN,
    EmbeddingLayer,
    FMLayer,
    LinearLayer,
    PredictionLayer,
    dnn_combine,
    split_rng,
)
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class DeepFM(Model):
    name = "deepfm"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        self.use_fm = bool(hp[HP.UseFM])
        self.use_deep = bool(hp[HP.UseDeep])
        assert self.use_fm or self.use_deep

        self.embeddings = EmbeddingLayer(
            feat_dict, hp[HP.EmbeddingSize], hp[HP.EmbeddingL2Reg], use_bias=True
        )
        self.linear = LinearLayer(
            feat_dict.linear_features(hp[HP.LinearFeatures]), hp[HP.LinearL2Reg]
        )
        self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        self.fm = FMLayer(dropout_keep=hp[HP.FMDropOut])
        if self.use_deep:
            dnn_input_dim = (
                self.embeddings.field_size * hp[HP.EmbeddingSize]
                + len(feat_dict.dense_feats)
            )
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
        if self.use_deep:
            params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        r_fm, r_dnn = split_rng(rng, 2)

        feat_embeds, feat_bias, logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        if self.use_fm:
            logit = logit + self.fm.apply(
                params, feat_embeds, feat_bias, training=training, rng=r_fm
            )
        if self.use_deep:
            dnn_input = dnn_combine([feat_embeds] + self.dense_columns(batch))
            logit = logit + self.dnn.apply(
                params, dnn_input, training=training, rng=r_dnn
            )
        return self.head.apply(params, logit)

    def l2(self, params):
        total = self.embeddings.l2(params) + self.linear.l2(params)
        if self.use_deep:
            total = total + self.dnn.l2(params)
        return total

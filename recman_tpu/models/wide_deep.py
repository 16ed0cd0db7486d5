"""Wide & Deep (arXiv:1606.07792).

Beyond-reference model: the reference zoo stops at FM-family towers; this
is the classic wide (linear, O(nnz) gathers — layers/linear.py) + deep
(flat embeddings + dense -> MLP) sum, i.e. DeepFM without the FM tower
(reference DeepFM.py:128-158 with use_fm=False but with the paper's
no-embedding-bias convention).
"""

from __future__ import annotations

from ..config import WideDeepHyperParams as HP
from ..layers import DNN, EmbeddingLayer, LinearLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class WideDeep(Model):
    name = "wide_deep"

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
        params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        (r_dnn,) = split_rng(rng, 1)
        feat_embeds, _, wide_logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        dnn_input = dnn_combine([feat_embeds] + self.dense_columns(batch))
        deep_logit = self.dnn.apply(params, dnn_input, training=training, rng=r_dnn)
        return self.head.apply(params, wide_logit + deep_logit)

    def l2(self, params):
        return self.embeddings.l2(params) + self.linear.l2(params) + self.dnn.l2(params)

"""PNN — Product-based Neural Network (arXiv:1611.00144).

Beyond-reference model: field embeddings -> product layer
(layers/product.py: inner / outer / both product signals) concatenated
with the flat embeddings (the paper's ``z``) and dense columns, feeding
an MLP. No wide/linear tower, per the paper.
"""

from __future__ import annotations

from ..config import PNNHyperParams as HP
from ..layers import DNN, EmbeddingLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.product import ProductLayer
from .base import Model


class PNN(Model):
    name = "pnn"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        k = hp[HP.EmbeddingSize]

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        self.product = ProductLayer(
            num_fields=self.embeddings.field_size,
            embedding_size=k,
            kind=hp[HP.ProductType],
        )
        dnn_input_dim = (
            self.embeddings.field_size * k          # z: flat embeddings
            + self.product.output_dim               # p: product signal
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
        params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        (r_dnn,) = split_rng(rng, 1)
        feat_embeds, _ = self.embeddings.apply(params, batch)
        p = self.product.apply(params, feat_embeds)
        dnn_input = dnn_combine([feat_embeds, p] + self.dense_columns(batch))
        logit = self.dnn.apply(params, dnn_input, training=training, rng=r_dnn)
        return self.head.apply(params, logit)

    def l2(self, params):
        return self.embeddings.l2(params) + self.dnn.l2(params)

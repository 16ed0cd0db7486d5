"""FiBiNET (arXiv:1905.09433).

Beyond-reference model: SENET field reweighting + bilinear field
interactions (layers/senet.py). Per the paper, the DNN consumes BOTH the
bilinear interactions of the original embeddings and those of the
SENET-reweighted embeddings (eq. 12), plus dense columns; logit =
linear + DNN.
"""

from __future__ import annotations

from ..config import FiBiNETHyperParams as HP
from ..layers import DNN, EmbeddingLayer, LinearLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.packed import PackedEmbeddingLinear
from ..layers.senet import BilinearInteraction, SENETLayer
from .base import Model


class FiBiNET(Model):
    name = "fibinet"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        k = hp[HP.EmbeddingSize]

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        self.linear = LinearLayer(
            feat_dict.linear_features(hp[HP.LinearFeatures]), hp[HP.LinearL2Reg]
        )
        self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        f = self.embeddings.field_size
        self.senet = SENETLayer(
            num_fields=f,
            reduction_ratio=hp[HP.ReductionRatio],
            l2_reg=hp[HP.SENETL2Reg],
        )
        # two towers share structure but have their OWN weights (paper eq. 12)
        self.bilinear = BilinearInteraction(
            f, k, bilinear_type=hp[HP.BilinearType],
            l2_reg=hp[HP.BilinearL2Reg], prefix="bilinear_",
        )
        self.bilinear_se = BilinearInteraction(
            f, k, bilinear_type=hp[HP.BilinearType],
            l2_reg=hp[HP.BilinearL2Reg], prefix="bilinear_se_",
        )
        dnn_input_dim = 2 * self.bilinear.output_dim + len(feat_dict.dense_feats)
        self.dnn = DNN(
            input_dim=dnn_input_dim,
            hidden_units=hp[HP.DeepHiddenUnits],
            dropout_keep=hp[HP.DeepDropOut],
            activation=hp[HP.DeepActivation],
            l2_reg=hp[HP.DeepL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k_emb, k_se, k_bi, k_bise, k_dnn = split_rng(rng, 5)
        params = {}
        params.update(self.embeddings.init(k_emb))
        params.update(self.linear.init())
        params.update(self.senet.init(k_se))
        params.update(self.bilinear.init(k_bi))
        params.update(self.bilinear_se.init(k_bise))
        params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        (r_dnn,) = split_rng(rng, 1)
        feat_embeds, _, linear_logit = self.packed.apply(
            params, batch, training=training, override=linear_override
        )
        se_embeds = self.senet.apply(params, feat_embeds)
        p = self.bilinear.apply(params, feat_embeds)        # (B, P, k)
        q = self.bilinear_se.apply(params, se_embeds)       # (B, P, k)
        dnn_input = dnn_combine([p, q] + self.dense_columns(batch))
        deep_logit = self.dnn.apply(params, dnn_input, training=training, rng=r_dnn)
        return self.head.apply(params, linear_logit + deep_logit)

    def l2(self, params):
        return (
            self.embeddings.l2(params)
            + self.linear.l2(params)
            + self.senet.l2(params)
            + self.bilinear.l2(params)
            + self.bilinear_se.l2(params)
            + self.dnn.l2(params)
        )

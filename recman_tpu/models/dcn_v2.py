"""DCN-V2 — Improved Deep & Cross Network (arXiv:2008.13535).

Beyond-reference model (the reference stops at DCN v1, models/dcn.py):
full- or low-rank matrix cross layers (optionally a mixture of low-rank
experts) combined with a DNN in the paper's two structures:

- ``structure="stacked"``: input -> cross tower -> deep tower -> logit
- ``structure="parallel"``: cross and deep both read the input; their
  logits sum (same additive-tower shape as DCN v1 here, keeping the
  linear tower optional).

Towers reuse this framework's layers (CrossNetV2, DNN, packed
embedding+linear lookups), so all execution-path optimizations apply.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DCNv2HyperParams as HP
from ..layers import (
    DNN,
    EmbeddingLayer,
    LinearLayer,
    PredictionLayer,
    dnn_combine,
    split_rng,
)
from ..layers.cross_v2 import CrossNetV2
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class DCNv2(Model):
    name = "dcn_v2"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        self.use_linear = bool(hp[HP.UseLinear])
        self.structure = hp[HP.Structure]
        assert self.structure in ("stacked", "parallel")

        self.embeddings = EmbeddingLayer(
            feat_dict, hp[HP.EmbeddingSize], hp[HP.EmbeddingL2Reg], use_bias=False
        )
        if self.use_linear:
            self.linear = LinearLayer(
                feat_dict.linear_features(hp[HP.LinearFeatures]), hp[HP.LinearL2Reg]
            )
            self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        input_dim = (
            self.embeddings.field_size * hp[HP.EmbeddingSize]
            + len(feat_dict.dense_feats)
        )
        self.input_dim = input_dim
        self.cross = CrossNetV2(
            input_dim=input_dim,
            num_layers=hp[HP.CrossLayerNum],
            rank=hp[HP.CrossRank],
            num_experts=hp[HP.CrossNumExperts],
            l2_reg=hp[HP.CrossLayerL2Reg],
            gated=bool(hp[HP.CrossGated]),
        )
        self.dnn = DNN(
            input_dim=input_dim,
            hidden_units=hp[HP.DeepHiddenUnits],
            dropout_keep=hp[HP.DeepDropOut],
            activation=hp[HP.DeepActivation],
            l2_reg=hp[HP.DeepL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k_emb, k_dnn, k_cross = split_rng(rng, 3)
        params = {}
        params.update(self.embeddings.init(k_emb))
        if self.use_linear:
            params.update(self.linear.init())
        params.update(self.cross.init(k_cross))
        params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        r_dnn, r_cross = split_rng(rng, 2)

        if self.use_linear:
            feat_embeds, _, linear_logit = self.packed.apply(
                params, batch, training=training, override=linear_override
            )
        else:
            feat_embeds, _ = self.embeddings.apply(params, batch)
            linear_logit = jnp.zeros((feat_embeds.shape[0], 1), feat_embeds.dtype)

        combined = dnn_combine([feat_embeds] + self.dense_columns(batch))

        if self.structure == "stacked":
            # cross WITHOUT its head: propagate the cross output into the
            # deep tower (paper fig. 2a)
            x = self.cross.features(params, combined)
            deep_logit = self.dnn.apply(params, x, training=training, rng=r_dnn)
            final_logit = linear_logit + deep_logit
        else:
            cross_logit = self.cross.apply(
                params, combined, training=training, rng=r_cross
            )
            deep_logit = self.dnn.apply(
                params, combined, training=training, rng=r_dnn
            )
            final_logit = linear_logit + cross_logit + deep_logit
        return self.head.apply(params, final_logit)

    def l2(self, params):
        total = self.embeddings.l2(params) + self.dnn.l2(params)
        if self.use_linear:
            total = total + self.linear.l2(params)
        if self.structure == "parallel":
            total = total + self.cross.l2(params)
        else:
            # stacked: head params unused; regularize the layer matrices
            for i in range(self.cross.num_layers):
                for name in self.cross._layer_param_names(i):
                    if not name.endswith(f"_b_{i}"):
                        from ..utils import l2_loss

                        total = total + self.cross.l2_reg * l2_loss(params[name])
        return total


class GDCN(DCNv2):
    """GDCN — Gated Deep Cross Network (arXiv:2311.04635).

    DCN-V2 with an information gate on every cross layer:
    x_{l+1} = x0 ⊙ (W_c x_l + b_l) ⊙ σ(W_g x_l) + x_l. The paper's
    GDCN-S/GDCN-P correspond to ``structure="stacked"/"parallel"``.
    """

    name = "gdcn"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        hp = {"cross_gated": True}
        hp.update(hparams or {})
        assert hp["cross_gated"], "GDCN is the gated variant by definition"
        super().__init__(feat_dict, hp, task=task)

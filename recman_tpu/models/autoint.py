"""AutoInt — Automatic Feature Interaction Learning via Self-Attentive
Neural Networks (arXiv:1810.11921).

Beyond-reference model: multi-head self-attention layers over the field
embeddings learn interaction weights; the attended field matrix
flattens into one logit, summed with the optional linear tower. Dense
features join as extra "fields" through a per-dense projection to the
embedding dim (the paper's numeric-field embedding e_m = v_m x_m).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import AutoIntHyperParams as HP
from ..layers import EmbeddingLayer, LinearLayer, PredictionLayer, split_rng
from ..layers.autoint import InteractingLayer
from ..layers.packed import PackedEmbeddingLinear
from ..utils import glorot_normal, l2_loss
from .base import Model


class AutoInt(Model):
    name = "autoint"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        self.use_linear = bool(hp[HP.UseLinear])
        k = hp[HP.EmbeddingSize]

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        if self.use_linear:
            self.linear = LinearLayer(
                feat_dict.linear_features(hp[HP.LinearFeatures]), hp[HP.LinearL2Reg]
            )
            self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        self.n_dense = len(feat_dict.dense_feats)
        self.num_fields = self.embeddings.field_size + self.n_dense
        self.interacting = InteractingLayer(
            input_dim=k,
            num_layers=hp[HP.AttLayerNum],
            num_heads=hp[HP.AttHeadNum],
            head_size=hp[HP.AttHeadSize],
            use_residual=hp[HP.AttUseResidual],
            dropout_keep=hp[HP.AttDropOut],
            l2_reg=hp[HP.AttL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k_emb, k_att, k_dense, k_out = split_rng(rng, 4)
        params = {}
        params.update(self.embeddings.init(k_emb))
        if self.use_linear:
            params.update(self.linear.init())
        params.update(self.interacting.init(k_att))
        if self.n_dense:
            # numeric-field embeddings: e_m = v_m * x_m (paper eq. 3)
            params["autoint_dense_embed"] = glorot_normal(
                k_dense, (self.n_dense, self.hparams[HP.EmbeddingSize])
            )
        params["autoint_out_w"] = glorot_normal(
            k_out, (self.num_fields * self.interacting.output_dim, 1)
        )
        params["autoint_out_w0"] = jnp.zeros((1,), dtype=jnp.float32)
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        (r_att,) = split_rng(rng, 1)

        if self.use_linear:
            feat_embeds, _, linear_logit = self.packed.apply(
                params, batch, training=training, override=linear_override
            )
        else:
            feat_embeds, _ = self.embeddings.apply(params, batch)
            linear_logit = jnp.zeros((feat_embeds.shape[0], 1), feat_embeds.dtype)

        fields = [feat_embeds]  # (B, F, k)
        if self.n_dense:
            dense = jnp.stack(
                [batch[f.name] for f in self.feat_dict.dense_feats], axis=1
            )  # (B, n_dense)
            fields.append(
                dense[:, :, None] * params["autoint_dense_embed"][None, :, :]
            )
        x = jnp.concatenate(fields, axis=1)  # (B, num_fields, k)

        att = self.interacting.apply(params, x, training=training, rng=r_att)
        flat = att.reshape(att.shape[0], -1)
        att_logit = flat @ params["autoint_out_w"] + params["autoint_out_w0"]
        return self.head.apply(params, linear_logit + att_logit)

    def l2(self, params):
        total = self.embeddings.l2(params) + self.interacting.l2(params)
        total = total + self.interacting.l2_reg * l2_loss(params["autoint_out_w"])
        if self.use_linear:
            total = total + self.linear.l2(params)
        return total

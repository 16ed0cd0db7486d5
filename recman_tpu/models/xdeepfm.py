"""xDeepFM — the flagship model (arXiv:1803.05170).

Reference: recman/tf/core/xDeepFM.py:20-126 (the reference's only working
model). Composition: shared embeddings (no bias, xDeepFM.py:54) feeding
linear + CIN + DNN towers; ``final_logit = linear + cin + dnn``
(xDeepFM.py:99-102) -> sigmoid head. Loss = BCE + Σ tower L2s
(xDeepFM.py:106-114).
"""

from __future__ import annotations

from ..config import xDeepFMHyperParams as HP
from ..layers import CIN, DNN, EmbeddingLayer, LinearLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.packed import PackedEmbeddingLinear
from .base import Model


class XDeepFM(Model):
    name = "xdeepfm"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp

        self.embeddings = EmbeddingLayer(
            feat_dict,
            hp[HP.EmbeddingSize],
            hp[HP.EmbeddingL2Reg],
            use_bias=False,  # xDeepFM.py:54
        )
        linear_feats = feat_dict.linear_features(hp[HP.LinearFeatures])
        self.linear = LinearLayer(linear_feats, hp[HP.LinearL2Reg])
        self.packed = PackedEmbeddingLinear(self.embeddings, self.linear)
        self.cin = CIN(
            field_size=self.embeddings.field_size,
            cross_layer_units=hp[HP.CinCrossLayerUnits],
            activation=hp[HP.CinActivation],
            dropout_keep=hp[HP.CinDropOut],
            l2_reg=hp[HP.CinL2Reg],
            compute_dtype=hp.get(HP.CinComputeDtype, "bfloat16"),
            remat=bool(hp.get(HP.CinRemat, False)),
        )
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
        k_emb, k_cin, k_dnn = split_rng(rng, 3)
        params = {}
        params.update(self.embeddings.init(k_emb))
        params.update(self.linear.init())
        params.update(self.cin.init(k_cin))
        params.update(self.dnn.init(k_dnn))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        r_cin, r_dnn = split_rng(rng, 2)

        import jax

        # named scopes label HLO metadata so profiler traces attribute
        # ops to towers (SURVEY.md par-tower trace annotations)
        with jax.named_scope("packed_lookup"):
            feat_embeds, _, linear_logit = self.packed.apply(
                params, batch, training=training, override=linear_override
            )  # one gather/scatter per feature for table + linear slice
        with jax.named_scope("cin_tower"):
            cin_logit = self.cin.apply(
                params, feat_embeds, training=training, rng=r_cin
            )
        with jax.named_scope("dnn_tower"):
            dnn_input = dnn_combine([feat_embeds] + self.dense_columns(batch))
            dnn_logit = self.dnn.apply(
                params, dnn_input, training=training, rng=r_dnn
            )

        final_logit = linear_logit + cin_logit + dnn_logit  # xDeepFM.py:99-102
        return self.head.apply(params, final_logit)

    def l2(self, params):
        """Σ tower L2s (xDeepFM.py:108-113: embeddings, linear, dnn, cin)."""
        return (
            self.embeddings.l2(params)
            + self.linear.l2(params)
            + self.dnn.l2(params)
            + self.cin.l2(params)
        )

"""DIN — Deep Interest Network (arXiv:1706.06978).

The reference's DIN.py ends mid-graph with no loss/output (DIN.py:10-144;
see SURVEY.md §2.3) — this is a complete implementation per the paper:

- every SequenceFeat's behavior sequence is pooled by attention against its
  tied id-feature's candidate embedding (ASPCombiner/ASPLayer intent,
  DIN.py:98-108)
- deep input = [non-sequence field embeddings, pooled sequence vectors,
  dense columns] -> DNN (Dice activation by default) -> sigmoid
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import DINHyperParams as HP
from ..features import SequenceFeat
from ..layers import ASPLayer, DNN, EmbeddingLayer, PredictionLayer, dnn_combine, split_rng
from .base import Model


class DIN(Model):
    name = "din"
    requires_sequence = True
    supports_moment_capture = True

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp

        self.seq_feats = feat_dict.sequence_feats
        assert self.seq_feats, "DIN requires at least one SequenceFeat"

        self.embeddings = EmbeddingLayer(
            feat_dict, hp[HP.EmbeddingSize], hp[HP.EmbeddingL2Reg], use_bias=False
        )
        self.asp = {
            f.name: ASPLayer(
                embedding_size=hp[HP.EmbeddingSize],
                att_hidden_units=hp[HP.AttHiddenUnits],
                activation=hp[HP.AttActivation],
                weight_normalization=hp[HP.AttWeightNormalization],
                prefix=f"{f.name}_",
            )
            for f in self.seq_feats
        }
        n_plain_fields = sum(
            1 for f in self.embeddings.feats if not isinstance(f, SequenceFeat)
        )
        dnn_input_dim = (
            (n_plain_fields + len(self.seq_feats)) * hp[HP.EmbeddingSize]
            + len(feat_dict.dense_feats)
        )
        self.dnn = DNN(
            input_dim=dnn_input_dim,
            hidden_units=hp[HP.DeepHiddenUnits],
            dropout_keep=hp[HP.DeepDropOut],
            activation=hp[HP.DeepActivation],  # "dice" supported natively
            l2_reg=hp[HP.DeepL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        keys = split_rng(rng, 2 + len(self.seq_feats))
        params = {}
        params.update(self.embeddings.init(keys[0]))
        params.update(self.dnn.init(keys[1]))
        for sub, f in zip(keys[2:], self.seq_feats):
            params.update(self.asp[f.name].init(sub))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None,
              moment_capture=None):
        r_dnn, = split_rng(rng, 1)
        per_feat = self.embeddings.apply_dict(params, batch)

        towers = []
        for f in self.embeddings.feats:
            if isinstance(f, SequenceFeat):
                continue
            towers.append(per_feat[f.name])  # (B, 1, k)

        pooled = []
        for f in self.seq_feats:
            queries = per_feat[f.id_feat.name][:, 0, :]  # (B, k) candidate embed
            keys = per_feat[f.name]  # (B, L, k), padding rows zeroed
            mask = batch[f.name] >= 0
            pooled.append(
                self.asp[f.name].apply(
                    params, queries, keys, mask, training=training,
                    moment_capture=moment_capture,
                )
            )

        dnn_input = dnn_combine(towers + pooled + self.dense_columns(batch))
        logit = self.dnn.apply(
            params, dnn_input, training=training, rng=r_dnn,
            moment_capture=moment_capture,
        )
        return self.head.apply(params, logit)

    def l2(self, params):
        total = self.embeddings.l2(params) + self.dnn.l2(params)
        for f in self.seq_feats:
            total = total + self.asp[f.name].l2(params)
        return total

"""FinalMLP (arXiv:2304.00902).

Beyond-reference model: two independently-gated MLP streams over the
shared field embeddings, fused by a multi-head bilinear interaction
aggregation head (layers/final_mlp.py). "Final" = Feature-selection +
INteraction-Aggregation Layers on two simple MLPs — the paper's point is
that a well-fused two-stream MLP matches elaborate explicit-interaction
towers.

Feature selection: each stream has its own 2*sigmoid gate over the flat
embeddings. By default the gate context is a learnable vector
(context-free); nominating feature names via ``fs1_context`` /
``fs2_context`` switches that stream to context-aware gating on those
fields' embeddings (e.g. user-side fields gate stream 1, item-side
stream 2, per the paper's CTR setup).

Dense features are appended AFTER gating (the gate shape covers the
embedding slots only, keeping it vocabulary-independent).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import FinalMLPHyperParams as HP
from ..features import SequenceFeat
from ..layers import EmbeddingLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.final_mlp import (
    FeatureSelectionGate,
    InteractionAggregation,
    MLPBlock,
)
from .base import Model


class FinalMLP(Model):
    name = "final_mlp"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        k = hp[HP.EmbeddingSize]

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        f = self.embeddings.field_size
        n_dense = len(feat_dict.dense_feats)
        flat_dim = f * k

        self._ctx_slots1 = self._context_slots(hp[HP.FS1Context])
        self._ctx_slots2 = self._context_slots(hp[HP.FS2Context])
        gate_hidden = int(hp[HP.FSGateHidden])
        self.fs1 = FeatureSelectionGate(
            target_dim=flat_dim,
            context_dim=(len(self._ctx_slots1) * k if self._ctx_slots1 else k),
            hidden_dim=gate_hidden,
            context_free=not self._ctx_slots1,
            l2_reg=hp[HP.FSL2Reg],
            prefix="final_fs1_",
        )
        self.fs2 = FeatureSelectionGate(
            target_dim=flat_dim,
            context_dim=(len(self._ctx_slots2) * k if self._ctx_slots2 else k),
            hidden_dim=gate_hidden,
            context_free=not self._ctx_slots2,
            l2_reg=hp[HP.FSL2Reg],
            prefix="final_fs2_",
        )
        self.mlp1 = MLPBlock(
            input_dim=flat_dim + n_dense,
            hidden_units=hp[HP.Mlp1HiddenUnits],
            dropout_keep=hp[HP.Mlp1DropOut],
            activation=hp[HP.MlpActivation],
            l2_reg=hp[HP.MlpL2Reg],
            prefix="final_mlp1_",
        )
        self.mlp2 = MLPBlock(
            input_dim=flat_dim + n_dense,
            hidden_units=hp[HP.Mlp2HiddenUnits],
            dropout_keep=hp[HP.Mlp2DropOut],
            activation=hp[HP.MlpActivation],
            l2_reg=hp[HP.MlpL2Reg],
            prefix="final_mlp2_",
        )
        self.agg = InteractionAggregation(
            dim1=self.mlp1.output_dim,
            dim2=self.mlp2.output_dim,
            num_heads=hp[HP.NumHeads],
            l2_reg=hp[HP.MlpL2Reg],
            prefix="final_agg_",
        )
        self.head = PredictionLayer(task)

    def _context_slots(self, names) -> tuple:
        """Map nominated feature names to field-slot indices on the concat
        axis (SequenceFeat fields occupy max_len slots)."""
        if not names:
            return ()
        names = set(names)
        slots, pos = [], 0
        for feat in self.embeddings.feats:
            width = feat.max_len if isinstance(feat, SequenceFeat) else 1
            if feat.name in names:
                slots.extend(range(pos, pos + width))
                names.discard(feat.name)
            pos += width
        assert not names, f"unknown fs context features: {sorted(names)}"
        return tuple(slots)

    def init_params(self, rng) -> dict:
        k_emb, k_f1, k_f2, k_m1, k_m2, k_agg = split_rng(rng, 6)
        params = {}
        params.update(self.embeddings.init(k_emb))
        params.update(self.fs1.init(k_f1))
        params.update(self.fs2.init(k_f2))
        params.update(self.mlp1.init(k_m1))
        params.update(self.mlp2.init(k_m2))
        params.update(self.agg.init(k_agg))
        params.update(self.head.init())
        return params

    def _gate_context(self, feat_embeds, slots):
        if not slots:
            return None
        B = feat_embeds.shape[0]
        return feat_embeds[:, jnp.asarray(slots), :].reshape(B, -1)

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        r1, r2 = split_rng(rng, 2)
        feat_embeds, _ = self.embeddings.apply(params, batch)  # (B, F, k)
        B = feat_embeds.shape[0]
        flat = feat_embeds.reshape(B, -1)
        dense = self.dense_columns(batch)

        g1 = self.fs1.apply(params, flat, self._gate_context(feat_embeds, self._ctx_slots1))
        g2 = self.fs2.apply(params, flat, self._gate_context(feat_embeds, self._ctx_slots2))
        o1 = self.mlp1.apply(params, dnn_combine([g1] + dense), training=training, rng=r1)
        o2 = self.mlp2.apply(params, dnn_combine([g2] + dense), training=training, rng=r2)
        logit = self.agg.apply(params, o1, o2)
        return self.head.apply(params, logit)

    def l2(self, params):
        return (
            self.embeddings.l2(params)
            + self.fs1.l2(params)
            + self.fs2.l2(params)
            + self.mlp1.l2(params)
            + self.mlp2.l2(params)
            + self.agg.l2(params)
        )

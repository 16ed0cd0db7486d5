"""BST — Behavior Sequence Transformer (arXiv:1905.06874).

Beyond-reference sequence model (the reference's only sequence machinery
is the unimplemented SequenceFeat, inputs.py:443). Per the paper: each
behavior sequence, with the CANDIDATE item appended as the last
position, plus learnable positional embeddings, runs through a stack of
masked transformer encoder blocks (layers/bst.py); the encoder outputs
(padding positions zeroed) are flattened and concatenated with the
plain field embeddings and dense columns into an MLP head.

Shares DIN's plumbing: SequenceFeat ties the behavior vocabulary and
embedding table to its id-feature, so the candidate and the history
live in one embedding space.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config import BSTHyperParams as HP
from ..features import SequenceFeat
from ..layers import DNN, EmbeddingLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.bst import TransformerEncoderLayer
from ..utils import glorot_normal, l2_loss
from .base import Model


class BST(Model):
    name = "bst"
    requires_sequence = True

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        k = hp[HP.EmbeddingSize]

        self.seq_feats = feat_dict.sequence_feats
        assert self.seq_feats, "BST requires at least one SequenceFeat"

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        self.num_blocks = int(hp[HP.NumBlocks])
        self.encoders = {
            f.name: [
                TransformerEncoderLayer(
                    model_dim=k,
                    num_heads=hp[HP.NumHeads],
                    ff_hidden=hp[HP.FFHidden],
                    dropout_keep=hp[HP.AttDropOut],
                    activation=hp[HP.TransActivation],
                    l2_reg=hp[HP.TransL2Reg],
                    prefix=f"{f.name}_bst_{i}_",
                )
                for i in range(self.num_blocks)
            ]
            for f in self.seq_feats
        }
        n_plain_fields = sum(
            1 for f in self.embeddings.feats if not isinstance(f, SequenceFeat)
        )
        seq_dims = sum((f.max_len + 1) * k for f in self.seq_feats)
        self.dnn = DNN(
            input_dim=n_plain_fields * k + seq_dims + len(feat_dict.dense_feats),
            hidden_units=hp[HP.DeepHiddenUnits],
            dropout_keep=hp[HP.DeepDropOut],
            activation=hp[HP.DeepActivation],
            l2_reg=hp[HP.DeepL2Reg],
        )
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        k = self.hparams[HP.EmbeddingSize]
        n_enc = len(self.seq_feats) * self.num_blocks
        keys = split_rng(rng, 2 + len(self.seq_feats) + n_enc)
        ki = iter(keys)
        params = {}
        params.update(self.embeddings.init(next(ki)))
        params.update(self.dnn.init(next(ki)))
        for f in self.seq_feats:
            # learnable positional embeddings over [history | candidate]
            params[f"{f.name}_bst_pos"] = glorot_normal(
                next(ki), (f.max_len + 1, k)
            )
            for enc in self.encoders[f.name]:
                params.update(enc.init(next(ki)))
        params.update(self.head.init())
        return params

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        rngs = split_rng(rng, 1 + len(self.seq_feats) * self.num_blocks)
        r_dnn, enc_rngs = rngs[0], list(rngs[1:])
        per_feat = self.embeddings.apply_dict(params, batch)

        towers = [
            per_feat[f.name]
            for f in self.embeddings.feats
            if not isinstance(f, SequenceFeat)
        ]  # (B, 1, k) each

        encoded = []
        for f in self.seq_feats:
            candidate = per_feat[f.id_feat.name]  # (B, 1, k)
            history = per_feat[f.name]  # (B, L, k), padding rows zeroed
            x = jnp.concatenate([history, candidate], axis=1)
            x = x + params[f"{f.name}_bst_pos"][None]
            mask = jnp.concatenate(
                [batch[f.name] >= 0,
                 jnp.ones(candidate.shape[:2], dtype=bool)],
                axis=1,
            )  # (B, L+1)
            for enc in self.encoders[f.name]:
                x = enc.apply(params, x, mask, training=training,
                              rng=enc_rngs.pop(0))
            # zero padded positions so the flatten is padding-invariant
            encoded.append(x * mask[:, :, None])

        dnn_input = dnn_combine(towers + encoded + self.dense_columns(batch))
        logit = self.dnn.apply(params, dnn_input, training=training, rng=r_dnn)
        return self.head.apply(params, logit)

    def l2(self, params):
        total = self.embeddings.l2(params) + self.dnn.l2(params)
        for f in self.seq_feats:
            for enc in self.encoders[f.name]:
                total = total + enc.l2(params)
            if self.hparams[HP.TransL2Reg]:
                total = total + self.hparams[HP.TransL2Reg] * l2_loss(
                    params[f"{f.name}_bst_pos"]
                )
        return total

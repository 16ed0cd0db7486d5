"""MaskNet (arXiv:2102.07619).

Beyond-reference model: instance-guided masking over layer-normalized
field embeddings (layers/masknet.py). Both paper topologies:

- variant="serial"  (MaskNetSerial / "SerMaskNet"): MaskBlocks chained —
  block i consumes block i-1's hidden output, every block's mask is
  computed from the raw embeddings; a final linear head produces the
  logit.
- variant="parallel" ("ParaMaskNet"): every MaskBlock consumes the
  LN-embeddings directly; the concatenated block outputs feed a small
  MLP head (layers/dnn.py DNN, which carries the 1-logit projection).

Dense features join both the mask input and the first block input as
extra columns (this framework's fixture datasets are fully sparse, so
this path is exercised by the Criteo-shaped configs).
"""

from __future__ import annotations

from ..config import MaskNetHyperParams as HP
from ..layers import DNN, EmbeddingLayer, PredictionLayer, dnn_combine, split_rng
from ..layers.masknet import LayerNorm, MaskBlock
from ..utils import glorot_normal, l2_loss
from .base import Model

import jax.numpy as jnp


class MaskNet(Model):
    name = "masknet"

    def __init__(self, feat_dict, hparams: dict | None = None, task="classification"):
        super().__init__(feat_dict, task)
        hp = dict(HP().defaults())
        hp.update(hparams or {})
        self.hparams = hp
        k = hp[HP.EmbeddingSize]
        self.variant = hp[HP.Variant]
        assert self.variant in ("serial", "parallel"), self.variant

        self.embeddings = EmbeddingLayer(
            feat_dict, k, hp[HP.EmbeddingL2Reg], use_bias=False
        )
        f = self.embeddings.field_size
        n_dense = len(feat_dict.dense_feats)
        emb_dim = f * k + n_dense  # mask input AND first block input width
        self.emb_ln = LayerNorm(k, prefix="masknet_emb_")

        dims = tuple(int(d) for d in hp[HP.BlockDims])
        agg_dim = int(hp[HP.AggDim])
        self.blocks = []
        prev = emb_dim
        for i, d in enumerate(dims):
            in_dim = emb_dim if self.variant == "parallel" else prev
            self.blocks.append(
                MaskBlock(
                    mask_input_dim=emb_dim,
                    input_dim=in_dim,
                    output_dim=d,
                    agg_dim=agg_dim,
                    l2_reg=hp[HP.MaskL2Reg],
                    prefix=f"masknet_block_{i}_",
                )
            )
            prev = d

        if self.variant == "parallel":
            self.head_dnn = DNN(
                input_dim=sum(dims),
                hidden_units=hp[HP.DeepHiddenUnits],
                dropout_keep=hp[HP.DeepDropOut],
                activation=hp[HP.DeepActivation],
                l2_reg=hp[HP.DeepL2Reg],
                prefix="masknet_head_",
            )
        else:
            self.head_dnn = None
            self._out_dim = dims[-1]
        self.head = PredictionLayer(task)

    def init_params(self, rng) -> dict:
        keys = split_rng(rng, len(self.blocks) + 2)
        params = {}
        params.update(self.embeddings.init(keys[0]))
        params.update(self.emb_ln.init())
        for blk, key in zip(self.blocks, keys[1:-1]):
            params.update(blk.init(key))
        if self.head_dnn is not None:
            params.update(self.head_dnn.init(keys[-1]))
        else:
            params["masknet_out_w"] = glorot_normal(keys[-1], (self._out_dim, 1))
            params["masknet_out_b"] = jnp.zeros((1,), dtype=jnp.float32)
        params.update(self.head.init())
        return params

    def _inputs(self, params, batch):
        feat_embeds, _ = self.embeddings.apply(params, batch)  # (B, F, k)
        B = feat_embeds.shape[0]
        dense = self.dense_columns(batch)
        raw_flat = dnn_combine([feat_embeds] + dense)
        ln_flat = dnn_combine([self.emb_ln.apply(params, feat_embeds)] + dense)
        return raw_flat, ln_flat, B

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        (r_dnn,) = split_rng(rng, 1)
        raw_flat, ln_flat, _ = self._inputs(params, batch)
        if self.variant == "parallel":
            outs = [blk.apply(params, ln_flat, raw_flat) for blk in self.blocks]
            logit = self.head_dnn.apply(
                params, jnp.concatenate(outs, axis=1), training=training, rng=r_dnn
            )
        else:
            x = ln_flat
            for blk in self.blocks:
                x = blk.apply(params, x, raw_flat)
            logit = x @ params["masknet_out_w"] + params["masknet_out_b"]
        return self.head.apply(params, logit)

    def l2(self, params):
        total = self.embeddings.l2(params)
        for blk in self.blocks:
            total += blk.l2(params)
        if self.head_dnn is not None:
            total += self.head_dnn.l2(params)
        else:
            total += self.hparams[HP.MaskL2Reg] * l2_loss(params["masknet_out_w"])
        return total

"""Attention Sequence Pooling for DIN (arXiv:1706.06978).

The reference's DIN model references ASPCombiner/ASPLayer that do not exist
in its layer library and the model file ends mid-graph (DIN.py:98-108; see
SURVEY.md §2.2-2.3) — this is a complete implementation per the paper:

    query  = candidate item embedding                (B, k)
    keys   = behavior-sequence embeddings            (B, L, k)
    att(q, k_t) = MLP([q, k_t, q - k_t, q * k_t])    per position
    pooled = sum_t w_t * k_t                         (B, k)

Padding positions (PAD_ID ids) are masked out. ``weight_normalization``
applies a masked softmax over positions; otherwise the raw (sigmoid-free)
scores scale the keys, matching the paper's description of preserving the
intensity of interest.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import glorot_normal, l2_loss
from .common import batch_moments, dice, resolve_activation, split_rng


class ASPLayer:
    """Params: ``asp_layer_{i}_weights/bias`` per attention MLP layer,
    ``asp_w``/``asp_w0`` head, plus ``asp_dice_alpha_{i}`` and frozen
    normalization moments ``asp_dice_mean_{i}``/``asp_dice_var_{i}`` when
    the Dice activation is selected (reference DIN ctor args
    att_hidden_units, att_activation, att_weight_normalization —
    DIN.py:20-60). Training normalizes with batch moments (the paper's
    mini-batch E[s]/Var[s]); inference uses the stored moments so serving
    predictions are batch-composition-invariant (set them via
    Trainer.calibrate, which runs at the end of fit)."""

    def __init__(
        self,
        embedding_size,
        att_hidden_units=(80, 40),
        activation="dice",
        weight_normalization=False,
        l2_reg=0.0,
        prefix="",
    ):
        self.embedding_size = embedding_size
        self.att_hidden_units = tuple(att_hidden_units)
        self.use_dice = activation == "dice"
        self.activation = None if self.use_dice else resolve_activation(activation)
        self.weight_normalization = weight_normalization
        self.l2_reg = l2_reg
        self.prefix = prefix

    def init(self, key) -> dict:
        dims = (4 * self.embedding_size,) + self.att_hidden_units
        keys = split_rng(key, len(self.att_hidden_units) + 1)
        params = {}
        for i in range(len(self.att_hidden_units)):
            params[f"{self.prefix}asp_layer_{i}_weights"] = glorot_normal(
                keys[i], (dims[i], dims[i + 1])
            )
            params[f"{self.prefix}asp_layer_{i}_bias"] = jnp.zeros(
                (dims[i + 1],), dtype=jnp.float32
            )
            if self.use_dice:
                params[f"{self.prefix}asp_dice_alpha_{i}"] = jnp.zeros(
                    (dims[i + 1],), dtype=jnp.float32
                )
                # frozen inference moments; never receive gradient (unused
                # in the training path) — written by Trainer.calibrate
                params[f"{self.prefix}asp_dice_mean_{i}"] = jnp.zeros(
                    (dims[i + 1],), dtype=jnp.float32
                )
                params[f"{self.prefix}asp_dice_var_{i}"] = jnp.ones(
                    (dims[i + 1],), dtype=jnp.float32
                )
        params[f"{self.prefix}asp_w"] = glorot_normal(keys[-1], (dims[-1], 1))
        params[f"{self.prefix}asp_w0"] = jnp.zeros((1,), dtype=jnp.float32)
        return params

    def apply(self, params, queries, keys, key_mask, training=True, rng=None,
              moment_capture=None):
        """queries (B, k); keys (B, L, k); key_mask (B, L) bool.

        ``moment_capture``: optional dict filled with {moment param name:
        traced batch-moment value} — Trainer.calibrate runs one training
        forward with this to freeze inference moments."""
        B, L, k = keys.shape
        q = jnp.broadcast_to(queries[:, None, :], (B, L, k))
        x = jnp.concatenate([q, keys, q - keys, q * keys], axis=-1)  # (B, L, 4k)
        x = x.reshape(B * L, 4 * k)

        for i in range(len(self.att_hidden_units)):
            x = (
                x @ params[f"{self.prefix}asp_layer_{i}_weights"]
                + params[f"{self.prefix}asp_layer_{i}_bias"]
            )
            if self.use_dice:
                if training:
                    mean, var = batch_moments(x)
                    if moment_capture is not None:
                        moment_capture[f"{self.prefix}asp_dice_mean_{i}"] = mean
                        moment_capture[f"{self.prefix}asp_dice_var_{i}"] = var
                else:
                    mean = params[f"{self.prefix}asp_dice_mean_{i}"]
                    var = params[f"{self.prefix}asp_dice_var_{i}"]
                x = dice(x, params[f"{self.prefix}asp_dice_alpha_{i}"], mean, var)
            else:
                x = self.activation(x)

        scores = (x @ params[f"{self.prefix}asp_w"] + params[f"{self.prefix}asp_w0"]).reshape(B, L)

        if self.weight_normalization:
            scores = jnp.where(key_mask, scores, -1e9)
            weights = jnp.exp(scores - jnp.max(scores, axis=1, keepdims=True))
            weights = weights / jnp.maximum(jnp.sum(weights, axis=1, keepdims=True), 1e-9)
        else:
            weights = jnp.where(key_mask, scores, 0.0)

        return jnp.einsum("bl,blk->bk", weights, keys)  # (B, k)

    def l2(self, params):
        total = self.l2_reg * l2_loss(params[f"{self.prefix}asp_w"])
        for i in range(len(self.att_hidden_units)):
            total += self.l2_reg * l2_loss(params[f"{self.prefix}asp_layer_{i}_weights"])
        return total

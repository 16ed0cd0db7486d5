"""MLP tower + input combiner (reference recman/tf/core/layers.py:484-628)."""

from __future__ import annotations

import jax.numpy as jnp

from ..utils import compute_hidden_units_s2, glorot_normal, l2_loss
from .common import batch_moments, dice, dropout, resolve_activation, split_rng


def dnn_combine(inputs: list) -> jnp.ndarray:
    """Flatten each input to (B, -1) and concat — reference DNNCombiner
    (layers.py:484-501). Accepts (B, F, k) embeddings and (B,) / (B, d)
    dense columns."""
    flat = []
    for x in inputs:
        if x.ndim == 1:
            x = x[:, None]
        flat.append(x.reshape(x.shape[0], -1))
    return jnp.concatenate(flat, axis=1)


class DNN:
    """Plain MLP with a final 1-logit projection.

    Reference layers.py:504-628. Param names match: ``dnn_layer_{i}_weights``
    / ``dnn_layer_{i}_bias`` / ``dnn_w`` / ``dnn_w0``. ``None`` entries in
    hidden_units auto-size via the 2/3-rule (layers.py:581-585).

    Dropout (keep-prob) is applied to the input (keep[0]) and after every
    activation (keep[i+1]) — layers.py:589-604; len(dropout) must be
    len(hidden_units) + 1.

    ``activation="dice"`` (DIN paper §4.3, the reference's broken
    activation.py:8-50) adds per-layer ``dnn_dice_alpha_{i}`` params plus
    frozen inference moments ``dnn_dice_mean_{i}``/``dnn_dice_var_{i}``:
    training normalizes with batch moments, inference with the stored
    moments (batch-composition-invariant; see Trainer.calibrate).
    """

    def __init__(
        self,
        input_dim,
        hidden_units,
        dropout_keep,
        activation,
        l2_reg=1e-5,
        prefix="",
    ):
        assert len(hidden_units) > 0
        assert len(hidden_units) + 1 == len(dropout_keep)
        if any(u is None for u in hidden_units):
            hidden_units = compute_hidden_units_s2(len(hidden_units), input_dim)
        self.input_dim = input_dim
        self.hidden_units = tuple(hidden_units)
        self.dropout_keep = tuple(dropout_keep)
        self.use_dice = activation == "dice"
        self.activation = None if self.use_dice else resolve_activation(activation)
        self.l2_reg = l2_reg
        self.prefix = prefix

    def init(self, key) -> dict:
        dims = (self.input_dim,) + self.hidden_units
        keys = split_rng(key, len(self.hidden_units) + 1)
        params = {}
        for i in range(len(self.hidden_units)):
            params[f"{self.prefix}dnn_layer_{i}_weights"] = glorot_normal(
                keys[i], (dims[i], dims[i + 1])
            )
            params[f"{self.prefix}dnn_layer_{i}_bias"] = jnp.zeros(
                (dims[i + 1],), dtype=jnp.float32
            )
            if self.use_dice:
                params[f"{self.prefix}dnn_dice_alpha_{i}"] = jnp.zeros(
                    (dims[i + 1],), dtype=jnp.float32
                )
                params[f"{self.prefix}dnn_dice_mean_{i}"] = jnp.zeros(
                    (dims[i + 1],), dtype=jnp.float32
                )
                params[f"{self.prefix}dnn_dice_var_{i}"] = jnp.ones(
                    (dims[i + 1],), dtype=jnp.float32
                )
        params[f"{self.prefix}dnn_w"] = glorot_normal(keys[-1], (dims[-1], 1))
        params[f"{self.prefix}dnn_w0"] = jnp.zeros((1,), dtype=jnp.float32)
        return params

    def apply(self, params, inputs, training=True, rng=None, moment_capture=None):
        assert inputs.ndim == 2
        rngs = split_rng(rng, len(self.hidden_units) + 1)

        y = dropout(rngs[0], inputs, self.dropout_keep[0], training)
        for i in range(len(self.hidden_units)):
            y = (
                y @ params[f"{self.prefix}dnn_layer_{i}_weights"]
                + params[f"{self.prefix}dnn_layer_{i}_bias"]
            )
            if self.use_dice:
                if training:
                    mean, var = batch_moments(y)
                    if moment_capture is not None:
                        moment_capture[f"{self.prefix}dnn_dice_mean_{i}"] = mean
                        moment_capture[f"{self.prefix}dnn_dice_var_{i}"] = var
                else:
                    mean = params[f"{self.prefix}dnn_dice_mean_{i}"]
                    var = params[f"{self.prefix}dnn_dice_var_{i}"]
                y = dice(y, params[f"{self.prefix}dnn_dice_alpha_{i}"], mean, var)
            else:
                y = self.activation(y)
            y = dropout(rngs[i + 1], y, self.dropout_keep[i + 1], training)

        return y @ params[f"{self.prefix}dnn_w"] + params[f"{self.prefix}dnn_w0"]

    def l2(self, params):
        """Layer weights + head, no biases (reference layers.py:611-628)."""
        total = self.l2_reg * l2_loss(params[f"{self.prefix}dnn_w"])
        for i in range(len(self.hidden_units)):
            total += self.l2_reg * l2_loss(params[f"{self.prefix}dnn_layer_{i}_weights"])
        return total

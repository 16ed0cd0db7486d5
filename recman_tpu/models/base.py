"""Model base: pure init/apply contract shared by the zoo.

TPU-native counterpart of the reference's abstract DeepModel contract
(_out/_loss, reference recman/tf/core/DeepModel.py:88-139) — but functional:
a model owns static structure (feature schema + hparams) and exposes

    init_params(rng)                          -> flat {name: array} pytree
    apply(params, batch, training, rng, ...)  -> (B,) predictions
    loss(params, batch, training, rng, ...)   -> scalar (data loss + L2)

Params exist before step 0 (no lazy upserts), so checkpointing and sharding
specs are static. The flat name-keyed dict mirrors the reference's
``variables`` dict (DeepModel.py:43) so checkpoints have the same shape.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..features import FeatureSet
from ..utils import binary_cross_entropy, mean_squared_error


class Model:
    """Base for all zoo models."""

    name = "model"
    # models that assert on SequenceFeat presence (DIN family) set this so
    # generic drivers (examples/model_zoo_ml.py) can filter them out of
    # schemas without behavior sequences
    requires_sequence = False
    # models whose apply() accepts moment_capture (Dice batch-moment
    # freezing — see Trainer.calibrate) set this
    supports_moment_capture = False

    def __init__(self, feat_dict: FeatureSet, task="classification"):
        assert task in ("classification", "regression")
        self.feat_dict = feat_dict
        self.task = task

    # -- contract ----------------------------------------------------------
    def init_params(self, rng) -> dict:
        raise NotImplementedError

    def apply(self, params, batch, training=True, rng=None, linear_override=None):
        raise NotImplementedError

    def l2(self, params):
        raise NotImplementedError

    # -- shared loss -------------------------------------------------------
    def data_loss(self, y_true, y_pred, weights=None):
        """BCE / MSE by task (reference utils.py:192-198)."""
        if self.task == "classification":
            return binary_cross_entropy(y_true, y_pred, weights)
        return mean_squared_error(y_true, y_pred, weights)

    def loss(self, params, batch, training=True, rng=None, weights=None):
        """data loss + sum of layer L2s (reference xDeepFM.py:106-114)."""
        preds = self.apply(params, batch, training=training, rng=rng)
        return self.data_loss(batch["y"], preds, weights) + self.l2(params)

    # -- helpers -----------------------------------------------------------
    def dense_columns(self, batch) -> list:
        """Dense inputs in schema order as (B, 1) columns (reference
        DataInputs.dense_inputs, inputs.py:88-90)."""
        return [batch[f.name][:, None] for f in self.feat_dict.dense_feats]

    @staticmethod
    def inference_dropout(keep_list):
        return tuple(1.0 for _ in keep_list)

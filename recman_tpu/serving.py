"""Serving: load a checkpoint + sidecars into a standalone predictor.

The reference has no serving layer (SURVEY.md §1: "no serving layer");
its implied flow is BestModelFinder's dill sidecars + tf.train.Checkpoint
restore (BestModelFinder.py:57-68, DeepModel.py:83-86). This makes that a
first-class surface: a Predictor rebuilds the feature schema from the
checkpoint's sidecar, restores params, and serves dataframes or
pre-encoded arrays with a compiled batched forward — including the
inference-time weight-override mechanism.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from .ckpt import load_feat_dict, load_hparams, restore_checkpoint
from .models import MODEL_REGISTRY
from .training import Trainer, create_optimizer, init_state
from .training.trainer import batch_indices


class Predictor:
    """Inference-only wrapper around a trained model."""

    def __init__(self, model, params, batch_size=4096):
        self.model = model
        self.params = params
        self.batch_size = batch_size
        self._eval_step = None

    @classmethod
    def from_checkpoint(cls, directory, model_name_or_cls, hparams=None,
                        task="classification", batch_size=4096):
        """Rebuild model + params from a Trainer.save / BestModelFinder
        checkpoint directory."""
        feat_dict = load_feat_dict(directory)
        try:
            saved_hp = load_hparams(directory)
        except FileNotFoundError:
            saved_hp = {}
        hp = dict(saved_hp)
        hp.update(hparams or {})

        model_cls = (
            MODEL_REGISTRY[model_name_or_cls]
            if isinstance(model_name_or_cls, str)
            else model_name_or_cls
        )
        model = model_cls(feat_dict, hp, task=task)

        # template state for orbax structural restore
        optimizer = create_optimizer(
            hp.get("optimizer", "adam"), float(hp.get("learning_rate", 1e-3))
        )
        template = init_state(model, optimizer, jax.random.PRNGKey(0))
        state = restore_checkpoint(directory, template)
        return cls(model, state.params, batch_size=batch_size)

    def _step(self):
        if self._eval_step is None:
            from .training.train_step import make_eval_step

            self._eval_step = make_eval_step(self.model)
        return self._eval_step

    def predict(self, X, apply_overrides=True) -> np.ndarray:
        """Batched scoring of a dataframe or encoded-array dict.

        ``apply_overrides`` activates any feat.set_weights counterfactual
        adjustments (reference xDeepFM_test.py:124-128 semantics)."""
        from .training.train_step import pack_dataset

        if isinstance(X, dict):
            data = dict(X)
        else:
            data = self.model.feat_dict.transform(X)
        n = len(next(iter(data.values())))
        if "y" not in data:
            data["y"] = np.zeros(n, dtype=np.float32)
        data, layout = pack_dataset(data)
        data = {k: jnp.asarray(v) for k, v in data.items()}

        override = None
        linear = getattr(self.model, "linear", None)
        if apply_overrides and linear is not None:
            override = jnp.asarray(linear.override_vector())

        step = self._step()
        idx = batch_indices(n, self.batch_size)
        outs = [
            np.asarray(
                step(self.params, data, jnp.asarray(idx[i]), override, False, layout)
            )
            for i in range(idx.shape[0])
        ]
        return np.concatenate(outs)[:n]

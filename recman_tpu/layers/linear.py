"""Linear (wide) tower as O(nnz) gathers instead of one-hot matmuls.

The reference materializes a one-hot design matrix — dense (LinearCombiner +
LinearLayer, layers.py:270-354) or tf.SparseTensor (SparseLinearCombiner +
SparseLinearLayer, layers.py:357-446) — then multiplies by a weight column
``linear_w`` (total_size, 1). On TPU both variants collapse to the same
mathematically-identical gather-sum over per-feature weight slices; there is
no dense/sparse split because nothing is ever one-hot materialized.

Per-feature contribution to the logit (matching utils.py:51-107 semantics):

- SparseFeat        w[offset + id]                 (OOV id 0 contributes)
- SparseValueFeat   w[offset + id] * value
- MultiValCsvFeat   sum over ids > 0 of w[offset + id]
                    (the reference zeroes the OOV column of the multi-hot,
                    utils.py:106-107, so unknown tags contribute nothing)
- MultiValSparseFeat same masked sum over ids > 0
- DenseFeat         w[offset] * value

The inference-time weight override (reference layers.py:338-345, the
mechanism behind the "penalize Outdoor by -5" demo, xDeepFM_test.py:124-127)
is an additive override vector concatenated from feat.weights, applied when
training=False.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from ..features import (
    DenseFeat,
    MultiValCsvFeat,
    MultiValSparseFeat,
    SparseFeat,
    SparseValueFeat,
)
from ..utils import l2_loss


class LinearLayer:
    """y = <onehot(x), W> + w0 via gathers. Params: ``{prefix}linear_w``
    (total_size, 1) zero-init and ``{prefix}linear_w0`` (1,) zero-init
    (reference layers.py:317-328)."""

    def __init__(self, linear_feats, l2_reg=1e-5, prefix=""):
        self.feats = list(linear_feats)
        self.l2_reg = l2_reg
        self.prefix = prefix
        self.offsets = {}
        offset = 0
        for feat in self.feats:
            self.offsets[feat.name] = offset
            offset += feat.feat_size
        self.total_size = offset

    def init(self, key=None) -> dict:
        return {
            f"{self.prefix}linear_w": jnp.zeros((self.total_size, 1), dtype=jnp.float32),
            f"{self.prefix}linear_w0": jnp.zeros((1,), dtype=jnp.float32),
        }

    def override_vector(self) -> np.ndarray:
        """Concat of per-feature override vectors, aligned to the W layout
        (reference layers.py:338-345 builds the same concat)."""
        return np.concatenate([np.asarray(f.weights, dtype=np.float32) for f in self.feats])

    def apply(self, params, batch, training=True, override=None):
        """Returns the linear logit (B, 1).

        ``override``: optional (total_size,) array added to W when not
        training (pass ``self.override_vector()`` from the host).
        """
        w = params[f"{self.prefix}linear_w"][:, 0]  # (total,) — possibly
        # tail-padded for mesh divisibility (parallel/sharding.py)
        w0 = params[f"{self.prefix}linear_w0"]
        if not training and override is not None:
            if override.shape[0] < w.shape[0]:
                override = jnp.concatenate(
                    [override, jnp.zeros(w.shape[0] - override.shape[0], w.dtype)]
                )
            w = w + override

        logit = None

        def acc(x):
            nonlocal logit
            logit = x if logit is None else logit + x

        for feat in self.feats:
            off = self.offsets[feat.name]
            if isinstance(feat, DenseFeat):
                acc(w[off] * batch[feat.name])
            elif isinstance(feat, SparseValueFeat):
                acc(jnp.take(w, off + batch[feat.name]) * batch[feat.value_key])
            elif isinstance(feat, SparseFeat):
                acc(jnp.take(w, off + batch[feat.name]))
            elif isinstance(feat, (MultiValCsvFeat, MultiValSparseFeat)):
                ids = batch[feat.name]  # (B, L)
                mask = (ids > 0).astype(w.dtype)
                rows = jnp.take(w, off + jnp.maximum(ids, 0))
                acc(jnp.sum(rows * mask, axis=1))
            else:
                raise NotImplementedError(type(feat))

        return (logit + w0)[:, None]  # (B, 1)

    def l2(self, params):
        """Reference layers.py:349-354 / 441-446."""
        return self.l2_reg * l2_loss(params[f"{self.prefix}linear_w"])


# Alias: the reference's sparse variant is computationally identical here
# (SparseLinearCombiner/SparseLinearLayer, layers.py:357-446).
SparseLinearLayer = LinearLayer

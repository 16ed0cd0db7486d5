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

import jax
import jax.numpy as jnp

from ..ops.embedding import embedding_lookup, embedding_lookup_grouped
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
        # 1-D storage: a (total, 1) f32 gets TPU layout T(1,128) whose
        # single-sublane tiles run the Adam update at 1/8 VPU efficiency
        # (profiled 1.8 ms/step on 2.6M rows); 1-D packs densely
        return {
            f"{self.prefix}linear_w": jnp.zeros((self.total_size,), dtype=jnp.float32),
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
        w = params[f"{self.prefix}linear_w"]  # (total,) — possibly
        # tail-padded for mesh divisibility (parallel/sharding.py)
        w0 = params[f"{self.prefix}linear_w0"]
        if not training and override is not None:
            if override.shape[0] < w.shape[0]:
                override = jnp.concatenate(
                    [override, jnp.zeros(w.shape[0] - override.shape[0], w.dtype)]
                )
            w = w + override
        w2 = w[:, None]

        logit = None

        def acc(x):
            nonlocal logit
            logit = x if logit is None else logit + x

        # per-feature STATIC slices of W: each slice's lookup gets the
        # scatter-free fused gradient (ops/embedding.py) scoped to that
        # feature's vocabulary instead of the whole design-matrix width;
        # same-size slices share one grouped (batched-kernel) lookup
        slices, ids_list, kinds = [], [], []
        for feat in self.feats:
            off = self.offsets[feat.name]
            if isinstance(feat, DenseFeat):
                acc(w2[off, 0] * batch[feat.name])
                continue
            w_f = jax.lax.slice_in_dim(w2, off, off + feat.feat_size, axis=0)
            slices.append(w_f)
            kinds.append(feat)
            if isinstance(feat, (MultiValCsvFeat, MultiValSparseFeat)):
                ids_list.append(jnp.maximum(batch[feat.name], 0))
            elif isinstance(feat, (SparseFeat, SparseValueFeat)):
                ids_list.append(batch[feat.name])
            else:
                raise NotImplementedError(type(feat))

        rows_list = embedding_lookup_grouped(slices, ids_list)
        for feat, rows in zip(kinds, rows_list):
            if isinstance(feat, SparseValueFeat):
                acc(rows[:, 0] * batch[feat.value_key])
            elif isinstance(feat, SparseFeat):
                acc(rows[:, 0])
            else:  # multi-val: OOV column excluded (reference utils.py:106-107)
                mask = (batch[feat.name] > 0).astype(rows.dtype)
                acc(jnp.sum(rows[:, :, 0] * mask, axis=1))

        return (logit + w0)[:, None]  # (B, 1)

    def l2(self, params):
        """Reference layers.py:349-354 / 441-446."""
        return self.l2_reg * l2_loss(params[f"{self.prefix}linear_w"])


# Alias: the reference's sparse variant is computationally identical here
# (SparseLinearCombiner/SparseLinearLayer, layers.py:357-446).
SparseLinearLayer = LinearLayer

"""Embedding layer: per-feature tables, typed lookup dispatch, sqrtn combine.

TPU-native counterpart of FeatEmbedding / FeatEmbeddingLayer (reference
recman/tf/core/layers.py:68-267). Tables are created eagerly at init (the
reference upserts them lazily on first call, layers.py:95-110 — a property
its checkpointing depends on; params existing before step 0 is strictly
better). Lookup dispatch by feature type mirrors layers.py:117-184:

- SparseFeat        -> table[id]                                  (B, 1, k)
- SparseValueFeat   -> table[id] * value                          (B, 1, k)
- MultiVal*Feat     -> sqrtn-combine over present ids             (B, 1, k)
- SequenceFeat      -> lookup into the TIED id-feature table,
                       padding rows zeroed                        (B, L, k)

"sqrtn" combine = sum(rows)/sqrt(count), the reference's
embedding_lookup_sparse combiner (layers.py:150-156). Padding ids (PAD_ID)
are masked out; OOV id 0 participates — exactly like the reference, where
unknown CSV tags map to hash-table default 0 and are still looked up
(utils.py:117-123).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..features import (
    DenseFeat,
    MultiValCsvFeat,
    MultiValSparseFeat,
    SequenceFeat,
    SparseFeat,
    SparseValueFeat,
)
from ..ops.embedding import embedding_lookup, embedding_lookup_grouped
from ..utils import glorot_normal, l2_loss
from .common import split_rng


def sqrtn_combine(table, ids):
    """Combine rows of ``table`` for padded id lists ``ids`` (B, L).

    Returns (B, k): sum of present rows / sqrt(#present). Rows with no
    present ids yield zeros.
    """
    mask = (ids >= 0).astype(table.dtype)  # (B, L)
    rows = embedding_lookup(table, jnp.maximum(ids, 0))  # (B, L, k)
    summed = jnp.einsum("blk,bl->bk", rows, mask)
    count = jnp.sum(mask, axis=1, keepdims=True)
    return summed * jnp.where(count > 0, 1.0 / jnp.sqrt(jnp.maximum(count, 1.0)), 0.0)


class EmbeddingLayer:
    """All embedding tables for a FeatureSet; returns concat field embeddings.

    Reference: FeatEmbeddingLayer (layers.py:196-267). Param names match the
    reference variable names: ``{prefix}{feat}_feat_embed`` (feat_size, k)
    and ``{prefix}{feat}_feat_bias`` (feat_size, 1).
    """

    def __init__(self, feature_set, embedding_size, l2_reg=1e-5, use_bias=True, prefix=""):
        self.feats = feature_set.embedding_feats
        self.embedding_size = embedding_size
        self.l2_reg = l2_reg
        self.use_bias = use_bias
        self.prefix = prefix

    @property
    def field_size(self) -> int:
        """Number of field slots on the concat axis (sequence feats occupy
        max_len slots, reference layers.py:171-184 + concat at 238-261)."""
        return sum(
            f.max_len if isinstance(f, SequenceFeat) else 1 for f in self.feats
        )

    def _owns_table(self, feat) -> bool:
        return not isinstance(feat, SequenceFeat)  # sequence feats tie to id_feat

    def _is_qr(self, feat) -> bool:
        """QR compositional embedding (features/schema.py qr_collisions):
        quotient + remainder tables replace the full (V, k) table."""
        return (
            getattr(feat, "qr_collisions", None) is not None
            and self._owns_table(feat)
        )

    def init(self, key) -> dict:
        params = {}
        owners = [f for f in self.feats if self._owns_table(f)]
        keys = split_rng(key, max(len(owners), 1))
        for sub, feat in zip(keys, owners):
            name = f"{self.prefix}{feat.name}_feat_embed"
            if self._is_qr(feat):
                if not isinstance(feat, SparseFeat) or isinstance(
                    feat, SparseValueFeat
                ):
                    raise NotImplementedError(
                        "qr_collisions is supported for single-id sparse "
                        f"features only (got {type(feat).__name__} for "
                        f"{feat.name!r})"
                    )
                q = int(feat.qr_collisions)
                assert 1 < q < feat.feat_size, (
                    f"qr_collisions for {feat.name!r} must be in "
                    f"(1, feat_size); got {q} vs {feat.feat_size}"
                )
                kq, kr = split_rng(sub, 2)
                params[f"{name}_q"] = glorot_normal(
                    kq, (-(-feat.feat_size // q), self.embedding_size)
                )
                params[f"{name}_r"] = glorot_normal(
                    kr, (q, self.embedding_size)
                )
            else:
                params[name] = glorot_normal(
                    sub, (feat.feat_size, self.embedding_size)
                )
            if self.use_bias:
                # 1-D storage (see layers/linear.py init: (V, 1) tiles as
                # T(1,128), 8x lane-padded update traffic). QR features
                # keep the full-size bias — a (V,) vector is not the
                # memory problem the QR tables solve.
                params[f"{self.prefix}{feat.name}_feat_bias"] = jnp.zeros(
                    (feat.feat_size,), dtype=jnp.float32
                )
        return params

    def _qr_rows(self, params, feat, ids):
        """rows(id) = Q[id // q] + R[id % q] — each id keeps a unique
        composed vector while memory shrinks to (V/q + q) rows."""
        q = int(feat.qr_collisions)
        tq = params[f"{self.prefix}{feat.name}_feat_embed_q"]
        tr = params[f"{self.prefix}{feat.name}_feat_embed_r"]
        return embedding_lookup(tq, ids // q) + embedding_lookup(tr, ids % q)

    def _tables(self, params, feat):
        owner = feat.id_feat.name if isinstance(feat, SequenceFeat) else feat.name
        table = params[f"{self.prefix}{owner}_feat_embed"]
        bias = params.get(f"{self.prefix}{owner}_feat_bias") if self.use_bias else None
        if bias is not None:
            bias = bias[:, None]  # stored 1-D; lookups want (V, 1)
        return table, bias

    def _lookup(self, params, feat, batch):
        """Per-feature lookup -> (embeds (B, n_slots, k), bias (B, n_slots, 1))."""
        if self._is_qr(feat):
            ids = batch[feat.name]
            embeds = self._qr_rows(params, feat, ids)[:, None, :]
            bias = None
            if self.use_bias:
                bias_vec = params[f"{self.prefix}{feat.name}_feat_bias"]
                bias = embedding_lookup(bias_vec[:, None], ids)[:, None, :]
            return embeds, bias
        table, bias_table = self._tables(params, feat)

        def one(t, width):
            if isinstance(feat, SparseFeat):
                return embedding_lookup(t, batch[feat.name])[:, None, :]
            if isinstance(feat, SparseValueFeat):
                rows = embedding_lookup(t, batch[feat.name])
                return (rows * batch[feat.value_key][:, None])[:, None, :]
            if isinstance(feat, (MultiValCsvFeat, MultiValSparseFeat)):
                return sqrtn_combine(t, batch[feat.name])[:, None, :]
            if isinstance(feat, SequenceFeat):
                ids = batch[feat.name]
                mask = (ids >= 0).astype(t.dtype)[:, :, None]
                return embedding_lookup(t, jnp.maximum(ids, 0)) * mask
            raise NotImplementedError(type(feat))

        embeds = one(table, self.embedding_size)
        bias = one(bias_table, 1) if bias_table is not None else None
        return embeds, bias

    def apply(self, params, batch):
        """Concat lookups along the field axis.

        Returns (embeds (B, F, k), bias (B, F, 1) | None) — reference
        FeatEmbeddingLayer.__call__ (layers.py:238-261). Plain sparse
        fields go through one grouped (batched-kernel) lookup; see
        ops.embedding_lookup_grouped.
        """
        plain = [
            f for f in self.feats
            if isinstance(f, SparseFeat) and not isinstance(f, SparseValueFeat)
            and not self._is_qr(f)  # QR feats have no single (V, k) table
        ]
        embeds_by_name, bias_by_name = {}, {}
        if plain:
            rows = embedding_lookup_grouped(
                [params[f"{self.prefix}{f.name}_feat_embed"] for f in plain],
                [batch[f.name] for f in plain],
            )
            for f, r in zip(plain, rows):
                embeds_by_name[f.name] = r[:, None, :]
            if self.use_bias:
                brows = embedding_lookup_grouped(
                    [params[f"{self.prefix}{f.name}_feat_bias"][:, None] for f in plain],
                    [batch[f.name] for f in plain],
                )
                for f, r in zip(plain, brows):
                    bias_by_name[f.name] = r[:, None, :]

        embeds, biases = [], []
        for feat in self.feats:
            if feat.name in embeds_by_name:
                e = embeds_by_name[feat.name]
                b = bias_by_name.get(feat.name)
            else:
                e, b = self._lookup(params, feat, batch)
            embeds.append(e)
            if b is not None:
                biases.append(b)
        out = jnp.concatenate(embeds, axis=1)
        bias = jnp.concatenate(biases, axis=1) if (self.use_bias and biases) else None
        return out, bias

    def apply_dict(self, params, batch) -> dict:
        """Per-feature embeddings keyed by name (for DIN's query/key split,
        reference DIN.py:90-95 uses feat_embeds_dict)."""
        return {f.name: self._lookup(params, f, batch)[0] for f in self.feats}

    def l2(self, params):
        """Summed per-table L2 (reference layers.py:188-193, 263-267).

        Under stacked table storage (ops.embedding.stacked_tables) the
        stacked feats' tables live in one (T, V, k) leaf: their L2 is one
        reduce over the stack (mathematically the per-table sum; reduce
        order differs in the last bits)."""
        from ..ops.embedding import _stacked_ctx

        sc = _stacked_ctx()
        stacked_names = ()
        if sc is not None:
            # Mirror packed.apply's exact-match gate: substitute the
            # stack's L2 only when the ctx tuple is exactly this layer's
            # owned feats in order (same names, same sequence). A
            # partially-matching ctx makes the forward fall back to
            # per-table lookups, so l2 must charge the per-table leaves
            # too — substituting the (wrong) stack would silently skew
            # the regularization term (round-4 advisor finding).
            in_ctx = set(sc[0])
            own = tuple(
                f.name for f in self.feats
                if self._owns_table(f) and not self._is_qr(f)
                and f.name in in_ctx
            )
            if own == sc[0]:
                stacked_names = in_ctx
        total = 0.0
        stacked_hit = False
        for feat in self.feats:
            if not self._owns_table(feat):
                continue
            if feat.name in stacked_names:
                stacked_hit = True
                continue
            if self._is_qr(feat):
                total += self.l2_reg * (
                    l2_loss(params[f"{self.prefix}{feat.name}_feat_embed_q"])
                    + l2_loss(params[f"{self.prefix}{feat.name}_feat_embed_r"])
                )
            else:
                total += self.l2_reg * l2_loss(
                    params[f"{self.prefix}{feat.name}_feat_embed"]
                )
        if stacked_hit:
            total += self.l2_reg * l2_loss(sc[1])
        return total

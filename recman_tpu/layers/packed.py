"""Packed embedding + linear lookup: one gather/scatter per feature.

Per-row random HBM access dominates the sparse part of a CTR train step
(~30-70 ns/row; see ops/embedding.py). A model with both an embedding
tower and a linear tower pays it TWICE per feature — once for the (V, k)
table, once for the (V,) linear-weight slice — plus once more for bias
tables. This layer concatenates, per feature, [table | bias | w_slice]
into a (V, k+2) matrix at apply time (static concat, sequential HBM
traffic, adjoint = cheap slices) so each feature does ONE gather forward
and ONE sorted scatter backward.

Parameters stay owned by EmbeddingLayer / LinearLayer under their
reference-parity names — this is purely an execution-path optimization;
checkpoints are unchanged. Semantics are identical to running the two
towers separately (covered by parity tests):

- embedding combine masks ids >= 0 (sqrtn), linear masks ids > 0
  (reference utils.py:106-107 excludes the OOV column)
- SparseValueFeat scales both parts by the value
- the inference-time linear weight override applies to the w column only
- dense features only contribute to the linear logit

Features not present in both towers (or SequenceFeat's tied tables) fall
back to the unpacked per-layer paths.
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
from ..ops.embedding import (
    _split_lookup_active,
    _stacked_ctx,
    embedding_lookup,
    embedding_lookup_grouped,
    packed_lookup_grouped,
    packed_lookup_stacked,
)


class PackedEmbeddingLinear:
    """Fused apply over an EmbeddingLayer and a LinearLayer."""

    def __init__(self, embeddings, linear):
        self.embeddings = embeddings
        self.linear = linear
        linear_names = {f.name for f in linear.feats}
        self.packable = [
            f
            for f in embeddings.feats
            if f.name in linear_names and not isinstance(f, SequenceFeat)
            # QR features have no single (V, k) table to pack; they route
            # through the unpacked quotient+remainder lookups
            and getattr(f, "qr_collisions", None) is None
        ]
        self._packable_names = {f.name for f in self.packable}

    def stackable(self):
        """Ordered name tuple of packable feats eligible for stacked
        (T, V, k) table storage (ops.embedding.stacked_tables), or None.

        Eligible = every packable feat is a 1-D-id sparse feat (no
        multi-val row matrices), all share one feat_size, and the
        embedding tower is bias-free — so one (T, V, k) leaf plus the
        linear-w columns reconstructs every packed matrix."""
        if self.embeddings.use_bias or not self.packable:
            return None
        if len({f.feat_size for f in self.packable}) != 1:
            return None
        for f in self.packable:
            if isinstance(f, (MultiValCsvFeat, MultiValSparseFeat)):
                return None
        return tuple(f.name for f in self.packable)

    def _linear_w(self, params, training, override):
        w = params[f"{self.linear.prefix}linear_w"]
        if not training and override is not None:
            if override.shape[0] < w.shape[0]:
                override = jnp.concatenate(
                    [override, jnp.zeros(w.shape[0] - override.shape[0], w.dtype)]
                )
            w = w + override
        return w

    def apply(self, params, batch, training=True, override=None):
        """Returns (feat_embeds (B,F,k), feat_bias (B,F,1)|None, linear_logit (B,1))."""
        emb = self.embeddings
        lin = self.linear
        k = emb.embedding_size
        use_bias = emb.use_bias
        w = self._linear_w(params, training, override)

        from ..ops.embedding import QuantTable, _dedup_ctx

        # under the dedup all-to-all exchange, packed [table|bias|w]
        # temporaries would break the even row sharding the exchange
        # needs; run the towers unpacked so each (padded) table routes
        # through the exchange directly. Same for int8 QuantTable params
        # (quantized serving): the packed f32 concat would defeat the
        # gather-then-dequantize path
        quant = any(
            isinstance(
                params.get(f"{emb.prefix}{f.name}_feat_embed"), QuantTable
            )
            for f in self.packable
        )
        packable = [] if (_dedup_ctx() is not None or quant) else self.packable
        packable_names = {f.name for f in packable}

        embeds_by_name, bias_by_name = {}, {}
        linear_logit = params[f"{lin.prefix}linear_w0"]

        ids_mats = []
        for feat in packable:
            if isinstance(feat, (MultiValCsvFeat, MultiValSparseFeat)):
                ids_mats.append(jnp.maximum(batch[feat.name], 0))
            else:
                ids_mats.append(batch[feat.name])

        sc = _stacked_ctx()
        if (
            sc is not None
            and not use_bias
            and tuple(f.name for f in packable) == sc[0]
        ):
            # stacked (T, V, k) table storage (ops.embedding.stacked_tables):
            # ONE concat builds every packed [table|w] matrix as a (T, V,
            # k+1) stack, forward gathers stay per-table (slices of the
            # stack), and the batched segmat backward's (T, k+1, V) grad
            # reaches the stacked leaf + linear_w with no per-table
            # split/re-stack — and the optimizer sweeps the tables as a
            # single fusion instead of T
            stack = sc[1]
            v = packable[0].feat_size
            w_cols = jnp.stack([
                w[lin.offsets[f.name]: lin.offsets[f.name] + v]
                for f in packable
            ])  # (T, V)
            from ..ops import embedding as _emb_ops
            from ..ops.embedding import packed_lookup_stacked_split

            _bf16 = _emb_ops._packed_fwd_bf16_active()
            if _emb_ops.STACKED_SPLIT_CONCAT:
                s, wc = stack[:, :v], w_cols
                if _bf16:
                    s, wc = s.astype(jnp.bfloat16), wc.astype(jnp.bfloat16)
                rows_list = packed_lookup_stacked_split(s, wc, ids_mats)
            else:
                packed_stack = jnp.concatenate(
                    [stack[:, :v], w_cols[:, :, None]], axis=2
                )
                if _bf16:
                    packed_stack = packed_stack.astype(jnp.bfloat16)
                rows_list = packed_lookup_stacked(packed_stack, ids_mats)
            if _bf16:
                rows_list = [r.astype(jnp.float32) for r in rows_list]
        elif _split_lookup_active():
            # phase 1/2 (split form): gather table rows and vector columns
            # SEPARATELY — no (V, k+m) packed concat ever materializes
            # (ops.embedding._lookup_multi_split has the profile-measured
            # rationale); output rows are identical to the concat form
            tables, vec_cols = [], []
            for feat in packable:
                table = params[f"{emb.prefix}{feat.name}_feat_embed"]
                tables.append(table[: feat.feat_size])
                vv = []
                if use_bias:
                    vv.append(
                        params[f"{emb.prefix}{feat.name}_feat_bias"][: feat.feat_size]
                    )
                off = lin.offsets[feat.name]
                vv.append(w[off : off + feat.feat_size])
                vec_cols.append(tuple(vv))
            rows_list = packed_lookup_grouped(tables, vec_cols, ids_mats)
        else:
            # phase 1: build each feature's packed [table|bias|w] matrix
            packed_mats = []
            for feat in packable:
                # tables may carry mesh-divisibility tail padding
                # (parallel/sharding.py); slice back to the logical vocab so
                # all packed columns agree
                table = params[f"{emb.prefix}{feat.name}_feat_embed"]
                cols = [table[: feat.feat_size]]
                if use_bias:
                    cols.append(
                        params[f"{emb.prefix}{feat.name}_feat_bias"][: feat.feat_size, None]
                    )
                off = lin.offsets[feat.name]
                cols.append(w[off : off + feat.feat_size][:, None])
                packed_mats.append(jnp.concatenate(cols, axis=1))  # (V, k [+1] +1)

            from ..ops import embedding as _emb_ops

            _bf16 = _emb_ops._packed_fwd_bf16_active()
            if _bf16:
                # halve the packed-path bytes end to end (see
                # ops.embedding.PACKED_FWD_BF16 for the measured gating)
                packed_mats = [m.astype(jnp.bfloat16) for m in packed_mats]

            # phase 2: grouped lookup — same-shape features share one batched
            # sort/permute in the backward (ops.embedding_lookup_grouped)
            rows_list = embedding_lookup_grouped(packed_mats, ids_mats)
            if _bf16:
                # consumers (CIN custom-vjp residuals, DNN) keep their f32
                # contracts; the cast's vjp turns their f32 cotangents back
                # into bf16 BEFORE the sort/permute/segmat streams, so the
                # backward keeps the halved bytes. Batch-sized cast only.
                rows_list = [r.astype(jnp.float32) for r in rows_list]

        # phase 3: per-type postprocessing
        for feat, rows in zip(packable, rows_list):
            if isinstance(feat, SparseValueFeat):
                rows = rows * batch[feat.value_key][:, None]
                embeds_by_name[feat.name] = rows[:, None, :k]
                if use_bias:
                    bias_by_name[feat.name] = rows[:, None, k : k + 1]
                linear_logit = linear_logit + rows[:, -1:]
            elif isinstance(feat, SparseFeat):
                embeds_by_name[feat.name] = rows[:, None, :k]
                if use_bias:
                    bias_by_name[feat.name] = rows[:, None, k : k + 1]
                linear_logit = linear_logit + rows[:, -1:]
            else:  # multi-val
                ids = batch[feat.name]  # (B, L)
                present = (ids >= 0).astype(rows.dtype)
                combined = jnp.einsum("blw,bl->bw", rows, present)
                count = jnp.sum(present, axis=1, keepdims=True)
                sqrtn = combined * jnp.where(
                    count > 0, 1.0 / jnp.sqrt(jnp.maximum(count, 1.0)), 0.0
                )
                embeds_by_name[feat.name] = sqrtn[:, None, :k]
                if use_bias:
                    bias_by_name[feat.name] = sqrtn[:, None, k : k + 1]
                # linear: plain sum over ids > 0 (OOV excluded)
                pos = (ids > 0).astype(rows.dtype)
                linear_logit = linear_logit + jnp.einsum(
                    "bl,bl->b", rows[:, :, -1], pos
                )[:, None]

        # unpacked remainder of the embedding tower (tied/sequence feats,
        # feats outside the linear selector)
        embeds, biases = [], []
        for feat in emb.feats:
            if feat.name in packable_names:
                e = embeds_by_name[feat.name]
                b = bias_by_name.get(feat.name)
            else:
                e, b = emb._lookup(params, feat, batch)
            embeds.append(e)
            if b is not None:
                biases.append(b)
        feat_embeds = jnp.concatenate(embeds, axis=1)
        feat_bias = (
            jnp.concatenate(biases, axis=1) if (use_bias and biases) else None
        )

        # unpacked remainder of the linear tower (dense feats + any sparse
        # feats not in the embedding tower)
        for feat in lin.feats:
            off = lin.offsets[feat.name]
            if isinstance(feat, DenseFeat):
                linear_logit = linear_logit + (w[off] * batch[feat.name])[:, None]
            elif feat.name not in packable_names:
                w_f = w[off : off + feat.feat_size][:, None]
                if isinstance(feat, SparseValueFeat):
                    linear_logit = linear_logit + (
                        embedding_lookup(w_f, batch[feat.name])[:, 0]
                        * batch[feat.value_key]
                    )[:, None]
                elif isinstance(feat, SparseFeat):
                    linear_logit = (
                        linear_logit + embedding_lookup(w_f, batch[feat.name])
                    )
                elif isinstance(feat, (MultiValCsvFeat, MultiValSparseFeat)):
                    ids = batch[feat.name]
                    mask = (ids > 0).astype(w.dtype)
                    rows = embedding_lookup(w_f, jnp.maximum(ids, 0))[:, :, 0]
                    linear_logit = linear_logit + jnp.sum(rows * mask, axis=1)[:, None]

        return feat_embeds, feat_bias, linear_logit

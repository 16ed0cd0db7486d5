"""Partition-spec inference for model params: which arrays row-shard.

Row-sharded embedding tables are the one genuinely model-parallel component
of a CTR stack (SURVEY.md §2.8): a table ``(feat_size, k)`` shards its
vocabulary rows over the ``model`` axis; lookups against it are partitioned
by the XLA SPMD partitioner into local masked gathers + an all-reduce of
the selected rows over ICI — the collective-based equivalent of the DLRM
all-to-all exchange, chosen here because it keeps every shape static and
lets XLA fuse the combine.

Small tables (below ``row_shard_threshold`` rows) stay replicated: the
all-reduce would cost more than the memory saved. Dense tower weights are
replicated (DP); wide-tower TP is a separate opt-in.
"""

from __future__ import annotations

from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import MODEL_AXIS


def param_specs(params: dict, row_shard_threshold=50_000,
                tp_dense_threshold=None) -> dict:
    """name -> PartitionSpec for a flat param dict.

    Row-shards ``*_feat_embed`` / ``*_feat_bias`` tables and the linear
    tower's vocab-length ``linear_w`` when their row count crosses the
    threshold AND divides the mesh's model axis (checked at placement).

    ``tp_dense_threshold``: when set, DNN tower matrices whose size
    crosses it get tensor-parallel sharding over the model axis —
    Megatron-style alternation (even layers column-sharded, odd layers
    row-sharded) so the partitioner inserts one all-reduce per pair
    instead of one per layer; per-layer bias follows its layer's output
    sharding.
    """
    import re

    specs = {}
    for name, value in params.items():
        rows = value.shape[0] if value.ndim else 0
        is_vocab_array = (
            name.endswith("_feat_embed")
            or name.endswith("_feat_embed_q")  # QR quotient table: its
            # rows scale with V/q and row-shard like a full table (ids//q
            # address it directly, so tail padding stays unaddressed)
            or name.endswith("_feat_bias")
            or name.endswith("linear_w")
        )
        if is_vocab_array and value.ndim >= 1 and rows >= row_shard_threshold:
            specs[name] = P(MODEL_AXIS, *([None] * (value.ndim - 1)))
            continue
        if tp_dense_threshold is not None:
            m = re.search(r"dnn_layer_(\d+)_(weights|bias)$", name)
            if m and value.size >= tp_dense_threshold:
                layer, kind = int(m.group(1)), m.group(2)
                col_sharded = layer % 2 == 0  # Megatron alternation
                if kind == "weights":
                    specs[name] = (
                        P(None, MODEL_AXIS) if col_sharded else P(MODEL_AXIS, None)
                    )
                else:
                    specs[name] = P(MODEL_AXIS) if col_sharded else P()
                continue
        specs[name] = P()
    return specs


def pad_vocab_for_mesh(feat_size: int, model_axis_size: int) -> int:
    """Round a vocabulary up so rows divide the model axis (padding rows are
    dead weight the OOV row scheme never addresses)."""
    r = feat_size % model_axis_size
    return feat_size if r == 0 else feat_size + (model_axis_size - r)


def place_params(params: dict, mesh, specs: dict | None = None,
                 row_shard_threshold=50_000) -> dict:
    """device_put every param with its inferred NamedSharding.

    Vocab arrays whose row count doesn't divide the model axis (the +1 OOV
    row guarantees this for power-of-two bucket counts) are zero-padded at
    the tail to the next multiple: ids never address the pad rows, their
    gradients and L2 (sum of squares of zeros) are exactly zero, so
    semantics are unchanged — only the stored shape grows.
    """
    import jax
    import numpy as np

    specs = specs or param_specs(params, row_shard_threshold)
    model_n = mesh.shape[MODEL_AXIS]
    placed = {}
    for name, value in params.items():
        spec = specs[name]
        is_vocab_array = (
            name.endswith("_feat_embed")
            or name.endswith("_feat_embed_q")
            or name.endswith("_feat_bias")
            or name.endswith("linear_w")
        )
        if spec != P():
            if is_vocab_array:
                # vocab rows pad safely: ids never address the tail
                rows = value.shape[0]
                padded_rows = pad_vocab_for_mesh(rows, model_n)
                if padded_rows != rows:
                    pad_width = [(0, padded_rows - rows)] + [(0, 0)] * (value.ndim - 1)
                    value = jax.numpy.asarray(np.pad(np.asarray(value), pad_width))
            else:
                # dense (TP) dims are structural — replicate when they
                # don't divide the axis
                for dim, axis_name in enumerate(spec):
                    if axis_name == MODEL_AXIS and value.shape[dim] % model_n != 0:
                        spec = P()
                        break
        placed[name] = jax.device_put(value, NamedSharding(mesh, spec))
    return placed

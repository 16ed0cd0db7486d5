"""Explicit sharded embedding lookup via shard_map (masked gather + psum).

The default SPMD path lets the XLA partitioner decide how to execute a
gather against a row-sharded table. This module is the EXPLICIT version
of that exchange — each model shard gathers the rows it owns (ids outside
its range masked to zero) and an ICI all-reduce over the ``model`` axis
assembles full rows everywhere:

    rows = psum_over_model( mask(ids in my range) * my_shard[ids - base] )

This is communication-equivalent to what the partitioner emits, but
written out it becomes the substrate for the round-2 optimization SURVEY
§2.8 calls the hard part: deduplicating ids on-device (sort + run-length)
and switching the exchange to all_to_all so each row crosses ICI once
instead of being reduced across all shards.

Not yet wired into ShardedTrainer (the partitioner path performs the same
collectives); covered by CPU-mesh equivalence tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def sharded_embedding_lookup(table, ids, mesh, shard_batch=True):
    """Gather rows ``ids`` (B,) from ``table`` (V, k) row-sharded over
    MODEL_AXIS. V must divide the model axis (see sharding.pad_vocab_for_mesh).

    ``shard_batch``: ids/output sharded over DATA_AXIS (the usual DP
    layout); False keeps them replicated.
    """
    v, k = table.shape
    n_shards = mesh.shape[MODEL_AXIS]
    assert v % n_shards == 0, f"vocab {v} must divide model axis {n_shards}"
    rows_per = v // n_shards

    batch_spec = P(DATA_AXIS) if shard_batch else P()

    def local(table_shard, ids_local):
        my = jax.lax.axis_index(MODEL_AXIS)
        rel = ids_local.astype(jnp.int32) - my * rows_per
        hit = (rel >= 0) & (rel < rows_per)
        rows = jnp.take(table_shard, jnp.clip(rel, 0, rows_per - 1), axis=0)
        rows = rows * hit[:, None].astype(rows.dtype)
        return jax.lax.psum(rows, MODEL_AXIS)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), batch_spec),
        out_specs=batch_spec,
    )(table, ids)

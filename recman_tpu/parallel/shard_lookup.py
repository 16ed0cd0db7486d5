"""Explicit sharded embedding lookups via shard_map.

Two formulations of the row-sharded-table exchange (SURVEY.md §2.8's
"hard part" — the reference recman/tf/core/layers.py:117-128 only ever
gathers from a local dense table):

1. ``sharded_embedding_lookup`` — masked gather + psum. Each model shard
   gathers the rows it owns (ids outside its range masked to zero) and an
   ICI all-reduce over ``model`` assembles full rows everywhere. This is
   communication-equivalent to what the XLA partitioner emits for a gather
   against a P('model') table: every result row crosses ICI ~2x
   (reduce-scatter + all-gather halves of the all-reduce), duplicates
   included.

2. ``dedup_embedding_lookup`` — sort + run-length dedup + capacity-bounded
   all-gather: the DLRM-style exchange (PAPERS.md: 1906.00091),
   TPU-shaped. Per model group:

       a. sort the (replicated) batch ids once, jointly with their
          original positions;
       b. run-length dedup the sorted ids: unique slot u(j) = cumsum of
          first-occurrence flags; U <= N uniques;
       c. each shard gathers ONLY the unique rows it owns — at most
          ``capacity`` of them — into a fixed (capacity, k) buffer;
       d. one all_gather over ``model`` moves each unique row across ICI
          exactly once: traffic = (S-1)·capacity·k per device, vs
          ~2·N·k for the psum path — a win of (2N / S·capacity), i.e.
          the duplication factor times 2 when capacity tracks the true
          per-shard unique count (Zipf-distributed CTR ids dedup well);
       e. every original position reads its row back from the gathered
          buffer at (owner, rank-within-owner) — a local gather computed
          from the sort, then the inverse permutation restores input
          order.

   Gradients ride the transpose of the same collectives: the all_gather
   transposes to a psum_scatter of the (capacity, k) cotangent buffers,
   so the backward exchange is capacity-bounded too.

   ``capacity`` is the MoE-style static bound on uniques owned per shard.
   ``capacity = N`` is exact for any input; the default
   ``ceil(4·N/S)`` is exact whenever hashing spreads uniques at most 4x
   unevenly (overflowing rows — beyond-capacity uniques of one shard —
   come back as zeros, never garbage). ``check_overflow`` returns the
   overflow count alongside the rows for validation runs.

Covered by CPU-mesh equivalence tests (tests/test_parallel.py) that
compare both paths and their gradients against a plain local gather.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS


def sharded_embedding_lookup(table, ids, mesh, shard_batch=True):
    """Masked-gather + psum exchange (the partitioner-equivalent baseline).

    ``table`` (V, k) row-sharded over MODEL_AXIS; V must divide the model
    axis (see sharding.pad_vocab_for_mesh). ``shard_batch``: ids/output
    sharded over DATA_AXIS (the usual DP layout); False keeps them
    replicated.
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


def default_capacity(n: int, n_shards: int, factor: float = 4.0) -> int:
    """Static per-shard unique-row bound: ceil(factor * N / S), clamped to N.

    factor=4.0 is a SAFETY default justified by measurement
    (tools/traffic_accounting.py, 2026-08-20): Zipf-RANKED id streams
    concentrate uniques up to 4.7x on one shard at S=8 (worst-table
    max-owned 1426 vs 4N/S=4096 at N=8192 — 2.9x headroom). It is NOT a
    traffic-optimal default: dedup beats psum only when capacity < N/S
    (the capacity factor IS the dedup:psum traffic ratio —
    parallel/traffic.py), which needs hashed/permuted row assignment
    plus a measured capacity ~1.5x the sample's max per-shard uniques
    (0.51·N/S measured for hashed streams). Pass ``dedup_capacity``
    from a measured sample for the win; the overflow guard catches
    underestimates. ``capacity_from_sample`` computes exactly that.
    """
    return min(n, -(-int(factor * n) // n_shards))


def capacity_from_sample(ids_by_table, n_shards: int, vocab: int,
                         safety: float = 1.5) -> int:
    """Data-driven dedup capacity from a HOST batch sample.

    The dedup:psum traffic ratio IS capacity*S/N (parallel/traffic.py),
    so a measured capacity — ``safety`` x the worst per-shard unique-row
    count over the sampled tables — is what actually realizes the
    exchange's bandwidth win (the 4N/S default is a 2.9x-headroom safety
    bound for ranked vocabularies; ~12x oversized for hashed ones —
    measured numbers in docs/sharding_guide.md). Use a sample with the
    PRODUCTION per-data-shard batch size; the runtime overflow guard
    catches under-estimates rather than corrupting training.

    ``ids_by_table``: iterable of 1-D id arrays (one per sharded table).
    """
    import numpy as np

    from .sharding import pad_vocab_for_mesh

    # mirror the exchange's row ownership exactly: the exchange divides the
    # mesh-PADDED vocab (place_params pads tables to a multiple of S), so
    # sampling with the raw vocab would shift attribution near shard edges
    # and can under-size capacity (ADVICE r3)
    rows_per = pad_vocab_for_mesh(vocab, n_shards) // n_shards
    worst = 1
    for ids in ids_by_table:
        uniq = np.unique(np.asarray(ids).reshape(-1))
        owned = np.bincount(
            np.clip(uniq // rows_per, 0, n_shards - 1), minlength=n_shards
        )
        worst = max(worst, int(owned.max()))
    return int(np.ceil(worst * float(safety)))


def _dedup_exchange(table_shard, ids_local, *, rows_per, n_shards, capacity,
                    data_sharded):
    """Body run per (data, model) shard by shard_map. ids replicated over
    MODEL_AXIS within the group; returns ((N, k) rows, overflow count)."""
    n = ids_local.shape[0]
    ids32 = ids_local.astype(jnp.int32)

    # a. one sort, shared by every step below
    sids, order = jax.lax.sort_key_val(ids32, jnp.arange(n, dtype=jnp.int32))

    # b. run-length dedup in sorted order
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sids[1:] != sids[:-1]]
    )
    uslot = jnp.cumsum(first.astype(jnp.int32)) - 1       # sorted pos -> unique slot
    n_unique = uslot[-1] + 1
    # unique ids, compacted to the front of a length-N buffer
    uids = jnp.zeros((n,), jnp.int32).at[uslot].set(sids, mode="drop")

    # owner of each unique slot and its rank within that owner's uniques
    owner = jnp.clip(uids // rows_per, 0, n_shards - 1)
    valid = jnp.arange(n) < n_unique
    # rank = running count of uniques per owner, computed from sorted uids
    # (uids are sorted ascending where valid, so equal owners are contiguous)
    owner_start = jnp.searchsorted(
        jnp.where(valid, owner, n_shards), jnp.arange(n_shards), side="left"
    ).astype(jnp.int32)
    rank = jnp.arange(n, dtype=jnp.int32) - owner_start[owner]

    # c. my shard gathers its owned uniques into a (capacity, k) buffer
    my = jax.lax.axis_index(MODEL_AXIS)
    mine = valid & (owner == my) & (rank < capacity)
    local_row = jnp.where(mine, uids - my * rows_per, 0)
    rows = jnp.take(table_shard, local_row, axis=0)
    rows = rows * mine[:, None].astype(rows.dtype)
    buf = jnp.zeros((capacity, table_shard.shape[1]), table_shard.dtype)
    slot = jnp.where(mine, rank, capacity)               # capacity = drop
    buf = buf.at[slot].add(rows, mode="drop")

    # d. one all_gather: each unique row crosses ICI once
    all_buf = jax.lax.all_gather(buf, MODEL_AXIS)        # (S, capacity, k)
    all_buf = all_buf.reshape(n_shards * capacity, -1)

    # e. per original position: (owner, rank) -> gathered row, then unsort
    fetch = owner * capacity + jnp.clip(rank, 0, capacity - 1)
    in_cap = rank < capacity
    sorted_rows = jnp.take(all_buf, fetch[uslot], axis=0)
    sorted_rows = sorted_rows * in_cap[uslot][:, None].astype(sorted_rows.dtype)
    out = jnp.zeros_like(sorted_rows).at[order].set(sorted_rows)

    # already the model-group total (owner/rank are computed identically on
    # every model shard); sum the data shards for a mesh-wide number
    overflow = jnp.sum(
        jnp.where(valid & ~in_cap, 1, 0), dtype=jnp.int32
    )
    if data_sharded:
        overflow = jax.lax.psum(overflow, DATA_AXIS)
    return out, overflow


def dedup_embedding_lookup(table, ids, mesh, capacity=None, shard_batch=True,
                           check_overflow=False):
    """Deduped all-to-all-style lookup against a row-sharded table.

    ``table`` (V, k) sharded P('model'); ``ids`` (N,) int IN [0, V) —
    mask PAD ids before calling (jnp.maximum(ids, 0), as the packed layer
    does) — sharded P('data') when ``shard_batch`` (replicated over
    'model' either way). Returns (N, k) rows (plus the mesh-total
    overflow count when ``check_overflow``). Exact whenever each model
    shard owns at most ``capacity`` of the batch's unique ids;
    ``capacity=N`` is unconditionally exact.
    """
    v, k = table.shape
    n_shards = mesh.shape[MODEL_AXIS]
    assert v % n_shards == 0, f"vocab {v} must divide model axis {n_shards}"
    rows_per = v // n_shards
    data_n = mesh.shape[DATA_AXIS] if shard_batch else 1
    n_local = ids.shape[0] // data_n
    if capacity is None:
        capacity = default_capacity(n_local, n_shards)
    capacity = min(capacity, n_local)

    batch_spec = P(DATA_AXIS) if shard_batch else P()

    body = functools.partial(
        _dedup_exchange, rows_per=rows_per, n_shards=n_shards,
        capacity=capacity, data_sharded=shard_batch,
    )

    rows, overflow = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), batch_spec),
        out_specs=(batch_spec, P()),
        # check_vma=False: the static varying-axes checker cannot infer
        # that the outputs are model-replicated. RE-TESTED on jax 0.9.0
        # (2026-08-21, the pvary-era checker): it still reports "could
        # not infer replication over any axes" for the rows output — the
        # all_gather -> local-gather -> unsort chain defeats its
        # inference — so the manual proof below remains the mechanism.
        # Proof they are: (1) ids
        # arrive model-REPLICATED (in_specs P(DATA) — no model axis), so
        # the sort/dedup/owner/rank computation is identical on every
        # model shard; (2) the only model-varying value, each shard's
        # (capacity, k) buffer of owned rows, goes through all_gather
        # over MODEL_AXIS, whose output is identical on every shard by
        # construction; (3) everything after (fetch indices, masks,
        # unsort permutation) is a function of (1) and (2) only. The
        # overflow count is psum'd over DATA and computed from (1).
        # Enforced empirically by the psum-vs-dedup-vs-dense equivalence
        # tests (tests/test_parallel.py) and the driver's
        # dryrun_multichip trajectory parity.
        check_vma=False,
    )(table, ids)
    if check_overflow:
        return rows, overflow
    return rows

"""Fused embedding lookups with sorted-scatter / Pallas gradient paths.

Problem: the gradient of ``jnp.take(table, ids)`` is a scatter-add, which
XLA lowers on TPU to a serialized per-row update loop (~70 ns/row measured:
profiling the FM step shows 26 scatter fusions x 0.6 ms = 15.7 of
31.4 ms/step at batch 8192 — see BASELINE.md). The reference hits the same
math through tf.nn.embedding_lookup on CPU (recman/tf/core/layers.py:
117-128) and never had to care.

``embedding_lookup(table, ids)`` is a custom-vjp op. Forward is a plain
gather (XLA gathers are parallel and fast). Two backward implementations:

- DEFAULT (``_sorted_scatter_grad`` / the batched ``_lookup_multi_bwd``):
  sort ids, permute the cotangent rows, scatter-add with
  ``indices_are_sorted=True`` — 2.4x faster than the naive scatter
  (measured, sort included). Same-shape tables share ONE batched sort and
  permute. Pure XLA.

- OPT-IN ``grad_kernel("segmat")`` (``_segment_matmul_grad``): a
  scatter-free SORTED SEGMENT-MATMUL Pallas kernel — grid over vocab
  tiles; each program walks ONLY its own sorted row range in chunks,
  building a (CHUNK, TILE_V) one-hot mask on the VPU and contracting it
  with the cotangent chunk on the MXU (acc += maskᵀ @ sg). Sorting first
  makes the work O(N·TILE_V + V·CHUNK) per table, unlike a brute-force
  one-hot contraction (V·N — 4x slower than the scatter, measured).
  ABAB-measured IN the real step at the headline config (2026-08-20,
  TPU v5e): see BASELINE.md round-3 table — the measurement VERDICT r2
  item 3 asked for.

A context flag (``fused_grad``) lets the SPMD trainer fall back to XLA's
partitionable gather so row-sharded tables keep working; auto mode enables
the custom backward on TPU.
"""

from __future__ import annotations

import contextlib
import functools
import threading
import typing

import jax
import jax.numpy as jnp

_state = threading.local()


def _mode():
    return getattr(_state, "mode", "auto")


@contextlib.contextmanager
def fused_grad(enabled: bool | None):
    """Force-enable/disable the Pallas backward while tracing (None=auto:
    on iff the default backend is TPU)."""
    prev = _mode()
    _state.mode = "auto" if enabled is None else ("on" if enabled else "off")
    try:
        yield
    finally:
        _state.mode = prev


def _fused_active() -> bool:
    mode = _mode()
    if mode == "on":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


@contextlib.contextmanager
def grad_kernel(kind: str):
    """Select the dense-table-cotangent implementation while tracing:
    "auto" (default), "scatter" (sorted-hint scatter-add) or "segmat"
    (the Pallas sorted segment-matmul — scatter-free; single-shard only,
    like every fused path). Ignored when the fused backward is inactive.

    "auto" routes the BATCHED multi-table backward through the segmat
    kernel on TPU when k >= 8 — the regime ABAB-measured faster than the
    sorted scatters IN the real step (581.1k vs 538.3k ex/s at the
    headline config, BASELINE.md round-3 trajectory) — and keeps the
    scatter elsewhere (single lookups, narrow k=1 linear slices:
    unmeasured regimes stay on the proven path)."""
    assert kind in ("auto", "scatter", "segmat"), kind
    prev = getattr(_state, "grad_kernel", "auto")
    _state.grad_kernel = kind
    try:
        yield
    finally:
        _state.grad_kernel = prev


def _grad_kernel() -> str:
    return getattr(_state, "grad_kernel", "auto")


# Trace-time flag: build the per-step packed [table|bias|w] matrices in
# BFLOAT16 before the forward gathers. Halves the bytes of the packed
# concat, its column->row relayout, the row gathers, the backward
# cotangent sort/permute streams and the segmat kernel inputs (the CIN
# tower already consumes bf16 multiplicands); gathered rows cast back to
# f32 so every consumer keeps its dtype contract while the cast's vjp
# returns the backward streams to bf16.
#
# NUMERICS-SHIFTING (forward embeddings + their gradients quantize
# through bf16), so the default is "auto" = on ONLY in the regime that
# was ABAB-measured AND quality-gated (TPU, fused single-shard path):
# tools/bench_r4g.py 2026-08-21 — 762.8k vs 715.1k ex/s median (+6.7%),
# 2M-synthetic quality 0.5219/0.8155 vs anchor 0.523/0.8144 (HOLDS).
# CPU paths (incl. the ML-100K parity gate) and sharded GSPMD traces
# (fused_grad(False)) resolve to OFF, so their trajectories are
# unchanged. True/False force it.
PACKED_FWD_BF16 = "auto"


def _packed_fwd_bf16_active() -> bool:
    if PACKED_FWD_BF16 == "auto":
        return _fused_active() and jax.default_backend() == "tpu"
    return bool(PACKED_FWD_BF16)


# "auto" default for the split-forward packed lookup (packed_lookup_grouped
# vs concat-then-gather): MEASURED SLOWER on TPU (tools/bench_r4.py ABAB
# 2026-08-21: split 601.5k/656.8k vs concat 612.9k/666.6k ex/s median at
# b=8192, batched/per-table permutes respectively). Killing the (V,17)
# packed concat doesn't remove the column->row relayout — the (V,16)
# table param still needs it for its own gather — and the 26 extra (V,)
# w-vector gathers cost more than the concat they replace (same economics
# the round-2 fm-path experiment hit, NOTES.md). Kept as an opt-in
# because the backward it carries (packed-cotangent segmat with free
# grad splits) is the right shape for future persistent-packed-storage
# revisits.
SPLIT_LOOKUP_AUTO_TPU = False


@contextlib.contextmanager
def split_lookup(kind: str):
    """Select how layers/packed.py assembles packed [table|vec...] rows
    while tracing: "auto" (default), "on" (split per-part gathers, no
    (V, k+m) packed concat — single-shard fused paths only) or "off"
    (explicit concat + one gather)."""
    assert kind in ("auto", "on", "off"), kind
    prev = getattr(_state, "split_lookup", "auto")
    _state.split_lookup = kind
    try:
        yield
    finally:
        _state.split_lookup = prev


def _split_lookup_active() -> bool:
    mode = getattr(_state, "split_lookup", "auto")
    if mode == "on":
        return True
    if mode == "off":
        return False
    return SPLIT_LOOKUP_AUTO_TPU and jax.default_backend() == "tpu"


# Rows per segmat kernel call: the kernel holds both per-table streams
# resident in VMEM (~(8 + roundup(k,8)+8 sublanes) * n_pad lanes * 4 B,
# double-buffered), which crowds the 16 MB scoped budget past ~48k rows
# at k=17. Bigger batches run as ceil(n/SEG) same-shape calls over
# consecutive SORTED row segments (slices of sorted stay sorted) whose
# dense grads sum — one Mosaic compile, bounded VMEM at any batch.
SEGMAT_SEGMENT_N = 32_768

# Experiment flag (trace-time): emit the batched segmat grad with the
# UNPADDED vocab as out_shape (Pallas masks the boundary tile's store)
# instead of (T, k, v_pad) + an explicit lane-dim slice. See BASELINE.md
# round-4 measurements before changing the default.
SEGMAT_UNPADDED_OUT = False


def _segmat_multi_active(k: int) -> bool:
    """Should the batched multi-table backward use the segmat kernel?

    Auto limit: k >= 8 (measured regime; k=1 linear slices keep the
    scatter)."""
    kind = _grad_kernel()
    if kind == "segmat":
        return True
    if kind == "scatter":
        return False
    return jax.default_backend() == "tpu" and k >= 8


@contextlib.contextmanager
def dedup_exchange(mesh, capacity=None, threshold=50_000):
    """Route lookups against large row-sharded tables through the deduped
    capacity-bounded all-to-all exchange (parallel/shard_lookup.py) while
    tracing. Tables below ``threshold`` rows, or whose row count doesn't
    divide the mesh's model axis, keep the partitioner's masked-gather +
    all-reduce. ShardedTrainer(embedding_exchange="dedup") installs this
    around its train/eval tracing."""
    prev = getattr(_state, "dedup", None)
    _state.dedup = (mesh, capacity, threshold)
    try:
        yield
    finally:
        _state.dedup = prev


def _dedup_ctx():
    return getattr(_state, "dedup", None)



@contextlib.contextmanager
def stacked_tables(names: tuple, stack):
    """Trace packed lookups against ONE stacked (T, V, k) table leaf.

    Round-5 storage experiment: the bench config's 26 same-shape tables
    cost 26 separate Adam fusions (~35 us fixed overhead each on top of
    the ~54 us bandwidth floor — ~0.9 ms/step total) plus a 26-way
    split/re-stack of the batched segmat grad. Storing them as one
    (T, V, k) parameter leaf makes the optimizer sweep a single fusion
    and lets the backward's batched (T, C, V) grad flow to the leaf
    unsplit (layers/packed.py consumes this context; the stacked-storage
    train step installs it around model.loss with the traced leaf).

    ``names``: feature names in stack order (must cover the packed
    layer's full packable set — the trainer checks eligibility with
    PackedEmbeddingLinear.stackable). Single-shard fused paths only,
    like fused_apply; incompatible with dedup_exchange.
    """
    assert _dedup_ctx() is None, (
        "stacked_tables is incompatible with dedup_exchange"
    )
    prev = getattr(_state, "stacked", None)
    _state.stacked = (tuple(names), stack)
    try:
        yield
    finally:
        _state.stacked = prev


def _stacked_ctx():
    return getattr(_state, "stacked", None)


def _round_up(x, m):
    return (x + m - 1) // m * m


class QuantTable(typing.NamedTuple):
    """Symmetric per-row int8 embedding table for quantized SERVING.

    Passed in place of an f32 (V, k) table inside a serving artifact's
    params pytree (serving.py ``quantize_embeddings="runtime"``): the
    table stays int8 in HBM and dequantization happens AFTER the gather,
    per looked-up row — 4k/(k+4)x less HBM footprint and table read
    traffic than dequantizing whole tables at load (k=16: 3.2x; the
    scale column is f32 per row).
    Lookup-only: no gradient path (inference artifacts never backprop).
    """

    q: object  # (V, k) int8
    scale: object  # (V,) f32

    @property
    def dtype(self):  # layers consult table.dtype for mask casts
        return self.scale.dtype

    @property
    def shape(self):
        return self.q.shape


try:  # serving artifacts serialize pytrees containing QuantTable
    from jax import export as _jax_export

    _jax_export.register_namedtuple_serialization(
        QuantTable, serialized_name="recman_tpu.QuantTable"
    )
except Exception:  # pragma: no cover - older jax without the registry
    pass


def quantize_table_int8(a):
    """f32 (V, k) -> (int8 (V, k), f32 (V,) per-row symmetric scales)."""
    import numpy as np

    a = np.asarray(a)
    scale = np.maximum(np.abs(a).max(axis=1) / 127.0, 1e-12).astype(np.float32)
    q = np.clip(np.rint(a / scale[:, None]), -127, 127).astype(np.int8)
    return q, scale


# Upper bound on the adaptive segmat chunk (sorted rows per kernel step).
# Module-level so tools/abab.py can sweep it (ccN modifier).
SEGMAT_CHUNK_CAP = 512


def _adaptive_chunk(n: int, tile_v: int, v_pad: int, cap: int | None = None) -> int:
    """Chunk rows per kernel step ≈ 2x the mean rows landing in one vocab
    tile (sized for the segment-matmul kernels; originally derived for
    the deleted fused-Adam path — git history): the kernel's
    total MXU work is ~N·TILE_V + V·CHUNK, so once CHUNK >> mean rows/tile
    the V·CHUNK term dominates pure overhead."""
    cap = SEGMAT_CHUNK_CAP if cap is None else cap
    mean_rows = max(1, n * tile_v // max(v_pad, 1))
    return max(64, min(cap, -(-2 * mean_rows // 8) * 8))


def _segment_matmul_grad(ids, g, vocab_size: int, tile_v: int = 512,
                         chunk_n: int | None = None,
                         interpret: bool | None = None):
    """(N,) ids + (N, k) cotangents -> (vocab_size, k) dense table grad
    via sort + per-tile chunked mask-matmuls. Scatter-free."""
    n = ids.shape[0]
    sids, order = jax.lax.sort_key_val(ids.astype(jnp.int32),
                                       jnp.arange(n, dtype=jnp.int32))
    sg = jnp.take(g, order, axis=0)
    return _segment_matmul_from_sorted(
        sids, sg, vocab_size, tile_v=tile_v, chunk_n=chunk_n,
        interpret=interpret,
    )


def _segment_matmul_from_sorted(sids, sg, vocab_size: int, tile_v: int = 512,
                                chunk_n: int | None = None,
                                interpret: bool | None = None):
    """Kernel half of ``_segment_matmul_grad`` for callers that already
    hold sorted ids + permuted cotangents (the batched multi-table
    backward shares ONE sort across tables)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, k = sg.shape
    tile_v = min(tile_v, _round_up(vocab_size, 8))
    v_pad = _round_up(vocab_size, tile_v)
    if chunk_n is None:
        chunk_n = _adaptive_chunk(n, tile_v, v_pad)
    chunk_n = min(chunk_n, _round_up(n, 8))
    num_tiles = v_pad // tile_v
    n_pad = _round_up(n, chunk_n) + chunk_n  # slack so dynamic chunk reads
    # starting anywhere in [0, n) stay in bounds

    sids_p = jnp.full((n_pad, 1), v_pad, dtype=jnp.int32).at[:n, 0].set(sids)
    sg_p = jnp.zeros((n_pad, k), dtype=sg.dtype).at[:n].set(sg)

    # [start, end) of each tile's rows in the sorted order
    bounds = jnp.searchsorted(
        sids, jnp.arange(0, v_pad + tile_v, tile_v, dtype=jnp.int32)
    ).astype(jnp.int32)

    def kernel(bounds_ref, sids_ref, sg_ref, out_ref):
        t = pl.program_id(0)
        base = t * tile_v
        start = bounds_ref[t]
        end = bounds_ref[t + 1]
        num_chunks = pl.cdiv(end - start, chunk_n)

        def chunk_body(c, acc):
            off = start + c * chunk_n
            sid_chunk = sids_ref[pl.ds(off, chunk_n), :]  # (CHUNK, 1)
            rows = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, tile_v), 1)
            # padded sids hold v_pad (matches no tile); no extra valid mask
            mask = (sid_chunk - base == rows).astype(sg_ref.dtype)
            gc = sg_ref[pl.ds(off, chunk_n), :]  # (CHUNK, k)
            return acc + jax.lax.dot_general(
                mask, gc, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jnp.zeros((tile_v, k), dtype=jnp.float32)
        acc = jax.lax.fori_loop(0, num_chunks, chunk_body, acc)
        out_ref[:] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bounds -> SMEM
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((n_pad, 1), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_pad, k), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_v, k), lambda t, b: (t, 0),
                               memory_space=pltpu.VMEM),
    )
    grad = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v_pad, k), sg.dtype),
        interpret=(jax.default_backend() != "tpu") if interpret is None else interpret,
    )(bounds, sids_p, sg_p)
    return grad[:vocab_size]


# Vocab-tile rows per grid step of the batched segmat kernel. Sweep
# history: round 3 (13.5 ms step): 256 -> 565.6k, 512 -> 606.4k,
# 1024 -> 615.8k, 2048 -> 617.6k ex/s — fewer/larger tiles won and 2048
# shipped. ROUND-6 re-sweep at the 8.3 ms step (tools/abab.py
# base,base+tv1024,base+tv4096 2026-08-21, 3/3 rounds): 1024 ->
# 1,007.3k vs 2048 -> 992.7k (+1.5%) and 4096 -> 941.0k (-5.2%) — the
# balance inverted as the surrounding step shrank (the kernel's serial
# V*CHUNK mask work per tile now outweighs grid-step overhead). Same
# math either way: per-row accumulation order is unchanged by the tile
# height (each vocab tile walks the same sorted chunk sequence).
SEGMAT_TILE_V = 1024


def _segment_matmul_from_sorted_batched(sids, sg_t, vocab_size: int,
                                        tile_v: int | None = None,
                                        chunk_n: int | None = None,
                                        interpret: bool | None = None):
    """Batched kernel: (T, N) sorted ids + (T, k, N) TRANSPOSED permuted
    cotangents -> (T, k, vocab_size) transposed dense grads in ONE
    pallas_call.

    One kernel for all T same-shape tables instead of T per-table calls:
    identical math, but a single Mosaic compile (the per-table form
    lowers T separate kernels — ~19 min of remote compiles at T=26 on
    this machine's tunnel) and one grid whose (table, tile) steps the
    scheduler can pipeline.

    Everything rides the FIELD-MAJOR layout (the Pallas rule that bit us
    in NOTES.md: big dim on the 128-lane axis): ids live as (1, N) and
    cotangents as (k, N) with N on lanes — the natural (N, 1)/(N, k)
    layouts lane-pad 1 and k up to 128 in VMEM and blow the 16 MB scoped
    budget (measured: 16.83M for the (N, 17) form at N=8192). The mask
    is built as (TILE_V, CHUNK) directly against the (1, CHUNK) id slice,
    so the kernel has NO internal transposes:

        acc(k, TILE_V) += gc(k, CHUNK) @ mask(TILE_V, CHUNK)^T
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, k, n = sg_t.shape
    if tile_v is None:
        tile_v = SEGMAT_TILE_V
    tile_v = min(tile_v, _round_up(vocab_size, 8))
    v_pad = _round_up(vocab_size, tile_v)
    if chunk_n is None:
        chunk_n = _adaptive_chunk(n, tile_v, v_pad)
    # Mosaic can only prove lane-dim dynamic slices in-bounds/aligned when
    # offsets are static multiples of 128: chunks live on an ABSOLUTE
    # chunk grid (off = c * chunk_n, chunk_n % 128 == 0) and each tile
    # walks floor(start/chunk)..ceil(end/chunk) — boundary chunks over-read
    # neighbors' rows, which the id==tile-range mask already zeroes
    chunk_n = max(128, _round_up(min(chunk_n, _round_up(n, 8)), 128))
    num_tiles = v_pad // tile_v
    n_pad = _round_up(n, chunk_n) + chunk_n

    sids_p = jnp.full((t, 1, n_pad), v_pad, dtype=jnp.int32)
    sids_p = sids_p.at[:, 0, :n].set(sids.astype(jnp.int32))
    sg_p = jnp.zeros((t, k, n_pad), dtype=sg_t.dtype).at[:, :, :n].set(sg_t)

    # bounds[t, e] = #ids whose vocab tile < e (== searchsorted(sids,
    # e*tile_v) for sorted ids). vmapped searchsorted lowers to a binary-
    # search while-loop measured at 0.71 ms/step (profile 2026-08-21);
    # this one fused compare-reduce over the (T, E, N) broadcast streams
    # in ~0.2 ms
    tiles_of = sids.astype(jnp.int32) // tile_v  # (T, N)
    edges_t = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.sum(
        tiles_of[:, None, :] < edges_t[None, :, None], axis=2,
        dtype=jnp.int32,
    )  # (T, num_tiles + 1)

    def kernel(bounds_ref, sids_ref, sg_ref, out_ref):
        tbl = pl.program_id(0)
        tile = pl.program_id(1)
        base = tile * tile_v
        start = bounds_ref[tbl, tile]
        end = bounds_ref[tbl, tile + 1]
        c0 = start // chunk_n  # absolute chunk grid (alignment proof)
        c1 = pl.cdiv(end, chunk_n)

        def chunk_body(c, acc):
            off = pl.multiple_of(c * chunk_n, chunk_n)
            sid_chunk = sids_ref[0, :, pl.ds(off, chunk_n)]  # (1, CHUNK)
            rows = jax.lax.broadcasted_iota(
                jnp.int32, (tile_v, chunk_n), 0
            )
            # padded sids hold v_pad (matches no tile); no extra mask
            mask = (sid_chunk - base == rows).astype(sg_ref.dtype)
            gc = sg_ref[0, :, pl.ds(off, chunk_n)]  # (k, CHUNK)
            return acc + jax.lax.dot_general(
                gc, mask, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        acc = jnp.zeros((k, tile_v), dtype=jnp.float32)
        acc = jax.lax.fori_loop(c0, c1, chunk_body, acc)
        out_ref[0, :, :] = acc.astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t, num_tiles),
        in_specs=[
            # per-table blocks; index depends only on the table axis so
            # each table's sorted stream loads into VMEM once and stays
            # for all of its vocab tiles (tile is the fast grid axis)
            pl.BlockSpec((1, 1, n_pad), lambda tb, ti, b: (tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, n_pad), lambda tb, ti, b: (tb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, tile_v), lambda tb, ti, b: (tb, 0, ti),
                               memory_space=pltpu.VMEM),
    )
    if SEGMAT_UNPADDED_OUT and vocab_size != v_pad:
        # let Pallas mask the boundary tile's store instead of
        # materializing a (T, k, v_pad) buffer + a lane-dim slice (the
        # slice profiles at 0.63 ms/step at the bench config)
        grad_t = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((t, k, vocab_size), sg_t.dtype),
            interpret=(jax.default_backend() != "tpu") if interpret is None
            else interpret,
        )(bounds, sids_p, sg_p)
        return grad_t
    grad_t = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, k, v_pad), sg_t.dtype),
        interpret=(jax.default_backend() != "tpu") if interpret is None else interpret,
    )(bounds, sids_p, sg_p)
    return grad_t[:, :, :vocab_size]


@jax.custom_vjp
def _lookup(table, ids):
    return jnp.take(table, ids, axis=0)


def _lookup_fwd(table, ids):
    return jnp.take(table, ids, axis=0), (ids, table.shape)


def _sorted_scatter_grad(ids, g, vocab_size: int):
    """Dense table grad via sort + sorted-hint scatter-add.

    XLA's TPU scatter is ~70 ns/row serialized for arbitrary indices, but
    with ``indices_are_sorted=True`` it runs 2.4x faster (measured 8.3 vs
    19.8 ms for 26 Criteo tables at batch 8192, sort + permute included).
    Pure XLA — no Pallas — so it also lowers on CPU/GPU.
    """
    n = ids.shape[0]
    sids, order = jax.lax.sort_key_val(
        ids.astype(jnp.int32), jnp.arange(n, dtype=jnp.int32)
    )
    sg = jnp.take(g, order, axis=0)
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,),
    )
    return jax.lax.scatter_add(
        jnp.zeros((vocab_size, g.shape[1]), g.dtype),
        sids[:, None],
        sg,
        dnums,
        indices_are_sorted=True,
        unique_indices=False,
    )


def _lookup_bwd(res, g):
    ids, (vocab_size, _k) = res
    if _grad_kernel() == "segmat":
        grad = _segment_matmul_grad(ids, g, vocab_size)
    else:
        grad = _sorted_scatter_grad(ids, g, vocab_size)
    return grad, None


_lookup.defvjp(_lookup_fwd, _lookup_bwd)


def embedding_lookup(table, ids):
    """Gather rows ``ids`` (any shape) from ``table`` (V, k).

    Uses the Pallas scatter-free backward when active (TPU, unsharded
    tables); the explicit deduped all-to-all under a dedup_exchange
    context (SPMD, large row-sharded tables); otherwise plain jnp.take
    whose gather grad the XLA SPMD partitioner knows how to shard.
    QuantTable tables gather int8 rows and dequantize AFTER the gather
    (quantized serving; no gradient path).
    """
    if isinstance(table, QuantTable):
        flat = ids.reshape(-1)
        rows = jnp.take(table.q, flat, axis=0).astype(table.scale.dtype)
        rows = rows * jnp.take(table.scale, flat, axis=0)[:, None]
        return rows.reshape(*ids.shape, table.q.shape[1])
    flat = ids.reshape(-1)
    ctx = _dedup_ctx()
    if ctx is not None:
        mesh, capacity, threshold = ctx
        from ..parallel.mesh import MODEL_AXIS
        from ..parallel.shard_lookup import dedup_embedding_lookup

        rows_n = table.shape[0]
        if rows_n >= threshold and rows_n % mesh.shape[MODEL_AXIS] == 0:
            rows = dedup_embedding_lookup(table, flat, mesh, capacity=capacity)
            return rows.reshape(*ids.shape, table.shape[1])
    if _fused_active():
        rows = _lookup(table, flat)
    else:
        rows = jnp.take(table, flat, axis=0)
    return rows.reshape(*ids.shape, table.shape[1])


def _segment_matmul_from_sorted_batched_vk(sids, sg_t, vocab_size: int,
                                           k_emb: int, n_vec: int,
                                           tile_v: int = 2048,
                                           chunk_n: int | None = None,
                                           interpret: bool | None = None):
    """Batched segmat emitting ROW-MAJOR grads: (T, N) sorted ids +
    (T, k_emb + n_vec, N) transposed permuted cotangents ->
    ((T, vocab_size, k_emb) table grads, (T, n_vec, vocab_size) vector
    grads) in ONE pallas_call.

    The difference vs ``_segment_matmul_from_sorted_batched``: the
    accumulator is built TRANSPOSED — acc(tile_v, k_eff) += mask(tile_v,
    chunk) @ gc(k_eff, chunk)^T, identical MXU tile count — so the table
    grad leaves the kernel (V, k_emb) row-major and the vector rows leave
    as (V,) slices. Downstream effect (the point): Adam consumes the
    table grad with NO transpose/relayout, so XLA keeps params/moments
    row-major and the FORWARD gathers need no column->row relayout
    either; the v_pad slice moves to the (cheap) sublane dim. Used by the
    split-lookup backward (packed_lookup_grouped) under SEGMAT_VK_OUT.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t, k_eff, n = sg_t.shape
    assert k_eff == k_emb + n_vec
    tile_v = min(tile_v, _round_up(vocab_size, 8))
    v_pad = _round_up(vocab_size, tile_v)
    if chunk_n is None:
        chunk_n = _adaptive_chunk(n, tile_v, v_pad)
    chunk_n = max(128, _round_up(min(chunk_n, _round_up(n, 8)), 128))
    num_tiles = v_pad // tile_v
    n_pad = _round_up(n, chunk_n) + chunk_n

    sids_p = jnp.full((t, 1, n_pad), v_pad, dtype=jnp.int32)
    sids_p = sids_p.at[:, 0, :n].set(sids.astype(jnp.int32))
    sg_p = jnp.zeros((t, k_eff, n_pad), dtype=sg_t.dtype).at[:, :, :n].set(sg_t)

    tiles_of = sids.astype(jnp.int32) // tile_v
    edges_t = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    bounds = jnp.sum(
        tiles_of[:, None, :] < edges_t[None, :, None], axis=2,
        dtype=jnp.int32,
    )

    def kernel(bounds_ref, sids_ref, sg_ref, out_emb_ref, out_vec_ref):
        tbl = pl.program_id(0)
        tile = pl.program_id(1)
        base = tile * tile_v
        start = bounds_ref[tbl, tile]
        end = bounds_ref[tbl, tile + 1]
        c0 = start // chunk_n
        c1 = pl.cdiv(end, chunk_n)

        def chunk_body(c, accs):
            acc_emb, acc_vec = accs
            off = pl.multiple_of(c * chunk_n, chunk_n)
            sid_chunk = sids_ref[0, :, pl.ds(off, chunk_n)]  # (1, CHUNK)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (tile_v, chunk_n), 0
            )
            mask = (sid_chunk - base == cols).astype(sg_ref.dtype)
            gc = sg_ref[0, :, pl.ds(off, chunk_n)]  # (k_eff, CHUNK)
            # table part ROW-MAJOR: (tile_v, CHUNK) x (k_emb, CHUNK)
            # contracted on CHUNK -> (tile_v, k_emb); same MXU tile count
            # as the (k, tile_v) orientation, accumulator already the
            # layout Adam wants
            acc_emb = acc_emb + jax.lax.dot_general(
                mask, gc[:k_emb], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if n_vec:
                # vector rows keep the original tiny-M orientation
                # (n_vec, CHUNK) @ (tile_v, CHUNK)^T — no transposes
                acc_vec = acc_vec + jax.lax.dot_general(
                    gc[k_emb:], mask, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            return acc_emb, acc_vec

        acc = (
            jnp.zeros((tile_v, k_emb), dtype=jnp.float32),
            jnp.zeros((max(n_vec, 1), tile_v), dtype=jnp.float32),
        )
        acc_emb, acc_vec = jax.lax.fori_loop(c0, c1, chunk_body, acc)
        out_emb_ref[0, :, :] = acc_emb.astype(out_emb_ref.dtype)
        out_vec_ref[0, :, :] = acc_vec.astype(out_vec_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t, num_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, n_pad), lambda tb, ti, b: (tb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_eff, n_pad), lambda tb, ti, b: (tb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_v, k_emb), lambda tb, ti, b: (tb, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, max(n_vec, 1), tile_v),
                         lambda tb, ti, b: (tb, 0, ti),
                         memory_space=pltpu.VMEM),
        ],
    )
    grad_emb, grad_vec = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((t, v_pad, k_emb), sg_t.dtype),
            jax.ShapeDtypeStruct((t, max(n_vec, 1), v_pad), sg_t.dtype),
        ],
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(bounds, sids_p, sg_p)
    return grad_emb[:, :vocab_size], grad_vec[:, :n_vec, :vocab_size]


# Experiment flag (trace-time): route the SPLIT-lookup backward through
# the row-major-out kernel above. MEASURED DEAD END (tools/bench_r4c.py
# ABAB 2026-08-21, TPU v5e): 274.9k vs 673.8k ex/s median — 29.8 vs
# 12.2 ms/step. The (tile_v, k) accumulator/store orientation costs
# ~17 ms: the acc lane-pads 16->128 in VMEM and the (1, tile_v, 16)
# narrow-minor HBM stores don't get the dense narrow tiling the layout
# theory assumed. The (k, tile_v) field-major orientation (big dim on
# lanes) remains the only fast form — the same Pallas rule from the
# round-1 CIN kernels. Kept for the record; do not enable.
SEGMAT_VK_OUT = False


@jax.custom_vjp
def _lookup_multi(tables, ids_tuple):
    """Multi-table lookup (tables: tuple of same-shape (V, k); ids (N,))."""
    return tuple(
        jnp.take(t, i, axis=0) for t, i in zip(tables, ids_tuple)
    )


def _lookup_multi_fwd(tables, ids_tuple):
    return _lookup_multi(tables, ids_tuple), (ids_tuple, tables[0].shape)


# Above this row count the cotangent permute runs per-table instead of as
# one batched (T, ...) take_along_axis. Round-4 ABAB (tools/bench_r4.py,
# 2026-08-21, TPU v5e): per-table permutes win at EVERY size — the one
# batched gather serializes at ~5.8 ns/row while 26 concurrent per-table
# gathers overlap (the forward side runs at ~1.6 ns/row), worth +8.8%
# step throughput at b=8192 (666.6k vs 612.9k ex/s median) — so the
# default is now 0 (always per-table). At N=65536 the batched form was
# additionally pathological: XLA lays it out column-major behind a
# dynamic-update-slice, 50.4 ms/step (profiled 2026-08-20, 30 ns/row).
# The batched SORT is cheap at every size and stays.
PERMUTE_BATCHED_MAX_N = 0


def _batched_sort(ids_tuple):
    """(tuple of (N,) ids) -> ((T, N) sorted ids, (T, N) sort order):
    ONE batched sort shared by all same-shape tables."""
    t = len(ids_tuple)
    n = ids_tuple[0].shape[0]
    ids_mat = jnp.stack([i.astype(jnp.int32) for i in ids_tuple])  # (T, N)
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (t, n))
    return jax.lax.sort_key_val(ids_mat, iota, dimension=1)


def _permute_transposed(gs_t_list, order):
    """Permute per-table TRANSPOSED (k, N) cotangent streams into sorted
    order -> (T, k, N).

    Size-dependent strategy: the batched take_along_axis amortizes small-N
    op overheads, but past PERMUTE_BATCHED_MAX_N rows XLA lays the batched
    gather out column-major behind a dynamic-update-slice (50 ms at 64k —
    see the constant's rationale) while per-table 2-D gathers stay linear.
    """
    n = order.shape[1]
    if n > PERMUTE_BATCHED_MAX_N:
        return jnp.stack([
            jnp.take(g_t, order[i], axis=1)
            for i, g_t in enumerate(gs_t_list)
        ])  # (T, k, N)
    g_t = jnp.stack(gs_t_list)  # (T, k, N)
    return jnp.take_along_axis(g_t, order[:, None, :], axis=2)


def _segmat_batched_segmented(sids, sg_t, vocab_size):
    """Batched segmat over sorted streams, segmented past
    SEGMAT_SEGMENT_N rows (the kernel holds both per-table streams
    resident in VMEM): same-shape kernel calls over consecutive SORTED
    row segments whose dense grads sum — one Mosaic compile, bounded
    VMEM at any batch. Returns (T, k, vocab_size) transposed grads."""
    n = sids.shape[1]
    seg = SEGMAT_SEGMENT_N
    if n <= seg:
        return _segment_matmul_from_sorted_batched(sids, sg_t, vocab_size)
    # Pad the tail segment with an above-vocab sentinel (never matches a
    # tile; its zero cotangents are inert).
    n_seg = -(-n // seg)
    pad = n_seg * seg - n
    sids_p = sids
    sg_p = sg_t
    if pad:
        sids_p = jnp.pad(
            sids, ((0, 0), (0, pad)), constant_values=jnp.int32(2**30)
        )
        sg_p = jnp.pad(sg_t, ((0, 0), (0, 0), (0, pad)))
    grads_b = None
    for s in range(n_seg):
        part = _segment_matmul_from_sorted_batched(
            sids_p[:, s * seg:(s + 1) * seg],
            sg_p[:, :, s * seg:(s + 1) * seg],
            vocab_size,
        )
        grads_b = part if grads_b is None else grads_b + part
    return grads_b


def _scatter_sorted_rows(sids, sg_rows, vocab_size, k, dtype):
    """Per-table sorted-hint scatter-adds (each keeps its
    indices_are_sorted fast path; one global scatter serializes 5x —
    NOTES.md dead ends). Returns tuple of (vocab_size, k) grads."""
    dnums = jax.lax.ScatterDimensionNumbers(
        update_window_dims=(1,),
        inserted_window_dims=(0,),
        scatter_dims_to_operand_dims=(0,),
    )
    return tuple(
        jax.lax.scatter_add(
            jnp.zeros((vocab_size, k), dtype),
            sids[i][:, None],
            sg_rows[i],
            dnums,
            indices_are_sorted=True,
            unique_indices=False,
        )
        for i in range(len(sg_rows))
    )


def _lookup_multi_bwd(res, gs):
    """Backward with BATCHED sort + (size-dependent) permute across tables.

    The sorted-scatter grad needs a sort and a permutation gather per
    table; as separate ops those are ~4.3 ms across 26 Criteo tables
    (vs ~4 ms for the scatters themselves). Stacking same-shape tables'
    ids/cotangents turns 26 sorts + 26 gathers into ONE batched sort and
    ONE take_along_axis; the scatters stay per-table so each keeps its
    indices_are_sorted fast path. Past PERMUTE_BATCHED_MAX_N rows the
    permute gathers run per-table (see the constant's rationale).
    """
    ids_tuple, (vocab_size, k) = res
    t = len(ids_tuple)
    n = ids_tuple[0].shape[0]

    sids, order = _batched_sort(ids_tuple)

    if _segmat_multi_active(k):
        # ONE batched scatter-free Pallas kernel across all tables (a
        # per-table form lowers T separate Mosaic kernels — ~19 min of
        # remote compiles at T=26). The permute gathers straight into the
        # kernel's transposed (T, k, N) layout — no separate transpose.
        sg_t = _permute_transposed(
            [jnp.swapaxes(g, 0, 1) for g in gs], order
        )
        grads_b = _segmat_batched_segmented(sids, sg_t, vocab_size)
        return tuple(jnp.swapaxes(grads_b[i], 0, 1) for i in range(t)), None

    if n > PERMUTE_BATCHED_MAX_N:
        sg_rows = [jnp.take(g, order[i], axis=0) for i, g in enumerate(gs)]
    else:
        g_mat = jnp.stack(gs)  # (T, N, k)
        sg = jnp.take_along_axis(g_mat, order[:, :, None], axis=1)
        sg_rows = [sg[i] for i in range(t)]

    grads = _scatter_sorted_rows(sids, sg_rows, vocab_size, k, gs[0].dtype)
    return grads, None


_lookup_multi.defvjp(_lookup_multi_fwd, _lookup_multi_bwd)


def embedding_lookup_multi(tables: list, ids_list: list) -> list:
    """Same-shape multi-table lookup with the batched-sort backward.

    All tables must share one shape and all ids one shape; flattens ids.
    """
    flat_ids = tuple(i.reshape(-1) for i in ids_list)
    if _fused_active() and len(tables) > 1:
        rows = _lookup_multi(tuple(tables), flat_ids)
    else:
        rows = tuple(jnp.take(t, i, axis=0) for t, i in zip(tables, flat_ids))
    k = tables[0].shape[1]
    return [
        r.reshape(*i.shape, k) for r, i in zip(rows, ids_list)
    ]


@jax.custom_vjp
def _stacked_gather(packed, ids_mat):
    """Gathers for stacked-storage packed lookups.

    ``packed`` (T, V, C) — the per-feature [table|w] packed matrices as
    ONE stacked array (a concat of the stacked (T, V, k) table leaf with
    the linear-w columns); ``ids_mat`` (T, N) int32. Returns a tuple of
    T (N, C) row arrays.

    Forward gathers run PER TABLE from slices of the stack (the round-4
    measurement that made PERMUTE_BATCHED_MAX_N=0: 26 concurrent 2-D
    gathers overlap at ~1.6 ns/row while one batched 3-D gather
    serializes; a slice of a stacked operand lowers to the same 2-D
    gather with a base offset). The backward is the batched sorted
    segmat exactly as _lookup_multi_bwd's — but its (T, C, V) grad
    transposes straight into the (T, V, C) stack cotangent with NO
    per-table split/re-stack.
    """
    t = packed.shape[0]
    return tuple(
        jnp.take(packed[i], ids_mat[i], axis=0) for i in range(t)
    )


def _stacked_gather_fwd(packed, ids_mat):
    return _stacked_gather(packed, ids_mat), (ids_mat, packed.shape)


def _stacked_gather_bwd(res, gs):
    # cotangents carry the packed stack's dtype (bf16 under
    # PACKED_FWD_BF16), so d_packed needs no cast
    ids_mat, (t, vocab, c) = res
    n = ids_mat.shape[1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (t, n))
    sids, order = jax.lax.sort_key_val(
        ids_mat.astype(jnp.int32), iota, dimension=1
    )
    if _segmat_multi_active(c):
        sg_t = _permute_transposed(
            [jnp.swapaxes(g, 0, 1) for g in gs], order
        )  # (T, C, N)
        grads_b = _segmat_batched_segmented(sids, sg_t, vocab)  # (T, C, V)
        d_packed = jnp.swapaxes(grads_b, 1, 2)  # (T, V, C)
    else:
        sg_rows = [jnp.take(g, order[i], axis=0) for i, g in enumerate(gs)]
        grads = _scatter_sorted_rows(
            [sids[i] for i in range(t)], sg_rows, vocab, c, gs[0].dtype
        )
        d_packed = jnp.stack(grads)
    return d_packed, None


_stacked_gather.defvjp(_stacked_gather_fwd, _stacked_gather_bwd)


def packed_lookup_stacked(packed, ids_list) -> list:
    """Stacked-storage packed lookup (see stacked_tables): per-table
    gathers from one (T, V, C) packed stack with a single batched
    sort/permute/segmat backward whose (T, V, C) grad reaches the
    stacked parameter leaf unsplit."""
    ids_mat = jnp.stack(
        [i.astype(jnp.int32).reshape(-1) for i in ids_list]
    )
    return list(_stacked_gather(packed, ids_mat))


@jax.custom_vjp
def _stacked_gather_split(stack, w_cols, ids_mat):
    """Stacked-storage gathers with PER-TABLE packed concats.

    Same contract as _stacked_gather, but the (V, C) packed matrices are
    built per table from slices of the (T, V, k) stack + (T, V) w
    columns — the default path's forward shape exactly — instead of one
    (T, V, C) concat. Isolates the stacked-leaf layout question from
    the 3-D-concat question (tools/bench_r5a.py variants S vs S2)."""
    t = stack.shape[0]
    return tuple(
        jnp.take(
            jnp.concatenate([stack[i], w_cols[i][:, None]], axis=1),
            ids_mat[i], axis=0,
        )
        for i in range(t)
    )


def _stacked_gather_split_fwd(stack, w_cols, ids_mat):
    return _stacked_gather_split(stack, w_cols, ids_mat), (
        ids_mat, stack.shape
    )


def _stacked_gather_split_bwd(res, gs):
    ids_mat, (t, vocab, k) = res
    c = k + 1
    n = ids_mat.shape[1]
    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32), (t, n))
    sids, order = jax.lax.sort_key_val(
        ids_mat.astype(jnp.int32), iota, dimension=1
    )
    if _segmat_multi_active(c):
        sg_t = _permute_transposed(
            [jnp.swapaxes(g, 0, 1) for g in gs], order
        )  # (T, C, N)
        grads_b = _segmat_batched_segmented(sids, sg_t, vocab)  # (T, C, V)
        d_stack = jnp.swapaxes(grads_b[:, :k, :], 1, 2)  # (T, V, k)
        d_w = grads_b[:, k, :]  # (T, V)
    else:
        sg_rows = [jnp.take(g, order[i], axis=0) for i, g in enumerate(gs)]
        grads = _scatter_sorted_rows(
            [sids[i] for i in range(t)], sg_rows, vocab, c, gs[0].dtype
        )
        d_packed = jnp.stack(grads)  # (T, V, C)
        d_stack = d_packed[:, :, :k]
        d_w = d_packed[:, :, k]
    return d_stack, d_w, None


_stacked_gather_split.defvjp(_stacked_gather_split_fwd, _stacked_gather_split_bwd)


# Stacked-storage forward form: True = per-table packed concats from
# slices of the stacked leaf (_stacked_gather_split), False = one
# (T, V, C) concat (_stacked_gather). Measurement flag for bench_r5a.
STACKED_SPLIT_CONCAT = True


def packed_lookup_stacked_split(stack, w_cols, ids_list) -> list:
    ids_mat = jnp.stack(
        [i.astype(jnp.int32).reshape(-1) for i in ids_list]
    )
    return list(_stacked_gather_split(stack, w_cols, ids_mat))


@jax.custom_vjp
def _lookup_multi_split(tables, vecs, ids_tuple):
    """Split-forward packed lookup: per table, gather (N, k) rows from the
    (V, k) table AND each (V,) vector column separately, returning the
    same (N, k + n_vec) packed rows a [table|vec...] concat-then-gather
    would — WITHOUT ever materializing the (V, k + n_vec) packed matrix.

    Why: the per-step packed concat costs ~0.63 ms/step at the bench
    config, and, worse, forces a ~1.0 ms column-major -> row-major
    relayout of all 26 packed matrices before the forward gathers (the
    table params live column-major because the segmat backward's
    transposed (k, V) grads feed Adam bitcast-free; profile 2026-08-21).
    Gathering the parts separately reads the params in whatever layout
    they live and pays only batch-sized concat writes (~0.1 ms).

    The BACKWARD still rides the one batched packed segmat: the (N, k+m)
    cotangents transpose/permute into (T, k+m, N) streams exactly as the
    packed form's would, one kernel produces (T, k+m, V) transposed
    grads, and the table/vector pieces split off as free row slices.
    """
    rows = []
    for t, vs, i in zip(tables, vecs, ids_tuple):
        parts = [jnp.take(t, i, axis=0)]
        parts += [jnp.take(v, i)[:, None] for v in vs]
        rows.append(jnp.concatenate(parts, axis=1))
    return tuple(rows)


def _lookup_multi_split_fwd(tables, vecs, ids_tuple):
    return (
        _lookup_multi_split(tables, vecs, ids_tuple),
        (ids_tuple, tables[0].shape, len(vecs[0])),
    )


def _lookup_multi_split_bwd(res, gs):
    ids_tuple, (vocab_size, k), n_vec = res
    t = len(ids_tuple)
    n = ids_tuple[0].shape[0]
    k_eff = k + n_vec

    sids, order = _batched_sort(ids_tuple)

    if _segmat_multi_active(k_eff):
        # cotangents arrive packed (N, k_eff) — the concat in the primal
        # means g already carries the vec columns; transpose/permute/
        # kernel exactly as the packed backward
        sg_t = _permute_transposed(
            [jnp.swapaxes(g, 0, 1) for g in gs], order
        )
        if SEGMAT_VK_OUT and n <= SEGMAT_SEGMENT_N:
            # row-major-out kernel: table grads leave (V, k) — Adam and
            # the forward gathers then agree on row-major params with no
            # relayout anywhere (see the kernel's docstring)
            grad_emb, grad_vec = _segment_matmul_from_sorted_batched_vk(
                sids, sg_t, vocab_size, k, n_vec
            )
            table_grads = tuple(grad_emb[i] for i in range(t))
            vec_grads = tuple(
                tuple(grad_vec[i, j] for j in range(n_vec))
                for i in range(t)
            )
            return table_grads, vec_grads, None
        grads_b = _segmat_batched_segmented(sids, sg_t, vocab_size)
        # (T, k_eff, V): rows :k are the table grad (transposed — the
        # swapaxes is a layout bitcast into Adam's column-major params),
        # row k+j is vector j's (V,) grad. Row slices of the row-major
        # (k_eff, V) block are free.
        table_grads = tuple(
            jnp.swapaxes(grads_b[i, :k, :], 0, 1) for i in range(t)
        )
        vec_grads = tuple(
            tuple(grads_b[i, k + j, :] for j in range(n_vec))
            for i in range(t)
        )
        return table_grads, vec_grads, None

    if n > PERMUTE_BATCHED_MAX_N:
        sg_rows = [jnp.take(g, order[i], axis=0) for i, g in enumerate(gs)]
    else:
        g_mat = jnp.stack(gs)  # (T, N, k_eff)
        sg = jnp.take_along_axis(g_mat, order[:, :, None], axis=1)
        sg_rows = [sg[i] for i in range(t)]

    packed = _scatter_sorted_rows(sids, sg_rows, vocab_size, k_eff,
                                  gs[0].dtype)
    table_grads = tuple(g[:, :k] for g in packed)
    vec_grads = tuple(
        tuple(g[:, k + j] for j in range(n_vec)) for g in packed
    )
    return table_grads, vec_grads, None


_lookup_multi_split.defvjp(_lookup_multi_split_fwd, _lookup_multi_split_bwd)


def packed_lookup_grouped(tables: list, vecs: list, ids_list: list) -> list:
    """Packed [table|vec...] lookup across features WITHOUT materializing
    per-feature packed matrices (see _lookup_multi_split).

    ``tables``: per-feature (V, k) tables; ``vecs``: per-feature tuples of
    (V,) vector columns (bias and/or linear w slice — every feature must
    have the same number); ``ids_list``: per-feature int ids (any shape).
    Returns per-feature (*ids.shape, k + n_vec) packed rows, exactly as a
    concat-then-gather would produce.

    Same-shape subsets share one batched sort/permute/segmat backward;
    singletons and non-fused tracing fall back to the explicit concat +
    embedding_lookup (the partitioner-friendly form).
    """
    assert len(tables) == len(vecs) == len(ids_list)
    import collections

    def _concat_fallback(p):
        packed = jnp.concatenate(
            [tables[p]] + [v[:, None] for v in vecs[p]], axis=1
        )
        return embedding_lookup(packed, ids_list[p])

    by_shape = collections.defaultdict(list)
    for pos, (t, i) in enumerate(zip(tables, ids_list)):
        by_shape[(t.shape, i.shape, len(vecs[pos]))].append(pos)

    out: list = [None] * len(tables)
    for positions in by_shape.values():
        if len(positions) == 1 or not _fused_active():
            for p in positions:
                out[p] = _concat_fallback(p)
        else:
            flat_ids = tuple(ids_list[p].reshape(-1) for p in positions)
            rows = _lookup_multi_split(
                tuple(tables[p] for p in positions),
                tuple(vecs[p] for p in positions),
                flat_ids,
            )
            k_eff = tables[positions[0]].shape[1] + len(vecs[positions[0]])
            for p, r in zip(positions, rows):
                out[p] = r.reshape(*ids_list[p].shape, k_eff)
    return out


def embedding_lookup_grouped(tables: list, ids_list: list) -> list:
    """Lookup across multiple tables -> list of row arrays.

    Same-shape subsets share the batched-sort backward
    (embedding_lookup_multi); the rest go per-table. Forward gathers stay
    per-table in all cases — a stacked (T, V, k) formulation turns them
    into ~27 ns/row random HBM reads (measured) — and scatters stay
    per-table for the indices_are_sorted fast path.
    """
    assert len(tables) == len(ids_list)
    import collections

    by_shape = collections.defaultdict(list)
    for pos, (t, i) in enumerate(zip(tables, ids_list)):
        by_shape[(t.shape, i.shape)].append(pos)

    out: list = [None] * len(tables)
    for positions in by_shape.values():
        if (
            len(positions) == 1
            or not _fused_active()
            or isinstance(tables[positions[0]], QuantTable)
        ):
            for p in positions:
                out[p] = embedding_lookup(tables[p], ids_list[p])
        else:
            rows = embedding_lookup_multi(
                [tables[p] for p in positions],
                [ids_list[p] for p in positions],
            )
            for p, r in zip(positions, rows):
                out[p] = r
    return out

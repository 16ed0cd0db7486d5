"""Fused embedding backward + Adam: one streaming pass per vocab tile.

The per-table update pipeline for an embedding table currently runs

    sort ids -> permute cotangents -> scatter-add dense grad (latency
    bound, ~12 ns/row) -> optax Adam (7 full-table HBM passes: read
    w,m,v,g; write w,m,v)

for ~4 ms/step across the bench config's 26 tables (tools/
profile_step.py; NOTES.md profile). This op fuses everything after the
sort into ONE kernel that never materializes the dense gradient:

    grid over vocab tiles; per tile t (rows [t*TV, (t+1)*TV)):
      1. the tile's slice [start, end) of the SORTED (ids, cotangent)
         stream comes from prefetched searchsorted bounds;
      2. grad_tile = Σ_chunks onehot(ids_chunk - base) @ g_chunk — an
         MXU mask-matmul over the tile's own rows only (empty tiles,
         the vast majority at CTR vocab sizes, skip the loop entirely);
      3. optional dense L2 term: grad += 2*l2*w (the tower L2 the models
         add to the loss — folding it here keeps the outside grad sparse);
      4. Adam (exactly optax.adam's math, bias correction included)
         updates w/m/v tiles in VMEM and writes them back.

Traffic: 6 table-sized HBM passes total (r/w of w,m,v) — the
information-theoretic floor for dense-Adam semantics — with no scatter
latency and no dense-grad round trip.

Semantics are IDENTICAL to scatter-grad + optax.adam (duplicates sum;
untouched rows still decay their moments); tests/test_sparse_adam.py
checks bit-level agreement within f32 accumulation order. Single-shard
only (like the other fused ops — the SPMD path keeps optax). Not yet
wired into the Trainer: that needs the row-cotangent capture hook and
optimizer-state surgery (NOTES.md round-2 lead 1); this op is the
measured, tested kernel half.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _round_up(x, m):
    return (x + m - 1) // m * m


def storage_vpad(vocab: int, tile_v: int = 512) -> int:
    """Padded row count that makes segment_adam_update's internal padding a
    no-op for a (vocab, k) table at this tile size — persistent storage
    (training/fused_adam.py) pre-pads to this so the per-step call never
    copies the table."""
    tile_v = min(tile_v, _round_up(vocab, 8))
    return _round_up(vocab, tile_v)


def _kernel(tile_v, chunk_n, b1, b2, eps, has_l2, bounds_ref,
            sids_ref, sg_ref, w_ref, m_ref, v_ref, lr_ref, t_ref,
            *refs):
    if has_l2:
        l2_ref, w_out, m_out, v_out = refs
    else:
        l2_ref, (w_out, m_out, v_out) = None, refs
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    base = t * tile_v
    start = bounds_ref[t]
    end = bounds_ref[t + 1]
    num_chunks = pl.cdiv(end - start, chunk_n)
    k = sg_ref.shape[1]

    def chunk_body(c, acc):
        off = start + c * chunk_n
        sid_chunk = sids_ref[pl.ds(off, chunk_n), :]  # (CHUNK, 1)
        rows = jax.lax.broadcasted_iota(jnp.int32, (chunk_n, tile_v), 1)
        # padded sids hold V_pad (match no tile); no extra valid mask
        mask = (sid_chunk - base == rows).astype(jnp.float32)
        gc = sg_ref[pl.ds(off, chunk_n), :]  # (CHUNK, k)
        return acc + jax.lax.dot_general(
            mask, gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    grad = jnp.zeros((tile_v, k), dtype=jnp.float32)
    grad = jax.lax.fori_loop(0, num_chunks, chunk_body, grad)

    w = w_ref[:]
    if has_l2:
        # per-column L2 coefficients (a packed [table|bias|w] matrix mixes
        # towers with different l2_reg); grad += 2*l2*w per column. Passed
        # as a (1, k) input — Pallas rejects array constants in the kernel
        grad = grad + (2.0 * l2_ref[:]) * w

    # optax.adam: m,v EMAs with bias correction, update = mhat/(sqrt(vhat)+eps)
    import math

    step = t_ref[0].astype(jnp.float32)  # 1-based step count
    m = b1 * m_ref[:] + (1.0 - b1) * grad
    v = b2 * v_ref[:] + (1.0 - b2) * grad * grad
    # b**step as exp(step*log(b)) — Mosaic has no powf lowering
    mhat = m / (1.0 - jnp.exp(step * math.log(b1)))
    vhat = v / (1.0 - jnp.exp(step * math.log(b2)))
    w_out[:] = w - lr_ref[0] * mhat / (jnp.sqrt(vhat) + eps)
    m_out[:] = m
    v_out[:] = v


def segment_adam_update(w, m, v, sids, sg, *, lr, step, b1=0.9, b2=0.999,
                        eps=1e-8, l2=0.0, tile_v=512, chunk_n=512,
                        interpret=None):
    """One fused sparse-grad Adam step on table ``w`` (V, k).

    ``sids`` (N,) int32 SORTED ascending ids; ``sg`` (N, k) the matching
    (permuted) cotangent rows — exactly what ops.embedding's sorted
    backward machinery produces before its scatter. ``step`` is the
    1-based Adam step count (int array or python int); ``lr`` may be a
    traced scalar (schedules). ``l2`` is a scalar or a per-column
    sequence (len k) of L2 coefficients, each applied as grad += 2*l2*w.
    Returns (w', m', v').

    If ``w.shape[0]`` is already a multiple of the effective tile size
    (see ``storage_vpad``) no padding happens — persistent pre-padded
    storage (training/fused_adam.py) round-trips with zero copies.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    l2s = tuple(float(x) for x in l2) if isinstance(l2, (tuple, list)) else None
    vocab, k = w.shape
    if l2s is None:
        l2s = (float(l2),) * k
    assert len(l2s) == k, (len(l2s), k)
    n = sids.shape[0]
    tile_v = min(tile_v, _round_up(vocab, 8))
    chunk_n = min(chunk_n, _round_up(n, 8))
    v_pad = _round_up(vocab, tile_v)
    num_tiles = v_pad // tile_v
    n_pad = _round_up(n, chunk_n) + chunk_n  # slack: dynamic chunk reads
    # starting anywhere in [0, n) stay in bounds

    sids_p = jnp.full((n_pad, 1), v_pad, dtype=jnp.int32).at[:n, 0].set(
        sids.astype(jnp.int32)
    )
    sg_p = jnp.zeros((n_pad, k), dtype=jnp.float32).at[:n].set(
        sg.astype(jnp.float32)
    )
    bounds = jnp.searchsorted(
        sids.astype(jnp.int32),
        jnp.arange(0, v_pad + tile_v, tile_v, dtype=jnp.int32),
    ).astype(jnp.int32)
    lr_arr = jnp.asarray(lr, jnp.float32).reshape(1)
    t_arr = jnp.asarray(step, jnp.int32).reshape(1)

    pad_rows = v_pad - vocab
    if pad_rows:
        padw = [(0, pad_rows), (0, 0)]
        w = jnp.pad(w, padw)
        m = jnp.pad(m, padw)
        v = jnp.pad(v, padw)

    has_l2 = any(l2s)
    in_specs = [
        pl.BlockSpec((n_pad, 1), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_pad, k), lambda t, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_v, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1,), lambda t, b: (0,), memory_space=pltpu.SMEM),
        pl.BlockSpec((1,), lambda t, b: (0,), memory_space=pltpu.SMEM),
    ]
    inputs = [bounds, sids_p, sg_p, w, m, v, lr_arr, t_arr]
    if has_l2:
        in_specs.append(
            pl.BlockSpec((1, k), lambda t, b: (0, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(jnp.asarray(l2s, jnp.float32)[None, :])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,  # bounds -> SMEM
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_v, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_v, k), lambda t, b: (t, 0), memory_space=pltpu.VMEM),
        ],
    )
    w2, m2, v2 = pl.pallas_call(
        functools.partial(_kernel, tile_v, chunk_n, b1, b2, eps, has_l2),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((v_pad, k), jnp.float32)] * 3,
        interpret=(jax.default_backend() != "tpu") if interpret is None
        else interpret,
    )(*inputs)
    if pad_rows:
        return w2[:vocab], m2[:vocab], v2[:vocab]
    return w2, m2, v2

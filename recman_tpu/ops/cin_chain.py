"""Whole-chain fused CIN: every layer + bias + activation + direct-connect
split + embedding-dim pooling in ONE forward and ONE backward Pallas call.

Motivation (round-5 profile, NOTES.md): with per-layer kernels the step
spends ~5 ms in a herd of ~60 small copy/relayout/convert ops around the
CIN tower — every (O, B*D) fmap round-trips HBM between the Pallas call,
the XLA bias+activation fusion, the direct-connect slice and the pooling
reduce, and each boundary re-layouts. No single op exceeds ~0.1 ms, so the
only way to attack the herd is structural: keep the whole tower's dataflow
inside VMEM.

Reference semantics (recman/tf/core/layers.py:711-760): per layer
    pre[o, n] = sum_{h,m} x0[h, n] * xk[m, n] * W[h*Hk+m, o] + b[o]
    fmap      = act(pre)                               n = b*D + d
first half of a non-final fmap feeds the next layer, the rest (all of the
final fmap) are direct-connect outputs, which sum-pool over the embedding
dim and project to the logit.

Design (the measured round-6 iteration chain is in BASELINE.md):
- Field-major (fields, B*D) layout throughout, like ops/cin_interact.py —
  the 128-lane axis is B*D (the big dim on lanes; the narrow-minor rule).
- FORWARD kernel, per B*D tile: fill a shared VMEM z scratch group-by-
  group on the VPU and contract it in ONE MXU dot per layer (K = G*128 —
  accumulating per-group K=128 dots instead measured -7% end to end),
  apply bias+activation in-register, then pool each direct block with
  one (t, t/D)-poolmat MXU dot (0/1 matrix built from iota) emitting
  batch-major (t/D, F_i) blocks. Nothing intermediate leaves VMEM except
  the pooled outputs and — under CHAIN_SAVE_FMAPS, the default — the two
  fmaps for the backward.
- BACKWARD kernel, per tile: reads the saved fmaps (default; ABAB +5.8%
  over recomputing — the 2x 52 MB HBM round trip costs less than the
  VPU-serial z-fills + layer dots) or RECOMPUTES them in VMEM when
  CHAIN_SAVE_FMAPS=False, then walks the layers in reverse:
  gpre = dfmap * act'(fmap); dW = z @ gpre^T as one big dot over the z
  scratch; per 128-row group u_g = W_g @ gpre gives the z-cotangent rows
  consumed immediately for dx0 / dxk. dW/db accumulate across the grid.
- Residuals: x0c, the params, and (save mode) the fmaps. With
  CHAIN_SAVE_FMAPS=False activation memory is O(B*D*H0) regardless of
  depth — the remat-style fallback for extreme batches (measured
  unnecessary through 131,072).

Eligibility (layers/cin.py gates): TPU fused path, activation in
{identity, relu, leaky_relu} (derivative recoverable from fmap), and all
in-chain dropout keep-probs == 1 (the reference default; input dropout
happens before the chain and is unrestricted). Anything else falls back
to the per-layer kernels.

Numerics: identical op structure to the per-layer path (bf16 z/W
multiplicands, f32 accumulation, f32 bias+activation); the pooling sum
runs as an f32 MXU dot with a 0/1 matrix instead of a VPU reduce, so
results match the per-layer path to f32 round-off (tests/test_cin_chain.py
asserts tight tolerances; the default flip carries the usual quality
gates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .cin_interact import _pack_dims, _pack_w, _unpack_w

# B*D tile widths (lane columns per grid step). Both kernels hold a
# (x_pad_max, t) bf16 z scratch plus W+fmap scratches (the backward adds
# dW accumulators). Tile ABAB at the bench geometry (tools/abab.py
# base,base+ctb2048,base+ctf2048 2026-08-21, 3/3 rounds): bwd t=2048
# 935.7k vs 924.9k ex/s (+1.2%, ~16 MB naive scoped set — compiles and
# wins); fwd t=2048 was noise-to-slightly-negative (921.99k), so the
# forward stays at 1024. t=4096 would put the bwd z scratch alone at
# 13.6 MB — over budget, not attempted.
CHAIN_TILE_FWD = 1024
CHAIN_TILE_BWD = 2048

# DEFAULT (ABAB 2026-08-21, tools/abab.py base,base+savefm, 3 clean
# rounds): the forward WRITES fmaps to HBM and the backward reads them
# instead of recomputing — 989.0k vs 934.8k ex/s median (+5.8%, 8.28 vs
# 8.75 ms/step) at the bench geometry. The ~2x 52 MB of extra HBM
# traffic costs less than the recompute's z-fills + layer dots; the
# trajectories are identical (the recompute reproduced the same values
# deterministically). Activation memory returns to O(B*D*O_total) —
# re-measured fine through batch 131,072; flip False to recover the
# O(B*D*H0) remat-style footprint for even larger batches.
CHAIN_SAVE_FMAPS = True

_SUPPORTED_ACTS = ("identity", "relu", "leaky_relu")


def _act(kind, x):
    if kind == "relu":
        return jnp.maximum(x, 0.0)
    if kind == "leaky_relu":
        # matches jax.nn.leaky_relu(negative_slope=0.2)
        return jnp.where(x >= 0, x, 0.2 * x)
    return x


def _act_deriv(kind, fmap):
    """d act/d pre recovered from the ACTIVATION OUTPUT (valid for the
    supported set: fmap > 0 <=> pre > 0; exact-zero pre is measure-zero
    for leaky/identity and has derivative 0 for relu, same as jax)."""
    if kind == "relu":
        return (fmap > 0).astype(jnp.float32)
    if kind == "leaky_relu":
        return jnp.where(fmap > 0, 1.0, 0.2)
    return None  # identity: multiply skipped


class _LayerCfg:
    """Static per-layer geometry (python ints only — trace-safe)."""

    __slots__ = ("h0", "hk", "o", "half", "hkp", "p", "g", "x_pad", "final")

    def __init__(self, h0, hk, o, final):
        self.h0, self.hk, self.o, self.final = h0, hk, o, final
        self.hkp, self.p, self.g = _pack_dims(h0, hk)
        self.x_pad = self.g * 128
        self.half = o if final else o // 2


def _layer_cfgs(h0: int, units: tuple[int, ...]) -> list[_LayerCfg]:
    cfgs, hk = [], h0
    for i, o in enumerate(units):
        final = i == len(units) - 1
        cfgs.append(_LayerCfg(h0, hk, o, final))
        hk = o // 2
    return cfgs


def _x0_rows(cfgs) -> int:
    """Sublane rows for the padded x0 / dx0 blocks: every layer's group
    loop indexes fields up to g*p, and layer 0's dxk accumulator is hkp_0
    rows re-added into dx0."""
    return max(max(c.g * c.p for c in cfgs), cfgs[0].hkp)


def _poolmat(t: int, d: int):
    """0/1 pooling matrix (t, t/d) with [n, j] = (n // d == j), built from
    2-D iota in-kernel (free vs an HBM operand). Contracting a field-major
    (F, t) block's lane axis against dim 0 pools the embedding dim and
    transposes to batch-major (t/d, F) in the same MXU dot — the pooled
    arrays live as (B, F) so their Mosaic blocks are (t/d, F) with the
    full array's last dim (lane-dim blocks below 128 are rejected
    otherwise), and the head matmul consumes (B, F) directly."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (t, t // d), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (t, t // d), 1)
    return (rows // d == cols).astype(jnp.float32)


def _load_xkp_rows(src_ref, hk, hkp, t):
    """(hk, t) leading rows of a ref, zero-padded to (hkp, t) sublanes."""
    import jax.experimental.pallas as pl

    xk = src_ref[pl.ds(0, hk), :] if src_ref.shape[0] != hk else src_ref[:]
    if hkp > hk:
        xk = jnp.concatenate(
            [xk, jnp.zeros((hkp - hk, t), dtype=xk.dtype)], axis=0
        )
    return xk


def _fill_z(z_ref, x0_ref, xkp_bf, cfg):
    """Write layer cfg's z rows (bf16) into the shared VMEM scratch,
    group by group (full-lane VPU broadcast multiplies, exactly the
    per-layer forward kernel's structure). The one big MXU contraction
    over the materialized z is ~2x faster than accumulating per-group
    K=128 dots (measured in-step: 1.018 -> 0.58 ms forward)."""
    import jax.experimental.pallas as pl

    p, hkp = cfg.p, cfg.hkp
    for grp in range(cfg.g):
        parts = []
        for j in range(p):
            x0_row = x0_ref[pl.ds(grp * p + j, 1), :].astype(jnp.bfloat16)
            parts.append(x0_row * xkp_bf)
        z_ref[grp * 128 : (grp + 1) * 128, :] = (
            parts[0] if p == 1 else jnp.concatenate(parts, axis=0)
        )


def _layer_pre(z_ref, w_ref, cfg):
    """pre = W_pad^T @ z, one MXU dot over the scratch z. (o, t) f32."""
    import jax.experimental.pallas as pl

    z = z_ref[pl.ds(0, cfg.x_pad), :]
    return jax.lax.dot_general(
        w_ref[:].astype(jnp.bfloat16), z, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _recompute_fmaps(cfgs, act, t, x0_ref, w_refs, b_refs, fmap_refs,
                     xkp_refs, z_ref):
    """Forward recompute into VMEM scratches: fmap_refs[i] (o_i, t),
    xkp_refs[i] (hkp_i, t) — the zero-padded xk each layer consumed —
    and z_ref left holding the LAST layer's z rows."""
    for i, cfg in enumerate(cfgs):
        if i == 0:
            xkp_refs[0][:] = _load_xkp_rows(x0_ref, cfg.hk, cfg.hkp, t)
        else:
            xkp_refs[i][:] = _load_xkp_rows(
                fmap_refs[i - 1], cfg.hk, cfg.hkp, t
            )
        _fill_z(z_ref, x0_ref, xkp_refs[i][:].astype(jnp.bfloat16), cfg)
        fmap_refs[i][:] = _act(act, _layer_pre(z_ref, w_ref=w_refs[i],
                                               cfg=cfg) + b_refs[i][:])


def _fill_xkps(cfgs, t, x0_ref, fmap_refs, xkp_refs):
    """xkp scratches from x0 / saved fmap leading slices (the save-fmaps
    backward — no recompute)."""
    for i, cfg in enumerate(cfgs):
        src = x0_ref if i == 0 else fmap_refs[i - 1]
        xkp_refs[i][:] = _load_xkp_rows(src, cfg.hk, cfg.hkp, t)


def _chain_fwd_kernel(cfgs, act, d, t, x0_ref, *refs):
    # with CHAIN_SAVE_FMAPS the fmap refs are OUTPUTS (written to HBM
    # for the backward) instead of scratches — same positions either
    # way, identical body
    n = len(cfgs)
    w_refs = refs[:n]
    b_refs = refs[n : 2 * n]
    out_refs = refs[2 * n : 3 * n]
    fmap_refs = refs[3 * n : 4 * n]
    xkp_refs = refs[4 * n : 5 * n]
    z_ref = refs[5 * n]

    import jax.experimental.pallas as pl  # noqa: F401  (parity w/ bwd)

    _recompute_fmaps(cfgs, act, t, x0_ref, w_refs, b_refs, fmap_refs,
                     xkp_refs, z_ref)
    pm = _poolmat(t, d)
    for i, cfg in enumerate(cfgs):
        import jax.experimental.pallas as pl

        direct = (
            fmap_refs[i][:] if cfg.final
            else fmap_refs[i][pl.ds(cfg.half, cfg.o - cfg.half), :]
        )
        # (t, t/d) poolmat contracted with (F, t) -> batch-major (t/d, F)
        out_refs[i][:] = jax.lax.dot_general(
            pm, direct, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )


def _chain_bwd_kernel(cfgs, act, d, t, save, x0_ref, *refs):
    import jax.experimental.pallas as pl

    n = len(cfgs)
    w_refs = refs[:n]
    b_refs = refs[n : 2 * n]
    g_refs = refs[2 * n : 3 * n]          # dpooled, batch-major (t/d, F_i)
    if save:
        # saved fmaps arrive as the last INPUTS; no recompute below
        fmap_refs = refs[3 * n : 4 * n]
        dx0_ref = refs[4 * n]
        dw_refs = refs[4 * n + 1 : 5 * n + 1]
        db_refs = refs[5 * n + 1 : 6 * n + 1]
        xkp_refs = refs[6 * n + 1 : 7 * n + 1]
        z_ref = refs[7 * n + 1]
    else:
        dx0_ref = refs[3 * n]
        dw_refs = refs[3 * n + 1 : 4 * n + 1]
        db_refs = refs[4 * n + 1 : 5 * n + 1]
        fmap_refs = refs[5 * n + 1 : 6 * n + 1]
        xkp_refs = refs[6 * n + 1 : 7 * n + 1]
        z_ref = refs[7 * n + 1]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for i in range(n):
            dw_refs[i][:] = jnp.zeros_like(dw_refs[i])
            db_refs[i][:] = jnp.zeros_like(db_refs[i])

    if save:
        _fill_xkps(cfgs, t, x0_ref, fmap_refs, xkp_refs)
    else:
        _recompute_fmaps(cfgs, act, t, x0_ref, w_refs, b_refs, fmap_refs,
                         xkp_refs, z_ref)
    # without save, z_ref now holds the LAST layer's z — the first layer
    # the reversed loop below processes, so its dW big-dot reads it as-is

    dx0_ref[:] = jnp.zeros_like(dx0_ref)
    pm = _poolmat(t, d)

    dxk_next = None  # cotangent for fmap_{i-1}[:half] from layer i
    for i in reversed(range(len(cfgs))):
        cfg = cfgs[i]
        # dfmap: direct rows get the pooled cotangent broadcast back to
        # field-major in one MXU dot (g is batch-major (t/d, F_i)); feed
        # rows get dxk from the layer above
        g_direct = jax.lax.dot_general(
            g_refs[i][:], pm, (((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (F_i, t)
        if cfg.final:
            dfmap = g_direct
        else:
            dfmap = jnp.concatenate(
                [dxk_next[: cfg.half, :], g_direct], axis=0
            )
        deriv = _act_deriv(act, fmap_refs[i][:])
        gpre = dfmap if deriv is None else dfmap * deriv
        db_refs[i][:] += jnp.sum(gpre, axis=1, keepdims=True)
        gpre_bf = gpre.astype(jnp.bfloat16)

        xkp = xkp_refs[i][:]

        # dW = z @ gpre^T as ONE big MXU dot over the scratch z (K = t);
        # the recompute left z holding the last layer's rows, earlier
        # layers rebuild theirs (cheap VPU broadcasts — the same work
        # the old per-group rebuild did, minus the per-group dot setup)
        if save or i != len(cfgs) - 1:
            _fill_z(z_ref, x0_ref, xkp.astype(jnp.bfloat16), cfg)
        dw_refs[i][:] += jax.lax.dot_general(
            z_ref[pl.ds(0, cfg.x_pad), :], gpre_bf,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        def body(grp, dxk_acc, cfg=cfg, gpre_bf=gpre_bf, xkp=xkp,
                 w_ref=w_refs[i]):
            w_g = w_ref[pl.ds(grp * 128, 128), :].astype(jnp.bfloat16)
            u_g = jax.lax.dot_general(
                w_g, gpre_bf, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (128, t) z-cotangent rows
            for j in range(cfg.p):
                h = grp * cfg.p + j
                u_h = u_g[j * cfg.hkp : (j + 1) * cfg.hkp, :]
                dx0_ref[pl.ds(h, 1), :] += jnp.sum(
                    u_h * xkp, axis=0, keepdims=True
                )
                x0_row = x0_ref[pl.ds(h, 1), :]
                dxk_acc = dxk_acc + u_h * x0_row
            return dxk_acc

        dxk_acc = jax.lax.fori_loop(
            0, cfg.g, body, jnp.zeros((cfg.hkp, t), dtype=jnp.float32)
        )
        if i == 0:
            # layer 0's xk IS x0: its dxk lands on dx0 (pad rows of
            # dxk_acc are exact zeros — W pad rows are zero)
            rows = dx0_ref.shape[0]
            add = dxk_acc
            if rows > cfg.hkp:
                add = jnp.concatenate(
                    [add, jnp.zeros((rows - cfg.hkp, t), jnp.float32)], 0
                )
            dx0_ref[:] += add[:rows, :]
        else:
            dxk_next = dxk_acc


def _pick_chain_tile(bd: int, d: int, want: int) -> int | None:
    """Largest tile <= want that divides bd, is lane-aligned (128) and a
    multiple of d. None if impossible."""
    t = want
    while t >= 128:
        if bd % t == 0 and t % d == 0 and t % 128 == 0:
            return t
        t //= 2
    return None


def chain_supported(h0: int, units, d: int, bd: int, act) -> bool:
    """Static eligibility of the fused chain for this geometry."""
    if act not in _SUPPORTED_ACTS:
        return False
    if not units or any(u % 2 for u in units[:-1]):
        return False
    cfgs = _layer_cfgs(h0, units)
    if max(c.hk for c in cfgs) > 128 or max(c.o for c in cfgs) > 512:
        return False
    return _pick_chain_tile(bd, d, CHAIN_TILE_FWD) is not None and \
        _pick_chain_tile(bd, d, CHAIN_TILE_BWD) is not None


def _pad_x0(x0c, rows):
    h0 = x0c.shape[0]
    if rows > h0:
        x0c = jnp.pad(x0c, ((0, rows - h0), (0, 0)))
    return x0c


def _chain_fwd_pallas(x0c, ws, bs, units, d, act, interpret, save=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h0, bd = x0c.shape
    cfgs = _layer_cfgs(h0, units)
    rows = _x0_rows(cfgs)
    t = _pick_chain_tile(bd, d, CHAIN_TILE_FWD)
    x0p = _pad_x0(x0c, rows)
    ws_pad = [_pack_w(w, cfg.h0, cfg.hk) for w, cfg in zip(ws, cfgs)]
    bs2 = [b[:, None] for b in bs]  # (o, 1) lane-broadcastable blocks

    n = len(cfgs)
    grid = (bd // t,)
    in_specs = (
        [pl.BlockSpec((rows, t), lambda i: (0, i),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((c.x_pad, c.o), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in cfgs]
        + [pl.BlockSpec((c.o, 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in cfgs]
    )
    n_direct = [c.o - c.half if not c.final else c.o for c in cfgs]
    # pooled outputs are batch-major (B, F_i): blocks (t/d, F_i) keep the
    # full array's lane dim (Mosaic rejects lane-dim blocks below 128)
    out_specs = [
        pl.BlockSpec((t // d, nd), lambda i: (i, 0),
                     memory_space=pltpu.VMEM)
        for nd in n_direct
    ]
    out_shape = [
        jax.ShapeDtypeStruct((bd // d, nd), jnp.float32) for nd in n_direct
    ]
    scratch = (
        [pltpu.VMEM((c.hkp, t), jnp.float32) for c in cfgs]
        + [pltpu.VMEM((max(c.x_pad for c in cfgs), t), jnp.bfloat16)]
    )
    if save:
        # fmaps become OUTPUTS right after the pooled blocks (the ref
        # order the kernel sees is identical to the scratch form)
        out_specs = out_specs + [
            pl.BlockSpec((c.o, t), lambda i: (0, i),
                         memory_space=pltpu.VMEM) for c in cfgs
        ]
        out_shape = out_shape + [
            jax.ShapeDtypeStruct((c.o, bd), jnp.float32) for c in cfgs
        ]
    else:
        scratch = [pltpu.VMEM((c.o, t), jnp.float32) for c in cfgs] + scratch
    out = pl.pallas_call(
        functools.partial(_chain_fwd_kernel, cfgs, act, d, t),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x0p, *ws_pad, *bs2)
    del n  # out_shape is a list, so pallas_call returns a list of arrays
    return tuple(out)


def _chain_bwd_pallas(x0c, ws, bs, gs, units, d, act, interpret,
                      fmaps=()):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h0, bd = x0c.shape
    cfgs = _layer_cfgs(h0, units)
    rows = _x0_rows(cfgs)
    t = _pick_chain_tile(bd, d, CHAIN_TILE_BWD)
    x0p = _pad_x0(x0c, rows)
    ws_pad = [_pack_w(w, cfg.h0, cfg.hk) for w, cfg in zip(ws, cfgs)]
    bs2 = [b[:, None] for b in bs]
    save = bool(fmaps)

    n = len(cfgs)
    n_direct = [c.o - c.half if not c.final else c.o for c in cfgs]
    grid = (bd // t,)
    in_specs = (
        [pl.BlockSpec((rows, t), lambda i: (0, i),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((c.x_pad, c.o), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in cfgs]
        + [pl.BlockSpec((c.o, 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in cfgs]
        + [pl.BlockSpec((t // d, nd), lambda i: (i, 0),
                        memory_space=pltpu.VMEM) for nd in n_direct]
        + ([pl.BlockSpec((c.o, t), lambda i: (0, i),
                         memory_space=pltpu.VMEM) for c in cfgs]
           if save else [])
    )
    out_specs = (
        [pl.BlockSpec((rows, t), lambda i: (0, i),
                      memory_space=pltpu.VMEM)]
        + [pl.BlockSpec((c.x_pad, c.o), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in cfgs]
        + [pl.BlockSpec((c.o, 1), lambda i: (0, 0),
                        memory_space=pltpu.VMEM) for c in cfgs]
    )
    out_shape = (
        [jax.ShapeDtypeStruct((rows, bd), jnp.float32)]
        + [jax.ShapeDtypeStruct((c.x_pad, c.o), jnp.float32) for c in cfgs]
        + [jax.ShapeDtypeStruct((c.o, 1), jnp.float32) for c in cfgs]
    )
    scratch = [pltpu.VMEM((c.hkp, t), jnp.float32) for c in cfgs] + [
        pltpu.VMEM((max(c.x_pad for c in cfgs), t), jnp.bfloat16)
    ]
    if not save:
        scratch = [pltpu.VMEM((c.o, t), jnp.float32) for c in cfgs] + scratch
    outs = pl.pallas_call(
        functools.partial(_chain_bwd_kernel, cfgs, act, d, t, save),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x0p, *ws_pad, *bs2, *gs, *fmaps)
    dx0 = outs[0][:h0, :]
    dws = tuple(
        _unpack_w(outs[1 + i], cfgs[i].h0, cfgs[i].hk) for i in range(n)
    )
    dbs = tuple(outs[1 + n + i][:, 0] for i in range(n))
    return dx0, dws, dbs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _chain_fm(x0c, ws, bs, units, d, act, interpret, save):
    out = _chain_fwd_pallas(x0c, ws, bs, units, d, act, interpret,
                            save=save)
    return out[: len(units)]


def _chain_fm_fwd(x0c, ws, bs, units, d, act, interpret, save):
    out = _chain_fwd_pallas(x0c, ws, bs, units, d, act, interpret,
                            save=save)
    n = len(units)
    return out[:n], (x0c, ws, bs, out[n:])


def _chain_fm_bwd(units, d, act, interpret, save, res, gs):
    x0c, ws, bs, fmaps = res
    dx0, dws, dbs = _chain_bwd_pallas(
        x0c, ws, bs, gs, units, d, act, interpret, fmaps=fmaps
    )
    return dx0, dws, dbs


_chain_fm.defvjp(_chain_fm_fwd, _chain_fm_bwd)


def cin_chain_fm(x0c, ws, bs, units, d, act="leaky_relu"):
    """Fused whole-chain CIN in field-major layout.

    x0c (H0, B*D) f32, ws/bs per-layer (H0*Hk_i, O_i)/(O_i,) params,
    units = cross_layer_units, d = embedding size, act in
    {identity, relu, leaky_relu}. Returns a tuple of per-layer pooled
    direct-connect blocks, each BATCH-MAJOR (B, F_i) f32 — concatenated
    along axis 1 in order, they are the (B, final_size) pooled result
    the head matmul consumes directly.
    """
    interpret = jax.default_backend() != "tpu"
    return _chain_fm(
        x0c, tuple(ws), tuple(bs), tuple(units), d, act, interpret,
        bool(CHAIN_SAVE_FMAPS),
    )

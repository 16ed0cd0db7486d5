"""Fused CIN interaction op: outer product + compression in one kernel.

The CIN layer computes, per embedding position d (reference layers.py:
711-736; our einsum form in layers/cin.py):

    pre[b, d, o] = sum_{h,m} x0[b, d, h] * xk[b, d, m] * W[h*Hk + m, o]

XLA materializes the intermediate z[b, d, h*Hk+m] (340 MB bf16 at batch
8192, X=1300) in HBM and layout-copies it — profiled at ~6.7 ms/step
across both CIN layers (fwd + bwd: the z copies, convert fusions and
multiply/reduce backward fusions in tools/profile_step.py output). This
op keeps z entirely in VMEM.

Kernel formulation — FIELD-MAJOR: all tensors live as (fields, B*D),
i.e. the batch*embedding product is the 128-lane dimension and the
field axis is sublanes:

    x0: (H0, BD)   xk: (Hk, BD)   out: (O, BD)   z: (X_pad, BD-tile)

- Every VPU op (the z outer-product rows, dx0/dxk reductions) runs at
  full 128-lane width; an earlier (B, D, H)-layout kernel did all its
  elementwise work on Hk<=64-lane slices and LOST to the einsum
  (measured 3.07 vs 2.13 ms fwd).
- z rows for field h are a (HKP, tbd) broadcast-multiply written at
  16-aligned sublane offsets; Hk pads to HKP in {32, 64, 128} and
  P = 128/HKP fields share each 128-row group, so the one MXU
  contraction per tile has K = G*128 only ~1.3x padded.
- The backward runs a fori_loop over groups (statically-unrolled group
  values all stay live at once in Mosaic's scoped-VMEM accounting and
  OOM the 16 MB budget): u_g = W_g @ g is one (128, tbd) matmul per
  group, consumed immediately for dx0/dxk/dW.
- The layer keeps the WHOLE CIN chain field-major (layers/cin.py): the
  kernel's (O, BD) output feeds the next layer's xk as a leading-dim
  slice, so there are no transposes anywhere — including the backward,
  whose cotangents arrive field-major too. bf16 multiplicands / f32
  accumulation, the same precision XLA picks for the einsum.

W is repacked to the padded row order with pure reshapes/pads outside
the kernel (and dW unpacked the same way), so checkpointed parameters
keep the reference layout.

Falls back to the pure-XLA einsum when not on TPU, when Hk > 128, or
when the SPMD trainer disables fused ops (ops.embedding.fused_grad(False))
so the XLA partitioner keeps sharded inputs working.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .embedding import _fused_active


def _einsum_interact(x0t, xkt, w, dtype=jnp.bfloat16):
    """Reference semantics in XLA (fallback path), (B, D, H) layout.

    ``dtype`` is the precision of the z intermediate and the MXU
    multiplicands (accumulation is always f32). bf16 z halves the
    dominant HBM traffic of the layer: measured 21.2 -> 17.0 ms/step
    (+24% throughput) on the bench config with loss identical to 4
    decimals; pass jnp.float32 for strict-f32 studies.
    """
    b, d, h0 = x0t.shape
    hk = xkt.shape[2]
    z = jnp.einsum(
        "bdh,bdm->bdhm", x0t.astype(dtype), xkt.astype(dtype)
    ).reshape(b, d, h0 * hk)
    return jnp.einsum(
        "bdx,xo->bdo", z, w.astype(dtype), preferred_element_type=jnp.float32
    )


def _pack_dims(h0: int, hk: int) -> tuple[int, int, int]:
    """(HKP, P, G): sublane-pad width, fields per 128-row group, groups."""
    if hk <= 32:
        hkp = 32
    elif hk <= 64:
        hkp = 64
    else:
        hkp = 128
    p = 128 // hkp
    g = -(-h0 // p)
    return hkp, p, g


def _pack_w(w, h0: int, hk: int):
    """(h0*hk, O) reference row order -> (G*128, O) padded kernel order.

    Row h*hk+m lands at g*128 + j*HKP + m where h = g*P + j. Pure
    reshapes/pads — no gather."""
    hkp, p, g = _pack_dims(h0, hk)
    o = w.shape[1]
    w3 = w.reshape(h0, hk, o)
    w3 = jnp.pad(w3, ((0, g * p - h0), (0, hkp - hk), (0, 0)))
    return w3.reshape(g, 128, o).reshape(g * 128, o)


def _unpack_w(w_pad, h0: int, hk: int):
    """Adjoint of _pack_w: (G*128, O) -> (h0*hk, O)."""
    hkp, p, g = _pack_dims(h0, hk)
    o = w_pad.shape[1]
    w4 = w_pad.reshape(g * p, hkp, o)
    return w4[:h0, :hk].reshape(h0 * hk, o)


def _pick_tile(bd, col_bytes, budget_bytes=4 * 1024 * 1024):
    """Largest BD tile (lane columns per grid step) whose VMEM working set
    fits the budget. Mosaic's scoped accounting runs ~2-3x a naive
    estimate, hence the conservative default."""
    tbd = 4096
    while tbd > 128 and tbd * col_bytes > budget_bytes:
        tbd //= 2
    while bd % tbd != 0 and tbd > 1:
        tbd //= 2
    return max(tbd, 1)


def _load_xkp(xk_ref, hk, hkp):
    """(hk, tbd) block, zero-padded to (HKP, tbd) sublanes."""
    xk = xk_ref[:]
    if hkp > hk:
        xk = jnp.concatenate(
            [xk, jnp.zeros((hkp - hk, xk.shape[1]), dtype=xk.dtype)], axis=0
        )
    return xk


def _z_group(x0_ref, xkp_bf, grp, p, hkp):
    """One (128, tbd) group of z rows: fields h = grp*P + j, built as
    full-lane broadcast multiplies (x0 rows are (1, tbd))."""
    import jax.experimental.pallas as pl

    parts = []
    for j in range(p):
        h = grp * p + j
        x0_row = x0_ref[pl.ds(h, 1), :].astype(jnp.bfloat16)
        parts.append(x0_row * xkp_bf)
    return parts[0] if p == 1 else jnp.concatenate(parts, axis=0)


def _fwd_kernel(h0, hk, x0_ref, xk_ref, w_ref, out_ref, z_ref):
    hkp, p, g_groups = _pack_dims(h0, hk)
    xkp_bf = _load_xkp(xk_ref, hk, hkp).astype(jnp.bfloat16)
    for grp in range(g_groups):
        z_ref[grp * 128 : (grp + 1) * 128, :] = _z_group(
            x0_ref, xkp_bf, grp, p, hkp
        )
    out_ref[:] = jax.lax.dot_general(
        w_ref[:].astype(jnp.bfloat16), z_ref[:], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_kernel(h0, hk, x0_ref, xk_ref, w_ref, g_ref,
                dx0_ref, dxk_ref, dw_ref):
    # fori_loop over 128-row groups; per group (h = grp*P + j; x0/dx0 are
    # zero-padded to G*P field rows by the caller so the body is
    # condition-free):
    #   u_g  = W_g @ g                     (128, tbd) z-cotangent rows
    #   dx0[h] = Σ_sublanes u_h · xk
    #   dxk   += u_h · x0[h]
    #   dW_g  += z_g @ gᵀ                  z_g rebuilt on the VPU
    import jax.experimental.pallas as pl

    hkp, p, g_groups = _pack_dims(h0, hk)
    tbd = x0_ref.shape[1]

    xkp = _load_xkp(xk_ref, hk, hkp)
    xkp_bf = xkp.astype(jnp.bfloat16)
    gb = g_ref[:].astype(jnp.bfloat16)  # (o, tbd)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    def body(grp, dxk_acc):
        w_g = w_ref[pl.ds(grp * 128, 128), :].astype(jnp.bfloat16)
        u_g = jax.lax.dot_general(
            w_g, gb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (128, tbd)
        z_parts = []
        for j in range(p):
            h = grp * p + j
            u_h = u_g[j * hkp : (j + 1) * hkp, :]
            # dx0[h] = sum_m u_h * xk (pad sublanes of xkp are zero)
            dx0_ref[pl.ds(h, 1), :] = jnp.sum(u_h * xkp, axis=0,
                                              keepdims=True)
            x0_row = x0_ref[pl.ds(h, 1), :]
            dxk_acc = dxk_acc + u_h * x0_row
            z_parts.append(x0_row.astype(jnp.bfloat16) * xkp_bf)
        z_g = z_parts[0] if p == 1 else jnp.concatenate(z_parts, axis=0)
        dw_ref[pl.ds(grp * 128, 128), :] += jax.lax.dot_general(
            z_g, gb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return dxk_acc

    dxk_acc = jax.lax.fori_loop(
        0, g_groups, body, jnp.zeros((hkp, tbd), dtype=jnp.float32)
    )
    dxk_ref[:] = dxk_acc[:hk, :]


def _pallas_fwd(x0c, xkc, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h0, bd = x0c.shape
    hk = xkc.shape[0]
    o = w.shape[1]
    hkp, p, g_groups = _pack_dims(h0, hk)
    x_pad = g_groups * 128
    gp = g_groups * p  # field rows padded so _z_group never branches
    if gp > h0:
        x0c = jnp.pad(x0c, ((0, gp - h0), (0, 0)))
    # z scratch (bf16) + in/out blocks, ~bytes per lane column. Tile-size
    # sweep (NOTES.md): tbd=4096 beats 1024 by ~14% fwd where it fits
    tbd = _pick_tile(bd, 2 * x_pad + 8 * (h0 + hk + o),
                     budget_bytes=12 * 1024 * 1024)
    w_pad = _pack_w(w, h0, hk)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, h0, hk),
        grid=(bd // tbd,),
        in_specs=[
            pl.BlockSpec((gp, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((x_pad, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((o, tbd), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((o, bd), jnp.float32),
        scratch_shapes=[pltpu.VMEM((x_pad, tbd), jnp.bfloat16)],
        interpret=interpret,
    )(x0c, xkc, w_pad)


def _pallas_bwd(x0c, xkc, w, g, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h0, bd = x0c.shape
    hk = xkc.shape[0]
    x, o = w.shape
    hkp, p, g_groups = _pack_dims(h0, hk)
    x_pad = g_groups * 128
    gp = g_groups * p  # field rows padded so the fori_loop never branches
    tbd = _pick_tile(bd, 128 * 6 + hkp * 14 + 8 * (h0 + hk + o),
                     budget_bytes=10 * 1024 * 1024)
    if gp > h0:
        x0c = jnp.pad(x0c, ((0, gp - h0), (0, 0)))
    w_pad = _pack_w(w, h0, hk)
    dx0_p, dxk, dw_pad = pl.pallas_call(
        functools.partial(_bwd_kernel, h0, hk),
        grid=(bd // tbd,),
        in_specs=[
            pl.BlockSpec((gp, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((x_pad, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((o, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((gp, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((hk, tbd), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((x_pad, o), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((gp, bd), jnp.float32),
            jax.ShapeDtypeStruct((hk, bd), jnp.float32),
            jax.ShapeDtypeStruct((x_pad, o), jnp.float32),
        ],
        interpret=interpret,
    )(x0c, xkc, w_pad, g)
    return dx0_p[:h0], dxk, _unpack_w(dw_pad, h0, hk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _interact_fm(x0c, xkc, w, interpret):
    return _pallas_fwd(x0c, xkc, w, interpret)


def _interact_fm_fwd(x0c, xkc, w, interpret):
    return _pallas_fwd(x0c, xkc, w, interpret), (x0c, xkc, w)


def _interact_fm_bwd(interpret, res, g):
    x0c, xkc, w = res
    return _pallas_bwd(x0c, xkc, w, g, interpret)


_interact_fm.defvjp(_interact_fm_fwd, _interact_fm_bwd)


import contextlib
import threading

_cin_state = threading.local()


@contextlib.contextmanager
def pallas_cin(enabled: bool | None):
    """Force the Pallas CIN kernel on/off while tracing (None = auto:
    on iff running on TPU with fused ops active and Hk <= 128).

    See BASELINE.md for measured numbers vs the einsum path on the bench
    config; the CIN layer switches to the no-transpose field-major chain
    when this is active (layers/cin.py).
    """
    prev = getattr(_cin_state, "mode", "auto")
    _cin_state.mode = "auto" if enabled is None else ("on" if enabled else "off")
    try:
        yield
    finally:
        _cin_state.mode = prev


def pallas_cin_active(hk: int) -> bool:
    """True when cin_interact_fm should be used for a layer of fan-in hk."""
    mode = getattr(_cin_state, "mode", "auto")
    if mode == "off" or not _fused_active():
        return False
    if hk > 128:  # beyond the sublane-pack widths; einsum fallback even
        return False  # when forced on
    if mode == "on":
        return True
    return jax.default_backend() == "tpu"


def cin_interact_fm(x0c, xkc, w):
    """Field-major fused interaction (Pallas).

    pre[o, n] = sum_{h,m} x0c[h, n] xkc[m, n] W[h*Hk+m, o], n = b*D+d.
    x0c (H0, B*D), xkc (Hk, B*D), w (H0*Hk, O) -> (O, B*D) f32.
    """
    interpret = jax.default_backend() != "tpu"
    return _interact_fm(x0c, xkc, w, interpret)


def cin_interact(x0t, xkt, w, dtype=jnp.bfloat16):
    """Batch-major interaction (XLA einsum; SPMD/CPU path).

    pre[b,d,o] = sum_{h,m} x0t[b,d,h] xkt[b,d,m] W[h*Hk+m, o].
    x0t (B, D, H0), xkt (B, D, Hk), w (H0*Hk, O) -> (B, D, O) f32.
    """
    return _einsum_interact(x0t, xkt, w, dtype=dtype)

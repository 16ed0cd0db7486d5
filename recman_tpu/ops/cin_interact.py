"""Fused CIN interaction op: outer product + compression in one kernel.

The CIN layer computes, per embedding position d (reference layers.py:
711-736; our einsum form in layers/cin.py):

    pre[b, d, o] = sum_{h,m} x0[b, d, h] * xk[b, d, m] * W[h*Hk + m, o]

XLA materializes the intermediate z[b, d, h*Hk+m] (680 MB at batch 8192,
X=1300) in HBM and layout-copies it — profiled at ~9 ms/step across both
CIN layers (fwd + bwd). This op keeps z entirely in VMEM: per batch tile,
build z on the VPU and contract on the MXU (bf16 multiplicands, f32
accumulation — the same precision XLA picks for the einsum), with a custom
VJP whose backward rebuilds z per tile for dW and contracts g·Wᵀ for
dx0/dxk, all on-chip.

Everything uses the (B, D, H) "embedding-position-major" layout so layer
outputs feed the next layer with zero transposes.

Falls back to the pure-XLA einsum when not on TPU or when the SPMD
trainer disables fused ops (ops.embedding.fused_grad(False)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .embedding import _fused_active


def _einsum_interact(x0t, xkt, w, dtype=jnp.bfloat16):
    """Reference semantics in XLA (default path).

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


def _pick_tile(b, d, h0, hk, o, budget_bytes=8 * 1024 * 1024):
    """Largest power-of-two batch tile fitting VMEM.

    The statically-unrolled h0 loop can keep ~h0 live (tbd, o) partials
    plus per-h (tbd, hk) buffers before Mosaic frees them; budget for
    that worst case (the compiler reported 20 MB scoped usage at tb=64
    for h0=26, o=100)."""
    per_row = d * 4 * (o * 6 + (h0 + hk) * 6)
    tb = 256
    while tb > 8 and tb * per_row > budget_bytes:
        tb //= 2
    while b % tb != 0 and tb > 1:
        tb //= 2
    return max(tb, 1)


def _fwd_kernel(x0c_ref, xk_ref, w_ref, out_ref):
    # Mosaic can't flatten the minor (h0, hk) dim pair into one lane dim,
    # so the contraction runs as a fori_loop over h0: each step a clean
    # 2-D MXU matmul plus a VPU scale-accumulate into the output ref
    # (a statically-unrolled value chain keeps all h0 partials live ->
    # VMEM OOM). x0 arrives column-major (h0, tb, d) so the per-h slice
    # is a cheap leading-dim dynamic slice.
    #   y = sum_h x0[:, h] * (xk @ W[h*hk:(h+1)*hk])
    from jax.experimental import pallas as pl

    h0, tb, d = x0c_ref.shape
    hk = xk_ref.shape[2]
    o = out_ref.shape[2]
    tbd = tb * d
    xk = xk_ref[:].reshape(tbd, hk).astype(jnp.bfloat16)

    out_ref[:] = jnp.zeros((tb, d, o), dtype=jnp.float32)

    def body(h, _):
        w_h = w_ref[pl.ds(h, 1), :, :].reshape(hk, o).astype(jnp.bfloat16)
        t1 = jax.lax.dot_general(
            xk, w_h, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x0_h = x0c_ref[pl.ds(h, 1), :, :].reshape(tb, d)
        out_ref[:] += x0_h[:, :, None] * t1.reshape(tb, d, o)
        return 0

    jax.lax.fori_loop(0, h0, body, 0)


def _bwd_kernel(x0c_ref, xk_ref, w_ref, g_ref, dx0_ref, dxk_ref, dw_ref):
    # fori_loop over h0; per h:
    #   u_h  = g @ W_h^T                      (tbd, hk)   cotangent of z_h
    #   dx0[h] = sum_m u_h * xk               -> row h of (h0, tb, d) out
    #   dxk += u_h * x0[:, h]                 (in-place in dxk_ref)
    #   dW_h = (x0[:, h] * xk)^T @ g          (hk, o), accumulated over tiles
    # dx0 is emitted (h0, tb, d) — its per-h result is a width-1 column
    # that would lane-pad to 128 if collected columnwise; caller transposes.
    from jax.experimental import pallas as pl

    h0, tb, d = x0c_ref.shape
    hk = xk_ref.shape[2]
    o = g_ref.shape[2]
    tbd = tb * d

    xk = xk_ref[:].reshape(tbd, hk)
    gb = g_ref[:].reshape(tbd, o).astype(jnp.bfloat16)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[:] = jnp.zeros_like(dw_ref)

    dxk_ref[:] = jnp.zeros((tb, d, hk), dtype=jnp.float32)

    xk3 = xk.reshape(tb, d, hk)

    def body(h, _):
        w_h = w_ref[pl.ds(h, 1), :, :].reshape(hk, o).astype(jnp.bfloat16)
        u_h3 = jax.lax.dot_general(
            gb, w_h, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(tb, d, hk)
        x0_h = x0c_ref[pl.ds(h, 1), :, :].reshape(tb, d)
        dx0_ref[pl.ds(h, 1), :, :] = jnp.sum(u_h3 * xk3, axis=2).reshape(1, tb, d)
        dxk_ref[:] += u_h3 * x0_h[:, :, None]
        z_h = (x0_h[:, :, None] * xk3).reshape(tbd, hk).astype(jnp.bfloat16)
        dw_ref[pl.ds(h, 1), :, :] += jax.lax.dot_general(
            z_h, gb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(1, hk, o)
        return 0

    jax.lax.fori_loop(0, h0, body, 0)



def _pallas_fwd(x0t, xkt, w, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d, h0 = x0t.shape
    hk = xkt.shape[2]
    x, o = w.shape
    tb = _pick_tile(b, d, h0, hk, o)
    x0c = jnp.transpose(x0t, (2, 0, 1))  # (h0, b, d) column-major
    w3 = w.reshape(h0, hk, o)  # leading-dim per-h slices are alignment-free
    return pl.pallas_call(
        _fwd_kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((h0, tb, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h0, hk, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tb, d, o), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, d, o), jnp.float32),
        interpret=interpret,
    )(x0c, xkt, w3)


def _pallas_bwd(x0t, xkt, w, g, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, d, h0 = x0t.shape
    hk = xkt.shape[2]
    x, o = w.shape
    tb = _pick_tile(b, d, h0, hk, o)
    x0c = jnp.transpose(x0t, (2, 0, 1))  # (h0, b, d)
    w3 = w.reshape(h0, hk, o)
    dx0_hbd, dxk, dw3 = pl.pallas_call(
        _bwd_kernel,
        grid=(b // tb,),
        in_specs=[
            pl.BlockSpec((h0, tb, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h0, hk, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d, o), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h0, tb, d), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tb, d, hk), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h0, hk, o), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h0, b, d), jnp.float32),
            jax.ShapeDtypeStruct((b, d, hk), jnp.float32),
            jax.ShapeDtypeStruct((h0, hk, o), jnp.float32),
        ],
        interpret=interpret,
    )(x0c, xkt, w3, g)
    return dx0_hbd, dxk, dw3.reshape(x, o)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _interact(x0t, xkt, w, interpret):
    return _pallas_fwd(x0t, xkt, w, interpret)


def _interact_fwd(x0t, xkt, w, interpret):
    return _pallas_fwd(x0t, xkt, w, interpret), (x0t, xkt, w)


def _interact_bwd(interpret, res, g):
    x0t, xkt, w = res
    dx0_hbd, dxk, dw = _pallas_bwd(x0t, xkt, w, g, interpret)
    return jnp.transpose(dx0_hbd, (1, 2, 0)), dxk, dw


_interact.defvjp(_interact_fwd, _interact_bwd)


import contextlib
import threading

_cin_state = threading.local()


@contextlib.contextmanager
def pallas_cin(enabled: bool):
    """Opt into the Pallas CIN kernel while tracing.

    Measured on one v5e chip (B=8192, D=16, H0=Hk=26, O=100): the kernel
    forward beats the einsum (5.2 vs 6.9 ms) but its backward loses (6.3
    vs 2.4 ms — the per-h fori_loop's small K=hk MXU contractions
    underutilize the systolic array), and Mosaic compilation of the
    fori_loop kernels takes ~90 s per shape through the remote-compile
    tunnel. Net: einsum stays the default; the kernel is kept (with
    tests) as groundwork for a blocked multi-h formulation.
    """
    prev = getattr(_cin_state, "on", False)
    _cin_state.on = enabled
    try:
        yield
    finally:
        _cin_state.on = prev


def cin_interact(x0t, xkt, w, dtype=jnp.bfloat16):
    """pre[b,d,o] = sum_{h,m} x0t[b,d,h] xkt[b,d,m] W[h*Hk+m, o].

    x0t (B, D, H0), xkt (B, D, Hk), w (H0*Hk, O) -> (B, D, O) f32.
    """
    if getattr(_cin_state, "on", False) and _fused_active():
        interpret = jax.default_backend() != "tpu"
        return _interact(x0t, xkt, w, interpret)
    return _einsum_interact(x0t, xkt, w, dtype=dtype)

"""Fused CIN interaction op: the field-major Pallas kernel (interpreted on
CPU) must match the XLA einsum formulation in value and gradients, and the
CIN layer's two layout chains must agree end to end."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.ops import fused_grad
from recman_tpu.ops.cin_interact import (
    _einsum_interact,
    cin_interact_fm,
    pallas_cin,
)


def _setup(B=16, D=4, H0=5, Hk=3, O=8, seed=0):
    rs = np.random.RandomState(seed)
    x0t = jnp.asarray(rs.randn(B, D, H0), dtype=jnp.float32)
    xkt = jnp.asarray(rs.randn(B, D, Hk), dtype=jnp.float32)
    w = jnp.asarray(rs.randn(H0 * Hk, O), dtype=jnp.float32)
    return x0t, xkt, w


def _to_fm(xt):
    """(B, D, H) -> (H, B*D)."""
    b, d, h = xt.shape
    return jnp.transpose(xt, (2, 0, 1)).reshape(h, b * d)


def _from_fm(xc, b, d):
    """(O, B*D) -> (B, D, O)."""
    o = xc.shape[0]
    return jnp.transpose(xc.reshape(o, b, d), (1, 2, 0))


class TestCinInteract:
    def test_forward_matches_einsum(self):
        x0t, xkt, w = _setup()
        b, d, _ = x0t.shape
        fused = _from_fm(cin_interact_fm(_to_fm(x0t), _to_fm(xkt), w), b, d)
        ref = _einsum_interact(x0t, xkt, w)
        # bf16 multiplicands in the kernel -> loose-ish tolerance
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)

    def test_grads_match_einsum(self):
        x0t, xkt, w = _setup(B=8, D=2, H0=4, Hk=4, O=6, seed=1)
        b, d, _ = x0t.shape

        def loss_fused(x0t, xkt, w):
            out = cin_interact_fm(_to_fm(x0t), _to_fm(xkt), w)
            return jnp.sum(jnp.tanh(out))

        def loss_ref(x0t, xkt, w):
            return jnp.sum(jnp.tanh(_einsum_interact(x0t, xkt, w)))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x0t, xkt, w)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x0t, xkt, w)
        for a, b_, name in zip(g_fused, g_ref, ("dx0", "dxk", "dw")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=5e-2, atol=5e-2, err_msg=name)

    def test_self_interaction_shared_input(self):
        """First CIN layer uses x0 twice (xkc is x0c): the VJP must sum both
        paths' cotangents."""
        x0t, _, w = _setup(B=4, D=2, H0=3, Hk=3, O=4, seed=2)

        def loss_fused(x0t, w):
            c = _to_fm(x0t)
            return jnp.sum(cin_interact_fm(c, c, w))

        def loss_ref(x0t, w):
            return jnp.sum(_einsum_interact(x0t, x0t, w))

        g1 = jax.grad(loss_fused)(x0t, w)
        g2 = jax.grad(loss_ref)(x0t, w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=5e-2, atol=5e-2)

    def test_wide_fanin_grouping(self):
        """Hk > 32 exercises the 64-sublane pack (P=2) and the padded
        final group."""
        x0t, xkt, w = _setup(B=4, D=2, H0=5, Hk=40, O=8, seed=4)
        b, d, _ = x0t.shape
        fused = _from_fm(cin_interact_fm(_to_fm(x0t), _to_fm(xkt), w), b, d)
        ref = _einsum_interact(x0t, xkt, w)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-2, atol=3e-2)

    def test_cin_layer_end_to_end_matches(self, rng):
        """Whole CIN layer: field-major Pallas chain vs batch-major einsum
        chain agree (forced via the pallas_cin context)."""
        from recman_tpu.layers import CIN

        B, F, D = 8, 5, 4
        cin = CIN(field_size=F, cross_layer_units=(6, 4), activation="identity",
                  dropout_keep=(1, 1, 1))
        params = cin.init(rng)
        x = jnp.asarray(np.random.RandomState(3).randn(B, F, D), dtype=jnp.float32)
        with fused_grad(True), pallas_cin(True):
            out_fused = cin.apply(params, x, training=False)
        with fused_grad(False):
            out_ref = cin.apply(params, x, training=False)
        np.testing.assert_allclose(np.asarray(out_fused), np.asarray(out_ref),
                                   rtol=2e-2, atol=2e-2)

    def test_cin_layer_grads_match(self, rng):
        """Gradients of the full CIN tower agree between the two chains."""
        from recman_tpu.layers import CIN

        B, F, D = 8, 5, 4
        cin = CIN(field_size=F, cross_layer_units=(6, 4), activation="identity",
                  dropout_keep=(1, 1, 1))
        params = cin.init(rng)
        x = jnp.asarray(np.random.RandomState(5).randn(B, F, D), dtype=jnp.float32)

        def loss(params, fm):
            ctx = (fused_grad(True), pallas_cin(True)) if fm else \
                  (fused_grad(False), pallas_cin(False))
            with ctx[0], ctx[1]:
                return jnp.sum(cin.apply(params, x, training=False) ** 2)

        g_fm = jax.grad(lambda p: loss(p, True))(params)
        g_bm = jax.grad(lambda p: loss(p, False))(params)
        for name in g_bm:
            a, b = np.asarray(g_fm[name]), np.asarray(g_bm[name])
            # both paths accumulate bf16 products in different orders;
            # tolerance is relative to the parameter's gradient scale
            # (measured agreement ~0.3% of scale, vs ~2% bf16-vs-f32)
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 2e-2 * scale, (
                f"{name}: max diff {np.abs(a - b).max()} vs scale {scale}"
            )

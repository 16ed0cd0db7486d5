"""Fused CIN interaction op: Pallas kernel (interpreted on CPU) must match
the XLA einsum formulation in value and gradients."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.ops import fused_grad
from recman_tpu.ops.cin_interact import _einsum_interact, cin_interact, pallas_cin


def _setup(B=16, D=4, H0=5, Hk=3, O=8, seed=0):
    rs = np.random.RandomState(seed)
    x0t = jnp.asarray(rs.randn(B, D, H0), dtype=jnp.float32)
    xkt = jnp.asarray(rs.randn(B, D, Hk), dtype=jnp.float32)
    w = jnp.asarray(rs.randn(H0 * Hk, O), dtype=jnp.float32)
    return x0t, xkt, w


class TestCinInteract:
    def test_forward_matches_einsum(self):
        x0t, xkt, w = _setup()
        with fused_grad(True), pallas_cin(True):
            fused = cin_interact(x0t, xkt, w)
        ref = _einsum_interact(x0t, xkt, w)
        # bf16 multiplicands in the kernel -> loose-ish tolerance
        np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)

    def test_grads_match_einsum(self):
        x0t, xkt, w = _setup(B=8, D=2, H0=4, Hk=4, O=6, seed=1)

        def loss_fused(x0t, xkt, w):
            with fused_grad(True), pallas_cin(True):
                return jnp.sum(jnp.tanh(cin_interact(x0t, xkt, w)))

        def loss_ref(x0t, xkt, w):
            return jnp.sum(jnp.tanh(_einsum_interact(x0t, xkt, w)))

        g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x0t, xkt, w)
        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x0t, xkt, w)
        for a, b, name in zip(g_fused, g_ref, ("dx0", "dxk", "dw")):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-2, atol=5e-2, err_msg=name)

    def test_self_interaction_shared_input(self):
        """First CIN layer uses x0 twice (xkt is x0t): the VJP must sum both
        paths' cotangents."""
        x0t, _, w = _setup(B=4, D=2, H0=3, Hk=3, O=4, seed=2)

        def loss_fused(x0t, w):
            with fused_grad(True), pallas_cin(True):
                return jnp.sum(cin_interact(x0t, x0t, w))

        def loss_ref(x0t, w):
            return jnp.sum(_einsum_interact(x0t, x0t, w))

        g1 = jax.grad(loss_fused)(x0t, w)
        g2 = jax.grad(loss_ref)(x0t, w)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=5e-2, atol=5e-2)

    def test_cin_layer_end_to_end_matches(self, rng):
        """Whole CIN layer: fused vs fallback paths agree."""
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

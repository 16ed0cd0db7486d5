"""Whole-chain fused CIN (ops/cin_chain.py, interpreted on CPU): the one-
kernel-per-direction tower must match the batch-major einsum chain in
value and in every gradient, across activations, depths and geometries;
the CIN layer must route to it exactly when eligible."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.layers import CIN
from recman_tpu.layers import cin as cin_mod
from recman_tpu.ops import fused_grad
from recman_tpu.ops.cin_chain import chain_supported, cin_chain_fm
from recman_tpu.ops.cin_interact import pallas_cin


def _layer(units, act="leaky_relu", F=5, keeps=None):
    keeps = keeps if keeps is not None else (1,) * (len(units) + 1)
    return CIN(field_size=F, cross_layer_units=units, activation=act,
               dropout_keep=keeps)


def _x(B, F, D, seed=0):
    return jnp.asarray(
        np.random.RandomState(seed).randn(B, F, D), dtype=jnp.float32
    )


# B*D must be a multiple of 128 for the chain tiles; 64*4=256 works.
B, F, D = 64, 5, 4


class TestChainOp:
    @pytest.mark.parametrize("act", ["identity", "relu", "leaky_relu"])
    @pytest.mark.parametrize("units", [(6, 4), (8, 8, 6), (4,)])
    def test_value_and_grads_match_batch_major(self, rng, act, units):
        cin = _layer(units, act)
        params = cin.init(rng)
        x = _x(B, F, D, seed=3)
        assert chain_supported(F, units, D, B * D, act)

        def chain_loss(params):
            with fused_grad(True), pallas_cin(True):
                return jnp.sum(cin.apply(params, x, training=False) ** 2)

        def ref_loss(params):
            with fused_grad(False), pallas_cin(False):
                return jnp.sum(cin.apply(params, x, training=False) ** 2)

        v1, g1 = jax.value_and_grad(chain_loss)(params)
        v2, g2 = jax.value_and_grad(ref_loss)(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
        for name in g2:
            a, b = np.asarray(g1[name]), np.asarray(g2[name])
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 3e-2 * scale, (
                f"{name}: max diff {np.abs(a - b).max()} vs scale {scale}"
            )

    def test_chain_matches_per_layer_kernels(self, rng):
        """Chain vs the per-layer field-major kernels (both Pallas paths,
        same bf16 multiplicand structure): agreement should be much
        tighter than vs the einsum."""
        units = (6, 4)
        cin = _layer(units)
        params = cin.init(rng)
        x = _x(B, F, D, seed=7)

        with fused_grad(True), pallas_cin(True):
            out_chain = cin.apply(params, x, training=False)
        prev = cin_mod.CIN_CHAIN_MODE
        cin_mod.CIN_CHAIN_MODE = "off"
        try:
            with fused_grad(True), pallas_cin(True):
                out_layers = cin.apply(params, x, training=False)
        finally:
            cin_mod.CIN_CHAIN_MODE = prev
        np.testing.assert_allclose(
            np.asarray(out_chain), np.asarray(out_layers),
            rtol=2e-3, atol=2e-3,
        )

    def test_save_fmaps_variant_matches_recompute(self, rng):
        """CHAIN_SAVE_FMAPS=True (backward reads saved fmaps instead of
        recomputing) must give the same values and near-identical grads
        as the recompute default."""
        from recman_tpu.ops import cin_chain as cc

        cin = _layer((6, 4))
        params = cin.init(rng)
        x = _x(B, F, D, seed=29)

        def loss(p):
            with fused_grad(True), pallas_cin(True):
                return jnp.sum(cin.apply(p, x, training=False) ** 2)

        v_ref, g_ref = jax.value_and_grad(loss)(params)
        prev = cc.CHAIN_SAVE_FMAPS
        cc.CHAIN_SAVE_FMAPS = True
        try:
            v_sf, g_sf = jax.value_and_grad(loss)(params)
        finally:
            cc.CHAIN_SAVE_FMAPS = prev
        np.testing.assert_allclose(float(v_sf), float(v_ref), rtol=1e-6)
        for name in g_ref:
            a, b = np.asarray(g_sf[name]), np.asarray(g_ref[name])
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 1e-4 * scale, name

    def test_training_mode_with_unit_keeps_matches_eval_routing(self, rng):
        """keeps == 1 everywhere: training=True must still take the chain
        and produce the same output as eval (dropout is a no-op)."""
        cin = _layer((6, 4))
        params = cin.init(rng)
        x = _x(B, F, D, seed=11)
        with fused_grad(True), pallas_cin(True):
            out_t = cin.apply(params, x, training=True,
                              rng=jax.random.PRNGKey(0))
            out_e = cin.apply(params, x, training=False)
        np.testing.assert_allclose(np.asarray(out_t), np.asarray(out_e))

    def test_op_level_direct_parity(self, rng):
        """cin_chain_fm against a hand-rolled einsum chain (no layer)."""
        units = (6, 4)
        h0 = F
        keys = jax.random.split(rng, 4)
        field_nums = [h0, 3]
        ws = [
            jax.random.normal(keys[0], (h0 * h0, 6)) * 0.3,
            jax.random.normal(keys[1], (h0 * 3, 4)) * 0.3,
        ]
        bs = [jax.random.normal(keys[2], (6,)) * 0.1,
              jax.random.normal(keys[3], (4,)) * 0.1]
        x = _x(B, F, D, seed=13)
        x0c = jnp.transpose(x, (1, 0, 2)).reshape(h0, B * D)

        pooled = cin_chain_fm(x0c, ws, bs, units, D, act="leaky_relu")
        got = jnp.concatenate(pooled, axis=1)  # (B, final)

        # reference: einsum chain, batch-major
        x0t = jnp.transpose(x, (0, 2, 1))
        xkt = x0t
        finals = []
        for i, (u, w, b_) in enumerate(zip(units, ws, bs)):
            z = jnp.einsum("bdh,bdm->bdhm", x0t, xkt).reshape(
                B, D, h0 * field_nums[i] if i else h0 * h0
            )
            pre = jnp.einsum("bdx,xo->bdo", z, w) + b_
            fmap = jax.nn.leaky_relu(pre, negative_slope=0.2)
            if i != len(units) - 1:
                xkt = fmap[:, :, : u // 2]
                finals.append(fmap[:, :, u // 2 :])
            else:
                finals.append(fmap)
        ref = jnp.sum(jnp.concatenate(finals, axis=2), axis=1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


class TestEligibility:
    def test_live_dropout_falls_back(self, rng):
        """In-chain dropout keep < 1 while training must NOT take the
        chain (it has no in-kernel RNG); it must still run and differ
        from eval output (live dropout)."""
        cin = _layer((6, 4), keeps=(1, 0.5, 1))
        assert not cin._chain_eligible(training=True, b=B, d=D)
        assert cin._chain_eligible(training=False, b=B, d=D)
        params = cin.init(rng)
        x = _x(B, F, D, seed=17)
        with fused_grad(True), pallas_cin(True):
            out = cin.apply(params, x, training=True,
                            rng=jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(out)))

    def test_unsupported_activation_falls_back(self):
        cin = _layer((6, 4), act="sigmoid")
        assert not cin._chain_eligible(training=False, b=B, d=D)
        cin2 = _layer((6, 4), act=jnp.tanh)
        assert not cin2._chain_eligible(training=False, b=B, d=D)

    def test_small_bd_falls_back(self):
        cin = _layer((6, 4))
        assert not cin._chain_eligible(training=False, b=8, d=4)

    def test_mode_off_falls_back(self):
        prev = cin_mod.CIN_CHAIN_MODE
        cin_mod.CIN_CHAIN_MODE = "off"
        try:
            cin = _layer((6, 4))
            assert not cin._chain_eligible(training=False, b=B, d=D)
        finally:
            cin_mod.CIN_CHAIN_MODE = prev


class TestWideEmbedding:
    def test_d32_geometry(self, rng):
        """D=32 (t % d and pooling block constraints at a wider
        embedding): value + grad parity vs batch-major."""
        F8, D32 = 8, 32
        units = (8, 6)
        cin = CIN(field_size=F8, cross_layer_units=units,
                  activation="leaky_relu", dropout_keep=(1, 1, 1))
        params = cin.init(rng)
        x = _x(16, F8, D32, seed=31)  # bd = 512
        assert chain_supported(F8, units, D32, 16 * D32, "leaky_relu")

        def chain_loss(p):
            with fused_grad(True), pallas_cin(True):
                return jnp.mean(cin.apply(p, x, training=False) ** 2)

        def ref_loss(p):
            with fused_grad(False), pallas_cin(False):
                return jnp.mean(cin.apply(p, x, training=False) ** 2)

        v1, g1 = jax.value_and_grad(chain_loss)(params)
        v2, g2 = jax.value_and_grad(ref_loss)(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
        for name in g2:
            a, b = np.asarray(g1[name]), np.asarray(g2[name])
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 3e-2 * scale, name


class TestBenchGeometry:
    def test_headline_shape_small_batch(self, rng):
        """The bench geometry (H0=26, units (100,100), D=16) at a small
        batch: value + grad parity vs batch-major."""
        F26, D16 = 26, 16
        units = (100, 100)
        cin = CIN(field_size=F26, cross_layer_units=units,
                  activation="leaky_relu", dropout_keep=(1, 1, 1))
        params = cin.init(rng)
        x = _x(16, F26, D16, seed=23)  # bd = 256
        assert chain_supported(F26, units, D16, 16 * D16, "leaky_relu")

        def chain_loss(p):
            with fused_grad(True), pallas_cin(True):
                return jnp.mean(cin.apply(p, x, training=False) ** 2)

        def ref_loss(p):
            with fused_grad(False), pallas_cin(False):
                return jnp.mean(cin.apply(p, x, training=False) ** 2)

        v1, g1 = jax.value_and_grad(chain_loss)(params)
        v2, g2 = jax.value_and_grad(ref_loss)(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=2e-2)
        for name in g2:
            a, b = np.asarray(g1[name]), np.asarray(g2[name])
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 3e-2 * scale, name

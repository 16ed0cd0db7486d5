"""Fused segment-Adam sweep (ops/sparse_adam.py) vs scatter-grad + optax:
identical updates, including duplicate-id accumulation, untouched-row
moment decay, bias correction, and the folded L2 term."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from recman_tpu.ops.sparse_adam import segment_adam_update


def _setup(V=300, N=64, K=8, seed=0, dup=True):
    rs = np.random.RandomState(seed)
    ids = rs.randint(0, V, N).astype(np.int32)
    if dup:
        ids[: N // 4] = ids[0]  # heavy duplication on one id
    order = np.argsort(ids, kind="stable")
    sids = jnp.asarray(ids[order])
    sg = jnp.asarray(rs.randn(N, K).astype(np.float32)[order])
    w = jnp.asarray(rs.randn(V, K).astype(np.float32))
    m = jnp.asarray(rs.randn(V, K).astype(np.float32) * 0.01)
    v = jnp.asarray(np.abs(rs.randn(V, K)).astype(np.float32) * 0.001)
    return w, m, v, sids, sg


def _reference(w, m, v, sids, sg, lr, step, b1, b2, eps, l2):
    """Dense scatter grad + the exact optax.adam formulas."""
    dn = jax.lax.ScatterDimensionNumbers((1,), (0,), (0,))
    g = jax.lax.scatter_add(
        jnp.zeros_like(w), sids[:, None], sg, dn, indices_are_sorted=True
    )
    g = g + 2.0 * l2 * w
    m2 = b1 * m + (1 - b1) * g
    v2 = b2 * v + (1 - b2) * g * g
    mhat = m2 / (1 - b1 ** step)
    vhat = v2 / (1 - b2 ** step)
    return w - lr * mhat / (jnp.sqrt(vhat) + eps), m2, v2


class TestSegmentAdam:
    @pytest.mark.parametrize("l2", [0.0, 1e-3])
    @pytest.mark.parametrize("step", [1, 7])
    def test_matches_scatter_plus_adam(self, l2, step):
        w, m, v, sids, sg = _setup()
        got = segment_adam_update(
            w, m, v, sids, sg, lr=0.01, step=step, l2=l2,
            tile_v=64, chunk_n=32,
        )
        want = _reference(w, m, v, sids, sg, 0.01, step, 0.9, 0.999, 1e-8, l2)
        for a, b, name in zip(got, want, ("w", "m", "v")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=name,
            )

    def test_first_step_matches_optax(self):
        """From zero moments, one step must equal optax.adam exactly."""
        w, _, _, sids, sg = _setup(seed=3, dup=False)
        zeros = jnp.zeros_like(w)
        got_w, _, _ = segment_adam_update(
            w, zeros, zeros, sids, sg, lr=0.05, step=1, tile_v=128,
            chunk_n=64,
        )
        dn = jax.lax.ScatterDimensionNumbers((1,), (0,), (0,))
        g = jax.lax.scatter_add(
            jnp.zeros_like(w), sids[:, None], sg, dn, indices_are_sorted=True
        )
        opt = optax.adam(0.05)
        state = opt.init(w)
        updates, _ = opt.update(g, state, w)
        want_w = optax.apply_updates(w, updates)
        np.testing.assert_allclose(
            np.asarray(got_w), np.asarray(want_w), rtol=1e-5, atol=1e-6
        )

    def test_untouched_rows_decay(self):
        """Rows with no ids still update (moment decay) — dense-Adam
        semantics, not lazy-Adam."""
        w, m, v, _, _ = _setup(seed=5)
        sids = jnp.asarray(np.array([0, 0], dtype=np.int32))
        sg = jnp.zeros((2, w.shape[1]), jnp.float32)
        got_w, got_m, got_v = segment_adam_update(
            w, m, v, sids, sg, lr=0.01, step=2, tile_v=64, chunk_n=32
        )
        # row 100 never referenced: m decays by b1, w moves by the tail
        np.testing.assert_allclose(
            np.asarray(got_m[100]), 0.9 * np.asarray(m[100]), rtol=1e-6
        )
        assert not np.allclose(np.asarray(got_w[100]), np.asarray(w[100]))

    def test_non_dividing_vocab(self):
        w, m, v, sids, sg = _setup(V=301, seed=7)
        got = segment_adam_update(
            w, m, v, sids, sg, lr=0.01, step=1, tile_v=64, chunk_n=32
        )
        want = _reference(w, m, v, sids, sg, 0.01, 1, 0.9, 0.999, 1e-8, 0.0)
        np.testing.assert_allclose(
            np.asarray(got[0]), np.asarray(want[0]), rtol=1e-5, atol=1e-6
        )

"""Fused embedding-lookup op: the Pallas scatter-free backward must equal
jnp.take's gather gradient exactly (run interpreted on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.ops import embedding_lookup, fused_grad
from recman_tpu.ops.embedding import _segment_matmul_grad, embedding_lookup_multi


class TestSegmentMatmulGrad:
    def test_matches_scatter_add(self):
        rs = np.random.RandomState(0)
        V, N, K = 100, 64, 8
        ids = jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32)
        g = jnp.asarray(rs.randn(N, K), dtype=jnp.float32)
        with fused_grad(True):
            out = _segment_matmul_grad(ids, g, V, tile_v=32)
        expect = jnp.zeros((V, K)).at[ids].add(g)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6)

    def test_duplicate_ids_accumulate(self):
        ids = jnp.asarray([3, 3, 3, 7], dtype=jnp.int32)
        g = jnp.ones((4, 4), dtype=jnp.float32)
        with fused_grad(True):
            out = _segment_matmul_grad(ids, g, 10, tile_v=8)
        np.testing.assert_allclose(np.asarray(out[3]), 3.0)
        np.testing.assert_allclose(np.asarray(out[7]), 1.0)
        assert float(jnp.sum(out)) == pytest.approx(16.0)

    def test_vocab_not_tile_aligned(self):
        rs = np.random.RandomState(1)
        V, N, K = 37, 20, 3
        ids = jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32)
        g = jnp.asarray(rs.randn(N, K), dtype=jnp.float32)
        with fused_grad(True):
            out = _segment_matmul_grad(ids, g, V, tile_v=16)
        expect = jnp.zeros((V, K)).at[ids].add(g)
        assert out.shape == (V, K)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5, atol=1e-6)


class TestEmbeddingLookupVJP:
    def test_value_and_grad_match_take(self):
        rs = np.random.RandomState(2)
        V, N, K = 50, 40, 4
        table = jnp.asarray(rs.randn(V, K), dtype=jnp.float32)
        ids = jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32)
        w = jnp.asarray(rs.randn(N, K), dtype=jnp.float32)

        def loss_fused(t):
            with fused_grad(True):
                return jnp.sum(embedding_lookup(t, ids) * w)

        def loss_take(t):
            return jnp.sum(jnp.take(t, ids, axis=0) * w)

        v1, g1 = jax.value_and_grad(loss_fused)(table)
        v2, g2 = jax.value_and_grad(loss_take)(table)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5, atol=1e-6)

    def test_multidim_ids(self):
        table = jnp.arange(20, dtype=jnp.float32).reshape(10, 2)
        ids = jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32)
        out = embedding_lookup(table, ids)
        assert out.shape == (2, 2, 2)
        np.testing.assert_allclose(np.asarray(out[1, 1]), [6.0, 7.0])

    def test_model_grads_parity_fused_vs_plain(self, synthetic_df, synthetic_features):
        """Whole-model gradient parity: fused path == take path."""
        from recman_tpu.models import XDeepFM

        model = XDeepFM(synthetic_features)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_features.transform(
                synthetic_df, y=synthetic_df["LABEL"].values
            ).items()
        }

        def loss(p):
            return model.loss(p, batch, training=False)

        with fused_grad(True):
            g_fused = jax.grad(loss)(params)
        with fused_grad(False):
            g_plain = jax.grad(loss)(params)
        for name in g_plain:
            np.testing.assert_allclose(
                np.asarray(g_fused[name]), np.asarray(g_plain[name]),
                rtol=1e-4, atol=1e-6, err_msg=name,
            )


class TestLookupMulti:
    def test_batched_bwd_matches_per_table(self):
        """Batched-sort backward == independent per-table take grads."""
        rs = np.random.RandomState(5)
        T, V, N, K = 4, 60, 32, 6
        tables = [jnp.asarray(rs.randn(V, K), dtype=jnp.float32) for _ in range(T)]
        ids = [jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32) for _ in range(T)]
        wts = [jnp.asarray(rs.randn(N, K), dtype=jnp.float32) for _ in range(T)]

        def loss_multi(tabs):
            with fused_grad(True):
                rows = embedding_lookup_multi(list(tabs), ids)
            return sum(jnp.sum(r * w) for r, w in zip(rows, wts))

        def loss_plain(tabs):
            rows = [jnp.take(t, i, axis=0) for t, i in zip(tabs, ids)]
            return sum(jnp.sum(r * w) for r, w in zip(rows, wts))

        g1 = jax.grad(loss_multi)(tuple(tables))
        g2 = jax.grad(loss_plain)(tuple(tables))
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_multi_dim_ids(self):
        tables = [jnp.arange(20, dtype=jnp.float32).reshape(10, 2)] * 2
        ids = [jnp.asarray([[0, 1], [2, 3]], dtype=jnp.int32)] * 2
        with fused_grad(True):
            rows = embedding_lookup_multi(tables, ids)
        assert rows[0].shape == (2, 2, 2)
        np.testing.assert_allclose(np.asarray(rows[1][1, 1]), [6.0, 7.0])


class TestPermuteSizeSplit:
    def test_per_table_permute_branch_matches(self, monkeypatch):
        """Past PERMUTE_BATCHED_MAX_N the backward permutes per-table;
        grads must be identical to the batched form."""
        import recman_tpu.ops.embedding as emb

        rs = np.random.RandomState(11)
        T, V, N, K = 3, 30, 40, 5
        tables = [jnp.asarray(rs.randn(V, K), dtype=jnp.float32)
                  for _ in range(T)]
        ids = [jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32)
               for _ in range(T)]
        wts = [jnp.asarray(rs.randn(N, K), dtype=jnp.float32)
               for _ in range(T)]

        def loss(tabs):
            with fused_grad(True):
                rows = embedding_lookup_multi(list(tabs), ids)
            return sum(jnp.sum(r * w) for r, w in zip(rows, wts))

        g_batched = jax.grad(loss)(tuple(tables))
        monkeypatch.setattr(emb, "PERMUTE_BATCHED_MAX_N", N - 1)
        g_split = jax.grad(loss)(tuple(tables))
        for a, b in zip(g_batched, g_split):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-7)


class TestGradKernelSelector:
    """grad_kernel("segmat") must route the custom-vjp backwards through the
    Pallas kernel with results identical to the scatter default."""

    def test_single_lookup_segmat_matches_scatter(self):
        from recman_tpu.ops.embedding import grad_kernel

        rs = np.random.RandomState(3)
        V, N, K = 60, 48, 8
        table = jnp.asarray(rs.randn(V, K), dtype=jnp.float32)
        ids = jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32)
        w = jnp.asarray(rs.randn(N, K), dtype=jnp.float32)

        def loss(t):
            return jnp.sum(embedding_lookup(t, ids) * w)

        with fused_grad(True):
            g_scatter = jax.grad(loss)(table)
            with grad_kernel("segmat"):
                g_segmat = jax.grad(loss)(table)
        np.testing.assert_allclose(
            np.asarray(g_segmat), np.asarray(g_scatter), rtol=1e-5, atol=1e-6
        )

    def test_multi_lookup_segmat_matches_scatter(self):
        from recman_tpu.ops.embedding import grad_kernel

        rs = np.random.RandomState(4)
        V, N, K, T = 40, 32, 4, 3
        tables = [jnp.asarray(rs.randn(V, K), dtype=jnp.float32) for _ in range(T)]
        ids = [jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32) for _ in range(T)]
        ws = [jnp.asarray(rs.randn(N, K), dtype=jnp.float32) for _ in range(T)]

        def loss(ts):
            rows = embedding_lookup_multi(list(ts), ids)
            return sum(jnp.sum(r * w) for r, w in zip(rows, ws))

        with fused_grad(True):
            g_scatter = jax.grad(loss)(tuple(tables))
            with grad_kernel("segmat"):
                g_segmat = jax.grad(loss)(tuple(tables))
        for a, b in zip(g_segmat, g_scatter):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )

    def test_multi_lookup_segmat_segmented_big_n(self, monkeypatch):
        """n > SEGMAT_SEGMENT_N splits into same-shape sorted segments
        whose grads sum — must equal the scatter grad exactly."""
        import recman_tpu.ops.embedding as emb
        from recman_tpu.ops.embedding import grad_kernel

        monkeypatch.setattr(emb, "SEGMAT_SEGMENT_N", 24)  # force 3 segments
        monkeypatch.setattr(emb, "PERMUTE_BATCHED_MAX_N", 32)  # per-table permutes
        rs = np.random.RandomState(5)
        V, N, K, T = 50, 70, 8, 3  # N deliberately not a segment multiple
        tables = [jnp.asarray(rs.randn(V, K), dtype=jnp.float32) for _ in range(T)]
        ids = [jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32) for _ in range(T)]
        ws = [jnp.asarray(rs.randn(N, K), dtype=jnp.float32) for _ in range(T)]

        def loss(ts):
            rows = embedding_lookup_multi(list(ts), ids)
            return sum(jnp.sum(r * w) for r, w in zip(rows, ws))

        with fused_grad(True):
            g_scatter = jax.grad(loss)(tuple(tables))
            with grad_kernel("segmat"):
                g_segmat = jax.grad(loss)(tuple(tables))
        for a, b in zip(g_segmat, g_scatter):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            )


class TestSplitPackedLookup:
    """packed_lookup_grouped (split forward, packed backward) must equal the
    concat-then-gather form in values AND gradients, both kernel modes."""

    def _setup(self, T=3, V=40, N=24, K=6, n_vec=2, seed=7):
        rs = np.random.RandomState(seed)
        tables = [jnp.asarray(rs.randn(V, K), dtype=jnp.float32)
                  for _ in range(T)]
        vecs = [tuple(jnp.asarray(rs.randn(V), dtype=jnp.float32)
                      for _ in range(n_vec)) for _ in range(T)]
        ids = [jnp.asarray(rs.randint(0, V, N), dtype=jnp.int32)
               for _ in range(T)]
        wts = [jnp.asarray(rs.randn(N, K + n_vec), dtype=jnp.float32)
               for _ in range(T)]
        return tables, vecs, ids, wts

    def _losses(self, ids, wts):
        from recman_tpu.ops.embedding import packed_lookup_grouped

        def loss_split(tabs, vs):
            rows = packed_lookup_grouped(list(tabs), list(vs), ids)
            return sum(jnp.sum(r * w) for r, w in zip(rows, wts))

        def loss_concat(tabs, vs):
            rows = [
                jnp.take(
                    jnp.concatenate([t] + [v[:, None] for v in vv], axis=1),
                    i, axis=0,
                )
                for t, vv, i in zip(tabs, vs, ids)
            ]
            return sum(jnp.sum(r * w) for r, w in zip(rows, wts))

        return loss_split, loss_concat

    @pytest.mark.parametrize("kernel", ["scatter", "segmat"])
    def test_value_and_grads_match_concat(self, kernel):
        from recman_tpu.ops.embedding import grad_kernel

        tables, vecs, ids, wts = self._setup()
        loss_split, loss_concat = self._losses(ids, wts)
        with fused_grad(True), grad_kernel(kernel):
            v1, (gt1, gv1) = jax.value_and_grad(loss_split, argnums=(0, 1))(
                tuple(tables), tuple(vecs)
            )
        v2, (gt2, gv2) = jax.value_and_grad(loss_concat, argnums=(0, 1))(
            tuple(tables), tuple(vecs)
        )
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        for a, b in zip(gt1, gt2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
        for va, vb in zip(gv1, gv2):
            for a, b in zip(va, vb):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)

    def test_model_parity_split_vs_concat(self, synthetic_df, synthetic_features):
        """Whole-model forward + grads identical under split_lookup('on')."""
        from recman_tpu.models import XDeepFM
        from recman_tpu.ops.embedding import split_lookup

        model = XDeepFM(synthetic_features)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_features.transform(
                synthetic_df, y=synthetic_df["LABEL"].values
            ).items()
        }

        def loss(p):
            return model.loss(p, batch, training=False)

        with fused_grad(True):
            with split_lookup("on"):
                v_split, g_split = jax.value_and_grad(loss)(params)
            with split_lookup("off"):
                v_concat, g_concat = jax.value_and_grad(loss)(params)
        np.testing.assert_allclose(float(v_split), float(v_concat), rtol=1e-6)
        for name in g_concat:
            np.testing.assert_allclose(
                np.asarray(g_split[name]), np.asarray(g_concat[name]),
                rtol=1e-4, atol=1e-6, err_msg=name,
            )


class TestPackedFwdBf16:
    def test_optin_close_to_f32_and_default_off(self, synthetic_df,
                                                synthetic_features,
                                                monkeypatch):
        """PACKED_FWD_BF16 quantizes the packed forward through bf16:
        loss within bf16 error of f32, grads within a few percent, and
        the flag defaults OFF (trajectory-changing opt-in)."""
        import recman_tpu.ops.embedding as emb
        from recman_tpu.models import XDeepFM

        # default "auto" resolves OFF on CPU (quality-gated TPU regime only)
        assert emb.PACKED_FWD_BF16 == "auto"
        assert emb._packed_fwd_bf16_active() is False

        model = XDeepFM(synthetic_features)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = {
            k: jnp.asarray(v)
            for k, v in synthetic_features.transform(
                synthetic_df, y=synthetic_df["LABEL"].values
            ).items()
        }

        def loss(p):
            return model.loss(p, batch, training=False)

        with fused_grad(True):
            v32, g32 = jax.value_and_grad(loss)(params)
            monkeypatch.setattr(emb, "PACKED_FWD_BF16", True)
            v16, g16 = jax.value_and_grad(loss)(params)
        assert abs(float(v32 - v16)) / abs(float(v32)) < 5e-3
        # grads: finite, bf16-close in aggregate (per-element relative
        # bounds are meaningless on a 16-row fixture's tiny grads), and
        # actually DIFFERENT (the flag took effect)
        total32 = total_delta = 0.0
        for k in g32:
            assert bool(jnp.isfinite(g16[k]).all()), k
            total32 += float(jnp.sum(jnp.abs(g32[k])))
            total_delta += float(jnp.sum(jnp.abs(g32[k] - g16[k])))
        assert total_delta / total32 < 0.05, (total_delta, total32)
        assert total_delta > 0.0

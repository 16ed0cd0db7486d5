"""Layer-library unit tests.

Each kernel is validated against an independent dense/naive implementation
of the reference semantics (recman/tf/core/layers.py), including a numpy
re-derivation of the CIN split/matmul/conv formulation checked by the
reference notebook (notes/xDeepFM.ipynb cells 6-7).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.features import (
    DenseFeat,
    FeatureSet,
    MultiValCsvFeat,
    SparseFeat,
    SparseValueFeat,
)
from recman_tpu.layers import (
    AFMLayer,
    ASPLayer,
    CIN,
    CrossNet,
    DNN,
    EmbeddingLayer,
    FMLayer,
    LinearLayer,
    PredictionLayer,
    dnn_combine,
    dropout,
    sqrtn_combine,
)


class TestSqrtnCombine:
    def test_matches_manual(self):
        table = jnp.asarray(np.random.RandomState(0).randn(5, 3).astype(np.float32))
        ids = jnp.asarray([[1, 2, -1], [0, -1, -1], [-1, -1, -1]], dtype=jnp.int32)
        out = sqrtn_combine(table, ids)
        expect0 = (table[1] + table[2]) / np.sqrt(2)
        np.testing.assert_allclose(out[0], expect0, rtol=1e-6)
        np.testing.assert_allclose(out[1], table[0], rtol=1e-6)  # OOV id 0 participates
        np.testing.assert_allclose(out[2], np.zeros(3), atol=0)  # empty row -> zeros


class TestEmbeddingLayer:
    def _fs(self):
        fs = FeatureSet()
        fs["u"] = SparseFeat("u", feat_size=4)
        fs["sv"] = SparseValueFeat("sv", feat_size=3)
        fs["tags"] = MultiValCsvFeat("tags", tags=("a", "b"))
        fs["d"] = DenseFeat("d")
        for name in ("u", "sv"):
            fs[name].feat_size = fs[name].feat_size  # already +1 from ctor
        return fs

    def test_shapes_and_dispatch(self, rng):
        fs = self._fs()
        layer = EmbeddingLayer(fs, embedding_size=8)
        params = layer.init(rng)
        # dense feats excluded; one table per embedding feat
        assert "u_feat_embed" in params and "d_feat_embed" not in params
        assert params["u_feat_embed"].shape == (5, 8)
        assert layer.field_size == 3

        batch = {
            "u": jnp.asarray([1, 2], dtype=jnp.int32),
            "sv": jnp.asarray([1, 0], dtype=jnp.int32),
            "sv:value": jnp.asarray([2.0, 3.0], dtype=jnp.float32),
            "tags": jnp.asarray([[1, 2], [-1, -1]], dtype=jnp.int32),
        }
        embeds, bias = layer.apply(params, batch)
        assert embeds.shape == (2, 3, 8)
        assert bias.shape == (2, 3, 1)
        # SparseValueFeat scales by value (reference layers.py:142)
        np.testing.assert_allclose(
            embeds[0, 1], 2.0 * params["sv_feat_embed"][1], rtol=1e-6
        )

    def test_l2(self, rng):
        fs = self._fs()
        layer = EmbeddingLayer(fs, embedding_size=4, l2_reg=0.1)
        params = layer.init(rng)
        expect = 0.1 * sum(
            0.5 * float(jnp.sum(jnp.square(params[f"{n}_feat_embed"])))
            for n in ("u", "sv", "tags")
        )
        np.testing.assert_allclose(float(layer.l2(params)), expect, rtol=1e-6)


class TestLinearLayer:
    def test_matches_onehot_matmul(self, rng):
        """Gather formulation == explicit one-hot design-matrix matmul."""
        fs = FeatureSet()
        fs["u"] = SparseFeat("u", feat_size=3)  # size 4
        fs["tags"] = MultiValCsvFeat("tags", tags=("a", "b", "c"))  # size 4
        fs["d"] = DenseFeat("d")
        feats = fs.linear_features()
        layer = LinearLayer(feats)
        params = layer.init()
        rs = np.random.RandomState(1)
        w = rs.randn(layer.total_size, 1).astype(np.float32)
        params["linear_w"] = jnp.asarray(w)
        params["linear_w0"] = jnp.asarray([0.5], dtype=jnp.float32)

        batch = {
            "u": jnp.asarray([0, 2], dtype=jnp.int32),
            "tags": jnp.asarray([[1, 3, -1], [0, 2, -1]], dtype=jnp.int32),
            "d": jnp.asarray([1.5, -2.0], dtype=jnp.float32),
        }
        out = layer.apply(params, batch)

        # dense one-hot design matrix per reference utils.py:51-107
        X = np.zeros((2, layer.total_size), dtype=np.float32)
        X[0, 0] = 1.0  # u id 0 (OOV contributes for SparseFeat)
        X[1, 2] = 1.0
        X[0, 4 + 1] = 1.0  # tags: ids>0 only
        X[0, 4 + 3] = 1.0
        X[1, 4 + 2] = 1.0  # id 0 excluded (reference utils.py:106-107)
        X[0, 8] = 1.5
        X[1, 8] = -2.0
        expect = X @ w + 0.5
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    def test_weight_override(self):
        """Inference-time override (reference layers.py:338-345)."""
        fs = FeatureSet()
        f = SparseFeat("u", feat_size=2)
        f.initialize(["a", "b"])
        fs["u"] = f
        layer = LinearLayer(fs.linear_features())
        params = layer.init()
        batch = {"u": jnp.asarray([1, 2], dtype=jnp.int32)}

        base = layer.apply(params, batch, training=False)
        np.testing.assert_allclose(np.asarray(base), 0.0)

        f.set_weights({"b": -5.0})
        override = jnp.asarray(layer.override_vector())
        out = layer.apply(params, batch, training=False, override=override)
        np.testing.assert_allclose(np.asarray(out)[:, 0], [0.0, -5.0])

        # training path ignores the override (reference layers.py:338)
        out_train = layer.apply(params, batch, training=True, override=override)
        np.testing.assert_allclose(np.asarray(out_train), 0.0)


class TestFMLayer:
    def test_identity_vs_pairwise(self, rng):
        """0.5*((sum v)^2 - sum v^2) == explicit pairwise dot sum."""
        B, F, K = 4, 5, 3
        rs = np.random.RandomState(0)
        emb = rs.randn(B, F, K).astype(np.float32)
        bias = rs.randn(B, F, 1).astype(np.float32)

        layer = FMLayer(dropout_keep=(1.0, 1.0))
        out = layer.apply({}, jnp.asarray(emb), jnp.asarray(bias), training=False)

        pairwise = np.zeros(B, dtype=np.float64)
        for i in range(F):
            for j in range(i + 1, F):
                pairwise += np.sum(emb[:, i, :] * emb[:, j, :], axis=1)
        expect = bias.sum(axis=1)[:, 0] + pairwise
        np.testing.assert_allclose(np.asarray(out)[:, 0], expect, rtol=1e-5)


class TestDNN:
    def test_forward_and_auto_units(self, rng):
        dnn = DNN(input_dim=6, hidden_units=(None, None), dropout_keep=(1, 1, 1),
                  activation="relu")
        # 2/3-rule: round((6+1)*2/3) = 5 (reference utils.py:135-139)
        assert dnn.hidden_units == (5, 5)
        params = dnn.init(rng)
        x = jnp.ones((3, 6))
        out = dnn.apply(params, x, training=False)
        assert out.shape == (3, 1)

    def test_manual_forward(self, rng):
        dnn = DNN(input_dim=2, hidden_units=(3,), dropout_keep=(1, 1),
                  activation="identity")
        params = dnn.init(rng)
        x = np.random.RandomState(0).randn(4, 2).astype(np.float32)
        out = dnn.apply(params, jnp.asarray(x), training=False)
        h = x @ np.asarray(params["dnn_layer_0_weights"]) + np.asarray(params["dnn_layer_0_bias"])
        expect = h @ np.asarray(params["dnn_w"]) + np.asarray(params["dnn_w0"])
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


def _reference_cin_numpy(inputs, filters, biases, units, act=lambda x: x):
    """Direct numpy port of the reference CIN loop (layers.py:697-760):
    split along embedding dim -> batched matmul -> reshape/transpose ->
    conv1d(width 1) -> activation -> transpose -> half-split."""
    B, H0, D = inputs.shape
    hidden = inputs
    finals = []
    for i, size in enumerate(units):
        Hk = hidden.shape[1]
        # dot_result[d, b, i0, ik] then reshape (D, B, H0*Hk), transpose (B, D, -1)
        dot = np.einsum("bhd,bmd->dbhm", inputs, hidden).reshape(D, B, H0 * Hk)
        dot = np.transpose(dot, (1, 0, 2))  # (B, D, H0*Hk)
        fmap = dot @ filters[i] + biases[i]  # conv1d width-1 == matmul
        fmap = act(fmap)
        fmap = np.transpose(fmap, (0, 2, 1))  # (B, size, D)
        if i != len(units) - 1:
            hidden = fmap[:, : size // 2, :]
            finals.append(fmap[:, size // 2 :, :])
        else:
            finals.append(fmap)
    result = np.concatenate(finals, axis=1)
    return result.sum(axis=-1)


class TestCIN:
    def test_matches_reference_formulation(self, rng):
        B, F, D = 3, 4, 5
        units = (6, 4)
        rs = np.random.RandomState(0)
        inputs = rs.randn(B, F, D).astype(np.float32)

        cin = CIN(field_size=F, cross_layer_units=units, activation="identity",
                  dropout_keep=(1, 1, 1), compute_dtype="float32")
        params = cin.init(rng)
        filters = [np.asarray(params[f"cin_filter_{i}"]) for i in range(len(units))]
        biases = [np.asarray(params[f"cin_bias_{i}"]) for i in range(len(units))]

        out = cin.apply(params, jnp.asarray(inputs), training=False)
        pooled = _reference_cin_numpy(inputs, filters, biases, units)
        expect = pooled @ np.asarray(params["cin_w"]) + np.asarray(params["cin_w0"])
        np.testing.assert_allclose(np.asarray(out), expect, rtol=2e-4, atol=1e-5)

    def test_notebook_toy_shapes(self, rng):
        """The notebook walkthrough config (notes/xDeepFM.ipynb cell 6):
        2 fields, k=4, units (16, 16), all-ones filters."""
        inputs = np.asarray([[[1, 2, 3, 4], [5, 6, 7, 8]]], dtype=np.float32)
        units = (16, 16)
        cin = CIN(field_size=2, cross_layer_units=units, activation="identity",
                  dropout_keep=(1, 1, 1), compute_dtype="float32")
        params = cin.init(rng)
        for i, size in enumerate(units):
            params[f"cin_filter_{i}"] = jnp.ones_like(params[f"cin_filter_{i}"])
        params["cin_w"] = jnp.ones_like(params["cin_w"])

        out = cin.apply(params, jnp.asarray(inputs), training=False)
        filters = [np.ones((2 * 2, 16), np.float32), np.ones((8 * 2, 16), np.float32)]
        biases = [np.zeros(16, np.float32)] * 2
        pooled = _reference_cin_numpy(inputs, filters, biases, units)
        # hand value: layer0 dot over d of x0 x0^T outer = known sums
        expect = pooled.sum(axis=1, keepdims=True)
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)

    def test_final_size(self):
        cin = CIN(field_size=10, cross_layer_units=(100, 100, 100),
                  activation="identity", dropout_keep=(1, 1, 1, 1))
        # 50 + 50 + 100 (reference layers.py:681-685)
        assert cin.final_size == 200


class TestCrossNet:
    def test_manual_recurrence(self, rng):
        d = 4
        net = CrossNet(input_dim=d, num_layers=2)
        params = net.init(rng)
        x0 = np.random.RandomState(0).randn(3, d).astype(np.float32)
        out = net.apply(params, jnp.asarray(x0))

        x = x0.copy()
        for i in range(2):
            w = np.asarray(params[f"cross_w_{i}"])
            b = np.asarray(params[f"cross_b_{i}"])
            x = x0 * (x @ w)[:, None] + b + x
        expect = x @ np.asarray(params["cross_w"]) + np.asarray(params["cross_w0"])
        np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-5)


class TestAFM:
    def test_vs_explicit_pairs(self, rng):
        B, F, K = 2, 4, 3
        layer = AFMLayer(field_size=F, embedding_size=K, att_factor=5)
        params = layer.init(rng)
        emb = np.random.RandomState(0).randn(B, F, K).astype(np.float32)
        out = layer.apply(params, jnp.asarray(emb), training=False)

        W = np.asarray(params["afm_att_w"])
        b = np.asarray(params["afm_att_b"])
        h = np.asarray(params["afm_att_h"])
        p = np.asarray(params["afm_p"])
        pairs, scores = [], []
        for i in range(F):
            for j in range(i + 1, F):
                pr = emb[:, i, :] * emb[:, j, :]
                pairs.append(pr)
                scores.append(np.maximum(pr @ W + b, 0) @ h)
        pairs = np.stack(pairs, 1)  # (B, P, K)
        scores = np.stack(scores, 1)
        probs = np.exp(scores - scores.max(1, keepdims=True))
        probs /= probs.sum(1, keepdims=True)
        pooled = np.einsum("bp,bpk->bk", probs, pairs)
        np.testing.assert_allclose(np.asarray(out), pooled @ p, rtol=1e-4)


class TestASP:
    def test_masked_pooling(self, rng):
        B, L, K = 2, 3, 4
        layer = ASPLayer(embedding_size=K, att_hidden_units=(8,),
                         activation="relu", weight_normalization=True)
        params = layer.init(rng)
        q = jnp.asarray(np.random.RandomState(0).randn(B, K), dtype=jnp.float32)
        keys = jnp.asarray(np.random.RandomState(1).randn(B, L, K), dtype=jnp.float32)
        mask = jnp.asarray([[True, True, False], [True, False, False]])
        out = layer.apply(params, q, keys, mask)
        assert out.shape == (B, K)
        # fully-masked weights on padded slots: recompute with zeroed pad keys
        keys2 = keys.at[0, 2].set(999.0)
        out2 = layer.apply(params, q, keys2, mask)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5)


class TestDropoutAndPrediction:
    def test_keep_prob_semantics(self, rng):
        x = jnp.ones((1000, 10))
        out = dropout(rng, x, keep_prob=0.8, training=True)
        kept = float(jnp.mean(out > 0))
        assert 0.75 < kept < 0.85
        # inverted scaling preserves expectation
        assert abs(float(jnp.mean(out)) - 1.0) < 0.05
        np.testing.assert_array_equal(dropout(rng, x, 0.8, training=False), x)
        np.testing.assert_array_equal(dropout(rng, x, 1.0, training=True), x)

    def test_prediction_layer(self):
        head = PredictionLayer(task="classification")
        out = head.apply({}, jnp.asarray([[0.0], [100.0]]))
        np.testing.assert_allclose(np.asarray(out), [0.5, 1.0], atol=1e-6)
        assert out.shape == (2,)
        reg = PredictionLayer(task="regression")
        np.testing.assert_allclose(np.asarray(reg.apply({}, jnp.asarray([[3.0]]))), [3.0])

    def test_dnn_combine(self):
        a = jnp.ones((2, 3, 4))
        b = jnp.ones((2,))
        out = dnn_combine([a, b])
        assert out.shape == (2, 13)


class TestCinRemat:
    def test_full_layer_remat_is_exact(self):
        """remat=True rebuilds each CIN layer in the backward; values AND
        grads must be bit-comparable to remat=False (same rng chain,
        dropout included)."""
        import jax
        import jax.numpy as jnp

        from recman_tpu.layers import CIN

        rs = np.random.RandomState(0)
        B, H0, D = 8, 5, 4
        x = jnp.asarray(rs.randn(B, H0, D), dtype=jnp.float32)

        def build(remat):
            return CIN(field_size=H0, cross_layer_units=(6, 4),
                       activation="relu", dropout_keep=(0.8, 0.9, 1.0),
                       compute_dtype="float32", remat=remat)

        cin_a, cin_b = build(False), build(True)
        params = cin_a.init(jax.random.PRNGKey(0))
        rng = jax.random.PRNGKey(3)

        def loss(p, layer):
            return jnp.sum(layer.apply(p, x, training=True, rng=rng) ** 2)

        va, ga = jax.value_and_grad(loss)(params, cin_a)
        vb, gb = jax.value_and_grad(loss)(params, cin_b)
        np.testing.assert_allclose(float(va), float(vb), rtol=1e-6)
        for name in ga:
            np.testing.assert_allclose(np.asarray(ga[name]),
                                       np.asarray(gb[name]),
                                       rtol=1e-5, atol=1e-7, err_msg=name)

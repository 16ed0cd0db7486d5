"""Model-zoo tests: every model learns on data matched to its inductive
bias, plus serving roundtrip and misc completeness items."""

import numpy as np
import pandas as pd
import pytest

import jax

from recman_tpu import FeatureSet, SequenceFeat, SparseFeat
from recman_tpu.models import AFM, DCN, DIN, MODEL_REGISTRY
from recman_tpu.serving import Predictor
from recman_tpu.training import LogLoss, RocAucScore, Trainer
from recman_tpu.utils import split_train_test


class TestZooLearns:
    @pytest.mark.parametrize("name", ["dcn", "afm"])
    def test_learns_synthetic(self, name, synthetic_df, synthetic_features):
        model = MODEL_REGISTRY[name](synthetic_features)
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before

    def test_din_learns_sequences(self):
        from recman_tpu.examples.din_synthetic import make_data

        df = make_data(n=400, n_items=20, max_hist=5)
        fs = FeatureSet()
        item = SparseFeat("item_id", feat_size=len(np.unique(df.item_id.values)))
        fs["item_id"] = item
        fs["hist_items"] = SequenceFeat("hist_items", id_feat=item, max_len=5)
        fs.initialize(df)

        model = DIN(fs, {"deep_hidden_units": (32, 16), "deep_dropout": (1, 1, 1)})
        trainer = Trainer(
            model, {"learning_rate": 0.02, "optimizer": "adam"},
            metrics=(LogLoss(), RocAucScore()), epoch=6, batch_size=64,
            random_seed=2019,
        )
        y = df["label"].values
        trainer.fit(df, y, random_seed_for_mini_batch=False)
        res = trainer.evaluate(df, y)
        assert res[1] > 0.65, f"DIN failed to learn sequence signal: AUC {res[1]}"


class TestServing:
    def test_predictor_roundtrip(self, tmp_path, synthetic_df, synthetic_features):
        from recman_tpu.models import XDeepFM

        model = XDeepFM(synthetic_features)
        trainer = Trainer(model, {"learning_rate": 0.01, "optimizer": "adam"},
                          epoch=2, batch_size=16, random_seed=2019)
        trainer.fit(synthetic_df, synthetic_df["LABEL"].values,
                    random_seed_for_mini_batch=False)
        expect = trainer.predict(synthetic_df)
        trainer.save(tmp_path / "ckpt")

        pred = Predictor.from_checkpoint(tmp_path / "ckpt", "xdeepfm")
        got = pred.predict(synthetic_df)
        np.testing.assert_allclose(got, expect, rtol=1e-5)

    def test_predictor_applies_overrides(self, tmp_path, synthetic_df,
                                         synthetic_features):
        from recman_tpu.models import XDeepFM

        model = XDeepFM(synthetic_features)
        trainer = Trainer(model, epoch=1, batch_size=16, random_seed=2019)
        trainer.fit(synthetic_df, synthetic_df["LABEL"].values,
                    random_seed_for_mini_batch=False)
        trainer.save(tmp_path / "ckpt")

        pred = Predictor.from_checkpoint(tmp_path / "ckpt", "xdeepfm")
        base = pred.predict(synthetic_df)
        # the sidecar schema is its own object; set override there
        pred.model.feat_dict["CATEGORY"].set_weights({"Outdoor": -5})
        penalized = pred.predict(synthetic_df)
        outdoor = (synthetic_df["CATEGORY"] == "Outdoor").values
        assert (penalized[outdoor] < base[outdoor]).all()
        ignored = pred.predict(synthetic_df, apply_overrides=False)
        np.testing.assert_allclose(ignored, base, rtol=1e-6)


class TestMisc:
    def test_split_train_test(self):
        df = pd.DataFrame({"x": range(100), "LABEL": [0, 1] * 50})
        tr, va, te = split_train_test(df, frac=0.8, random_seed=1)
        assert len(tr) == 80 and len(va) == 10 and len(te) == 10
        assert len(set(tr.index) | set(va.index) | set(te.index)) == 100

    def test_large_batch_schedule(self):
        from recman_tpu.training import large_batch_schedule, linear_scaled_lr

        assert linear_scaled_lr(0.001, 65536, 256) == pytest.approx(0.256)
        s = large_batch_schedule(0.001, 65536, 256, warmup_steps=100,
                                 total_steps=1000, decay="cosine")
        assert float(s(0)) == pytest.approx(0.0)
        assert float(s(100)) == pytest.approx(0.256, rel=1e-3)
        assert float(s(1000)) < 1e-4

    def test_batchnorm(self, rng):
        from recman_tpu.layers import BatchNormalization
        import jax.numpy as jnp

        bn = BatchNormalization(units=4)
        params = bn.init()
        state = bn.init_state()
        x = jnp.asarray(np.random.RandomState(0).randn(256, 4) * 3 + 7,
                        dtype=jnp.float32)
        out, state = bn.apply(params, state, x, training=True)
        np.testing.assert_allclose(np.asarray(out).mean(axis=0), 0.0, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out).std(axis=0), 1.0, atol=1e-2)
        # inference uses EMA stats deterministically
        out_inf, state2 = bn.apply(params, state, x[:8], training=False)
        assert state2 is state


class TestBeyondReferenceZoo:
    """DCN-V2 and AutoInt (beyond-reference models, arXiv:2008.13535 /
    1810.11921): learn on synthetic data in every structural variant."""

    @pytest.mark.parametrize("hp", [
        {"structure": "parallel"},                       # full-rank
        {"structure": "parallel", "cross_rank": 4},      # low-rank
        {"structure": "parallel", "cross_rank": 4, "cross_num_experts": 2},
        {"structure": "stacked", "cross_rank": 4},
    ])
    def test_dcn_v2_learns(self, hp, synthetic_df, synthetic_features):
        from recman_tpu.models import DCNv2

        model = DCNv2(synthetic_features, hp)
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before

    def test_autoint_learns(self, synthetic_df, synthetic_features):
        from recman_tpu.models import AutoInt

        model = AutoInt(synthetic_features, {"att_layer_num": 2})
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before

    def test_cross_v2_low_rank_shapes_and_head(self):
        import jax.numpy as jnp

        from recman_tpu.layers import CrossNetV2

        layer = CrossNetV2(input_dim=6, num_layers=2, rank=3, num_experts=2)
        params = layer.init(jax.random.PRNGKey(0))
        assert params["cross_v2_u_0_1"].shape == (6, 3)
        assert params["cross_v2_gate_1"].shape == (6, 2)
        x = jnp.ones((4, 6))
        out = layer.apply(params, x)
        assert out.shape == (4, 1)
        feats = layer.features(params, x)
        assert feats.shape == (4, 6)

    def test_autoint_attention_shapes(self):
        import jax.numpy as jnp

        from recman_tpu.layers import InteractingLayer

        layer = InteractingLayer(input_dim=8, num_layers=2, num_heads=2,
                                 head_size=4)
        params = layer.init(jax.random.PRNGKey(0))
        out = layer.apply(params, jnp.ones((3, 5, 8)), training=False)
        assert out.shape == (3, 5, 8)  # H*dh = 8

    def test_registry_contains_new_models(self):
        for name in ("dcn_v2", "autoint", "wide_deep", "nfm", "pnn",
                     "fibinet", "fwfm"):
            assert name in MODEL_REGISTRY, name


class TestRound2Zoo:
    """Wide&Deep / NFM / PNN / FiBiNET / FwFM (beyond-reference models):
    learn on the synthetic fixture + layer-level identities."""

    @pytest.mark.parametrize("name,hp", [
        ("wide_deep", {}),
        ("nfm", {}),
        ("pnn", {"product_type": "inner"}),
        ("pnn", {"product_type": "outer"}),
        ("pnn", {"product_type": "both"}),
        ("fibinet", {"bilinear_type": "all"}),
        ("fibinet", {"bilinear_type": "each"}),
        ("fibinet", {"bilinear_type": "interaction"}),
        ("fwfm", {}),
        ("dlrm", {}),  # no dense feats in the fixture: pure dot-interaction
    ])
    def test_learns_synthetic(self, name, hp, synthetic_df, synthetic_features):
        model = MODEL_REGISTRY[name](synthetic_features, hp)
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before

    def test_fwfm_init_matches_fm_pairwise(self, rng):
        """With r=1 (the init), FwFM's pair term equals FM's second-order
        term computed by the sum-square identity."""
        import jax.numpy as jnp

        from recman_tpu.layers import FMLayer, FwFMLayer

        emb = jax.random.normal(rng, (7, 5, 8))
        fw = FwFMLayer(num_fields=5)
        got = fw.apply(fw.init(), emb)
        fm = FMLayer(dropout_keep=(1.0, 1.0))
        want = fm.apply({}, emb, jnp.zeros((7, 5, 1)), training=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_bi_interaction_matches_explicit_pairs(self, rng):
        """Bi-interaction pooling equals Σ_{i<j} v_i ⊙ v_j elementwise."""
        from recman_tpu.layers import BiInteractionPooling

        emb = np.asarray(jax.random.normal(rng, (4, 6, 3)))
        want = np.zeros((4, 3))
        for i in range(6):
            for j in range(i + 1, 6):
                want += emb[:, i, :] * emb[:, j, :]
        layer = BiInteractionPooling()
        got = layer.apply({}, emb, training=False)
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    def test_product_layer_inner_matches_pairs(self, rng):
        from recman_tpu.layers import ProductLayer

        emb = np.asarray(jax.random.normal(rng, (3, 5, 4)))
        layer = ProductLayer(num_fields=5, embedding_size=4, kind="inner")
        got = np.asarray(layer.apply({}, emb))
        assert got.shape == (3, 10) and layer.output_dim == 10
        col = 0
        for i in range(5):
            for j in range(i + 1, 5):
                np.testing.assert_allclose(
                    got[:, col], (emb[:, i, :] * emb[:, j, :]).sum(-1),
                    rtol=1e-5, atol=1e-5,
                )
                col += 1

    def test_bilinear_shapes_and_all_type_identity(self, rng):
        import jax.numpy as jnp

        from recman_tpu.layers import BilinearInteraction

        emb = jax.random.normal(rng, (2, 4, 3))
        for btype, n_w in (("all", 1), ("each", 4), ("interaction", 6)):
            layer = BilinearInteraction(4, 3, bilinear_type=btype)
            params = layer.init(jax.random.PRNGKey(1))
            assert params[f"bilinear_w_{btype}"].shape == (n_w, 3, 3)
            out = layer.apply(params, emb)
            assert out.shape == (2, 6, 3)
        # "all": p_01 must equal (v_0 W) ⊙ v_1 computed by hand
        layer = BilinearInteraction(4, 3, bilinear_type="all")
        params = layer.init(jax.random.PRNGKey(2))
        out = layer.apply(params, emb)
        want = (emb[:, 0, :] @ params["bilinear_w_all"][0]) * emb[:, 1, :]
        np.testing.assert_allclose(np.asarray(out[:, 0, :]), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_dlrm_with_dense_bottom_mlp(self):
        """Criteo-shaped schema (13 dense feats): the bottom MLP projects
        dense to k, joins the dot interaction as a field, and the model
        learns."""
        from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
        from recman_tpu.models import DLRM

        fs = create_criteo_features(num_buckets=200)
        data = synthetic_criteo_arrays(512, num_buckets=200, seed=11)
        model = DLRM(fs, {"embedding_size": 4, "bot_hidden_units": (8,),
                          "top_hidden_units": (16,),
                          "top_dropout": (1.0, 1.0)})
        params = model.init_params(jax.random.PRNGKey(0))
        assert params["dlrm_bot_0_weights"].shape == (13, 8)
        assert params["dlrm_bot_1_weights"].shape == (8, 4)  # projects to k
        # 26 sparse fields + 1 dense field -> 27*26/2 pairs + k top input
        assert params["top_dnn_layer_0_weights"].shape == (4 + 27 * 13, 16)

        trainer = Trainer(model, {"learning_rate": 0.02, "optimizer": "adam"},
                          metrics=(LogLoss(),), epoch=1, batch_size=64,
                          random_seed=2019)
        y = data["y"]
        before = trainer.evaluate(data, y)[0]
        trainer.fit(data, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(data, y)[0] < before

    def test_senet_scales_fields(self, rng):
        from recman_tpu.layers import SENETLayer

        layer = SENETLayer(num_fields=6, reduction_ratio=2)
        params = layer.init(rng)
        emb = jax.random.normal(jax.random.PRNGKey(3), (5, 6, 4))
        out = np.asarray(layer.apply(params, emb))
        e = np.asarray(emb)
        assert out.shape == e.shape
        # each field vector is a nonneg scalar multiple of the input:
        # least-squares per-(example, field) scale reconstructs out exactly
        scale = (out * e).sum(axis=2) / (e * e).sum(axis=2)
        np.testing.assert_allclose(out, e * scale[:, :, None],
                                   rtol=1e-4, atol=1e-5)
        assert (scale >= -1e-6).all()


class TestRound3Zoo:
    """MaskNet / FinalMLP (beyond-reference models): learning on the
    synthetic fixture + layer-level identities."""

    @pytest.mark.parametrize("name,hp", [
        ("masknet", {"variant": "parallel"}),
        ("masknet", {"variant": "serial"}),
        ("final_mlp", {}),
        ("final_mlp", {"num_heads": 1}),
        ("final_mlp", {"fs1_context": ("USER_ID",),
                       "fs2_context": ("CLASS_ID", "CATEGORY")}),
    ])
    def test_learns_synthetic(self, name, hp, synthetic_df, synthetic_features):
        model = MODEL_REGISTRY[name](synthetic_features, hp)
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before

    def test_mask_block_matches_manual(self, rng):
        """MaskBlock output equals the paper's formula computed by hand."""
        import jax.numpy as jnp

        from recman_tpu.layers.masknet import MaskBlock

        blk = MaskBlock(mask_input_dim=12, input_dim=10, output_dim=6,
                        agg_dim=8, prefix="t_")
        params = blk.init(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 7))
        x = jax.random.normal(k1, (5, 10))
        v = jax.random.normal(k2, (5, 12))
        got = np.asarray(blk.apply(params, x, v))

        p = {k: np.asarray(a) for k, a in params.items()}
        mask = np.maximum(v @ p["t_agg_w"] + p["t_agg_b"], 0) @ p["t_proj_w"] + p["t_proj_b"]
        h = (np.asarray(x) * mask) @ p["t_hidden_w"]
        mu = h.mean(-1, keepdims=True)
        var = h.var(-1, keepdims=True)
        ln = (h - mu) / np.sqrt(var + 1e-6) * p["t_ln_gamma"] + p["t_ln_beta"]
        np.testing.assert_allclose(got, np.maximum(ln, 0), rtol=1e-5, atol=1e-5)

    def test_interaction_aggregation_matches_loop(self, rng):
        """Multi-head bilinear fusion equals the explicit per-head loop."""
        from recman_tpu.layers.final_mlp import InteractionAggregation

        agg = InteractionAggregation(dim1=8, dim2=12, num_heads=4, prefix="t_")
        params = agg.init(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 3))
        o1 = np.asarray(jax.random.normal(k1, (6, 8)))
        o2 = np.asarray(jax.random.normal(k2, (6, 12)))
        got = np.asarray(agg.apply(params, o1, o2))[:, 0]

        p = {k: np.asarray(a) for k, a in params.items()}
        want = o1 @ p["t_w1"][:, 0] + o2 @ p["t_w2"][:, 0] + p["t_bias"][0]
        for h in range(4):
            a = o1[:, h * 2:(h + 1) * 2]
            b = o2[:, h * 3:(h + 1) * 3]
            want += np.einsum("bi,ij,bj->b", a, p["t_w12"][h], b)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_fs_gate_range_and_context_slots(self, synthetic_features):
        """Gates live in (0, 2); context slots resolve by feature name."""
        from recman_tpu.models import FinalMLP

        model = FinalMLP(synthetic_features,
                         {"fs1_context": ("USER_ID",), "fs2_context": ()})
        assert len(model._ctx_slots1) == 1 and model._ctx_slots2 == ()
        params = model.init_params(jax.random.PRNGKey(0))
        g = np.asarray(model.fs2.gate(params))
        assert g.shape == (1, model.fs2.target_dim)
        assert (g > 0).all() and (g < 2).all()

    def test_registry_contains_round3_models(self):
        for name in ("masknet", "final_mlp"):
            assert name in MODEL_REGISTRY, name

    def test_gated_cross_matches_manual(self, rng):
        """GDCN gate: x1 = x0*(W x0 + b)*sigmoid(Wg x0) + x0 (1 layer)."""
        from recman_tpu.layers.cross_v2 import CrossNetV2

        layer = CrossNetV2(input_dim=6, num_layers=1, gated=True, prefix="t_")
        params = layer.init(rng)
        x0 = np.asarray(jax.random.normal(jax.random.fold_in(rng, 1), (4, 6)))
        got = np.asarray(layer.features(params, x0))
        p = {k: np.asarray(v) for k, v in params.items()}
        sig = 1.0 / (1.0 + np.exp(-(x0 @ p["t_cross_v2_wg_0"])))
        want = x0 * (x0 @ p["t_cross_v2_w_0"] + p["t_cross_v2_b_0"]) * sig + x0
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("hp", [{"structure": "parallel"},
                                    {"structure": "stacked"}])
    def test_gdcn_learns_synthetic(self, hp, synthetic_df, synthetic_features):
        model = MODEL_REGISTRY["gdcn"](synthetic_features, hp)
        assert model.cross.gated
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before

    def test_bst_masked_attention_padding_invariant(self, rng):
        """Changing values at MASKED positions must not affect unmasked
        outputs (key masking + padding-zeroed flatten)."""
        import jax.numpy as jnp

        from recman_tpu.layers.bst import TransformerEncoderLayer

        layer = TransformerEncoderLayer(model_dim=8, num_heads=2,
                                        ff_hidden=16, prefix="t_")
        params = layer.init(rng)
        k1, k2 = jax.random.split(jax.random.fold_in(rng, 5))
        x = jax.random.normal(k1, (3, 6, 8))
        mask = jnp.asarray([[True] * 4 + [False] * 2] * 3)
        noise = jax.random.normal(k2, (3, 6, 8)) * jnp.where(
            mask[:, :, None], 0.0, 10.0
        )
        out_a = np.asarray(layer.apply(params, x, mask, training=False))
        out_b = np.asarray(layer.apply(params, x + noise, mask, training=False))
        np.testing.assert_allclose(out_a[:, :4], out_b[:, :4],
                                   rtol=1e-4, atol=1e-5)

    def test_bst_learns_sequences(self):
        from recman_tpu.examples.din_synthetic import make_data
        from recman_tpu.models import BST

        df = make_data(n=400, n_items=20, max_hist=5)
        fs = FeatureSet()
        item = SparseFeat("item_id", feat_size=len(np.unique(df.item_id.values)))
        fs["item_id"] = item
        fs["hist_items"] = SequenceFeat("hist_items", id_feat=item, max_len=5)
        fs.initialize(df)

        model = BST(fs)
        trainer = Trainer(
            model, {"learning_rate": 0.02, "optimizer": "adam"},
            metrics=(LogLoss(), RocAucScore()), epoch=6, batch_size=64,
            random_seed=2019,
        )
        y = df["label"].values
        trainer.fit(df, y, random_seed_for_mini_batch=False)
        res = trainer.evaluate(df, y)
        assert res[1] > 0.65, f"BST failed to learn sequence signal: AUC {res[1]}"


class TestDIEN:
    def _seq_fixture(self, n=400):
        from recman_tpu.examples.din_synthetic import make_data

        df = make_data(n=n, n_items=20, max_hist=5)
        fs = FeatureSet()
        item = SparseFeat("item_id", feat_size=len(np.unique(df.item_id.values)))
        fs["item_id"] = item
        fs["hist_items"] = SequenceFeat("hist_items", id_feat=item, max_len=5)
        fs.initialize(df)
        return df, fs

    def test_dien_learns_sequences(self):
        from recman_tpu.models import DIEN

        df, fs = self._seq_fixture()
        model = DIEN(fs, {"deep_hidden_units": (32, 16), "deep_dropout": (1, 1, 1)})
        trainer = Trainer(
            model, {"learning_rate": 0.02, "optimizer": "adam"},
            metrics=(LogLoss(), RocAucScore()), epoch=6, batch_size=64,
            random_seed=2019,
        )
        y = df["label"].values
        trainer.fit(df, y, random_seed_for_mini_batch=False)
        res = trainer.evaluate(df, y)
        assert res[1] > 0.75, f"DIEN failed to learn sequence signal: AUC {res[1]}"

    def test_dien_aux_loss_trains_and_differs(self):
        """aux_loss_weight>0 adds the next-behavior term: loss must differ
        from the aux-free loss on the same params/batch, and training must
        still learn."""
        import jax

        from recman_tpu.models import DIEN

        df, fs = self._seq_fixture(n=128)
        base = DIEN(fs, {"deep_dropout": (1, 1, 1)})
        aux = DIEN(fs, {"deep_dropout": (1, 1, 1), "aux_loss_weight": 0.5})
        params = base.init_params(jax.random.PRNGKey(0))
        batch = {k: jax.numpy.asarray(v)
                 for k, v in fs.transform(df, y=df["label"].values).items()}
        l0 = float(base.loss(params, batch, training=True, rng=None))
        l1 = float(aux.loss(params, batch, training=True, rng=None))
        assert l1 > l0  # -log sigmoid terms are positive
        # aux contributes gradient to the GRU/attention params
        g = jax.grad(lambda p: aux.loss(p, batch, training=True, rng=None))(params)
        gn = float(jax.numpy.abs(g["hist_items_gru_wx"]).sum())
        assert gn > 0.0

    def test_dien_padding_invariance(self):
        """Extra PAD positions beyond a row's history must not change its
        prediction (masked GRU carries state through padding)."""
        import jax

        from recman_tpu.models import DIEN

        df, fs = self._seq_fixture(n=64)
        model = DIEN(fs, {"deep_dropout": (1, 1, 1)})
        params = model.init_params(jax.random.PRNGKey(1))
        data = fs.transform(df)
        batch5 = {k: jax.numpy.asarray(v) for k, v in data.items()}

        # re-encode with max_len 8: same ids, 3 more PAD columns
        fs["hist_items"].max_len = 8
        data8 = fs.transform(df)
        fs["hist_items"].max_len = 5
        model8 = DIEN(fs, {"deep_dropout": (1, 1, 1)})
        batch8 = {k: jax.numpy.asarray(v) for k, v in data8.items()}

        p5 = np.asarray(model.apply(params, batch5, training=False))
        p8 = np.asarray(model8.apply(params, batch8, training=False))
        np.testing.assert_allclose(p5, p8, rtol=1e-6, atol=1e-6)

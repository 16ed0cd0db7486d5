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
        assert "dcn_v2" in MODEL_REGISTRY and "autoint" in MODEL_REGISTRY

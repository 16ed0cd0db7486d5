"""AOT serving-artifact tests: Predictor.export -> ExportedPredictor.load
roundtrip (StableHLO via jax.export; no model classes at serve time)."""

import numpy as np
import pytest

import jax

from recman_tpu.models import MODEL_REGISTRY
from recman_tpu.serving import (
    EXPORT_BLOB,
    EXPORT_META,
    EXPORT_PARAMS,
    EXPORT_SCHEMA,
    EXPORT_SCHEMA_JSON,
    ExportedPredictor,
    Predictor,
)


@pytest.fixture
def xdeepfm_predictor(synthetic_features):
    model = MODEL_REGISTRY["xdeepfm"](synthetic_features, {"embedding_size": 4})
    params = model.init_params(jax.random.PRNGKey(3))
    return Predictor(model, params, batch_size=8)


class TestExportRoundtrip:
    def test_artifact_files_and_parity(self, tmp_path, xdeepfm_predictor,
                                       synthetic_df):
        d = xdeepfm_predictor.export(str(tmp_path), synthetic_df)
        for name in (EXPORT_BLOB, EXPORT_META, EXPORT_PARAMS, EXPORT_SCHEMA_JSON):
            assert (tmp_path / name).exists(), name
        # built-in feature types serialize as pure-data JSON; no pickle
        assert not (tmp_path / EXPORT_SCHEMA).exists()

        served = ExportedPredictor.load(d)
        want = xdeepfm_predictor.predict(synthetic_df)
        got = served.predict(synthetic_df)
        assert got.shape == want.shape == (len(synthetic_df),)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        # zero-row input early-returns an empty result
        empty = served.predict(synthetic_df.iloc[:0])
        assert empty.shape == (0,)

    def test_multi_platform_export_disables_fused_ops(self, tmp_path,
                                                      xdeepfm_predictor,
                                                      synthetic_df):
        """An export that must run beyond TPU must NOT embed Mosaic
        custom calls even if the exporting host would use the fused
        Pallas path: force the fused contexts on and assert the cpu+tpu
        export still lowers and serves (the portability gate in
        Predictor.export traces the XLA path)."""
        from recman_tpu.ops import fused_grad
        from recman_tpu.ops.cin_interact import pallas_cin

        with fused_grad(True), pallas_cin(True):
            d = xdeepfm_predictor.export(
                str(tmp_path), synthetic_df, platforms=("cpu", "tpu")
            )
        served = ExportedPredictor.load(d)
        want = xdeepfm_predictor.predict(synthetic_df)
        got = served.predict(synthetic_df)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)

    def test_padding_path(self, tmp_path, xdeepfm_predictor, synthetic_df):
        """16 rows through a batch-5 artifact: 3 padded calls + trim."""
        d = xdeepfm_predictor.export(str(tmp_path), synthetic_df, batch_size=5)
        served = ExportedPredictor.load(d)
        want = xdeepfm_predictor.predict(synthetic_df)
        got = served.predict(synthetic_df)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_encoded_dict_input(self, tmp_path, xdeepfm_predictor,
                                synthetic_df):
        d = xdeepfm_predictor.export(str(tmp_path), synthetic_df)
        served = ExportedPredictor.load(d)
        data = served.feat_dict.transform(synthetic_df)
        np.testing.assert_allclose(
            served.predict(data), xdeepfm_predictor.predict(synthetic_df),
            rtol=1e-5, atol=1e-6,
        )

    def test_override_baked_in(self, tmp_path, synthetic_features,
                               synthetic_df):
        """Overrides active at export time are constants in the artifact."""
        model = MODEL_REGISTRY["xdeepfm"](synthetic_features,
                                          {"embedding_size": 4})
        params = model.init_params(jax.random.PRNGKey(3))
        pred = Predictor(model, params, batch_size=8)

        base = pred.export(str(tmp_path / "base"), synthetic_df)
        synthetic_features["CATEGORY"].set_weights({"Outdoor": -5})
        overridden = pred.export(str(tmp_path / "ovr"), synthetic_df)
        try:
            got_base = ExportedPredictor.load(base).predict(synthetic_df)
            got_ovr = ExportedPredictor.load(overridden).predict(synthetic_df)
            live = pred.predict(synthetic_df, apply_overrides=True)
        finally:
            synthetic_features["CATEGORY"].set_weights({})

        np.testing.assert_allclose(got_ovr, live, rtol=1e-5, atol=1e-6)
        outdoor = np.asarray(synthetic_df["CATEGORY"] == "Outdoor")
        assert (np.abs(got_ovr - got_base)[outdoor] > 1e-4).all()
        np.testing.assert_allclose(got_base[~outdoor], got_ovr[~outdoor],
                                   rtol=1e-5, atol=1e-6)

    def test_no_model_registry_needed(self, tmp_path, xdeepfm_predictor,
                                      synthetic_df, monkeypatch):
        """Loading must not consult MODEL_REGISTRY / model classes."""
        d = xdeepfm_predictor.export(str(tmp_path), synthetic_df)
        import recman_tpu.serving as serving

        monkeypatch.setattr(serving, "MODEL_REGISTRY", {})
        served = ExportedPredictor.load(d)
        assert served.predict(synthetic_df).shape == (len(synthetic_df),)

    def test_quantized_embeddings_artifact(self, tmp_path, synthetic_df,
                                           synthetic_features):
        """int8 per-row embedding storage: ~4x smaller tables, predictions
        within quantization error of the f32 artifact."""
        model = MODEL_REGISTRY["xdeepfm"](synthetic_features,
                                          {"embedding_size": 4})
        params = model.init_params(jax.random.PRNGKey(3))
        pred = Predictor(model, params, batch_size=8)
        d32 = pred.export(str(tmp_path / "f32"), synthetic_df)
        dq = pred.export(str(tmp_path / "q8"), synthetic_df,
                         quantize_embeddings=True)

        s32 = ExportedPredictor.load(d32)
        sq = ExportedPredictor.load(dq)
        assert sq.meta["quantized"], "no tables were quantized"
        with np.load(str(tmp_path / "q8" / EXPORT_PARAMS)) as z:
            name = sq.meta["quantized"][0]
            assert z[f"{name}::q8"].dtype == np.int8

        want = s32.predict(synthetic_df)
        got = sq.predict(synthetic_df)
        np.testing.assert_allclose(got, want, atol=5e-3)
        assert not np.allclose(got, want, atol=1e-8)  # genuinely quantized

    def test_runtime_quantized_lookup(self, tmp_path, synthetic_df,
                                      synthetic_features):
        """quantize_embeddings='runtime': tables stay int8 IN MEMORY at
        serve time (gather-then-dequantize is inside the exported
        forward), predictions within quantization error of f32."""
        from recman_tpu.ops.embedding import QuantTable

        model = MODEL_REGISTRY["xdeepfm"](synthetic_features,
                                          {"embedding_size": 4})
        params = model.init_params(jax.random.PRNGKey(3))
        pred = Predictor(model, params, batch_size=8)
        d32 = pred.export(str(tmp_path / "f32"), synthetic_df)
        dr = pred.export(str(tmp_path / "rq8"), synthetic_df,
                         quantize_embeddings="runtime")

        s32 = ExportedPredictor.load(d32)
        sr = ExportedPredictor.load(dr)
        assert sr.meta["quant_mode"] == "runtime"
        # serving params hold int8 tables — no f32 dequantized copy exists
        qt = [v for v in sr.params.values() if isinstance(v, QuantTable)]
        assert qt and all(np.asarray(t.q).dtype == np.int8 for t in qt)
        f32_bytes = sum(
            np.asarray(s32.params[k]).nbytes for k in sr.meta["quantized"]
        )
        q_bytes = sum(
            np.asarray(t.q).nbytes + np.asarray(t.scale).nbytes for t in qt
        )
        assert q_bytes < f32_bytes / 1.8  # 4k/(k+4): 2x at k=4, 3.8x at k=16

        want = s32.predict(synthetic_df)
        got = sr.predict(synthetic_df)
        np.testing.assert_allclose(got, want, atol=1e-2)
        assert not np.allclose(got, want, atol=1e-8)
        # and exact agreement with load-time dequantization (same rounded
        # values, different placement of the multiply)
        dq = pred.export(str(tmp_path / "q8"), synthetic_df,
                         quantize_embeddings=True)
        sq = ExportedPredictor.load(dq)
        np.testing.assert_allclose(
            got, sq.predict(synthetic_df), rtol=1e-5, atol=1e-6
        )


class TestExportSequenceModels:
    def test_din_export_roundtrip(self, tmp_path):
        """Sequence-model artifacts: (B, L) history arrays trace and pad."""
        import pandas as pd

        from recman_tpu import FeatureSet, SequenceFeat, SparseFeat
        from recman_tpu.examples.din_synthetic import make_data
        from recman_tpu.models import DIN

        df = make_data(n=64, n_items=10, max_hist=4)
        fs = FeatureSet()
        item = SparseFeat("item_id", feat_size=len(np.unique(df.item_id.values)))
        fs["item_id"] = item
        fs["hist_items"] = SequenceFeat("hist_items", id_feat=item, max_len=4)
        fs.initialize(df)

        # DEFAULT Dice activations: inference uses frozen moments from
        # params (Trainer.calibrate / layers), so exports are exact and
        # batch-composition-invariant
        model = DIN(fs)
        params = model.init_params(jax.random.PRNGKey(7))
        pred = Predictor(model, params, batch_size=16)
        d = pred.export(str(tmp_path), df, batch_size=10)  # padding path too
        served = ExportedPredictor.load(d)
        np.testing.assert_allclose(
            served.predict(df), pred.predict(df), rtol=1e-5, atol=1e-6
        )

    def test_din_dice_predictions_batch_invariant(self, tmp_path):
        """Serving-safe Dice: a trained+calibrated DIN scores each row the
        same regardless of which rows accompany it (the round-2 caveat,
        now fixed — VERDICT.md item 6)."""
        import pandas as pd

        from recman_tpu import FeatureSet, SequenceFeat, SparseFeat
        from recman_tpu.examples.din_synthetic import make_data
        from recman_tpu.models import DIN
        from recman_tpu.training import Trainer

        df = make_data(n=128, n_items=10, max_hist=4)
        fs = FeatureSet()
        item = SparseFeat("item_id", feat_size=len(np.unique(df.item_id.values)))
        fs["item_id"] = item
        fs["hist_items"] = SequenceFeat("hist_items", id_feat=item, max_len=4)
        fs.initialize(df)

        model = DIN(fs)  # default Dice in attention MLP and DNN
        trainer = Trainer(model, {"learning_rate": 0.02, "optimizer": "adam"},
                          epoch=1, batch_size=32, random_seed=2019)
        trainer.fit(df, df["label"].values, random_seed_for_mini_batch=False)
        # fit calibrated the moments; in-process predictions batch-invariant
        full = trainer.predict(df)
        half = np.concatenate(
            [trainer.predict(df.iloc[:40]), trainer.predict(df.iloc[40:])]
        )
        np.testing.assert_allclose(full, half, rtol=1e-6, atol=1e-7)

        # exported artifact: same invariance through the frozen forward
        d = Predictor(model, trainer.params, batch_size=16).export(
            str(tmp_path), df, batch_size=16
        )
        served = ExportedPredictor.load(d)
        np.testing.assert_allclose(
            served.predict(df),
            np.concatenate([served.predict(df.iloc[:40]),
                            served.predict(df.iloc[40:])]),
            rtol=1e-6, atol=1e-7,
        )
        # and the moments are real (calibration actually ran)
        assert any("_dice_mean_" in k for k in trainer.params)
        m = [np.asarray(v) for k, v in trainer.params.items()
             if "_dice_var_" in k]
        assert any(not np.allclose(v, 1.0) for v in m), "moments never written"

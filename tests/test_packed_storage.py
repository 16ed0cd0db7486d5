"""PackedStorageTrainer (training/packed_storage.py) vs the standard
Trainer: identical training trajectories, losses, params, and
interchangeable checkpoints.

The packed-storage step keeps the standard sorted-scatter backward and
optax optimizer but stores each packable feature's [table|(bias)|w]
matrix persistently, removing the per-step concat/slice. For
elementwise optimizers the update commutes with packing, so this is an
exact-parity integration test, under live dropout.
"""

import numpy as np
import pytest

from recman_tpu.models import XDeepFM
from recman_tpu.training import PackedStorageTrainer, Trainer
from recman_tpu.training.trainer import batch_indices

HP = {
    "learning_rate": 0.01,
    "embedding_size": 4,
    "cin_cross_layer_units": (6, 6),
    "cin_dropout": (1, 1, 1),
    "deep_hidden_units": (8, 8),
    # keep dropout LIVE (0.8 keep) — parity must hold under identical
    # rng splitting, not just in the deterministic case
    "deep_dropout": (0.8, 0.8, 0.8),
}


def _trainers(synthetic_features, hp=HP, batch_size=8):
    model = XDeepFM(synthetic_features, hp)
    std = Trainer(model, hp, batch_size=batch_size, random_seed=7)
    packed = PackedStorageTrainer(model, hp, batch_size=batch_size,
                                  random_seed=7)
    return model, std, packed


def _run(trainer, df, y, steps=4):
    data, layout = trainer._to_device(
        trainer.model.feat_dict.transform(df), y
    )
    idx = batch_indices(len(y), trainer.batch_size, shuffle_seed=3)
    losses = []
    for i in range(steps):
        losses.append(float(trainer.fit_on_batch(data, idx[i % len(idx)], layout)))
    return losses


class TestPackedStorageTrainer:
    @pytest.mark.parametrize("optimizer", ["adam", "adagrad", "momentum"])
    def test_matches_standard_trainer(self, synthetic_features, synthetic_df,
                                      optimizer):
        y = synthetic_df["LABEL"].values.astype(np.float32)
        hp = dict(HP, optimizer=optimizer)
        model, std, packed = _trainers(synthetic_features, hp)

        losses_std = _run(std, synthetic_df, y)
        losses_packed = _run(packed, synthetic_df, y)
        np.testing.assert_allclose(losses_std, losses_packed, rtol=1e-6)

        packed._sync()
        for name, want in std.state.params.items():
            got = packed.state.params[name]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-7,
                err_msg=name,
            )

    def test_export_state_carries_moments(self, synthetic_features,
                                          synthetic_df):
        """export_state() must hand a standard Trainer a state it can
        continue from with an identical next step."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, packed = _trainers(synthetic_features)
        _run(std, synthetic_df, y, steps=3)
        _run(packed, synthetic_df, y, steps=3)

        std2 = Trainer(model, HP, batch_size=8, random_seed=7)
        std2.state = packed.export_state()
        data, layout = std._to_device(model.feat_dict.transform(synthetic_df), y)
        idx = batch_indices(len(y), 8, shuffle_seed=11)
        l_std = float(std.fit_on_batch(data, idx[0], layout))
        l_cont = float(std2.fit_on_batch(data, idx[0], layout))
        np.testing.assert_allclose(l_std, l_cont, rtol=1e-6)
        for name, want in std.state.params.items():
            np.testing.assert_allclose(
                np.asarray(std2.state.params[name]), np.asarray(want),
                rtol=1e-5, atol=1e-7, err_msg=name,
            )

    def test_import_mid_training_standard_state(self, synthetic_features,
                                                synthetic_df):
        """Carving a standard Trainer's mid-training state (live Adam
        moments) must continue exactly like that trainer would."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, packed = _trainers(synthetic_features)
        _run(std, synthetic_df, y, steps=3)

        packed.import_state(std.state)
        l_std = _run(std, synthetic_df, y, steps=2)
        l_packed = _run(packed, synthetic_df, y, steps=2)
        np.testing.assert_allclose(l_std, l_packed, rtol=1e-6)

    def test_import_round_trip(self, synthetic_features, synthetic_df):
        """import_state(export_state()) continues the packed run exactly."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, _, packed = _trainers(synthetic_features)
        _run(packed, synthetic_df, y, steps=2)
        snapshot = packed.export_state()

        l_a = _run(packed, synthetic_df, y, steps=2)

        packed2 = PackedStorageTrainer(model, HP, batch_size=8, random_seed=7)
        packed2.import_state(snapshot)
        l_b = _run(packed2, synthetic_df, y, steps=2)
        np.testing.assert_allclose(l_a, l_b, rtol=1e-6)

    def test_eval_after_fit_uses_fresh_params(self, synthetic_features,
                                              synthetic_df):
        """predict() must see post-step weights (the _sync hook)."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, packed = _trainers(synthetic_features)
        X = model.feat_dict.transform(synthetic_df)
        p0 = packed.predict(X)
        _run(std, synthetic_df, y, steps=3)
        _run(packed, synthetic_df, y, steps=3)
        p_std = std.predict(X)
        p_packed = packed.predict(X)
        assert not np.allclose(p0, p_packed)  # trained at all
        np.testing.assert_allclose(p_std, p_packed, rtol=1e-5, atol=1e-7)

    def test_rejects_per_tensor_optimizer(self, synthetic_features):
        model = XDeepFM(synthetic_features, HP)
        with pytest.raises(AssertionError, match="elementwise"):
            PackedStorageTrainer(
                model, dict(HP, optimizer="lamb"), batch_size=8
            )

    def test_rejects_optimizer_object(self, synthetic_features):
        """A GradientTransformation bypassed the elementwise check and
        silently broke trajectory identity (ADVICE r1)."""
        import optax

        model = XDeepFM(synthetic_features, HP)
        with pytest.raises(AssertionError, match="elementwise"):
            PackedStorageTrainer(
                model, dict(HP, optimizer=optax.lamb(1e-3)), batch_size=8
            )

    def test_predict_after_save_is_fresh(self, synthetic_features,
                                         synthetic_df, tmp_path):
        """save() used to restore the PRE-sync state with _dirty=False —
        predictions after save() silently used stale weights (ADVICE r1,
        medium)."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, packed = _trainers(synthetic_features)
        X = model.feat_dict.transform(synthetic_df)
        _run(std, synthetic_df, y, steps=3)
        _run(packed, synthetic_df, y, steps=3)
        packed.save(str(tmp_path / "ckpt"))
        np.testing.assert_allclose(
            packed.predict(X), std.predict(X), rtol=1e-5, atol=1e-7
        )

    def test_import_rejects_momentless_midtraining_state(
            self, synthetic_features, synthetic_df):
        """A TrainState with opt_state=() but step>0 (e.g. another packed
        trainer's own .state) must be rejected, not silently reset Adam
        moments (ADVICE r1)."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, _, packed = _trainers(synthetic_features)
        _run(packed, synthetic_df, y, steps=2)
        packed._sync()
        assert packed.state.opt_state == ()  # the hazardous shape
        packed2 = PackedStorageTrainer(model, HP, batch_size=8,
                                       random_seed=7)
        with pytest.raises(AssertionError, match="moments"):
            packed2.import_state(packed.state)

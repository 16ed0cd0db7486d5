"""FusedAdamTrainer (training/fused_adam.py) vs the standard Trainer:
identical training trajectories, losses, params, and checkpoints.

The fused step replaces the whole sparse-parameter pipeline (packed
gather, scatter-grad, optax Adam) with persistent packed storage +
zero-perturbation cotangent capture + the segment-Adam kernel, so this
is the integration-level proof that all three hooks compose to the same
math (the kernel itself is covered by tests/test_sparse_adam.py).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from recman_tpu.models import XDeepFM
from recman_tpu.training import FusedAdamTrainer, Trainer
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


def _trainers(synthetic_features, batch_size=8):
    model = XDeepFM(synthetic_features, HP)
    std = Trainer(model, HP, batch_size=batch_size, random_seed=7)
    fused = FusedAdamTrainer(model, HP, batch_size=batch_size, random_seed=7,
                             tile_v=8, chunk_n=8)
    return model, std, fused


def _run(trainer, df, y, steps=4):
    data, layout = trainer._to_device(
        trainer.model.feat_dict.transform(df), y
    )
    idx = batch_indices(len(y), trainer.batch_size, shuffle_seed=3)
    losses = []
    for i in range(steps):
        losses.append(float(trainer.fit_on_batch(data, idx[i % len(idx)], layout)))
    return losses


class TestFusedAdamTrainer:
    def test_matches_standard_trainer(self, synthetic_features, synthetic_df):
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, fused = _trainers(synthetic_features)

        losses_std = _run(std, synthetic_df, y)
        losses_fused = _run(fused, synthetic_df, y)
        np.testing.assert_allclose(losses_std, losses_fused, rtol=1e-5)

        fused._sync()
        for name, want in std.state.params.items():
            got = fused.state.params[name]
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-6,
                err_msg=name,
            )

    def test_export_state_carries_moments(self, synthetic_features, synthetic_df):
        """export_state() must hand a standard Trainer a state it can
        continue from with an identical next step."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, fused = _trainers(synthetic_features)
        _run(std, synthetic_df, y, steps=3)
        _run(fused, synthetic_df, y, steps=3)

        std2 = Trainer(model, HP, batch_size=8, random_seed=7)
        std2.state = fused.export_state()
        # one more identical step on each
        data, layout = std._to_device(model.feat_dict.transform(synthetic_df), y)
        idx = batch_indices(len(y), 8, shuffle_seed=11)
        l_std = float(std.fit_on_batch(data, idx[0], layout))
        l_cont = float(std2.fit_on_batch(data, idx[0], layout))
        np.testing.assert_allclose(l_std, l_cont, rtol=1e-5)
        for name, want in std.state.params.items():
            np.testing.assert_allclose(
                np.asarray(std2.state.params[name]), np.asarray(want),
                rtol=1e-4, atol=1e-6, err_msg=name,
            )

    def test_import_round_trip(self, synthetic_features, synthetic_df):
        """import_state(export_state()) continues the fused run exactly."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, _, fused = _trainers(synthetic_features)
        _run(fused, synthetic_df, y, steps=2)
        snapshot = fused.export_state()

        l_a = _run(fused, synthetic_df, y, steps=2)

        fused2 = FusedAdamTrainer(model, HP, batch_size=8, random_seed=7,
                                  tile_v=8, chunk_n=8)
        fused2.import_state(snapshot)
        l_b = _run(fused2, synthetic_df, y, steps=2)
        np.testing.assert_allclose(l_a, l_b, rtol=1e-5)

    def test_eval_after_fit_uses_fresh_params(self, synthetic_features,
                                              synthetic_df):
        """predict() must see post-step weights (the _sync hook)."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, fused = _trainers(synthetic_features)
        X = model.feat_dict.transform(synthetic_df)
        p0 = fused.predict(X)
        _run(std, synthetic_df, y, steps=3)
        _run(fused, synthetic_df, y, steps=3)
        p_std = std.predict(X)
        p_fused = fused.predict(X)
        assert not np.allclose(p0, p_fused)  # trained at all
        np.testing.assert_allclose(p_std, p_fused, rtol=1e-4, atol=1e-6)

    def test_rejects_non_adam(self, synthetic_features):
        model = XDeepFM(synthetic_features, HP)
        with pytest.raises(AssertionError):
            FusedAdamTrainer(model, {**HP, "optimizer": "lamb"})

    def test_predict_after_save_is_fresh(self, synthetic_features,
                                         synthetic_df, tmp_path):
        """save() used to restore the PRE-sync state with _dirty=False —
        predictions after save() silently used stale weights (ADVICE r1,
        medium)."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, std, fused = _trainers(synthetic_features)
        X = model.feat_dict.transform(synthetic_df)
        _run(std, synthetic_df, y, steps=3)
        _run(fused, synthetic_df, y, steps=3)
        fused.save(str(tmp_path / "ckpt"))
        np.testing.assert_allclose(
            fused.predict(X), std.predict(X), rtol=1e-4, atol=1e-6
        )

    def test_import_rejects_momentless_midtraining_state(
            self, synthetic_features, synthetic_df):
        """A TrainState without Adam moments at step>0 must be rejected,
        not silently reset the kernel-owned moments (ADVICE r1)."""
        y = synthetic_df["LABEL"].values.astype(np.float32)
        model, _, fused = _trainers(synthetic_features)
        _run(fused, synthetic_df, y, steps=2)
        fused._sync()
        fused2 = FusedAdamTrainer(model, HP, batch_size=8, random_seed=7,
                                  tile_v=8, chunk_n=8)
        with pytest.raises(AssertionError, match="moments"):
            fused2.import_state(fused.state)

    def test_lr_schedule(self, synthetic_features, synthetic_df):
        """Callable learning rates route through both optax and the kernel
        at the same (pre-increment) step count."""
        import optax

        y = synthetic_df["LABEL"].values.astype(np.float32)
        sched = optax.linear_schedule(0.02, 0.002, 8)
        hp = {**HP, "learning_rate": sched}
        model = XDeepFM(synthetic_features, HP)
        std = Trainer(model, hp, batch_size=8, random_seed=7)
        fused = FusedAdamTrainer(model, hp, batch_size=8, random_seed=7,
                                 tile_v=8, chunk_n=8)
        l_std = _run(std, synthetic_df, y, steps=4)
        l_fused = _run(fused, synthetic_df, y, steps=4)
        np.testing.assert_allclose(l_std, l_fused, rtol=1e-5)
        fused._sync()
        for name, want in std.state.params.items():
            np.testing.assert_allclose(
                np.asarray(fused.state.params[name]), np.asarray(want),
                rtol=1e-4, atol=1e-6, err_msg=name,
            )

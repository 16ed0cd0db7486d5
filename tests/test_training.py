"""Training-subsystem tests: metrics, batching, end-to-end fit, callbacks,
checkpoint roundtrip. The end-to-end case is the reference's own smoke
"test" (examples/xDeepFM_test.py) with real assertions."""

import numpy as np
import pytest

import jax

from recman_tpu.config import BaseHyperParameters, xDeepFMHyperParams
from recman_tpu.models import FM, XDeepFM
from recman_tpu.obs import BestModelFinder
from recman_tpu.training import (
    LogLoss,
    RocAucScore,
    StreamingAUC,
    Trainer,
    batch_indices,
    create_optimizer,
)


class TestMetrics:
    def test_logloss_matches_sklearn(self):
        from sklearn.metrics import log_loss

        y = np.array([0, 1, 1, 0, 1])
        p = np.array([0.1, 0.8, 0.6, 0.4, 0.99])
        ours = LogLoss()(y, p)
        np.testing.assert_allclose(ours, log_loss(y, p), rtol=1e-9)

    def test_auc_matches_sklearn_with_ties(self):
        from sklearn.metrics import roc_auc_score

        rs = np.random.RandomState(0)
        y = rs.randint(0, 2, 200)
        p = np.round(rs.rand(200), 1)  # heavy ties
        np.testing.assert_allclose(RocAucScore()(y, p), roc_auc_score(y, p), rtol=1e-12)

    def test_streaming_auc_close_to_exact(self):
        rs = np.random.RandomState(1)
        y = rs.randint(0, 2, 5000)
        p = np.clip(rs.rand(5000) * 0.5 + y * 0.3, 0, 1)
        exact = RocAucScore()(y, p)
        stream = StreamingAUC(num_buckets=4096)
        # incremental updates across chunks
        for i in range(0, 5000, 1000):
            stream.update(y[i : i + 1000], p[i : i + 1000])
        assert abs(stream.result() - exact) < 5e-3

    def test_higher_the_better_flags(self):
        assert not LogLoss().higher_the_better
        assert RocAucScore().higher_the_better
        assert StreamingAUC().higher_the_better


class TestBatching:
    def test_padding_and_coverage(self):
        idx = batch_indices(10, 4)
        # reference total_batch = n // bs + 1 (DeepModel.py:188)
        assert idx.shape == (3, 4)
        flat = idx.flatten()
        assert sorted(flat[flat >= 0].tolist()) == list(range(10))
        assert (flat == -1).sum() == 2

    def test_shuffle_determinism(self):
        a = batch_indices(100, 8, shuffle_seed=7)
        b = batch_indices(100, 8, shuffle_seed=7)
        c = batch_indices(100, 8, shuffle_seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)


class TestOptimizerFactory:
    @pytest.mark.parametrize("name", ["adam", "adagrad", "gd", "sgd", "momentum", "lamb"])
    def test_known(self, name):
        opt = create_optimizer(name, 0.01)
        assert hasattr(opt, "update")

    def test_unknown(self):
        with pytest.raises(ValueError):
            create_optimizer("nope", 0.01)


class TestEndToEnd:
    def test_xdeepfm_synthetic_learns(self, synthetic_df, synthetic_features):
        """Train on the reference's 16-row fixture; loss must drop and AUC
        must beat random — with real assertions (the reference's script
        asserts nothing, SURVEY.md §4)."""
        df = synthetic_df
        hp = xDeepFMHyperParams().defaults()
        hp[BaseHyperParameters.LearningRate] = 0.01
        model = XDeepFM(synthetic_features, hp)
        trainer = Trainer(
            model, hp, metrics=(LogLoss(), RocAucScore()),
            epoch=5, batch_size=16, random_seed=2019,
        )
        y = df["LABEL"].values
        before = trainer.evaluate(df, y)
        trainer.fit(df, y, random_seed_for_mini_batch=False)
        after = trainer.evaluate(df, y)
        assert after[0] < before[0], f"logloss did not improve: {before} -> {after}"
        assert after[1] > 0.5

    def test_epoch_scan_matches_per_step_loop(self, synthetic_df,
                                              synthetic_features):
        """fit with epoch_in_one_dispatch=True (one lax.scan per epoch)
        produces the same parameters as the per-step loop: identical rng
        chain, batch order, and update math."""
        df = synthetic_df
        y = df["LABEL"].values
        hp = {BaseHyperParameters.LearningRate: 0.01}
        model = XDeepFM(synthetic_features, xDeepFMHyperParams().defaults())
        t_loop = Trainer(model, hp, metrics=(LogLoss(),), epoch=2,
                         batch_size=8, random_seed=2019)
        t_scan = Trainer(model, hp, metrics=(LogLoss(),), epoch=2,
                         batch_size=8, random_seed=2019,
                         epoch_in_one_dispatch=True)
        t_loop.fit(df, y, random_seed_for_mini_batch=False)
        t_scan.fit(df, y, random_seed_for_mini_batch=False)
        for name in t_loop.state.params:
            np.testing.assert_allclose(
                np.asarray(t_loop.state.params[name]),
                np.asarray(t_scan.state.params[name]),
                rtol=1e-5, atol=1e-6, err_msg=name,
            )

    def test_weight_override_reranks(self, synthetic_df, synthetic_features):
        """The reference's signature behavioral check (xDeepFM_test.py:118-129):
        penalizing a category downranks its rows at inference only."""
        df = synthetic_df
        model = XDeepFM(synthetic_features)
        trainer = Trainer(model, epoch=2, batch_size=16, random_seed=2019)
        trainer.fit(df, df["LABEL"].values, random_seed_for_mini_batch=False)

        base = trainer.predict(df, training=False)
        synthetic_features["CATEGORY"].set_weights({"Outdoor": -5})
        synthetic_features["HISTORICAL_CATEGORIES"].set_weights({"Outdoor": -5})
        penalized = trainer.predict(df, training=False)
        synthetic_features["CATEGORY"].set_weights(None)
        synthetic_features["HISTORICAL_CATEGORIES"].set_weights(None)

        outdoor_rows = (df["CATEGORY"] == "Outdoor").values
        assert (penalized[outdoor_rows] < base[outdoor_rows]).all()
        np.testing.assert_allclose(
            penalized[~outdoor_rows], base[~outdoor_rows], rtol=1e-5
        )

    def test_fm_learns(self, synthetic_df, synthetic_features):
        df = synthetic_df
        model = FM(synthetic_features)
        trainer = Trainer(
            model, {"learning_rate": 0.05, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=5, batch_size=8, random_seed=2019,
        )
        y = df["LABEL"].values
        before = trainer.evaluate(df, y)[0]
        trainer.fit(df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(df, y)[0] < before

    def test_eval_in_training_mode_flag(self, synthetic_df, synthetic_features):
        """training=True keeps dropout live (reference DeepModel.py:103-111)."""
        model = XDeepFM(synthetic_features)
        trainer = Trainer(model, epoch=1, batch_size=16)
        p_det1 = trainer.predict(synthetic_df, training=False)
        p_det2 = trainer.predict(synthetic_df, training=False)
        np.testing.assert_array_equal(p_det1, p_det2)


class TestBestModelFinder:
    def _fake_trainer(self, metric):
        class T:
            metrics = (metric,)

            def save(self, d):
                self.saved = d

        return T()

    def test_respects_higher_the_better(self):
        finder = BestModelFinder()
        t = self._fake_trainer(RocAucScore())
        finder(model=t, eval_results=([0.7], [0.7]), df_all=None)
        finder(model=t, eval_results=([0.6], [0.6]), df_all=None)
        assert finder.best_score == 0.7  # higher AUC wins

    def test_lower_for_logloss(self):
        finder = BestModelFinder()
        t = self._fake_trainer(LogLoss())
        finder(model=t, eval_results=([0.7], [0.7]), df_all=None)
        finder(model=t, eval_results=([0.6], [0.6]), df_all=None)
        assert finder.best_score == 0.6

    def test_reference_compat_mode(self):
        # reference hardcodes min (BestModelFinder.py:49)
        finder = BestModelFinder(lower_is_better=True)
        t = self._fake_trainer(RocAucScore())
        finder(model=t, eval_results=([0.7], [0.7]), df_all=None)
        finder(model=t, eval_results=([0.8], [0.8]), df_all=None)
        assert finder.best_score == 0.7

    def test_uses_valid_over_train(self):
        finder = BestModelFinder()
        t = self._fake_trainer(LogLoss())
        finder(model=t, eval_results=([0.1], [0.9]), df_all=None)
        assert finder.best_score == 0.9  # last non-empty = valid

    def test_no_valid_falls_back_to_train(self):
        finder = BestModelFinder()
        t = self._fake_trainer(LogLoss())
        finder(model=t, eval_results=([0.3], None), df_all=None)
        assert finder.best_score == 0.3


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, synthetic_df, synthetic_features):
        model = XDeepFM(synthetic_features)
        trainer = Trainer(model, epoch=1, batch_size=16, random_seed=2019)
        trainer.fit(synthetic_df, synthetic_df["LABEL"].values,
                    random_seed_for_mini_batch=False)
        preds = trainer.predict(synthetic_df)
        trainer.save(tmp_path / "ckpt")

        trainer2 = Trainer(model, epoch=1, batch_size=16, random_seed=999)
        assert not np.allclose(trainer2.predict(synthetic_df), preds)
        trainer2.restore(tmp_path / "ckpt")
        np.testing.assert_allclose(trainer2.predict(synthetic_df), preds, rtol=1e-6)
        assert int(trainer2.state.step) == int(trainer.state.step)

    def test_sidecars(self, tmp_path, synthetic_features):
        from recman_tpu.ckpt import load_feat_dict, load_hparams

        model = XDeepFM(synthetic_features)
        trainer = Trainer(model, {"learning_rate": 0.01, "optimizer": "adam"},
                          epoch=1, batch_size=16)
        trainer.save(tmp_path / "ckpt")
        hp = load_hparams(tmp_path / "ckpt")
        assert hp["learning_rate"] == 0.01
        fd = load_feat_dict(tmp_path / "ckpt")
        assert list(fd.keys()) == list(synthetic_features.keys())


class TestResumeTraining:
    def test_resume_continues_optimizer_state(self, tmp_path, synthetic_df,
                                              synthetic_features):
        """Save mid-training, restore into a fresh trainer, continue: the
        resumed run must match an uninterrupted run exactly (Adam moments
        and step counter restored — the reference cannot do this, its
        optimizer state resets every batch)."""
        from recman_tpu.models import XDeepFM

        y = synthetic_df["LABEL"].values

        def make():
            model = XDeepFM(synthetic_features)
            return Trainer(model, {"learning_rate": 0.01, "optimizer": "adam"},
                           epoch=2, batch_size=16, random_seed=2019)

        # uninterrupted: 4 epochs
        t_full = make()
        t_full.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        t_full.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        expect = t_full.predict(synthetic_df)

        # interrupted: 2 epochs, save, restore elsewhere, 2 more
        t_a = make()
        t_a.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        t_a.save(tmp_path / "mid")
        t_b = make()
        t_b.restore(tmp_path / "mid")
        # rng state restored too -> identical dropout streams
        t_b.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        got = t_b.predict(synthetic_df)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


class TestShardedCheckpoint:
    def test_sharded_save_restore(self, tmp_path):
        """Row-sharded params checkpoint and restore through Orbax."""
        from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
        from recman_tpu.models import DeepFM
        from recman_tpu.parallel import ShardedTrainer, make_mesh

        mesh = make_mesh(data=2, model=4)
        fs = create_criteo_features(num_buckets=8192)
        data = synthetic_criteo_arrays(256, num_buckets=8192, seed=9)
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        t1 = ShardedTrainer(model, epoch=1, batch_size=64, random_seed=2019,
                            mesh=mesh, row_shard_threshold=4096)
        t1.fit(data, data["y"], random_seed_for_mini_batch=False)
        expect = t1.predict(data)
        t1.save(tmp_path / "sharded")

        t2 = ShardedTrainer(model, epoch=1, batch_size=64, random_seed=7,
                            mesh=mesh, row_shard_threshold=4096)
        t2.restore(tmp_path / "sharded")
        np.testing.assert_allclose(t2.predict(data), expect, rtol=1e-5)

        # the checkpoint is mode-portable: a dedup-exchange + sharded-dataset
        # trainer restores the same params and predicts identically
        t3 = ShardedTrainer(model, epoch=1, batch_size=64, random_seed=3,
                            mesh=mesh, row_shard_threshold=4096,
                            embedding_exchange="dedup", dataset_sharded=True)
        t3.restore(tmp_path / "sharded")
        np.testing.assert_allclose(t3.predict(data), expect, rtol=1e-5,
                                   atol=1e-6)


class TestUnrolledStep:
    def test_unrolled_matches_sequential(self, synthetic_df, synthetic_features):
        """make_train_step_unrolled(n) == n sequential make_train_step calls
        (same rng chain, same update math, donated carry aliased)."""
        import jax
        import jax.numpy as jnp

        from recman_tpu.models import XDeepFM
        from recman_tpu.training import create_optimizer, init_state
        from recman_tpu.training.train_step import (
            make_train_step,
            make_train_step_unrolled,
            pack_dataset,
        )
        from recman_tpu.training.trainer import batch_indices

        model = XDeepFM(synthetic_features)
        data = synthetic_features.transform(
            synthetic_df, y=synthetic_df["LABEL"].values
        )
        data, layout = pack_dataset(data)
        data = {k: jnp.asarray(v) for k, v in data.items()}
        idx = batch_indices(len(synthetic_df), 4, shuffle_seed=0)[:4]

        opt = create_optimizer("adam", 0.01)
        s_seq = init_state(model, opt, jax.random.PRNGKey(0))
        s_unr = init_state(model, opt, jax.random.PRNGKey(0))

        step = make_train_step(model, opt)
        step4 = make_train_step_unrolled(model, opt, unroll=4)

        losses_seq = []
        for i in range(4):
            s_seq, loss = step(s_seq, data, jnp.asarray(idx[i]), layout)
            losses_seq.append(float(loss))
        s_unr, losses_unr = step4(s_unr, data, jnp.asarray(idx), layout)

        np.testing.assert_allclose(losses_seq, np.asarray(losses_unr),
                                   rtol=1e-6)
        assert int(s_unr.step) == int(s_seq.step) == 4
        for name in s_seq.params:
            np.testing.assert_allclose(
                np.asarray(s_seq.params[name]),
                np.asarray(s_unr.params[name]),
                rtol=1e-6, atol=1e-7, err_msg=name,
            )


class TestRowwiseAdam:
    """rowwise_adam: tables get rowwise-v/bf16-m scaling, everything else
    exact optax.adam."""

    def _grads_params(self, seed=0):
        import jax.numpy as jnp

        rs = np.random.RandomState(seed)
        params = {
            "U_feat_embed": jnp.asarray(rs.randn(6, 4), dtype=jnp.float32),
            "dnn_layer_0_weights": jnp.asarray(rs.randn(4, 3),
                                               dtype=jnp.float32),
            "linear_w": jnp.asarray(rs.randn(7), dtype=jnp.float32),
        }
        grads = [
            {k: jnp.asarray(rs.randn(*v.shape), dtype=jnp.float32)
             for k, v in params.items()}
            for _ in range(3)
        ]
        return params, grads

    def test_rest_params_match_plain_adam(self):
        import optax

        from recman_tpu.training.rowwise_adam import rowwise_adam

        params, grads = self._grads_params()
        opt_r = rowwise_adam(0.01)
        opt_a = optax.adam(0.01)
        s_r, s_a = opt_r.init(params), opt_a.init(params)
        p_r = p_a = params
        for g in grads:
            u_r, s_r = opt_r.update(g, s_r, p_r)
            u_a, s_a = opt_a.update(g, s_a, p_a)
            p_r = optax.apply_updates(p_r, u_r)
            p_a = optax.apply_updates(p_a, u_a)
        for name in ("dnn_layer_0_weights", "linear_w"):
            np.testing.assert_allclose(np.asarray(p_r[name]),
                                       np.asarray(p_a[name]),
                                       rtol=1e-6, err_msg=name)
        # the table diverges from plain adam (rowwise denominator)
        assert not np.allclose(np.asarray(p_r["U_feat_embed"]),
                               np.asarray(p_a["U_feat_embed"]))

    def test_table_math_matches_numpy_reference(self):
        import optax

        from recman_tpu.training.rowwise_adam import rowwise_adam

        params, grads = self._grads_params(seed=3)
        opt = rowwise_adam(0.01, mu_dtype=None)  # f32 m for exact compare
        state = opt.init(params)
        p = params
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 0.01

        w = np.asarray(params["U_feat_embed"], dtype=np.float64)
        m = np.zeros_like(w)
        v = np.zeros(w.shape[0])
        for t, g_tree in enumerate(grads, start=1):
            u, state = opt.update(g_tree, state, p)
            p = optax.apply_updates(p, u)
            g = np.asarray(g_tree["U_feat_embed"], dtype=np.float64)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * (g ** 2).mean(axis=1)
            m_hat = m / (1 - b1 ** t)
            v_hat = v / (1 - b2 ** t)
            w = w - lr * m_hat / (np.sqrt(v_hat)[:, None] + eps)
        np.testing.assert_allclose(np.asarray(p["U_feat_embed"]), w,
                                   rtol=1e-5, atol=1e-6)

    def test_state_shapes_and_dtypes(self):
        import jax.numpy as jnp

        from recman_tpu.training.rowwise_adam import rowwise_adam

        params, grads = self._grads_params()
        opt = rowwise_adam(0.01)
        state = opt.init(params)
        inner = state.inner_states["table"].inner_state[0]
        assert inner.mu["U_feat_embed"].dtype == jnp.bfloat16
        assert inner.nu["U_feat_embed"].shape == (6,)
        opt.update(grads[0], state, params)  # runs

    def test_trains_end_to_end(self, synthetic_df, synthetic_features):
        from recman_tpu.models import XDeepFM
        from recman_tpu.training import LogLoss

        model = XDeepFM(synthetic_features)
        trainer = Trainer(
            model, {"learning_rate": 0.02, "optimizer": "rowwise_adam"},
            metrics=(LogLoss(),), epoch=4, batch_size=16, random_seed=2019,
        )
        y = synthetic_df["LABEL"].values
        before = trainer.evaluate(synthetic_df, y)[0]
        trainer.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(synthetic_df, y)[0] < before


class TestStepsPerDispatch:
    def test_grouped_dispatch_matches_per_step(self, synthetic_df,
                                               synthetic_features):
        """Trainer(steps_per_dispatch=3) == per-step loop, including the
        non-divisible tail (16 rows / batch 4 -> 5 steps = one 3-pack + 2
        tail steps)."""
        df = synthetic_df
        y = df["LABEL"].values
        hp = {BaseHyperParameters.LearningRate: 0.01}
        model = XDeepFM(synthetic_features, xDeepFMHyperParams().defaults())
        t_loop = Trainer(model, hp, metrics=(LogLoss(),), epoch=2,
                         batch_size=4, random_seed=2019)
        t_grp = Trainer(model, hp, metrics=(LogLoss(),), epoch=2,
                        batch_size=4, random_seed=2019,
                        steps_per_dispatch=3)
        t_loop.fit(df, y, random_seed_for_mini_batch=False)
        t_grp.fit(df, y, random_seed_for_mini_batch=False)
        assert int(t_grp.state.step) == int(t_loop.state.step)
        for name in t_loop.state.params:
            np.testing.assert_allclose(
                np.asarray(t_loop.state.params[name]),
                np.asarray(t_grp.state.params[name]),
                rtol=1e-5, atol=1e-6, err_msg=name,
            )


class TestLambPartitioned:
    def test_exclusions_route_to_adam(self):
        """lamb_partitioned: 1-D params + *_feat_embed tables get plain
        Adam updates; dense matrices get LAMB (trust-ratio-scaled)."""
        import optax

        from recman_tpu.training.lr_schedule import lamb_partitioned

        import jax.numpy as jnp

        params = {
            "C1_feat_embed": jnp.ones((64, 4)) * 0.5,
            "linear_w": jnp.ones((64,)) * 0.5,
            "dnn_layer_0_weights": jnp.ones((8, 8)) * 0.5,
        }
        grads = jax.tree.map(jnp.ones_like, params)
        opt = lamb_partitioned(0.1)
        state = opt.init(params)
        updates, _ = opt.update(grads, state, params)

        adam_ref = optax.adam(0.1)
        au, _ = adam_ref.update(grads, adam_ref.init(params), params)
        # excluded params: identical to plain adam
        np.testing.assert_allclose(
            np.asarray(updates["C1_feat_embed"]),
            np.asarray(au["C1_feat_embed"]), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(updates["linear_w"]),
            np.asarray(au["linear_w"]), rtol=1e-6)
        # dense matrix: trust-ratio-scaled -> differs from plain adam
        assert not np.allclose(
            np.asarray(updates["dnn_layer_0_weights"]),
            np.asarray(au["dnn_layer_0_weights"]))

    def test_trains_end_to_end(self, synthetic_df, synthetic_features):
        from recman_tpu.models import XDeepFM
        from recman_tpu.training.lr_schedule import lamb_partitioned

        model = XDeepFM(synthetic_features)
        t = Trainer(model, {"learning_rate": 1e-3,
                            "optimizer": lamb_partitioned(0.01)},
                    metrics=(LogLoss(),), epoch=1, batch_size=8)
        y = synthetic_df["LABEL"].values
        t.fit(synthetic_df, y, random_seed_for_mini_batch=False)
        assert np.isfinite(t.last_mean_loss)

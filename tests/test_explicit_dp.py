"""Explicit shard_map DP step (parallel/train_explicit.py) on the forced
8-device CPU mesh: trajectory parity against the unsharded step (the
single-chip hot path it re-enables under SPMD), stacked-storage parity,
eval parity, and eligibility gating."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
from recman_tpu.models import XDeepFM
from recman_tpu.parallel import make_mesh
from recman_tpu.parallel.train_explicit import (
    explicit_dp_supported,
    make_dp_eval_scan_explicit,
    make_dp_train_step_explicit,
)
from recman_tpu.training import create_optimizer, init_state
from recman_tpu.training.train_step import (
    TrainState,
    make_train_step_unrolled,
    make_train_step_stacked,
    pack_dataset,
    stack_table_params,
    unstack_table_params,
)
from recman_tpu.training.trainer import batch_indices

BATCH = 64
N = 512


@pytest.fixture(scope="module")
def setup():
    fs = create_criteo_features(num_buckets=4096)
    model = XDeepFM(
        fs,
        {
            "embedding_size": 8,
            "cin_cross_layer_units": (8, 6),
            "cin_dropout": (1, 1, 1),
            "deep_hidden_units": (16, 16),
            "deep_dropout": (1.0, 1.0, 1.0),
        },
    )
    data = synthetic_criteo_arrays(N, num_buckets=4096, seed=5)
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    optimizer = create_optimizer("adam", 1e-3)
    idx_mat = batch_indices(N, BATCH, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)][:6]
    return model, data, layout, optimizer, idx_mat


def _run_reference(model, data, layout, optimizer, idx_mat, steps=6):
    state = init_state(model, optimizer, jax.random.PRNGKey(0))
    step = make_train_step_unrolled(model, optimizer, steps)
    state, losses = step(state, data, jnp.asarray(idx_mat[:steps]), layout)
    return state, np.asarray(losses)


class TestExplicitDP:
    def test_trajectory_matches_unsharded_8dev(self, setup):
        model, data, layout, optimizer, idx_mat = setup
        mesh = make_mesh(data=8, model=1)
        ref_state, ref_losses = _run_reference(
            model, data, layout, optimizer, idx_mat
        )

        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        step = make_dp_train_step_explicit(model, optimizer, mesh, unroll=6)
        state, losses = step(state, data, jnp.asarray(idx_mat[:6]), layout)
        # per-shard partial sums + psum reorder the f32 reductions; the
        # drift compounds ~1e-5/step (a REAL decomposition bug — e.g.
        # double-counted L2 — would show at 1e-3+)
        np.testing.assert_allclose(
            np.asarray(losses), ref_losses, rtol=1e-3, atol=1e-4
        )
        for k in ref_state.params:
            a = np.asarray(state.params[k])
            b = np.asarray(ref_state.params[k])
            scale = np.abs(b).max() + 1e-6
            # Adam's m_hat/sqrt(v_hat) amplifies f32 psum-reorder noise on
            # near-zero-gradient rows (untouched rows see only the tiny
            # L2 grad, so the update direction is noise-sensitive); the
            # observed honest-drift band is ~4e-3*scale after 6 steps vs
            # ~8e-2*scale for a real decomposition bug (the 8x psum
            # double-count this test caught). Gradient-level parity is
            # asserted tightly by test_sgd_one_step_grad_parity.
            assert np.abs(a - b).max() <= 2e-2 * scale, k

    def test_one_device_mesh_matches_to_roundoff(self, setup):
        model, data, layout, optimizer, idx_mat = setup
        mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        ref_state, ref_losses = _run_reference(
            model, data, layout, optimizer, idx_mat
        )
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        step = make_dp_train_step_explicit(model, optimizer, mesh, unroll=6)
        state, losses = step(state, data, jnp.asarray(idx_mat[:6]), layout)
        # 1-wide data axis: no psum reorder, no rng fold-in — the only
        # differences are compilation-level fusion choices (measured max
        # abs param delta 3.7e-9 after 6 steps)
        np.testing.assert_allclose(np.asarray(losses), ref_losses,
                                   rtol=1e-5, atol=1e-6)
        for k in ref_state.params:
            np.testing.assert_allclose(
                np.asarray(state.params[k]), np.asarray(ref_state.params[k]),
                rtol=2e-3, atol=1e-7, err_msg=k,
            )

    def test_stacked_storage_parity_8dev(self, setup):
        model, data, layout, optimizer, idx_mat = setup
        mesh = make_mesh(data=8, model=1)
        ref_state, ref_losses = _run_reference(
            model, data, layout, optimizer, idx_mat
        )
        base = init_state(model, optimizer, jax.random.PRNGKey(0))
        params_s, names = stack_table_params(model, base.params)
        state = TrainState(
            params_s, optimizer.init(params_s), base.step, base.rng
        )
        step = make_dp_train_step_explicit(
            model, optimizer, mesh, unroll=6, stacked_names=names
        )
        state, losses = step(state, data, jnp.asarray(idx_mat[:6]), layout)
        np.testing.assert_allclose(
            np.asarray(losses), ref_losses, rtol=1e-3, atol=1e-4
        )
        params = unstack_table_params(model, state.params)
        for k in ref_state.params:
            a, b = np.asarray(params[k]), np.asarray(ref_state.params[k])
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 2e-2 * scale, k  # see above

    def test_stacked_matches_unrolled_stacked(self, setup):
        """Explicit stacked step vs the single-shard stacked step: the
        SAME storage form both ways."""
        model, data, layout, optimizer, idx_mat = setup
        mesh = make_mesh(data=8, model=1)
        base = init_state(model, optimizer, jax.random.PRNGKey(0))
        params_s, names = stack_table_params(model, base.params)
        # copy EVERYTHING (incl. step/rng) before the first step donates
        params_s2 = jax.tree.map(jnp.copy, params_s)
        step0, rng0 = jnp.copy(base.step), jnp.copy(base.rng)

        s_ref = TrainState(
            params_s, optimizer.init(params_s), base.step, base.rng
        )
        step_ref = make_train_step_stacked(model, optimizer, 6, names)
        s_ref, l_ref = step_ref(s_ref, data, jnp.asarray(idx_mat[:6]), layout)

        s_dp = TrainState(
            params_s2, optimizer.init(params_s2), step0, rng0,
        )
        step_dp = make_dp_train_step_explicit(
            model, optimizer, mesh, unroll=6, stacked_names=names
        )
        s_dp, l_dp = step_dp(s_dp, data, jnp.asarray(idx_mat[:6]), layout)
        np.testing.assert_allclose(
            np.asarray(l_dp), np.asarray(l_ref), rtol=1e-3, atol=1e-4
        )

    def test_eval_scan_matches_unsharded_preds(self, setup):
        model, data, layout, optimizer, idx_mat = setup
        mesh = make_mesh(data=8, model=1)
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        scan = make_dp_eval_scan_explicit(model, mesh)
        idx = jnp.asarray(idx_mat[:4])
        preds = scan(state.params, data, idx, None, False, layout)

        from recman_tpu.training.train_step import gather_batch, unpack_batch

        outs = []
        for row in np.asarray(idx):
            batch, _ = gather_batch(data, jnp.asarray(row))
            batch = unpack_batch(batch, layout)
            outs.append(np.asarray(
                model.apply(state.params, batch, training=False)
            ))
        ref = np.concatenate(outs)
        np.testing.assert_allclose(np.asarray(preds), ref, rtol=2e-5,
                                   atol=2e-6)

    def test_live_dropout_runs_and_differs_per_shard_seed(self, setup):
        _, data, layout, optimizer, idx_mat = setup
        fs = create_criteo_features(num_buckets=4096)
        model = XDeepFM(
            fs,
            {
                "embedding_size": 8,
                "cin_cross_layer_units": (8, 6),
                "cin_dropout": (1, 1, 1),
                "deep_hidden_units": (16, 16),
                "deep_dropout": (0.8, 0.8, 0.8),
            },
        )
        mesh = make_mesh(data=8, model=1)
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        step = make_dp_train_step_explicit(model, optimizer, mesh, unroll=2)
        state, losses = step(state, data, jnp.asarray(idx_mat[:2]), layout)
        assert np.all(np.isfinite(np.asarray(losses)))

    def test_sgd_one_step_grad_parity(self, setup):
        """ONE step under plain SGD: the param delta IS lr*grad, so this
        asserts GRADIENT parity tightly without Adam's noise
        amplification — the assertion that catches decomposition bugs
        (double-counted L2, double psum) at their true magnitude."""
        model, data, layout, _, idx_mat = setup
        sgd = create_optimizer("sgd", 0.1)
        mesh = make_mesh(data=8, model=1)

        ref_state = init_state(model, sgd, jax.random.PRNGKey(0))
        ref_step = make_train_step_unrolled(model, sgd, 1)
        ref_state, _ = ref_step(ref_state, data, jnp.asarray(idx_mat[:1]),
                                layout)

        state = init_state(model, sgd, jax.random.PRNGKey(0))
        step = make_dp_train_step_explicit(model, sgd, mesh, unroll=1)
        state, _ = step(state, data, jnp.asarray(idx_mat[:1]), layout)
        for k in ref_state.params:
            a = np.asarray(state.params[k])
            b = np.asarray(ref_state.params[k])
            scale = np.abs(b).max() + 1e-6
            assert np.abs(a - b).max() <= 2e-5 * scale, k

    def test_sharded_trainer_auto_takes_explicit_and_fits(self, setup):
        """ShardedTrainer(spmd='auto') on a pure-DP mesh routes to the
        explicit step (incl. the steps_per_dispatch>1 stacked dispatch
        loop) and its fit trajectory tracks the unsharded Trainer."""
        from recman_tpu.parallel import ShardedTrainer
        from recman_tpu.training import Trainer
        from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays

        fs = create_criteo_features(num_buckets=512)
        hp = {
            "embedding_size": 8,
            "cin_cross_layer_units": (8, 6),
            "cin_dropout": (1, 1, 1),
            "deep_hidden_units": (16, 16),
            "deep_dropout": (1.0, 1.0, 1.0),
        }
        from recman_tpu.models import XDeepFM

        raw = synthetic_criteo_arrays(256, num_buckets=512, seed=9)
        y = np.asarray(raw["y"])

        t_ref = Trainer(XDeepFM(fs, hp), epoch=1, batch_size=64,
                        random_seed=7)
        t_ref.fit(dict(raw), y, random_seed_for_mini_batch=False)

        mesh = make_mesh(data=8, model=1)
        t_dp = ShardedTrainer(XDeepFM(fs, hp), epoch=1, batch_size=64,
                              random_seed=7, mesh=mesh,
                              steps_per_dispatch=2, stacked_tables=True)
        assert t_dp._explicit_dp
        assert t_dp._train_step_stacked is not None
        t_dp.fit(dict(raw), y, random_seed_for_mini_batch=False)
        assert abs(t_dp.last_mean_loss - t_ref.last_mean_loss) < 5e-4, (
            t_dp.last_mean_loss, t_ref.last_mean_loss,
        )
        # eval path (explicit eval scan) agrees with the unsharded one
        p_ref = t_ref.predict(dict(raw))
        p_dp = t_dp.predict(dict(raw))
        np.testing.assert_allclose(p_dp, p_ref, rtol=5e-3, atol=5e-4)

    def test_supported_gate(self, setup):
        model, *_ = setup
        mesh81 = make_mesh(data=8, model=1)
        mesh24 = make_mesh(data=2, model=4)
        assert explicit_dp_supported(model, mesh81)
        assert not explicit_dp_supported(model, mesh24)
        assert not explicit_dp_supported(
            model, mesh81, embedding_exchange="dedup"
        )

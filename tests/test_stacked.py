"""Stacked (T, V, k) table storage: trajectory parity + eligibility.

ops.embedding.stacked_tables stores the packed layer's same-shape tables
as ONE leaf so the optimizer sweeps them in a single fusion and the
batched backward grad flows unsplit (the round-5 Adam-overhead lever).
Semantics must be IDENTICAL to per-table storage: these tests train the
same model both ways from the same init and require bit-equal params.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
from recman_tpu.models import XDeepFM
from recman_tpu.ops import embedding as emb
from recman_tpu.training import create_optimizer, init_state
from recman_tpu.training.train_step import (
    STACKED_KEY,
    TrainState,
    make_train_step_stacked,
    make_train_step_unrolled,
    pack_dataset,
    stack_table_params,
    unstack_table_params,
)
from recman_tpu.training.trainer import batch_indices


def _tiny_model(num_buckets=50):
    feat_dict = create_criteo_features(num_buckets=num_buckets)
    return XDeepFM(
        feat_dict,
        {
            "embedding_size": 8,
            "cin_cross_layer_units": (8, 8),
            "cin_dropout": (1, 1, 1),
            "deep_hidden_units": (16, 16),
            "deep_dropout": (1.0, 1.0, 1.0),
        },
    )


def test_stacked_step_matches_per_table_trajectory():
    model = _tiny_model()
    data = synthetic_criteo_arrays(256, num_buckets=50, seed=3)
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    opt = create_optimizer("adam", 1e-3)
    idx_mat = batch_indices(256, 64, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
    packs = jnp.asarray(idx_mat[:4])

    # the grouped/stacked fused lookups are single-shard-only; force them
    # on so the CPU test exercises the same trace the TPU bench runs
    with emb.fused_grad(True):
        step_a = make_train_step_unrolled(model, opt, 4)
        st_a = init_state(model, opt, jax.random.PRNGKey(0))
        st_a, losses_a = step_a(st_a, data, packs, layout)

        base = init_state(model, opt, jax.random.PRNGKey(0))
        params_s, names = stack_table_params(model, base.params)
        assert params_s[STACKED_KEY].shape[0] == len(names)
        st_s = TrainState(params_s, opt.init(params_s), base.step, base.rng)
        step_s = make_train_step_stacked(model, opt, 4, names)
        st_s, losses_s = step_s(st_s, data, packs, layout)

    np.testing.assert_allclose(
        np.asarray(losses_a), np.asarray(losses_s), rtol=0, atol=0
    )
    unstacked = unstack_table_params(model, st_s.params)
    assert set(unstacked) == set(st_a.params)
    for k in st_a.params:
        np.testing.assert_array_equal(
            np.asarray(st_a.params[k]), np.asarray(unstacked[k]),
            err_msg=f"param {k} diverged under stacked storage",
        )


def test_stack_unstack_roundtrip():
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(1))
    params_s, names = stack_table_params(model, params)
    assert STACKED_KEY in params_s
    for n in names:
        assert f"{n}_feat_embed" not in params_s
    back = unstack_table_params(model, params_s)
    assert set(back) == set(params)
    for k in params:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(params[k]))
    # unstack is a no-op on per-table params
    assert set(unstack_table_params(model, params)) == set(params)


def test_stackable_eligibility():
    # the Criteo schema (26 same-vocab sparse + 13 dense) is stackable
    model = _tiny_model()
    names = model.packed.stackable()
    assert names is not None and len(names) == 26

    # a multi-val feature in the packable set disqualifies the group
    # (same stored feat_size — 3 — so the multi-val check is what fires)
    from recman_tpu.features import FeatureSet, MultiValCsvFeat, SparseFeat

    fs = FeatureSet()
    fs["a"] = SparseFeat("a", feat_size=2)
    fs["tags"] = MultiValCsvFeat("tags", tags=("x", "y"))
    from recman_tpu.layers import EmbeddingLayer, LinearLayer
    from recman_tpu.layers.packed import PackedEmbeddingLinear

    embs = EmbeddingLayer(fs, 4, use_bias=False)
    lin = LinearLayer(fs.linear_features(None))
    packed = PackedEmbeddingLinear(embs, lin)
    assert packed.stackable() is None

    # a bias-carrying tower disqualifies (bias columns are not stacked)
    embs_b = EmbeddingLayer(fs, 4, use_bias=True)
    packed_b = PackedEmbeddingLinear(embs_b, lin)
    assert packed_b.stackable() is None


def test_trainer_stacked_fit_matches_per_table():
    """Trainer(stacked_tables=True) trains bit-identically to the
    per-table loop and leaves self.state in per-table (checkpoint) form."""
    from recman_tpu.training.trainer import Trainer

    data = synthetic_criteo_arrays(256, num_buckets=50, seed=7)
    y = data.pop("y")

    def _fit(stacked):
        model = _tiny_model()
        tr = Trainer(
            model, {"learning_rate": 1e-3}, epoch=2, batch_size=64,
            steps_per_dispatch=4, stacked_tables=stacked,
        )
        # deterministic shuffles so both runs see identical batches
        tr.fit(dict(data), y, random_seed_for_mini_batch=False)
        return tr

    with emb.fused_grad(True):
        tr_a = _fit(False)
        tr_s = _fit(True)

    assert STACKED_KEY not in tr_s.state.params
    assert set(tr_a.state.params) == set(tr_s.state.params)
    for k in tr_a.state.params:
        np.testing.assert_array_equal(
            np.asarray(tr_a.state.params[k]), np.asarray(tr_s.state.params[k]),
            err_msg=f"param {k} diverged under Trainer stacked storage",
        )
    # optimizer moments round-trip through the stacked form bit-exactly
    flat_a = jax.tree_util.tree_leaves(tr_a.state.opt_state)
    flat_s = jax.tree_util.tree_leaves(tr_s.state.opt_state)
    assert len(flat_a) == len(flat_s)
    for a, s in zip(flat_a, flat_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(s))


def test_stacked_ctx_requires_matching_names():
    """A ctx whose names don't cover the packable set is ignored (the
    per-table path still runs and reads per-table leaves)."""
    model = _tiny_model()
    params = model.init_params(jax.random.PRNGKey(2))
    data = synthetic_criteo_arrays(32, num_buckets=50, seed=5)
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    with emb.fused_grad(True):
        ref = model.apply(params, batch, training=False)
        wrong = jnp.zeros((2, 51, 8))
        with emb.stacked_tables(("C1", "C2"), wrong):
            out = model.apply(params, batch, training=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))

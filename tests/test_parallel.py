"""SPMD tests on the forced 8-device CPU mesh — the same pjit/collective
code paths that run on a pod slice (SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from recman_tpu.features import FeatureSet, HashedSparseFeat, SparseFeat, DenseFeat
from recman_tpu.models import XDeepFM, DeepFM
from recman_tpu.parallel import (
    DATA_AXIS,
    MODEL_AXIS,
    ShardedTrainer,
    make_mesh,
    pad_vocab_for_mesh,
    param_specs,
)
from recman_tpu.training import LogLoss, RocAucScore, Trainer
from recman_tpu.data import synthetic_criteo_arrays, create_criteo_features


@pytest.fixture(scope="module")
def mesh24():
    return make_mesh(data=2, model=4)


@pytest.fixture(scope="module")
def mesh81():
    return make_mesh(data=8, model=1)


def _criteo_setup(num_buckets=8192, n=512):
    fs = create_criteo_features(num_buckets=num_buckets)
    data = synthetic_criteo_arrays(n, num_buckets=num_buckets, seed=3)
    return fs, data


class TestMesh:
    def test_shapes(self, mesh24):
        assert mesh24.shape[DATA_AXIS] == 2
        assert mesh24.shape[MODEL_AXIS] == 4

    def test_bad_factorization(self):
        with pytest.raises(AssertionError):
            make_mesh(data=3, model=3)

    def test_pad_vocab(self):
        assert pad_vocab_for_mesh(100, 8) == 104
        assert pad_vocab_for_mesh(96, 8) == 96


class TestParamSpecs:
    def test_threshold(self):
        params = {
            "C1_feat_embed": jnp.zeros((100_000, 8)),
            "small_feat_embed": jnp.zeros((50, 8)),
            "linear_w": jnp.zeros((2_600_000, 1)),
            "dnn_layer_0_weights": jnp.zeros((400, 400)),
        }
        specs = param_specs(params, row_shard_threshold=50_000)
        assert specs["C1_feat_embed"] == P(MODEL_AXIS, None)
        assert specs["small_feat_embed"] == P()
        assert specs["linear_w"] == P(MODEL_AXIS, None)
        assert specs["dnn_layer_0_weights"] == P()


class TestShardedTraining:
    def test_dp_matches_single_device(self, mesh81):
        """Pure DP on 8 devices must reproduce the single-device loss
        trajectory (same seeds, same data)."""
        fs, data = _criteo_setup(num_buckets=500, n=256)
        model = XDeepFM(fs, {"embedding_size": 4,
                             "cin_cross_layer_units": (8, 8),
                             "cin_dropout": (1, 1, 1),
                             "deep_hidden_units": (16,),
                             "deep_dropout": (1.0, 1.0)})
        kw = dict(metrics=(LogLoss(),), epoch=1, batch_size=64, random_seed=2019)
        t_single = Trainer(model, **kw)
        t_shard = ShardedTrainer(model, mesh=mesh81, **kw)

        y = data["y"]
        t_single.fit(data, y, random_seed_for_mini_batch=False)
        t_shard.fit(data, y, random_seed_for_mini_batch=False)

        p1 = t_single.predict(data)
        p2 = t_shard.predict(data)
        np.testing.assert_allclose(p1, p2, rtol=2e-3, atol=2e-4)

    def test_row_sharded_tables_train(self, mesh24):
        """2x4 mesh with tables big enough to row-shard: the full DLRM-style
        path (sharded gather + psum + sharded Adam) compiles and learns."""
        fs, data = _criteo_setup(num_buckets=8192, n=512)
        model = DeepFM(fs, {"embedding_size": 4,
                            "deep_hidden_units": (16,),
                            "deep_dropout": (1.0, 1.0)})
        trainer = ShardedTrainer(
            model, {"learning_rate": 0.01, "optimizer": "adam"},
            metrics=(LogLoss(), RocAucScore()), epoch=1, batch_size=128,
            random_seed=2019, mesh=mesh24, row_shard_threshold=4096,
        )
        # tables actually sharded?
        emb = trainer.state.params["C1_feat_embed"]
        assert emb.sharding.spec == P(MODEL_AXIS, None)
        assert emb.sharding.num_devices == 8

        y = data["y"]
        before = trainer.evaluate(data, y)
        trainer.fit(data, y, random_seed_for_mini_batch=False)
        after = trainer.evaluate(data, y)
        assert after[0] < before[0]
        # Adam moments share the table's sharding
        mu = trainer.state.opt_state[0].mu["C1_feat_embed"]
        assert mu.sharding.spec in (P(MODEL_AXIS, None), P(MODEL_AXIS))

    def test_batch_size_divisibility_enforced(self, mesh24):
        fs, _ = _criteo_setup(num_buckets=100, n=8)
        model = DeepFM(fs, {"embedding_size": 2, "deep_hidden_units": (4,),
                            "deep_dropout": (1.0, 1.0)})
        with pytest.raises(AssertionError):
            ShardedTrainer(model, batch_size=63, mesh=mesh24)


class TestShardedLookup:
    def test_matches_dense_lookup(self, mesh24):
        """Explicit shard_map masked-gather+psum == plain take."""
        from recman_tpu.parallel import sharded_embedding_lookup
        from recman_tpu.parallel.sharding import pad_vocab_for_mesh

        rs = np.random.RandomState(0)
        V = pad_vocab_for_mesh(1000, 4)
        table = jnp.asarray(rs.randn(V, 8), dtype=jnp.float32)
        ids = jnp.asarray(rs.randint(0, 1000, 64), dtype=jnp.int32)
        sharded = jax.device_put(
            table, jax.sharding.NamedSharding(mesh24, P(MODEL_AXIS, None))
        )
        out = sharded_embedding_lookup(sharded, ids, mesh24)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )

    def test_differentiable(self, mesh24):
        """Grad through the shard_map path equals the take grad."""
        from recman_tpu.parallel import sharded_embedding_lookup
        from recman_tpu.parallel.sharding import pad_vocab_for_mesh

        rs = np.random.RandomState(1)
        V = pad_vocab_for_mesh(96, 4)
        table = jnp.asarray(rs.randn(V, 4), dtype=jnp.float32)
        ids = jnp.asarray(rs.randint(0, 96, 16), dtype=jnp.int32)
        w = jnp.asarray(rs.randn(16, 4), dtype=jnp.float32)

        g1 = jax.grad(lambda t: jnp.sum(
            sharded_embedding_lookup(t, ids, mesh24) * w))(table)
        g2 = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * w))(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


class TestShardedDataset:
    """dataset_sharded=True: rows live P('data') with shard-local gathers
    (parallel/train_pjit.py make_local_gather)."""

    def _trainers(self, mesh, n=300, buckets=500):
        from recman_tpu.models import DeepFM

        fs = create_criteo_features(num_buckets=buckets)
        data = synthetic_criteo_arrays(n, num_buckets=buckets, seed=5)
        kw = dict(
            hparams={"learning_rate": 0.01, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=1, batch_size=64, random_seed=2019,
            mesh=mesh,
        )
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        repl = ShardedTrainer(model, **kw)
        shrd = ShardedTrainer(model, dataset_sharded=True, **kw)
        return repl, shrd, data

    def test_predict_row_order_matches_replicated(self, mesh24):
        """Same init params -> identical predictions in dataset row order
        (exercises padding, local sequential gathers, and _unshard_preds),
        including a row count that doesn't divide the data axis."""
        repl, shrd, data = self._trainers(mesh24, n=301)
        p1 = repl.predict(data)
        p2 = shrd.predict(data)
        assert p2.shape == (301,)
        np.testing.assert_allclose(p1, p2, rtol=1e-5, atol=1e-6)

    def test_trains_and_improves(self, mesh81):
        repl, shrd, data = self._trainers(mesh81, n=512)
        y = data["y"]
        before = shrd.evaluate(data, y)[0]
        shrd.fit(data, y, random_seed_for_mini_batch=False)
        assert shrd.evaluate(data, y)[0] < before

    def test_multihost_feed_path_matches_device_put(self, mesh24):
        """multihost_feed=True assembles the dataset with
        jax.make_array_from_process_local_data — with process_count()==1 it
        must be byte-identical to the device_put path, and the full
        fit/evaluate surface must agree (VERDICT r1 missing #2; the code
        path real pods use, SURVEY §2.8 runtime row / DeepModel.py:141)."""
        from recman_tpu.models import DeepFM

        fs = create_criteo_features(num_buckets=500)
        data = synthetic_criteo_arrays(301, num_buckets=500, seed=5)
        kw = dict(
            hparams={"learning_rate": 0.01, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=1, batch_size=64, random_seed=2019,
            mesh=mesh24, dataset_sharded=True,
        )
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        base = ShardedTrainer(model, **kw)
        multi = ShardedTrainer(model, multihost_feed=True, **kw)
        y = data["y"]

        dev_b, _ = base._to_device(data, y)
        dev_m, _ = multi._to_device(data, y)
        for k in dev_b:
            assert dev_m[k].sharding == dev_b[k].sharding
            np.testing.assert_array_equal(np.asarray(dev_m[k]),
                                          np.asarray(dev_b[k]))

        base.fit(data, y, random_seed_for_mini_batch=False)
        multi.fit(data, y, random_seed_for_mini_batch=False)
        np.testing.assert_allclose(base.evaluate(data, y)[0],
                                   multi.evaluate(data, y)[0], rtol=1e-5)
        np.testing.assert_allclose(base.predict(data), multi.predict(data),
                                   rtol=1e-5, atol=1e-6)

    def test_multihost_feed_requires_dataset_sharded(self, mesh24):
        from recman_tpu.models import DeepFM

        fs = create_criteo_features(num_buckets=500)
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        with pytest.raises(AssertionError, match="dataset_sharded"):
            ShardedTrainer(model, mesh=mesh24, batch_size=64,
                           multihost_feed=True)

    def test_local_index_matrix_covers_every_row_once(self, mesh24):
        _, shrd, _ = self._trainers(mesh24)
        n = 301
        idx = shrd._batch_index_matrix(n, shuffle_seed=7)
        d_n = shrd.mesh.shape[DATA_AXIS]
        local_bs = shrd.batch_size // d_n
        local_n = -(-n // d_n)
        # reassemble global row ids: shard d, local i -> d*local_n + i
        got = []
        for b in range(idx.shape[0]):
            row = idx[b].reshape(d_n, local_bs)
            for d in range(d_n):
                for v in row[d]:
                    if v >= 0:
                        got.append(d * local_n + v)
        assert sorted(got) == list(range(n))


class TestDedupLookup:
    """Deduped capacity-bounded all-gather exchange (parallel/shard_lookup.py)
    vs plain take — value, gradient, overflow accounting."""

    def _setup(self, mesh, V=1000, k=8, n=64, lo=0, hi=None, seed=0):
        from recman_tpu.parallel.sharding import pad_vocab_for_mesh

        rs = np.random.RandomState(seed)
        Vp = pad_vocab_for_mesh(V, mesh.shape[MODEL_AXIS])
        table = jnp.asarray(rs.randn(Vp, k), dtype=jnp.float32)
        ids = jnp.asarray(rs.randint(lo, hi or V, n), dtype=jnp.int32)
        sharded = jax.device_put(
            table, jax.sharding.NamedSharding(mesh, P(MODEL_AXIS, None))
        )
        return table, sharded, ids

    def test_matches_dense_lookup(self, mesh24):
        from recman_tpu.parallel import dedup_embedding_lookup

        table, sharded, ids = self._setup(mesh24)
        out = dedup_embedding_lookup(sharded, ids, mesh24)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )

    def test_zipf_duplicates(self, mesh24):
        """Heavy duplication (the case dedup exists for) stays exact."""
        from recman_tpu.parallel import dedup_embedding_lookup

        table, sharded, _ = self._setup(mesh24, V=1000)
        rs = np.random.RandomState(7)
        ids = jnp.asarray(
            np.minimum(rs.zipf(1.5, 128) - 1, 999), dtype=jnp.int32
        )
        out, overflow = dedup_embedding_lookup(
            sharded, ids, mesh24, check_overflow=True
        )
        assert int(overflow) == 0
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )

    def test_full_capacity_is_exact_for_skew(self, mesh24):
        """All ids owned by ONE shard: default capacity overflows (counted),
        capacity=N is exact."""
        from recman_tpu.parallel import dedup_embedding_lookup

        # vocab 1000 over 4 shards -> shard 0 owns [0, 250)
        table, sharded, _ = self._setup(mesh24, V=1000)
        ids = jnp.asarray(np.arange(64), dtype=jnp.int32)  # 64 uniques, shard 0
        out, overflow = dedup_embedding_lookup(
            sharded, ids, mesh24, capacity=64, shard_batch=False,
            check_overflow=True,
        )
        assert int(overflow) == 0
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )
        _, overflow_small = dedup_embedding_lookup(
            sharded, ids, mesh24, capacity=16, shard_batch=False,
            check_overflow=True,
        )
        assert int(overflow_small) > 0  # 64 uniques on one shard, cap 16

    def test_differentiable(self, mesh24):
        """The all_gather transposes to a psum_scatter; grads must equal
        the plain take grad."""
        from recman_tpu.parallel import dedup_embedding_lookup

        table, sharded, ids = self._setup(mesh24, V=96, k=4, n=16, seed=1)
        rs = np.random.RandomState(2)
        w = jnp.asarray(rs.randn(16, 4), dtype=jnp.float32)

        g1 = jax.grad(lambda t: jnp.sum(
            dedup_embedding_lookup(t, ids, mesh24) * w))(sharded)
        g2 = jax.grad(lambda t: jnp.sum(jnp.take(t, ids, axis=0) * w))(table)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5,
                                   atol=1e-6)

    def test_replicated_batch(self, mesh24):
        from recman_tpu.parallel import dedup_embedding_lookup

        table, sharded, ids = self._setup(mesh24, n=48, seed=3)
        out = dedup_embedding_lookup(sharded, ids, mesh24, shard_batch=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)), rtol=1e-6
        )

    def test_trainer_dedup_exchange_matches_psum(self, mesh24):
        """ShardedTrainer(embedding_exchange='dedup') trains the same model
        to the same losses as the partitioner (psum) path."""
        from recman_tpu.models import XDeepFM

        fs, data = _criteo_setup(num_buckets=2048, n=256)  # 2049 % 4 != 0 ->
        # placement pads to 2052; the exchange sees evenly sharded tables
        y = data["y"]
        kw = dict(
            hparams={"learning_rate": 0.01, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=1, batch_size=64, random_seed=2019,
            mesh=mesh24, row_shard_threshold=1000,
        )
        model = XDeepFM(fs, {"embedding_size": 4,
                             "cin_cross_layer_units": (4, 4),
                             "cin_dropout": (1, 1, 1),
                             "deep_hidden_units": (8,),
                             "deep_dropout": (1.0, 1.0)})
        t_psum = ShardedTrainer(model, embedding_exchange="psum", **kw)
        t_dedup = ShardedTrainer(model, embedding_exchange="dedup", **kw)
        p0 = t_psum.predict(data)
        p1 = t_dedup.predict(data)
        np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-6)
        t_psum.fit(data, y, random_seed_for_mini_batch=False)
        t_dedup.fit(data, y, random_seed_for_mini_batch=False)
        np.testing.assert_allclose(
            t_psum.evaluate(data, y)[0], t_dedup.evaluate(data, y)[0],
            rtol=1e-3,
        )


class TestDedupOverflowGuard:
    """shard_lookup.py's capacity bound silently ZEROES overflowing rows;
    ShardedTrainer must catch that on the first training batch
    (VERDICT r1 weak #6)."""

    def _skewed_setup(self, num_buckets=2048, n=128):
        """All categorical ids land in shard 0's ownership range with more
        uniques than the default capacity ceil(4N/S) allows."""
        fs = create_criteo_features(num_buckets=num_buckets)
        data = synthetic_criteo_arrays(n, num_buckets=num_buckets, seed=3)
        # vocab 2049 pads to 2056 on an 8-way model axis -> rows_per=257;
        # ids 1..n are unique, all owned by shard 0
        for name in list(data):
            if name.startswith("C"):
                data[name] = np.arange(1, n + 1, dtype=np.int32)
        return fs, data

    def _trainer(self, fs, mesh, **kw):
        model = XDeepFM(fs, {"embedding_size": 4,
                             "cin_cross_layer_units": (4, 4),
                             "cin_dropout": (1, 1, 1),
                             "deep_hidden_units": (8,),
                             "deep_dropout": (1.0, 1.0)})
        return ShardedTrainer(
            model, hparams={"learning_rate": 0.01}, epoch=1, batch_size=64,
            random_seed=2019, mesh=mesh, row_shard_threshold=1000,
            embedding_exchange="dedup", **kw,
        )

    def test_skewed_ids_autosize_and_warn(self, caplog):
        """With dedup_capacity=None the first batch AUTO-SIZES capacity
        (capacity_from_sample), so skew no longer silently zeroes rows —
        it trains exactly, and logs that psum would be cheaper."""
        import logging

        mesh18 = make_mesh(data=1, model=8)
        fs, data = self._skewed_setup()
        t = self._trainer(fs, mesh18)
        dev, layout = t._to_device(data, data["y"])
        idx = np.arange(64, dtype=np.int32)
        # 64 unique ids on one shard vs DEFAULT capacity ceil(4*64/8)=32
        report = t.dedup_overflow_report(dev, idx, layout)
        assert any(v > 0 for v in report.values()), report
        with caplog.at_level(logging.WARNING, "recman_tpu.parallel.train_pjit"):
            loss = t.fit_on_batch(dev, idx, layout)
        assert np.isfinite(float(loss))
        assert t.dedup_capacity is not None and t.dedup_capacity >= 64
        assert any("breakeven" in r.message for r in caplog.records)

    def test_explicit_undersized_capacity_raises(self):
        mesh18 = make_mesh(data=1, model=8)
        fs, data = self._skewed_setup()
        t = self._trainer(fs, mesh18, dedup_capacity=8)
        dev, layout = t._to_device(data, data["y"])
        idx = np.arange(64, dtype=np.int32)
        with pytest.raises(ValueError, match="dedup"):
            t.fit_on_batch(dev, idx, layout)

    def test_explicit_capacity_passes(self):
        mesh18 = make_mesh(data=1, model=8)
        fs, data = self._skewed_setup()
        # capacity = batch size is unconditionally exact
        t = self._trainer(fs, mesh18, dedup_capacity=64)
        dev, layout = t._to_device(data, data["y"])
        idx = np.arange(64, dtype=np.int32)
        assert not any(t.dedup_overflow_report(dev, idx, layout).values())
        loss = t.fit_on_batch(dev, idx, layout)
        assert np.isfinite(float(loss))

    def test_uniform_ids_pass_default(self, mesh24):
        fs, data = _criteo_setup(num_buckets=2048, n=256)
        t = self._trainer(fs, mesh24)
        dev, layout = t._to_device(data, data["y"])
        idx = np.arange(64, dtype=np.int32)
        loss = t.fit_on_batch(dev, idx, layout)  # no raise
        assert np.isfinite(float(loss))
        assert t._dedup_checked


class TestTensorParallelDense:
    def test_tp_dnn_trains(self, mesh24):
        """Megatron-style alternating column/row sharding on the DNN tower
        compiles and learns on the 2x4 mesh."""
        from recman_tpu.models import XDeepFM

        fs, data = _criteo_setup(num_buckets=2000, n=256)
        model = XDeepFM(fs, {"embedding_size": 4,
                             "cin_cross_layer_units": (8, 8),
                             "cin_dropout": (1, 1, 1),
                             "deep_hidden_units": (64, 64),
                             "deep_dropout": (1.0, 1.0, 1.0)})
        trainer = ShardedTrainer(
            model, {"learning_rate": 0.01, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=1, batch_size=64, random_seed=2019,
            mesh=mesh24, tp_dense_threshold=1000,
        )
        w0 = trainer.state.params["dnn_layer_0_weights"]
        w1 = trainer.state.params["dnn_layer_1_weights"]
        assert w0.sharding.spec == P(None, MODEL_AXIS)  # column-sharded
        assert w1.sharding.spec in (P(MODEL_AXIS, None), P(MODEL_AXIS))
        y = data["y"]
        before = trainer.evaluate(data, y)[0]
        trainer.fit(data, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(data, y)[0] < before

    def test_indivisible_dims_fall_back(self, mesh24):
        from recman_tpu.parallel.sharding import param_specs, place_params

        params = {"dnn_layer_0_weights": jnp.zeros((100, 66))}  # 66 % 4 != 0
        specs = param_specs(params, tp_dense_threshold=100)
        assert specs["dnn_layer_0_weights"] == P(None, MODEL_AXIS)
        placed = place_params(params, mesh24, specs)
        assert placed["dnn_layer_0_weights"].sharding.spec == P()


class TestShardedResilience:
    """Resilience (training/resilient.py) composes with ShardedTrainer:
    Orbax checkpoints/restores the SHARDED TrainState transparently, so a
    preempted sharded run resumes to the same trajectory as an
    uninterrupted one."""

    def _make(self, mesh, fs):
        from recman_tpu.models import DeepFM

        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        return ShardedTrainer(
            model, {"learning_rate": 0.01, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=2, batch_size=64, random_seed=2019,
            mesh=mesh, row_shard_threshold=256,
        )

    def test_preempt_resume_matches_uninterrupted(self, mesh81, tmp_path):
        from recman_tpu.training import Preempted, Resilience
        from tests.test_resilient import PreemptAtStep

        fs, data = _criteo_setup(num_buckets=500, n=256)
        y = data["y"]

        ref = self._make(mesh81, fs)
        ref.fit(data, y, resilience=Resilience(tmp_path / "ref",
                                               every_epochs=10**6,
                                               preempt_signals=()))

        t1 = self._make(mesh81, fs)
        res = PreemptAtStep(tmp_path / "ck", at_step=6, every_epochs=1,
                            preempt_signals=())
        with pytest.raises(Preempted):
            t1.fit(data, y, resilience=res)
        assert res.latest()[1]["step"] == 6  # mid-epoch-2 (5 steps/epoch)

        t2 = self._make(mesh81, fs)
        t2.fit(data, y, resilience=Resilience(tmp_path / "ck",
                                              preempt_signals=()))
        assert int(t2.state.step) == int(ref.state.step)
        for name, want in ref.state.params.items():
            got = t2.state.params[name]
            assert got.sharding.spec == want.sharding.spec, name
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=0, atol=0,
                err_msg=f"sharded param {name} diverged after resume",
            )


class TestRound2ZooSharded:
    """The new model families ride the SPMD path unchanged: their extra
    params (SENET/bilinear 3-D stacks, product layers) fall back to
    replicated specs while tables row-shard."""

    # final_mlp's fused bilinear head starts near zero (no linear tower),
    # so it needs a few more steps than the rest to move on 256 rows
    @pytest.mark.parametrize("name,epoch", [
        ("fibinet", 1), ("nfm", 1), ("pnn", 1), ("masknet", 1),
        ("final_mlp", 3), ("gdcn", 1),
    ])
    def test_learns_on_mesh(self, mesh81, name, epoch):
        from recman_tpu.models import MODEL_REGISTRY

        fs, data = _criteo_setup(num_buckets=500, n=256)
        model = MODEL_REGISTRY[name](fs, {"embedding_size": 4,
                                          "deep_hidden_units": (8,),
                                          "deep_dropout": (1.0, 1.0)})
        trainer = ShardedTrainer(
            model, {"learning_rate": 0.02, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=epoch, batch_size=64, random_seed=2019,
            mesh=mesh81, row_shard_threshold=256,
        )
        y = data["y"]
        before = trainer.evaluate(data, y)[0]
        trainer.fit(data, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(data, y)[0] < before


class TestSequenceModelsSharded:
    """DIN and BST (SequenceFeat models) train under the SPMD mesh: the
    tied candidate/history tables ride the row-sharded lookup path and
    the attention/encoder math is pure batch-sharded dense work."""

    @pytest.mark.parametrize("name", ["din", "bst", "dien"])
    def test_learns_on_mesh(self, mesh81, name):
        import numpy as np

        from recman_tpu import FeatureSet, SequenceFeat, SparseFeat
        from recman_tpu.examples.din_synthetic import make_data
        from recman_tpu.models import MODEL_REGISTRY

        df = make_data(n=256, n_items=20, max_hist=5)
        fs = FeatureSet()
        item = SparseFeat("item_id",
                          feat_size=len(np.unique(df.item_id.values)))
        fs["item_id"] = item
        fs["hist_items"] = SequenceFeat("hist_items", id_feat=item, max_len=5)
        fs.initialize(df)

        model = MODEL_REGISTRY[name](fs)
        trainer = ShardedTrainer(
            model, {"learning_rate": 0.02, "optimizer": "adam"},
            metrics=(LogLoss(),), epoch=3, batch_size=64, random_seed=2019,
            mesh=mesh81,
        )
        y = df["label"].values
        before = trainer.evaluate(df, y)[0]
        trainer.fit(df, y, random_seed_for_mini_batch=False)
        assert trainer.evaluate(df, y)[0] < before


class TestTrafficAccounting:
    """parallel/traffic.py: the analytic collective model and the HLO
    counter agree with hand-computed ring costs."""

    def test_analytic_model_hand_check(self):
        from recman_tpu.parallel.traffic import collective_traffic_model

        t = collective_traffic_model(
            n_tables=2, vocab=1000, k=4, batch_local=100,
            data_shards=4, model_shards=2, capacity=30,
            dense_param_bytes=1000,
        )
        # psum: 2 * (1/2) * 100 * 4 * 4B * 2 tables = 3200
        assert t["model_axis"]["psum_bytes"] == 3200
        # dedup: 2 * (2-1) * 30 * 4 * 4B * 2 tables = 1920
        assert t["model_axis"]["dedup_bytes"] == 1920
        assert abs(t["model_axis"]["dedup_over_psum"] - 0.6) < 1e-9
        assert t["model_axis"]["breakeven_capacity"] == 50
        # data grad: 2 * (3/4) * (1000 + 2*(1000/2)*5*4) = 31500
        assert t["data_axis"]["grad_allreduce_bytes"] == 31500.0

    def test_hlo_parser_counts_collectives(self):
        from recman_tpu.parallel.traffic import hlo_collective_bytes

        hlo = """
  %ag = f32[8,16]{1,0} all-gather(f32[4,16] %x), dimensions={0}
  %ar.1 = bf16[100]{0} all-reduce(bf16[100] %y), to_apply=%add
  %cp = f32[2,2]{1,0} collective-permute(f32[2,2] %z)
  %done = f32[8,16] all-gather-done(f32[8,16] %ag)
"""
        h = hlo_collective_bytes(hlo)
        assert h["counts"] == {"all-gather": 1, "all-reduce": 1,
                               "collective-permute": 1}
        assert h["output_bytes"]["all-gather"] == 8 * 16 * 4
        assert h["output_bytes"]["all-reduce"] == 100 * 2
        assert h["total_bytes"] == 512 + 200 + 16


class TestCapacityFromSample:
    def test_measured_capacity_and_dedup_equivalence(self, mesh24):
        """capacity_from_sample sizes the exchange from real id spread;
        the dedup lookup stays exact at that capacity."""
        from recman_tpu.parallel.shard_lookup import (
            capacity_from_sample,
            dedup_embedding_lookup,
        )
        from recman_tpu.parallel.sharding import pad_vocab_for_mesh

        rs = np.random.RandomState(2)
        V = pad_vocab_for_mesh(1000, 4)
        ids_np = rs.zipf(1.2, size=64) % 1000
        cap = capacity_from_sample([ids_np], n_shards=4, vocab=V)
        uniq = np.unique(ids_np)
        rows_per = -(-V // 4)
        worst = np.bincount(np.clip(uniq // rows_per, 0, 3), minlength=4).max()
        assert cap == int(np.ceil(worst * 1.5))
        assert cap <= 64

        table = jnp.asarray(rs.randn(V, 8), dtype=jnp.float32)
        sharded = jax.device_put(
            table, jax.sharding.NamedSharding(mesh24, P(MODEL_AXIS, None))
        )
        ids = jnp.asarray(ids_np, dtype=jnp.int32)
        out = dedup_embedding_lookup(sharded, ids, mesh24, capacity=cap,
                                     shard_batch=False)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(jnp.take(table, ids, axis=0)),
            rtol=1e-6,
        )


class TestAutoCapacityShuffledVocab:
    """Round-4 scaling lever end to end: shuffled-vocab encoding + the
    auto-sized dedup exchange must (a) pick a small capacity from the
    first batch and (b) train the exact same trajectory as psum."""

    def _ranked_hot_data(self, n=256, vocab_classes=2047):
        """Sparse string features whose values are Zipf-RANKED (value name
        == frequency rank), so unshuffled encoding concentrates hot ids."""
        rs = np.random.RandomState(0)
        fit_vals = [f"v{r:05d}" for r in range(vocab_classes)]
        cols = {}
        for c in range(4):
            ranks = np.minimum(rs.zipf(1.3, n), vocab_classes - 1)
            cols[f"C{c}"] = [f"v{r:05d}" for r in ranks]
        import pandas as pd

        df = pd.DataFrame(cols)
        fit_df = pd.DataFrame({k: fit_vals for k in cols})
        df_all = pd.concat([fit_df, df], ignore_index=True)
        y = rs.randint(0, 2, n).astype(np.float32)
        return df_all, df, y

    def _trainer(self, fs, mesh, **kw):
        model = XDeepFM(fs, {"embedding_size": 4,
                             "cin_cross_layer_units": (4, 4),
                             "cin_dropout": (1, 1, 1),
                             "deep_hidden_units": (8,),
                             "deep_dropout": (1.0, 1.0)})
        return ShardedTrainer(
            model, hparams={"learning_rate": 0.01}, metrics=(LogLoss(),),
            epoch=1, batch_size=256, random_seed=2019, mesh=mesh,
            row_shard_threshold=1000, **kw,
        )

    def test_shuffled_dedup_autosizes_small_and_matches_psum(self, mesh24):
        # enough rows per data shard (256/2=128) that Zipf duplication makes
        # dedup winnable: sub-breakeven needs N >> uniques-per-shard
        df_all, df, y = self._ranked_hot_data(n=1024)

        def build_fs(shuffle):
            fs = FeatureSet()
            for c in range(4):
                fs[f"C{c}"] = SparseFeat(f"C{c}")
            fs.initialize(df_all, shuffle_vocab=shuffle)
            return fs

        fs = build_fs(7)
        data = fs.transform(df, y=y)
        t_dedup = self._trainer(fs, mesh24, embedding_exchange="dedup")
        t_psum = self._trainer(fs, mesh24, embedding_exchange="psum")
        t_dedup.fit(data, y, random_seed_for_mini_batch=False)
        t_psum.fit(data, y, random_seed_for_mini_batch=False)
        # auto-capacity fired and chose a sub-breakeven bound
        model_n = mesh24.shape[MODEL_AXIS]
        n_local = 256 // mesh24.shape[DATA_AXIS]
        assert t_dedup.dedup_capacity is not None
        assert t_dedup.dedup_capacity * model_n / n_local < 1.0, (
            t_dedup.dedup_capacity
        )
        # identical predictions (the exchange is exact at the sampled cap)
        p0 = t_psum.predict(data)
        p1 = t_dedup.predict(data)
        np.testing.assert_allclose(p0, p1, rtol=1e-5, atol=1e-6)

        # and the UNSHUFFLED encoding of the SAME data needs a much larger
        # capacity (the skew the lever removes)
        fs_ranked = build_fs(None)
        data_ranked = fs_ranked.transform(df, y=y)
        t_ranked = self._trainer(fs_ranked, mesh24, embedding_exchange="dedup")
        dev, layout = t_ranked._to_device(data_ranked, y)
        idx = np.arange(256, dtype=np.int32)
        cap_ranked = t_ranked.auto_dedup_capacity(dev, idx, layout)
        assert cap_ranked > 1.8 * t_dedup.dedup_capacity, (
            cap_ranked, t_dedup.dedup_capacity
        )

"""Streaming input pipeline: chunk iterators + Trainer.fit_stream.

The double-buffered chunked fit must be TRAJECTORY-IDENTICAL to stepping
the same batches from a resident dataset (same gathers, same padding
masks), and the native range reads must equal slices of a full parse.
"""

import os

import numpy as np
import pytest

from recman_tpu.data import (
    create_criteo_features,
    iter_array_chunks,
    iter_criteo_chunks,
    synthetic_criteo_arrays,
)
from recman_tpu.data.streaming import iter_array_chunks as _iac  # noqa: F401
from recman_tpu.models import DeepFM
from recman_tpu.training import Trainer, batch_indices

HP = {"embedding_size": 4, "deep_hidden_units": (8,),
      "deep_dropout": (1.0, 1.0), "learning_rate": 0.01}


def _setup(n=256, buckets=512):
    fs = create_criteo_features(num_buckets=buckets)
    data = synthetic_criteo_arrays(n, num_buckets=buckets, seed=11)
    return fs, data


class TestIterArrayChunks:
    def test_partitions_rows(self):
        _, data = _setup(n=100)
        chunks = list(iter_array_chunks(data, 32))
        assert [len(c["y"]) for c in chunks] == [32, 32, 32, 4]
        np.testing.assert_array_equal(
            np.concatenate([c["C1"] for c in chunks]), data["C1"]
        )

    def test_shuffle_covers_all_rows(self):
        _, data = _setup(n=100)
        chunks = list(iter_array_chunks(data, 32, shuffle_seed=3))
        got = np.concatenate([c["y"] for c in chunks])
        np.testing.assert_array_equal(np.sort(got), np.sort(data["y"]))
        assert not np.array_equal(got, data["y"])  # actually shuffled


class TestFitStream:
    def _train_manual(self, fs, data, chunk_rows, batch_size=64):
        """Reference trajectory: resident fit_on_batch over exactly the
        batches fit_stream(shuffle_in_chunk=False) derives from chunks."""
        model = DeepFM(fs, HP)
        t = Trainer(model, HP, batch_size=batch_size, random_seed=5)
        n = len(data["y"])
        dev, layout = t._to_device(data, data["y"])
        for s in range(0, n, chunk_rows):
            m = min(chunk_rows, n - s)
            for row in batch_indices(m, batch_size):
                idx = np.where(row >= 0, row + s, -1).astype(np.int32)
                t.fit_on_batch(dev, idx, layout)
        return t

    def _train_stream(self, fs, data, chunk_rows, batch_size=64):
        model = DeepFM(fs, HP)
        t = Trainer(model, HP, batch_size=batch_size, random_seed=5)
        t.fit_stream(iter_array_chunks(data, chunk_rows), epochs=1,
                     shuffle_in_chunk=False)
        return t

    @pytest.mark.parametrize("chunk_rows", [256, 96])
    def test_matches_resident_batches(self, chunk_rows):
        """Single- and multi-chunk streams replay the resident trajectory
        exactly (incl. partial final batches per chunk)."""
        fs, data = _setup(n=256)
        t_ref = self._train_manual(fs, data, chunk_rows)
        t_str = self._train_stream(fs, data, chunk_rows)
        assert int(t_str.state.step) == int(t_ref.state.step)
        for name, want in t_ref.state.params.items():
            np.testing.assert_allclose(
                np.asarray(t_str.state.params[name]), np.asarray(want),
                rtol=1e-6, atol=1e-7, err_msg=name,
            )

    def test_multi_epoch_needs_callable(self):
        fs, data = _setup(n=128)
        t = Trainer(DeepFM(fs, HP), HP, batch_size=64)
        with pytest.raises(AssertionError, match="callable"):
            t.fit_stream(iter_array_chunks(data, 64), epochs=2)

    def test_multi_epoch_callable_learns(self):
        fs, data = _setup(n=512)
        model = DeepFM(fs, HP)
        from recman_tpu.training import LogLoss

        t = Trainer(model, HP, metrics=(LogLoss(),), batch_size=64,
                    random_seed=5)
        before = t.evaluate(data, data["y"])[0]
        t.fit_stream(
            lambda: iter_array_chunks(data, 128, shuffle_seed=9), epochs=2
        )
        assert t.evaluate(data, data["y"])[0] < before

    def test_sharded_trainer_streams(self):
        """fit_stream composes with the SPMD trainer (chunks get sharded
        placement via its _to_device)."""
        from recman_tpu.parallel import ShardedTrainer, make_mesh

        fs, data = _setup(n=256)
        model = DeepFM(fs, HP)
        t = ShardedTrainer(model, HP, batch_size=64, random_seed=5,
                           mesh=make_mesh(data=4, model=2))
        t.fit_stream(iter_array_chunks(data, 128), epochs=1)
        assert int(t.state.step) > 0
        assert np.isfinite(t.predict(data)).all()


@pytest.mark.skipif(os.environ.get("RECMAN_SKIP_NATIVE") == "1",
                    reason="native build disabled")
class TestCriteoChunkStream:
    def test_range_reads_equal_full_parse(self, tmp_path):
        from tests.test_native_loader import _make_tsv
        from recman_tpu.data import load_criteo_tsv_native

        path = _make_tsv(str(tmp_path / "day.tsv"), n_rows=157)
        full = load_criteo_tsv_native(path, num_buckets=1000)
        chunks = list(iter_criteo_chunks(path, 1000, chunk_rows=50))
        assert [len(c["y"]) for c in chunks] == [50, 50, 50, 7]
        for key in full:
            np.testing.assert_array_equal(
                np.concatenate([c[key] for c in chunks]), full[key],
                err_msg=key,
            )

    def test_max_rows(self, tmp_path):
        from tests.test_native_loader import _make_tsv

        path = _make_tsv(str(tmp_path / "day2.tsv"), n_rows=80, seed=1)
        chunks = list(iter_criteo_chunks(path, 1000, chunk_rows=32,
                                         max_rows=70))
        assert sum(len(c["y"]) for c in chunks) == 70


class TestPredictStream:
    def _trainer_and_data(self):
        import jax.numpy as jnp  # noqa: F401

        from recman_tpu.data.criteo import (
            calibrated_criteo_arrays,
            create_criteo_features,
        )
        from recman_tpu.models import XDeepFM
        from recman_tpu.training import LogLoss, RocAucScore, Trainer

        fs = create_criteo_features(num_buckets=64)
        arrs = calibrated_criteo_arrays(1024, num_buckets=64, seed=1)
        model = XDeepFM(fs, {
            "embedding_size": 4, "cin_cross_layer_units": (8,),
            "cin_dropout": (1, 1), "deep_hidden_units": (16,),
            "deep_dropout": (1.0, 1.0),
        })
        tr = Trainer(model, {"learning_rate": 1e-3}, batch_size=128,
                     metrics=(LogLoss(), RocAucScore()), epoch=1)
        tr.fit(arrs, arrs["y"], random_seed_for_mini_batch=False)
        return tr, arrs

    def test_predict_stream_matches_resident_predict(self):
        from recman_tpu.data.streaming import iter_array_chunks

        tr, arrs = self._trainer_and_data()
        X = {k: v for k, v in arrs.items() if k != "y"}
        resident = tr.predict(X)
        streamed = tr.predict_stream(iter_array_chunks(arrs, 300))
        np.testing.assert_allclose(streamed, resident, rtol=1e-5, atol=1e-6)

    def test_evaluate_stream_matches_resident(self):
        from recman_tpu.data.streaming import iter_array_chunks

        tr, arrs = self._trainer_and_data()
        res_resident = tr.evaluate(
            {k: v for k, v in arrs.items() if k != "y"}, arrs["y"]
        )
        res_stream = tr.evaluate_stream(
            lambda: iter_array_chunks(arrs, 300)
        )
        np.testing.assert_allclose(res_stream, res_resident, rtol=1e-5)

"""QR compositional embeddings (Shi et al. 2019, arXiv:1909.02107):
quotient + remainder tables replace a full (V, k) table for single-id
sparse features — ~q/2x less embedding memory at q ~ sqrt(V), every id
keeping a UNIQUE composed vector (unlike plain hashing)."""

import numpy as np
import pandas as pd
import pytest

import jax
import jax.numpy as jnp

from recman_tpu.features import FeatureSet, HashedSparseFeat, SparseFeat, DenseFeat
from recman_tpu.models import DeepFM, XDeepFM
from recman_tpu.training import LogLoss, Trainer


def _qr_schema(n_rows=64, vocab=97, q=10, seed=0):
    rs = np.random.RandomState(seed)
    df = pd.DataFrame({
        "u": [f"u{i}" for i in rs.randint(0, vocab, n_rows)],
        "h": [f"h{i}" for i in rs.randint(0, 1000, n_rows)],
        "d": rs.randn(n_rows),
    })
    fs = FeatureSet()
    fs["u"] = SparseFeat("u", qr_collisions=q)
    fs["h"] = HashedSparseFeat("h", num_buckets=200, qr_collisions=15)
    fs["d"] = DenseFeat("d")
    fs.initialize(df)
    y = rs.randint(0, 2, n_rows).astype(np.float32)
    return fs, df, y


class TestQREmbedding:
    def test_param_shapes_and_memory(self):
        fs, df, y = _qr_schema()
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        params = model.init_params(jax.random.PRNGKey(0))
        V = fs["u"].feat_size
        q = 10
        assert "u_feat_embed" not in params
        assert params["u_feat_embed_q"].shape == (-(-V // q), 4)
        assert params["u_feat_embed_r"].shape == (q, 4)
        assert params["h_feat_embed_q"].shape == (-(-201 // 15), 4)
        # memory shrinks vs the full table
        full = V * 4
        qr = params["u_feat_embed_q"].size + params["u_feat_embed_r"].size
        assert qr < full / 2

    def test_unique_composition(self):
        """ids sharing a quotient OR a remainder still compose distinct
        vectors; rows equal Q[id//q] + R[id%q] exactly."""
        fs, df, y = _qr_schema()
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        params = model.init_params(jax.random.PRNGKey(0))
        emb = model.embeddings
        ids = jnp.arange(30, dtype=jnp.int32)
        rows = np.asarray(emb._qr_rows(params, fs["u"], ids))
        tq = np.asarray(params["u_feat_embed_q"])
        tr = np.asarray(params["u_feat_embed_r"])
        want = tq[np.arange(30) // 10] + tr[np.arange(30) % 10]
        np.testing.assert_allclose(rows, want, rtol=1e-6)
        # all 30 composed vectors distinct
        assert len({tuple(np.round(r, 6)) for r in rows}) == 30

    @pytest.mark.parametrize("model_cls", [DeepFM, XDeepFM])
    def test_trains_end_to_end(self, model_cls):
        fs, df, y = _qr_schema(n_rows=128)
        hp = {"embedding_size": 4, "deep_hidden_units": (8,),
              "deep_dropout": (1.0, 1.0)}
        if model_cls is XDeepFM:
            hp.update({"cin_cross_layer_units": (4, 4),
                       "cin_dropout": (1, 1, 1)})
        model = model_cls(fs, hp)
        t = Trainer(model, {"learning_rate": 0.05}, metrics=(LogLoss(),),
                    epoch=2, batch_size=32, random_seed=2019)
        before = t.evaluate(df, y)[0]
        t.fit(df, y, random_seed_for_mini_batch=False)
        after = t.evaluate(df, y)[0]
        assert np.isfinite(after) and after < before

    def test_schema_json_round_trip(self):
        from recman_tpu import schema_from_json, schema_to_json

        fs, df, y = _qr_schema()
        fs2 = schema_from_json(schema_to_json(fs))
        assert fs2["u"].qr_collisions == 10
        assert fs2["h"].qr_collisions == 15
        a, b = fs.transform(df), fs2.transform(df)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

    def test_qr_rejected_for_multival(self):
        from recman_tpu.features import MultiValSparseFeat

        fs = FeatureSet()
        f = MultiValSparseFeat("m", max_len=3)
        f.qr_collisions = 4  # not a constructor arg; simulate misuse
        fs["m"] = f
        fs.initialize(pd.DataFrame({"m": [["a", "b"], ["c"]]})["m"].to_frame())
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        with pytest.raises(NotImplementedError, match="single-id"):
            model.init_params(jax.random.PRNGKey(0))

    def test_sharded_trainer_row_shards_quotient_table(self):
        """The quotient table row-shards like a full table; the model
        trains on the mesh and matches... (smoke: learns + spec)."""
        from jax.sharding import PartitionSpec as P

        from recman_tpu.parallel import MODEL_AXIS, ShardedTrainer, make_mesh

        rs = np.random.RandomState(0)
        df = pd.DataFrame({
            "u": [f"u{i}" for i in rs.randint(0, 4000, 128)],
            "d": rs.randn(128),
        })
        fs = FeatureSet()
        fs["u"] = SparseFeat("u", feat_size=4000, qr_collisions=8)
        fs["d"] = DenseFeat("d")
        fs.initialize(df)
        y = rs.randint(0, 2, 128).astype(np.float32)
        data = fs.transform(df, y=y)
        model = DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (8,),
                            "deep_dropout": (1.0, 1.0)})
        t = ShardedTrainer(
            model, {"learning_rate": 0.05}, metrics=(LogLoss(),), epoch=1,
            batch_size=32, random_seed=2019, mesh=make_mesh(data=2, model=4),
            row_shard_threshold=64,
        )
        spec = t.state.params["u_feat_embed_q"].sharding.spec
        assert spec == P(MODEL_AXIS, None), spec
        loss = None
        dev, layout = t._to_device(data, y)
        idx = np.arange(32, dtype=np.int32)
        loss = t.fit_on_batch(dev, idx, layout)
        assert np.isfinite(float(loss))

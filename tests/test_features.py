"""Feature-system unit tests (reference behaviors from recman/tf/inputs.py)."""

import numpy as np
import pandas as pd
import pytest

from recman_tpu.features import (
    PAD_ID,
    DenseFeat,
    FeatureSet,
    HashedSparseFeat,
    MinMaxScaler,
    MultiValCsvFeat,
    MultiValSparseFeat,
    SequenceFeat,
    SparseFeat,
    SparseValueFeat,
    VocabEncoder,
    hash_bucket,
)


class TestVocabEncoder:
    def test_oov_reserved_zero(self):
        # reference ResilientLabelEncoder: index 0 = sentinel (inputs.py:122-126)
        enc = VocabEncoder().fit(["b", "a", "c", "a"])
        assert enc.vocab_size == 4  # 3 classes + OOV
        out = enc.transform(["a", "b", "c", "zzz"])
        assert out.tolist() == [1, 2, 3, 0]

    def test_inverse(self):
        enc = VocabEncoder().fit(["x", "y"])
        inv = enc.inverse_transform(np.array([1, 2, 0]))
        assert inv.tolist() == ["x", "y", None]


class TestSparseFeat:
    def test_feat_size_plus_one(self):
        # reference: feat_size = n+1 (inputs.py:166)
        f = SparseFeat("f", feat_size=5)
        assert f.feat_size == 6

    def test_transform(self):
        f = SparseFeat("f", feat_size=3)
        f.initialize(pd.Series(["a", "b", "c", "a"]))
        out = f.transform(pd.Series(["b", "nope", "c"]))
        assert out["f"].tolist() == [2, 0, 3]
        assert out["f"].dtype == np.int32

    def test_weight_override_vector(self):
        # reference inputs.py:170-189 + set_weights
        f = SparseFeat("f", feat_size=3)
        f.initialize(pd.Series(["a", "b", "c"]))
        f.set_weights({"b": -5.0})
        w = f.weights
        assert w.shape == (4,)
        assert w[2] == -5.0 and w.sum() == -5.0


class TestSparseValueFeat:
    def test_transform_splits_id_value(self):
        f = SparseValueFeat("f", feat_size=2)
        f.initialize(pd.Series([["x", 3], ["y", 2]]))
        out = f.transform(pd.Series([["x", 3], ["y", 2], ["zz", 7]]))
        assert out["f"].tolist() == [1, 2, 0]
        np.testing.assert_allclose(out["f:value"], [3.0, 2.0, 7.0])


class TestDenseFeat:
    def test_minmax(self):
        f = DenseFeat("d", scaler="minmax")
        f.initialize(pd.Series([0.0, 5.0, 10.0]))
        out = f.transform(pd.Series([5.0]))
        np.testing.assert_allclose(out["d"], [0.5])

    def test_standard(self):
        f = DenseFeat("d")
        vals = pd.Series([1.0, 2.0, 3.0])
        f.initialize(vals)
        out = f.transform(vals)["d"]
        np.testing.assert_allclose(out.mean(), 0.0, atol=1e-6)


class TestMultiValCsv:
    def test_tags_and_unknown(self):
        # known tags -> 1..n, unknown -> OOV 0, padding -> PAD_ID
        f = MultiValCsvFeat("g", tags=("a", "b", "c"))
        assert f.feat_size == 4
        out = f.transform(pd.Series(["a|c", "zz|b", ""]))["g"]
        assert out.shape == (3, 3)
        assert out[0].tolist() == [1, 3, PAD_ID]
        assert out[1].tolist() == [0, 2, PAD_ID]
        assert out[2].tolist() == [PAD_ID, PAD_ID, PAD_ID]

    def test_weights_by_tag(self):
        f = MultiValCsvFeat("g", tags=("a", "b"))
        f.set_weights({"b": -5.0, "nope": 3.0})
        w = f.weights
        assert w.tolist() == [0.0, 0.0, -5.0]


class TestMultiValSparse:
    def test_padded_encode(self):
        f = MultiValSparseFeat("m", max_len=4)
        col = pd.Series([["a", "b"], ["c"], ["a", "zzz"]])
        f.initialize(col)
        out = f.transform(pd.Series([["a", "b"], ["c"], ["a", "nope"]]))["m"]
        assert out.shape == (3, 4)
        assert out[0].tolist() == [1, 2, PAD_ID, PAD_ID]
        assert out[2].tolist() == [1, 0, PAD_ID, PAD_ID]


class TestSequenceFeat:
    def test_tied_vocab(self):
        # the reference declares but never implements this (inputs.py:443)
        id_feat = SparseFeat("item", feat_size=3)
        id_feat.initialize(pd.Series(["i1", "i2", "i3"]))
        f = SequenceFeat("hist", id_feat=id_feat, max_len=3)
        assert f.feat_size == id_feat.feat_size
        out = f.transform(pd.Series([["i1", "i3"], ["i2"]]))["hist"]
        assert out[0].tolist() == [1, 3, PAD_ID]
        assert out[1].tolist() == [2, PAD_ID, PAD_ID]


class TestHashing:
    def test_stable_and_bounded(self):
        a = hash_bucket(np.array(["x", "y", "x"]), 100)
        b = hash_bucket(np.array(["x", "y", "x"]), 100)
        assert a.tolist() == b.tolist()
        assert a[0] == a[2]
        assert (a >= 0).all() and (a < 100).all()

    def test_hashed_sparse_feat(self):
        f = HashedSparseFeat("h", num_buckets=50)
        out = f.transform(pd.Series(["a", "", "b"]))["h"]
        assert out[1] == 0  # missing -> null row
        assert (out[[0, 2]] > 0).all()


class TestFeatureSet:
    def test_accessors_and_transform(self, synthetic_df, synthetic_features):
        fs = synthetic_features
        assert len(fs.sparse_feats) == 3
        assert len(fs.multi_val_csv_feats) == 1
        assert len(fs.embedding_feats) == 4
        batch = fs.transform(synthetic_df, y=synthetic_df["LABEL"].values)
        assert batch["USER_ID"].shape == (16,)
        assert batch["HISTORICAL_CATEGORIES"].shape == (16, 4)
        assert batch["y"].dtype == np.float32

    def test_linear_features_default_order(self, synthetic_features):
        # reference utils.py:27-36
        feats = synthetic_features.linear_features()
        names = [f.name for f in feats]
        assert names == ["USER_ID", "CLASS_ID", "CATEGORY", "HISTORICAL_CATEGORIES"]

    def test_linear_features_selector(self, synthetic_features):
        feats = synthetic_features.linear_features("CATEGORY,USER_ID")
        assert [f.name for f in feats] == ["CATEGORY", "USER_ID"]


class TestSchemaJson:
    """JSON schema round-trip (features/serialize.py): loading a serving
    artifact must not execute pickled code."""

    def _full_schema_and_df(self):
        from recman_tpu import (
            DenseFeat,
            FeatureSet,
            HashedSparseFeat,
            MultiValCsvFeat,
            MultiValSparseFeat,
            SequenceFeat,
            SparseFeat,
            SparseValueFeat,
        )

        df = pd.DataFrame(
            {
                "uid": [5, 7, 9, 5],
                "city": ["sf", "nyc", "sf", "la"],
                "h": ["a", "b", "", "c"],
                "iv": [["I1", 2.0], ["I2", 0.5], ["I1", 1.0], ["I3", 3.0]],
                "age": [10.0, 20.0, 30.0, 40.0],
                "ts": [1.0, 2.0, 3.0, 4.0],
                "tags": ["a|b", "b", "", "a|b|c"],
                "ml": [["x", "y"], ["y"], [], ["z"]],
                "hist": [[5, 7], [9], [], [5]],
            }
        )
        fs = FeatureSet()
        uid = SparseFeat("uid")
        fs["uid"] = uid
        fs["city"] = SparseFeat("city", description="city code")
        fs["h"] = HashedSparseFeat("h", num_buckets=32)
        fs["iv"] = SparseValueFeat("iv")
        fs["age"] = DenseFeat("age", scaler="standard")
        fs["ts"] = DenseFeat("ts", scaler="minmax")
        fs["tags"] = MultiValCsvFeat("tags", tags=("a", "b", "c"))
        fs["ml"] = MultiValSparseFeat("ml", max_len=3)
        fs["hist"] = SequenceFeat("hist", id_feat=uid, max_len=4)
        fs.initialize(df)
        fs["city"].set_weights({"sf": -2.5})
        fs["tags"].set_weights({"b": 1.5})
        return fs, df

    def test_round_trip_transforms_identically(self):
        from recman_tpu import schema_from_json, schema_to_json

        fs, df = self._full_schema_and_df()
        fs2 = schema_from_json(schema_to_json(fs))

        assert list(fs2) == list(fs)
        a, b = fs.transform(df), fs2.transform(df)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)
        # override vectors survive (incl. dict keys typed correctly)
        for name in fs:
            np.testing.assert_array_equal(
                fs[name].weights, fs2[name].weights, err_msg=name
            )
        # feat sizes + tied vocab preserved
        for name in fs:
            assert fs[name].feat_size == fs2[name].feat_size, name
        assert fs2["hist"].id_feat is fs2["uid"]

    def test_object_vocab_with_non_str_values_rejected(self):
        # ADVICE r3: an object-dtype vocab of ints would round-trip with
        # string keys and silently OOV everything — must raise instead so
        # the pickle sidecar takes over
        from recman_tpu import FeatureSet, SparseFeat, schema_to_json

        fs = FeatureSet()
        fs["c"] = SparseFeat("c")
        df = pd.DataFrame({"c": pd.array([1, 2, 3], dtype=object)})
        fs.initialize(df)
        assert fs["c"].encoder.classes_.dtype.kind == "O"
        with pytest.raises(TypeError, match="non-str"):
            schema_to_json(fs)

    def test_unknown_schema_version_raises_valueerror(self):
        import json

        from recman_tpu import schema_from_json

        with pytest.raises(ValueError, match="unknown schema version"):
            schema_from_json(json.dumps({"version": 999, "features": []}))

    def test_custom_scaler_rejected(self):
        from recman_tpu import DenseFeat, FeatureSet, schema_to_json

        class MyScaler:
            def fit(self, x):
                return self

            def transform(self, x):
                return x

        fs = FeatureSet()
        fs["d"] = DenseFeat("d", scaler=MyScaler())
        with pytest.raises(TypeError, match="not JSON-serializable"):
            schema_to_json(fs)


class TestShuffledVocab:
    """Seeded shuffled id assignment (the sharded-embedding scaling lever:
    makes ranked vocabularies behave like hashed ones for range-partitioned
    row sharding — encoders.VocabEncoder docstring)."""

    def test_deterministic_bijection_oov_fixed(self):
        from recman_tpu.features.encoders import VocabEncoder

        vals = np.array([f"v{i:04d}" for i in range(500)])
        e1 = VocabEncoder(shuffle_seed=7).fit(vals)
        e2 = VocabEncoder(shuffle_seed=7).fit(vals)
        plain = VocabEncoder().fit(vals)
        ids1, ids2 = e1.transform(vals), e2.transform(vals)
        np.testing.assert_array_equal(ids1, ids2)  # deterministic
        # bijection over 1..n, OOV still 0
        assert sorted(ids1.tolist()) == list(range(1, 501))
        assert e1.transform(np.array(["UNSEEN"]))[0] == 0
        assert e1.vocab_size == plain.vocab_size
        # actually shuffled (not the sorted assignment)
        assert ids1.tolist() != plain.transform(vals).tolist()
        # inverse transform follows the shuffled assignment
        back = e1.inverse_transform(ids1[:10])
        np.testing.assert_array_equal(back, vals[:10])

    def test_featureset_one_switch(self):
        from recman_tpu import FeatureSet, SparseFeat, schema_from_json, schema_to_json

        df = pd.DataFrame({
            "a": [f"x{i}" for i in range(50)],
            "b": [f"y{i}" for i in range(50)],
        })
        fs = FeatureSet()
        fs["a"] = SparseFeat("a")
        fs["b"] = SparseFeat("b")
        fs.initialize(df, shuffle_vocab=123)
        ta = fs.transform(df)
        # distinct per-feature seeds -> distinct permutations
        assert ta["a"].tolist() != ta["b"].tolist()
        assert sorted(ta["a"].tolist()) == list(range(1, 51))
        # JSON round-trip preserves the shuffled assignment
        fs2 = schema_from_json(schema_to_json(fs))
        tb = fs2.transform(df)
        np.testing.assert_array_equal(ta["a"], tb["a"])
        np.testing.assert_array_equal(ta["b"], tb["b"])

    def test_spreads_ranked_hot_ids_across_shards(self):
        """The point of the lever: a Zipf-RANKED stream concentrates
        uniques on shard 0 under range partitioning; shuffled assignment
        spreads them (so capacity_from_sample comes out ~U/S, making the
        dedup exchange's byte ratio < 1)."""
        from recman_tpu.features.encoders import VocabEncoder
        from recman_tpu.parallel.shard_lookup import capacity_from_sample

        rs = np.random.RandomState(0)
        V, N, S = 8000, 4096, 8
        # Zipf-distributed RANKS (hot values = low rank), values named so
        # the sorted (unshuffled) encoder assigns ids in rank order
        ranks = np.minimum(rs.zipf(1.3, N * 4), V - 1)[:N]
        vals = np.array([f"v{r:06d}" for r in ranks])
        fit_vals = np.array([f"v{r:06d}" for r in range(V)])

        ranked = VocabEncoder().fit(fit_vals).transform(vals)
        shuffled = VocabEncoder(shuffle_seed=1).fit(fit_vals).transform(vals)

        cap_ranked = capacity_from_sample([ranked], S, V + 1)
        cap_shuffled = capacity_from_sample([shuffled], S, V + 1)
        u = len(np.unique(vals))
        # ranked: hot rows contiguous -> one shard owns far more than U/S
        assert cap_ranked > 2.5 * u / S, (cap_ranked, u)
        # shuffled: near-even spread; 1.5x safety over ~U/S
        assert cap_shuffled < 1.5 * 1.35 * u / S, (cap_shuffled, u)
        # and the dedup:psum traffic ratio capacity*S/N dips below 1
        assert cap_shuffled * S / N < 1.0

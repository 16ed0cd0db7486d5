"""Data pipeline tests: ML-100K loader parity facts + Criteo loaders."""

import io
import os

import numpy as np
import pytest

from recman_tpu.data import (
    CAT_NAMES,
    INT_NAMES,
    create_criteo_features,
    create_ml_features,
    get_ml_dataset,
    load_criteo_tsv,
    synthetic_criteo_arrays,
)


class TestML100K:
    @pytest.fixture(scope="class")
    def dataset(self):
        return get_ml_dataset(frac=0.1, random_seed=2019)

    def test_split_and_labels(self, dataset):
        df_train, df_valid, df_test, domains = dataset
        # u.info ground truth: 943 users / 1682 items / 100k ratings,
        # ua.base = 90570 / ua.test = 9430
        assert len(df_train) + len(df_valid) == round(90570 * 0.1)
        assert len(df_test) == 9430
        assert set(df_train.label.unique()) <= {0.0, 1.0}
        assert abs(len(df_train) / (len(df_train) + len(df_valid)) - 0.7) < 0.01

    def test_genres_pipe_joined(self, dataset):
        df_train, _, _, domains = dataset
        assert len(domains["genres"]) == 19
        sample = df_train.genres.iloc[0]
        assert all(g in domains["genres"] for g in sample.split("|") if g)

    def test_feature_schema(self, dataset):
        import pandas as pd

        df_train, df_valid, _, domains = dataset
        fs = create_ml_features(pd.concat([df_train, df_valid]), domains)
        # reference examples/utils.py:29-75: 5 sparse + 2 dense + 1 multival
        assert len(fs.sparse_feats) == 5
        assert len(fs.dense_feats) == 2
        assert len(fs.multi_val_csv_feats) == 1
        batch = fs.transform(df_train, y=df_train.label.values)
        assert batch["user_id"].max() <= fs["user_id"].feat_size - 1
        assert batch["genres"].shape[1] == 19
        # MinMax-scaled dense in [0, 1]
        assert batch["age"].min() >= 0 and batch["age"].max() <= 1


class TestCriteo:
    def test_tsv_loader(self, tmp_path):
        # 2 rows: full + one with missing fields
        row1 = "1\t" + "\t".join(str(i) for i in range(13)) + "\t" + "\t".join(
            f"c{i:02x}" for i in range(26)
        )
        row2 = "0\t" + "\t".join([""] * 13) + "\t" + "\t".join([""] * 26)
        p = tmp_path / "day.tsv"
        p.write_text(row1 + "\n" + row2 + "\n")

        raw = load_criteo_tsv(p)
        assert raw["y"].tolist() == [1.0, 0.0]
        assert raw["I1"].tolist() == [0.0, 0.0]
        assert raw["I13"].tolist() == [12.0, 0.0]

        fs = create_criteo_features(num_buckets=1000)
        y = raw.pop("y")
        batch = fs.transform(raw, y=y)
        assert batch["C1"][0] > 0  # hashed into 1..buckets
        assert batch["C1"][1] == 0  # missing -> null row 0
        assert (batch["I13"] >= 0).all()  # log1p

    def test_synthetic_generator(self):
        data = synthetic_criteo_arrays(1000, num_buckets=5000, seed=1)
        assert set(data) == set(CAT_NAMES) | set(INT_NAMES) | {"y"}
        assert data["C1"].min() >= 1 and data["C1"].max() <= 5000
        assert 0.1 < data["y"].mean() < 0.9  # both classes present
        # deterministic
        data2 = synthetic_criteo_arrays(1000, num_buckets=5000, seed=1)
        np.testing.assert_array_equal(data["C5"], data2["C5"])

    def test_calibrated_generator(self):
        """calibrated_criteo_arrays: per-field missing rates, realistic
        base rate, learnable teacher signal (VERDICT r1 #8)."""
        from recman_tpu.data import calibrated_criteo_arrays
        from recman_tpu.data.criteo import KAGGLE_CAT_MISSING

        data = calibrated_criteo_arrays(20_000, num_buckets=5000, seed=1)
        assert set(data) == set(CAT_NAMES) | set(INT_NAMES) | {"y"}
        # encoded like the real hashed pipeline: ids in [0, buckets]
        assert data["C3"].min() >= 0 and data["C3"].max() <= 5000
        # missing rates land near the declared per-field parameters
        for name, rate in (("C22", KAGGLE_CAT_MISSING[21]),
                           ("C1", KAGGLE_CAT_MISSING[0])):
            got = float((data[name] == 0).mean())
            assert abs(got - rate) < 0.03, (name, got, rate)
        # CTR-like base rate, not a balanced coin
        assert 0.2 < data["y"].mean() < 0.4
        # deterministic
        data2 = calibrated_criteo_arrays(20_000, num_buckets=5000, seed=1)
        np.testing.assert_array_equal(data["C7"], data2["C7"])
        np.testing.assert_array_equal(data["y"], data2["y"])
        # the teacher signal is learnable: a logistic fit on a few small
        # hashed fields must beat chance AUC by a clear margin
        from recman_tpu.training.metrics import RocAucScore

        # per-bucket label means FIT ON THE FIRST HALF must predict the
        # HELD-OUT half (in-sample means would pass on pure noise by
        # memorization); sum a few fields' estimates — the teacher signal
        # is deliberately spread across all 26 fields like real CTR data
        big = calibrated_criteo_arrays(50_000, num_buckets=5000, seed=1)
        y = big["y"]
        h = len(y) // 2
        comb = np.zeros(len(y))
        for f in ("C1", "C5", "C7", "C9", "C17", "C20", "C22"):
            ids = big[f]
            sums = np.bincount(ids[:h], weights=y[:h], minlength=5001)
            cnts = np.bincount(ids[:h], minlength=5001)
            m = np.where(cnts > 4, sums / np.maximum(cnts, 1), y[:h].mean())
            comb += m[ids]
        auc = RocAucScore()(y[h:], comb[h:])
        assert auc > 0.57, auc  # measured 0.60 on this seed


class TestHistoryFeature:
    """add_history_feature: temporal per-user rated-item histories for the
    sequence family's ML-100K anchors (data/ml_100k.py)."""

    def test_strictly_before_and_truncated(self):
        import pandas as pd

        from recman_tpu.data import add_history_feature

        df = pd.DataFrame({
            "user_id": [1, 1, 1, 1, 2],
            "timestamp": [10, 20, 30, 40, 5],
            "item_id": [100, 101, 102, 103, 200],
        })
        out = add_history_feature(df, max_len=2)
        assert out["hist_items"].tolist() == [
            [], [100], [100, 101], [101, 102], []
        ]

    def test_temporal_across_splits(self):
        import pandas as pd

        from recman_tpu.data import add_history_feature

        df = pd.DataFrame({
            "user_id": [1, 1, 1],
            "timestamp": [10, 20, 30],
            "item_id": [100, 101, 102],
        })
        # the later split's rows see the earlier split's interactions
        d1, d2 = add_history_feature(df.iloc[:1], df.iloc[1:], max_len=5)
        assert d1["hist_items"].tolist() == [[]]
        assert d2["hist_items"].tolist() == [[100], [100, 101]]

    def test_sequence_schema_ties_item_vocab(self):
        import numpy as np
        import pandas as pd

        from recman_tpu.data import (
            add_history_feature,
            create_ml_sequence_features,
            get_ml_dataset,
        )

        df_train, df_valid, df_test, domains = get_ml_dataset(frac=0.05)
        df_train, df_valid, df_test = add_history_feature(
            df_train, df_valid, df_test
        )
        fs = create_ml_sequence_features(
            pd.concat([df_train, df_valid]), domains
        )
        assert fs["hist_items"].id_feat is fs["item_id"]
        batch = fs.transform(df_train)
        assert batch["hist_items"].shape == (len(df_train), 10)
        # encoded histories use the item vocabulary (PAD=-1 elsewhere)
        assert batch["hist_items"].max() < fs["item_id"].feat_size

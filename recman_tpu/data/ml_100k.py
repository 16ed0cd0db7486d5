"""MovieLens-100K pipeline — the parity dataset.

Reference: recman/examples/datasets/ml_100k.py:4-89 (pandas joins of
u.user/u.item/u.genre/u{set}.base/.test with a pipe-joined genres column)
and recman/examples/utils.py:9-75 (label binarization rating>=4, frac
subsample, 70/30 train/valid split, the canonical 5-sparse/2-dense/1-multival
feature schema).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

from ..features import (
    DenseFeat,
    FeatureSet,
    MultiValCsvFeat,
    SequenceFeat,
    SparseFeat,
)

DEFAULT_DATA_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "data")


def get_data(data_dir=DEFAULT_DATA_DIR, file_set="a"):
    """Load and join ML-100K tables (reference ml_100k.py:4-89).

    Returns (df_train_all, df_test_all, domains) where domains carries the
    genre/occupation vocabularies.
    """
    root = os.path.join(data_dir, "ml-100k")
    df_genres = pd.read_csv(
        f"{root}/u.genre", delimiter="|", header=None, encoding="latin-1",
        names=["genre", "id"],
    )
    df_occupations = pd.read_csv(
        f"{root}/u.occupation", delimiter="|", header=None, encoding="latin-1",
        names=["occupation"],
    )
    df_users = pd.read_csv(
        f"{root}/u.user", delimiter="|", header=None, encoding="latin-1",
        names=["user_id", "age", "gender", "occupation", "zip"],
    )
    genre_names = df_genres.genre.unique().tolist()
    df_items = pd.read_csv(
        f"{root}/u.item", delimiter="|", header=None, encoding="latin-1",
        names=["item_id", "title", "release_date", "video_release_date", "imdb_url"]
        + genre_names,
    )
    # pipe-joined genre string per movie (reference ml_100k.py:37-45),
    # vectorized instead of a row-wise apply
    genre_mat = df_items[genre_names].values == 1.0
    df_items["genres"] = [
        "|".join(g for g, on in zip(genre_names, row) if on) for row in genre_mat
    ]

    def load_interactions(path):
        df = pd.read_csv(
            path, delimiter="\t", header=None, encoding="latin-1",
            names=["user_id", "item_id", "rating", "timestamp"],
        )
        df = pd.merge(df, df_users, on="user_id")
        return pd.merge(
            df, df_items[["item_id", "title", "release_date", "genres"]], on="item_id"
        )

    df_train_all = load_interactions(f"{root}/u{file_set}.base")
    df_test_all = load_interactions(f"{root}/u{file_set}.test")
    domains = dict(
        genres=df_genres.genre.tolist(),
        occupations=df_occupations.occupation.tolist(),
    )
    return df_train_all, df_test_all, domains


def get_ml_dataset(frac=0.5, random_seed=2019, data_dir=DEFAULT_DATA_DIR):
    """Binarize + subsample + 70/30 split (reference examples/utils.py:9-27)."""
    df_all, df_test, domains = get_data(data_dir)
    df_all = df_all.sample(frac=frac, random_state=random_seed)

    for df in (df_all, df_test):
        df.loc[df.rating < 4, "label"] = 0
        df.loc[df.rating >= 4, "label"] = 1
    df_train = df_all.sample(frac=0.7, random_state=random_seed)
    df_valid = df_all.drop(df_train.index)
    return df_train, df_valid, df_test, domains


def create_ml_features(df_data, domains) -> FeatureSet:
    """The canonical ML-100K schema (reference examples/utils.py:29-75):
    5 SparseFeat + 2 MinMax DenseFeat + 1 MultiValCsvFeat."""
    fs = FeatureSet()
    for name in ("user_id", "item_id", "gender", "occupation", "zip"):
        fs[name] = SparseFeat(name, feat_size=len(np.unique(df_data[name].values)))
    fs["timestamp"] = DenseFeat("timestamp", scaler="minmax")
    fs["age"] = DenseFeat("age", scaler="minmax")
    fs["genres"] = MultiValCsvFeat("genres", tags=tuple(domains["genres"]))
    fs.initialize(df_data)
    return fs


def add_history_feature(*dfs, max_len=10):
    """Add a ``hist_items`` column (list of the user's previously-rated
    item_ids, most recent last, truncated to ``max_len``) to each df.

    Built TEMPORALLY over the union of the given frames (sorted by user
    then timestamp), so a row's history contains only interactions that
    happened strictly before it — the behavior sequence DIN/BST/DIEN
    consume (beyond-reference: the reference's SequenceFeat is
    unimplemented, inputs.py:443). Labels are never consulted; ties on
    (user, timestamp) resolve by original row order. Returns the same
    frames with the column added (copies).
    """
    import pandas as pd

    tagged = []
    for i, df in enumerate(dfs):
        t = df[["user_id", "timestamp", "item_id"]].copy()
        t["__src"] = i
        t["__row"] = df.index
        tagged.append(t)
    union = pd.concat(tagged, ignore_index=True)
    union = union.sort_values(
        ["user_id", "timestamp", "__src", "__row"], kind="stable"
    )

    hist_by_rowkey: dict = {}
    cur_user, cur_hist = None, []
    for user, item, src, row in zip(
        union["user_id"].values, union["item_id"].values,
        union["__src"].values, union["__row"].values,
    ):
        if user != cur_user:
            cur_user, cur_hist = user, []
        hist_by_rowkey[(src, row)] = cur_hist[-max_len:]
        cur_hist = cur_hist + [item]

    out = []
    for i, df in enumerate(dfs):
        df = df.copy()
        df["hist_items"] = [hist_by_rowkey[(i, r)] for r in df.index]
        out.append(df)
    return out[0] if len(out) == 1 else tuple(out)


def create_ml_sequence_features(df_data, domains, max_len=10) -> FeatureSet:
    """The canonical schema + a SequenceFeat over ``hist_items`` tied to
    item_id's table — the schema the sequence family (DIN/BST/DIEN)
    trains on for the ML-100K anchors."""
    fs = create_ml_features(df_data, domains)
    fs["hist_items"] = SequenceFeat(
        "hist_items", id_feat=fs["item_id"], max_len=max_len
    )
    return fs

"""Cross-vocabulary warm start (ckpt/transfer.py) + min_count vocab floor."""

import numpy as np
import pandas as pd

import jax

from recman_tpu.ckpt import warm_start_embeddings
from recman_tpu.features import FeatureSet, HashedSparseFeat, SparseFeat, DenseFeat
from recman_tpu.features.encoders import VocabEncoder
from recman_tpu.models import DeepFM
from recman_tpu.training import LogLoss, Trainer


class TestMinCount:
    def test_rare_values_prune_to_oov(self):
        enc = VocabEncoder(min_count=2).fit(["a", "a", "b", "b", "c"])
        assert enc.vocab_size == 3  # a, b + OOV; c pruned
        out = enc.transform(["a", "b", "c", "zzz"])
        assert out[2] == 0 and out[3] == 0 and (out[:2] > 0).all()

    def test_feature_level(self):
        f = SparseFeat("x", encoder=VocabEncoder(min_count=3))
        f.initialize(pd.Series(["p"] * 3 + ["q"] * 2))
        assert f.feat_size == 2  # only p survives (+OOV)


def _fit_schema(values_by_col, hashed=False):
    df = pd.DataFrame(values_by_col)
    fs = FeatureSet()
    for c in values_by_col:
        if c == "d":
            fs[c] = DenseFeat(c)
        elif hashed and c == "h":
            fs[c] = HashedSparseFeat(c, num_buckets=64)
        else:
            fs[c] = SparseFeat(c)
    fs.initialize(df)
    return fs, df


class TestWarmStart:
    def test_rows_transfer_by_value(self):
        rs = np.random.RandomState(0)
        old_vals = [f"v{i}" for i in range(20)]
        fs_old, df_old = _fit_schema({
            "u": old_vals, "h": old_vals, "d": rs.randn(20)}, hashed=True)
        hp = {"embedding_size": 4, "deep_hidden_units": (8,),
              "deep_dropout": (1.0, 1.0)}
        m_old = DeepFM(fs_old, hp)
        t = Trainer(m_old, {"learning_rate": 0.05}, metrics=(LogLoss(),),
                    epoch=2, batch_size=8, random_seed=2019)
        y = rs.randint(0, 2, 20).astype(np.float32)
        t.fit(df_old, y, random_seed_for_mini_batch=False)
        old_params = {k: np.asarray(v) for k, v in t.state.params.items()}

        # new vocab: drop v0..v4, add w0..w9 (shifting every id)
        new_vals = [f"v{i}" for i in range(5, 20)] + [f"w{i}" for i in range(10)]
        fs_new, df_new = _fit_schema({
            "u": new_vals, "h": new_vals, "d": rs.randn(25)}, hashed=True)
        m_new = DeepFM(fs_new, hp)
        fresh = m_new.init_params(jax.random.PRNGKey(7))
        warm = warm_start_embeddings(fresh, fs_new, old_params, fs_old)

        # surviving value rows moved to their NEW ids with OLD vectors
        for v in ("v5", "v17"):
            old_id = fs_old["u"].encoder.transform([v])[0]
            new_id = fs_new["u"].encoder.transform([v])[0]
            np.testing.assert_allclose(
                np.asarray(warm["u_feat_embed"])[new_id],
                old_params["u_feat_embed"][old_id], rtol=1e-6,
            )
        # OOV row transfers
        np.testing.assert_allclose(
            np.asarray(warm["u_feat_embed"])[0],
            old_params["u_feat_embed"][0], rtol=1e-6)
        # new values keep the fresh init
        wid = fs_new["u"].encoder.transform(["w3"])[0]
        np.testing.assert_allclose(
            np.asarray(warm["u_feat_embed"])[wid],
            np.asarray(fresh["u_feat_embed"])[wid], rtol=1e-6)
        # hashed feature: same bucket count -> whole-table transfer
        np.testing.assert_allclose(
            np.asarray(warm["h_feat_embed"]),
            old_params["h_feat_embed"], rtol=1e-6)

    def test_qr_transfer_requires_matching_shapes(self):
        rs = np.random.RandomState(1)
        vals = [f"v{i}" for i in range(30)]
        df = pd.DataFrame({"u": vals, "d": rs.randn(30)})
        hp = {"embedding_size": 4, "deep_hidden_units": (8,),
              "deep_dropout": (1.0, 1.0)}

        def build(q):
            fs = FeatureSet()
            fs["u"] = SparseFeat("u", qr_collisions=q)
            fs["d"] = DenseFeat("d")
            fs.initialize(df)
            return fs, DeepFM(fs, hp)

        fs_a, m_a = build(5)
        pa = {k: np.asarray(v) for k, v in
              m_a.init_params(jax.random.PRNGKey(0)).items()}
        # same q: whole-table transfer
        fs_b, m_b = build(5)
        warm = warm_start_embeddings(
            m_b.init_params(jax.random.PRNGKey(9)), fs_b, pa, fs_a)
        np.testing.assert_allclose(
            np.asarray(warm["u_feat_embed_q"]), pa["u_feat_embed_q"])
        # different q: shapes differ -> fresh init kept
        fs_c, m_c = build(6)
        fresh_c = m_c.init_params(jax.random.PRNGKey(9))
        warm_c = warm_start_embeddings(fresh_c, fs_c, pa, fs_a)
        np.testing.assert_allclose(
            np.asarray(warm_c["u_feat_embed_q"]),
            np.asarray(fresh_c["u_feat_embed_q"]))

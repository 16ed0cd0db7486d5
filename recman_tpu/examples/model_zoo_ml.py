"""FM / DeepFM / DCN / AFM on MovieLens-100K — one driver for the zoo.

Replaces the reference's stale per-model drivers (examples/FM_ml.py,
DeepFM_ml.py, DCN_ml.py — all broken TF1 remnants, SURVEY.md §2.7) with a
single working one; used to self-establish BASELINE.md numbers.

Run: python -m recman_tpu.examples.model_zoo_ml --model fm [--epoch 1]
"""

import argparse
import logging

import pandas as pd

import recman_tpu
from recman_tpu.data import (
    add_history_feature,
    create_ml_features,
    create_ml_sequence_features,
    get_ml_dataset,
)
from recman_tpu.models import MODEL_REGISTRY
from recman_tpu.training import LogLoss, RocAucScore, Trainer

log = logging.getLogger(__name__)

RANDOM_SEED = 2019


def run_model(model_name, frac=0.5, epoch=1, batch_size=128, hparams=None):
    recman_tpu.config_logger()
    df_train, df_valid, df_test, domains = get_ml_dataset(
        frac=frac, random_seed=RANDOM_SEED
    )
    if MODEL_REGISTRY[model_name].requires_sequence:
        # sequence family (DIN/BST/DIEN): per-user previously-rated-item
        # history, built temporally over all splits (data/ml_100k.py)
        df_train, df_valid, df_test = add_history_feature(
            df_train, df_valid, df_test
        )
        feat_dict = create_ml_sequence_features(
            pd.concat([df_train, df_valid]), domains
        )
    else:
        feat_dict = create_ml_features(pd.concat([df_train, df_valid]), domains)

    model_cls = MODEL_REGISTRY[model_name]
    hp = {"learning_rate": 0.001, "optimizer": "adam"}
    hp.update(hparams or {})
    model = model_cls(feat_dict, hp)
    trainer = Trainer(
        model, hp, metrics=(LogLoss(), RocAucScore()), epoch=epoch,
        batch_size=batch_size, random_seed=RANDOM_SEED,
    )
    trainer.fit(
        df_train, df_train["label"].values,
        X_valid=df_valid, y_valid=df_valid["label"].values,
    )
    test_res = trainer.evaluate(df_test, df_test["label"].values)
    log.info(
        "%s: TEST logloss=%.4f auc=%.4f", model_name, test_res[0], test_res[1]
    )
    return trainer, test_res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    # sequence models run too: run_model derives a per-user rated-item
    # history SequenceFeat for them (add_history_feature)
    ap.add_argument("--model", default="fm", choices=list(MODEL_REGISTRY))
    ap.add_argument("--frac", type=float, default=0.5)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args()
    run_model(args.model, frac=args.frac, epoch=args.epoch, batch_size=args.batch_size)

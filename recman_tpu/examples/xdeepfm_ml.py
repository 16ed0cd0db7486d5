"""xDeepFM on MovieLens-100K with learning-rate grid search.

Mirror of recman/examples/xDeepFM_ml.py:28-70: 50% subsample, 70/30
train/valid split, lr grid {0.01, 0.005}, batch 128, seed 2019, TensorBoard
logging and best-model tracking.

Run: python -m recman_tpu.examples.xdeepfm_ml [--frac 0.5] [--epoch 1]
"""

import argparse
import logging

import recman_tpu
from recman_tpu.config import xDeepFMHyperParams as HyperParams
from recman_tpu.data import create_ml_features, get_ml_dataset
from recman_tpu.models import XDeepFM
from recman_tpu.obs import BestModelFinder, TensorBoardLogger
from recman_tpu.training import LogLoss, RocAucScore, Trainer

log = logging.getLogger(__name__)

RANDOM_SEED = 2019


def main(frac=0.5, epoch=1, batch_size=128, lr_grid=(0.01, 0.005), log_dir="./logs"):
    recman_tpu.config_logger()
    df_train, df_valid, df_test, domains = get_ml_dataset(
        frac=frac, random_seed=RANDOM_SEED
    )
    # encoders fit on the union so vocabularies are shared
    # (reference examples/utils.py:73 fits on df_all)
    import pandas as pd

    feat_dict = create_ml_features(pd.concat([df_train, df_valid]), domains)

    hp_params = HyperParams()
    hp_params[HyperParams.LearningRate](list(lr_grid))
    metrics = (LogLoss(), RocAucScore())
    finder = BestModelFinder()

    for sess_num, hp_val in enumerate(hp_params.grid_search()):
        tb_logger = TensorBoardLogger(hp_params, sess_num=sess_num, log_dir=log_dir)
        model = XDeepFM(feat_dict, hp_val)
        trainer = Trainer(
            model, hp_val, metrics=metrics, epoch=epoch, batch_size=batch_size,
            random_seed=RANDOM_SEED,
        )
        trainer.fit(
            df_train, df_train["label"].values,
            X_valid=df_valid, y_valid=df_valid["label"].values,
            tb_logger=tb_logger, epoch_callback=finder,
        )
        tb_logger.close()

    test_res = finder.best_model.evaluate(df_test, df_test["label"].values)
    log.info(
        "Best lr=%s | valid=%s | TEST logloss=%.4f auc=%.4f",
        finder.best_model.hparams[HyperParams.LearningRate],
        finder.best_eval_results,
        test_res[0], test_res[1],
    )
    return finder, test_res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--frac", type=float, default=0.5)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=128)
    args = ap.parse_args()
    main(frac=args.frac, epoch=args.epoch, batch_size=args.batch_size)

"""The 16-row synthetic xDeepFM demo with counterfactual weight override.

Mirror of the reference's only executable "test"
(recman/examples/xDeepFM_test.py:1-129): build the in-memory dataframe,
grid-search-train xDeepFM, rank predictions, then penalize the "Outdoor"
category via set_weights and re-rank with training=False.

Run: python -m recman_tpu.examples.xdeepfm_synthetic
"""

import logging

import numpy as np
import pandas as pd

import recman_tpu
from recman_tpu import FeatureSet, MultiValCsvFeat, SparseFeat
from recman_tpu.config import xDeepFMHyperParams as HyperParams
from recman_tpu.models import XDeepFM
from recman_tpu.obs import BestModelFinder, TensorBoardLogger
from recman_tpu.training import LogLoss, RocAucScore, Trainer

log = logging.getLogger(__name__)

RANDOM_SEED = 2019
TB_LOG_DIR = "./logs"

# fmt: off
ROWS = [
    ["USER_1", "ITEM_1", "Outdoor",   123, "a|b|d",   1],
    ["USER_1", "ITEM_4", "Treadmill", 123, "a|b",     1],
    ["USER_1", "ITEM_3", "Outdoor",   124, "a|b",     1],
    ["USER_1", "ITEM_5", "Outdoor",   124, "a|b",     1],
    ["USER_4", "ITEM_6", "Rest",      124, "a|b",     0],
    ["USER_2", "ITEM_1", "Treadmill", 125, "b|c",     0],
    ["USER_2", "ITEM_4", "Treadmill", 125, "b|c",     0],
    ["USER_2", "ITEM_2", "Outdoor",   125, "b|c",     1],
    ["USER_2", "ITEM_5", "Outdoor",   125, "b|c",     1],
    ["USER_5", "ITEM_1", "Treadmill", 125, "b|c",     0],
    ["USER_5", "ITEM_3", "Rest",      125, "b|c",     1],
    ["USER_3", "ITEM_1", "Treadmill", 125, "a|c",     1],
    ["USER_3", "ITEM_4", "Treadmill", 125, "a|c",     1],
    ["USER_3", "ITEM_2", "Outdoor",   125, "a|c",     0],
    ["USER_6", "ITEM_2", "Outdoor",   125, "a|c",     0],
    ["USER_6", "ITEM_5", "Outdoor",   125, "a|b|c|d", 0],
]
# fmt: on
COLUMNS = ["USER_ID", "CLASS_ID", "CATEGORY", "TIMESTAMP", "HISTORICAL_CATEGORIES", "LABEL"]


def main():
    recman_tpu.config_logger()
    df_X = pd.DataFrame(ROWS, columns=COLUMNS)

    feat_dict = FeatureSet()
    for name in ("USER_ID", "CLASS_ID", "CATEGORY"):
        feat_dict[name] = SparseFeat(name, feat_size=len(np.unique(df_X[name].values)))
    feat_dict["HISTORICAL_CATEGORIES"] = MultiValCsvFeat(
        "HISTORICAL_CATEGORIES", tags=("a", "b", "c", "d")
    )
    feat_dict.initialize(df_X)

    hp_params = HyperParams()
    hp_params[HyperParams.LearningRate]([0.01])
    metrics = (LogLoss(), RocAucScore())
    finder = BestModelFinder()

    for sess_num, hp_val in enumerate(hp_params.grid_search()):
        tb_logger = TensorBoardLogger(hp_params, sess_num=sess_num, log_dir=TB_LOG_DIR)
        model = XDeepFM(feat_dict, hp_val)
        trainer = Trainer(
            model, hp_val, metrics=metrics, epoch=5, batch_size=128,
            random_seed=RANDOM_SEED,
        )
        trainer.fit(
            df_X, df_X["LABEL"].values,
            tb_logger=tb_logger, epoch_callback=finder,
            random_seed_for_mini_batch=False,
        )
        tb_logger.close()

    log.info("Training complete. BestScore: %s", finder.best_score)

    df_test = df_X.copy()
    df_test["PRED"] = finder.best_model.predict(df_test)
    log.info("Base ranking:\n%s", df_test.sort_values("PRED", ascending=False))

    # counterfactual: penalize Outdoor by -5 (reference xDeepFM_test.py:124-127)
    feat_dict["CATEGORY"].set_weights({"Outdoor": -5})
    feat_dict["HISTORICAL_CATEGORIES"].set_weights({"Outdoor": -5})
    df_test["PRED_PENALIZED"] = finder.best_model.predict(df_test, training=False)
    log.info(
        "Penalized ranking:\n%s", df_test.sort_values("PRED_PENALIZED", ascending=False)
    )
    return df_test


if __name__ == "__main__":
    main()

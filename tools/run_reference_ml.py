#!/usr/bin/env python
"""Run the UPSTREAM REFERENCE (TF) xDeepFM ML-100K pipeline, head-to-head.

Executes the reference implementation at /root/reference under the installed
TF to produce MEASURED reference logloss/AUC numbers — replacing the
"self-established" parity assumption in BASELINE.md with a real head-to-head.

Mirrors /root/reference/recman/examples/xDeepFM_ml.py:28-63 exactly
(lr grid {0.01, 0.005}, batch 128, seed 2019, 1 epoch,
random_seed_for_mini_batch=False, BestModelFinder on valid logloss), with
three mechanical substitutions, each forced by the environment:

1. `get_ml_dataset` (reference examples/utils.py:9-27) resolves the data dir
   from os.getcwd(); its 6 lines of sampling/labeling are replicated here
   verbatim with an explicit data dir so we never chdir into (or write to)
   the read-only reference tree.
2. The reference's LogLoss metric passes `eps=` to sklearn.log_loss
   (recman/tf/core/metric.py:10), removed in sklearn>=1.5 — equivalent
   metric objects without `eps` are defined here.
3. No TensorBoardLogger (it writes ./logs; irrelevant to the numbers).
4. `ResilientLabelEncoder.transform` (reference inputs.py:128-139) assigns
   the string sentinel "-----" into the column; old pandas silently upcast
   the column to object, pandas>=2.2 raises. The monkeypatched transform
   below does the upcast EXPLICITLY and is otherwise line-for-line the
   reference's — semantics preserved exactly.

MEASURED DEFECT in the reference, preserved by default: `fit`
(inputs.py:120-126) concatenates the string sentinel onto the fitted
classes, so for int64 columns numpy upcasts `classes_` to '<U21' strings;
`transform`'s isin() then never matches an int value, and EVERY value of
every int64 SparseFeat (user_id, item_id) encodes to OOV index 0. Verified
empirically (see tools/run_reference_ml.py git history / BASELINE.md). Run
with --fix-int-encoder to patch `fit` to keep object-dtype classes (the
intended behavior: known ints -> their index, unknown -> 0), which isolates
the model-math comparison from this encoding defect.

Everything that matters — feature encoding, model, training loop, the
per-batch optimizer recreation defect, eval protocol — is the reference's
own code, imported from /root/reference and executed unmodified.

Usage: python tools/run_reference_ml.py [--frac 0.5] [--epoch 1] [--out FILE]
"""

import argparse
import json
import logging
import sys
import time

REFERENCE_ROOT = "/root/reference"


class LogLoss:
    """Reference metric.py:5-16 minus the removed sklearn `eps` kwarg."""

    higher_the_better = False

    def __call__(self, y_true, y_pred):
        from sklearn.metrics import log_loss

        import numpy as np

        # reference used eps=1e-7; clip to match its behavior exactly
        return log_loss(y_true, np.clip(y_pred, 1e-7, 1 - 1e-7))

    def __str__(self):
        return "logloss"

    __repr__ = __str__


class RocAucScore:
    """Reference metric.py:19-27."""

    higher_the_better = True

    def __call__(self, y_true, y_pred):
        from sklearn.metrics import roc_auc_score

        return roc_auc_score(y_true, y_pred)

    def __str__(self):
        return "roc_auc"

    __repr__ = __str__


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frac", type=float, default=0.5)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--lr-grid", type=float, nargs="+", default=[0.01, 0.005])
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--out", default=None, help="write results JSON here")
    ap.add_argument(
        "--fix-int-encoder",
        action="store_true",
        help="patch the reference's int64-columns-all-OOV encoder defect "
        "(substitution 4 in the module docstring)",
    )
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s %(message)s")
    log = logging.getLogger("run_reference_ml")

    sys.path.insert(0, REFERENCE_ROOT)

    import numpy as np
    import pandas as pd
    from tensorboard.plugins.hparams import api as hp

    from recman.examples.datasets.ml_100k import get_data
    from recman.examples.utils import create_ml_features
    from recman.tf import inputs as ref_inputs
    from recman.tf.BestModelFinder import BestModelFinder
    from recman.tf.core import xDeepFM
    from recman.tf.hparams import xDeepFM as HyperParams

    # substitution 4: reference transform with the object upcast old pandas
    # did implicitly (reference inputs.py:128-139, semantics identical)
    def _transform(self, X):
        if not isinstance(X, pd.Series):
            X = pd.Series(X)
        all_classes = set(self._encoder.classes_)
        copy = X.to_frame()
        col_name = copy.columns[0]
        copy[col_name] = copy[col_name].astype(object)
        copy.loc[~copy[col_name].isin(all_classes), col_name] = self.null_val
        return copy.apply(self._encoder.transform).values

    ref_inputs.ResilientLabelEncoder.transform = _transform

    # substitution 5: Keras 3 (TF 2.21) optimizers dropped the Keras-2
    # `minimize(loss_fn, var_list)` method the reference calls at
    # xDeepFM.py:126. Shim it with exactly what Keras-2 minimize did:
    # tape -> gradient -> apply_gradients, None-grads skipped. The
    # reference's fresh-optimizer-per-batch defect is preserved verbatim
    # (create_optimizer is still called once per batch).
    import tensorflow as tf

    import importlib

    ref_xdeepfm_mod = importlib.import_module("recman.tf.core.xDeepFM")
    ref_xdeepfm_mod = sys.modules["recman.tf.core.xDeepFM"]
    _orig_create_optimizer = ref_xdeepfm_mod.create_optimizer

    class _MinimizeShim:
        def __init__(self, opt):
            self._opt = opt

        def minimize(self, loss_fn, var_list):
            var_list = list(var_list)
            with tf.GradientTape() as tape:
                loss = loss_fn()
            grads = tape.gradient(loss, var_list)
            self._opt.apply_gradients(
                [(g, v) for g, v in zip(grads, var_list) if g is not None]
            )

    def _create_optimizer(optimizer, learning_rate):
        return _MinimizeShim(_orig_create_optimizer(optimizer, learning_rate))

    ref_xdeepfm_mod.create_optimizer = _create_optimizer

    if args.fix_int_encoder:
        # intended behavior: keep classes object-dtype so int values match
        def _fit(self, X, y=None):
            self._encoder.fit(X)
            self._encoder.classes_ = np.concatenate(
                (
                    np.array([self.null_val], dtype=object),
                    self._encoder.classes_.astype(object),
                ),
                axis=0,
            )
            return self

        ref_inputs.ResilientLabelEncoder.fit = _fit

    RANDOM_SEED = 2019

    # --- reference examples/utils.py:9-27 get_ml_dataset, explicit data dir ---
    df_all, df_test, domains = get_data(f"{REFERENCE_ROOT}/data")
    df_all = df_all.sample(frac=args.frac, random_state=RANDOM_SEED)
    df_test = df_test.copy()
    df_all.loc[df_all.rating < 4, "label"] = 0
    df_all.loc[df_all.rating >= 4, "label"] = 1
    df_test.loc[df_test.rating < 4, "label"] = 0
    df_test.loc[df_test.rating >= 4, "label"] = 1
    df_train = df_all.sample(frac=0.7, random_state=RANDOM_SEED)
    df_valid = df_all.drop(df_train.index)
    log.info(
        "train=%d valid=%d test=%d", len(df_train), len(df_valid), len(df_test)
    )

    # --- reference examples/xDeepFM_ml.py:25-26 ---
    df_union = pd.concat([df_train, df_valid, df_test], axis=0)
    feat_dict = create_ml_features(df_union, domains)

    # --- reference examples/xDeepFM_ml.py:28-55 ---
    hp_params = HyperParams()
    hp_params["learning_rate"](hp.Discrete(list(args.lr_grid)))
    hp_params["optimizer"](hp.Discrete(["adam"]))
    metrices = (LogLoss(), RocAucScore())
    finder = BestModelFinder()

    sessions = []
    for sess_num, hp_val in enumerate(hp_params.grid_search()):
        lr = hp_val["learning_rate"]
        log.info("session %d: lr=%s", sess_num, lr)
        model = xDeepFM(
            feat_dict,
            hp_val,
            batch_size=args.batch_size,
            metrics=metrices,
            random_seed=RANDOM_SEED,
            epoch=args.epoch,
        )
        t0 = time.time()
        model.fit(
            X_train=df_train,
            y_train=df_train["label"].values,
            X_valid=df_valid,
            y_valid=df_valid["label"].values,
            epoch_callback=finder,
            random_seed_for_mini_batch=False,
        )
        fit_s = time.time() - t0
        valid_res = model.evaluate(
            df_valid, df_valid["label"].values, training=False
        )
        sessions.append(
            {
                "lr": lr,
                "fit_seconds": round(fit_s, 1),
                "train_examples_per_sec": round(
                    args.epoch * len(df_train) / fit_s, 1
                ),
                "valid_logloss": float(valid_res[0]),
                "valid_auc": float(valid_res[1]),
            }
        )
        log.info("session %d done: %s", sess_num, sessions[-1])

    best = finder.best_model
    test_res = best.evaluate(df_test, df_test["label"].values, training=False)
    result = {
        "framework": "reference (dev-wei/recman, TF)",
        "config": {
            "frac": args.frac,
            "epoch": args.epoch,
            "batch_size": args.batch_size,
            "lr_grid": args.lr_grid,
            "seed": RANDOM_SEED,
        },
        "sessions": sessions,
        "best_lr": best.hparams["learning_rate"],
        "best_valid_score": float(finder.best_score),
        "test_logloss": float(test_res[0]),
        "test_auc": float(test_res[1]),
    }
    print(json.dumps(result, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()

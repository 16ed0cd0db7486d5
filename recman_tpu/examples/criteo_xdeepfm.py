"""xDeepFM on Criteo (real TSV or synthetic) — the scale config.

BASELINE.json configs 3-5: hashed 26-cat vocabularies, large batches.
Falls back to the deterministic synthetic Criteo generator when no TSV
path is given (zero-egress environments have no real Criteo download).

Run: python -m recman_tpu.examples.criteo_xdeepfm [--tsv path] [--rows 200000]
"""

import argparse
import logging

import numpy as np

import recman_tpu
from recman_tpu.data import (
    calibrated_criteo_arrays,
    create_criteo_features,
    load_criteo_tsv,
    synthetic_criteo_arrays,
)
from recman_tpu.models import XDeepFM
from recman_tpu.training import LogLoss, RocAucScore, StreamingAUC, Trainer

log = logging.getLogger(__name__)


def main(tsv=None, rows=200_000, num_buckets=100_000, epoch=1, batch_size=4096,
         learning_rate=0.001, embedding_size=16, native=True,
         optimizer="adam", calibrated=False, large_batch=False):
    """``large_batch=True`` applies the measured config-5 recipe
    (BASELINE.md round-4 resolution): batch 65,536 with SQRT-scaled
    peak LR, 12-step warmup and cosine decay on plain Adam — at equal
    step counts over fresh data this EXCEEDED the batch-8192 anchor by
    +0.020 AUC (0.8359 vs 0.8155) while training at 925k ex/s/chip.
    Feed it proportionally more rows (it consumes ~8x per step)."""
    recman_tpu.config_logger()
    feat_dict = create_criteo_features(num_buckets=num_buckets)

    if tsv:
        data = None
        if native:
            # one multithreaded C++ pass straight to encoded arrays
            # (12.5x the pandas route, hash-identical — data/native_loader.py)
            try:
                from recman_tpu.data import load_criteo_tsv_native

                data = load_criteo_tsv_native(
                    tsv, num_buckets=num_buckets, max_rows=rows
                )
            except Exception as e:  # no g++ toolchain: python fallback
                log.warning("native parser unavailable (%s); pandas path", e)
        if data is None:
            raw = load_criteo_tsv(tsv, max_rows=rows)
            y = raw.pop("y")
            data = feat_dict.transform(raw, y=y)
    elif calibrated:
        # published-stats-calibrated generator (data/criteo.py): Kaggle
        # per-field cardinalities + missing rates, Bayes-optimal AUC
        # ~0.8413 by construction — the quality-anchor proxy while real
        # Criteo is egress-blocked (BASELINE.md round-3 note)
        data = calibrated_criteo_arrays(rows, num_buckets=num_buckets)
    else:
        data = synthetic_criteo_arrays(rows, num_buckets=num_buckets)

    n = len(data["y"])
    split = int(n * 0.9)
    train = {k: v[:split] for k, v in data.items()}
    valid = {k: v[split:] for k, v in data.items()}
    y_valid = valid.pop("y")

    if large_batch:
        from recman_tpu.training.lr_schedule import (
            sqrt_scaled_lr,
            warmup_schedule,
        )
        from recman_tpu.training.train_step import create_optimizer

        if batch_size <= 4096:  # the argparse default — bump to config 5
            batch_size = 65_536
        total_steps = (split // batch_size + 1) * epoch
        peak = sqrt_scaled_lr(learning_rate, batch_size, base_batch_size=8192)
        optimizer = create_optimizer(
            optimizer if isinstance(optimizer, str) else "adam",
            warmup_schedule(peak, min(12, max(total_steps // 10, 1)),
                            total_steps, decay="cosine"),
        )
        log.info("large-batch recipe: batch=%d, sqrt-scaled peak lr=%.2e, "
                 "warmup+cosine over %d steps", batch_size, peak, total_steps)

    hp = {
        "learning_rate": learning_rate,
        "optimizer": optimizer,  # "rowwise_adam" = the DLRM-style recipe
        "embedding_size": embedding_size,
        "cin_cross_layer_units": (100, 100),
        "cin_dropout": (1, 1, 1),
        "deep_hidden_units": (400, 400),
        "deep_dropout": (1.0, 1.0, 1.0),
    }
    model = XDeepFM(feat_dict, hp)
    trainer = Trainer(
        model, hp, metrics=(LogLoss(), StreamingAUC()), epoch=epoch,
        batch_size=batch_size, random_seed=2019,
    )
    trainer.fit(train, train["y"])
    res = trainer.evaluate(valid, y_valid)
    kind = "" if tsv else (" (calibrated synthetic)" if calibrated
                           else " (synthetic)")
    log.info("Criteo%s: VALID logloss=%.4f auc=%.4f", kind, res[0], res[1])
    return trainer, res


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--tsv", default=None)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--buckets", type=int, default=100_000)
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("--batch-size", type=int, default=4096)
    ap.add_argument("--no-native", action="store_true",
                    help="force the pandas TSV path")
    ap.add_argument("--optimizer", default="adam",
                    help="adam | rowwise_adam | adagrad | lamb | ...")
    ap.add_argument("--calibrated", action="store_true",
                    help="published-stats-calibrated synthetic generator "
                         "(Bayes AUC ~0.8413) instead of the bench one")
    ap.add_argument("--large-batch", action="store_true",
                    help="the config-5 recipe: batch 65,536 + sqrt-scaled "
                         "warmup/cosine Adam (BASELINE.md round-4 "
                         "resolution); pass --rows proportionally more")
    args = ap.parse_args()
    main(tsv=args.tsv, rows=args.rows, num_buckets=args.buckets,
         epoch=args.epoch, batch_size=args.batch_size,
         native=not args.no_native, optimizer=args.optimizer,
         calibrated=args.calibrated, large_batch=args.large_batch)

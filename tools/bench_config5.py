"""Config-5 large-batch QUALITY sweep (VERDICT r3 item 2).

Task: 2,097,152 synthetic Criteo rows, 90/10 split, xDeepFM headline
config. Anchor: batch 8192, adam 1e-3, 1 epoch. Candidates: batch 65,536
at EQUAL STEP COUNT (8 epochs — 29 steps/epoch vs the anchor's 231),
sweeping the recipe dimensions the round-3 study left on the table:

- peak LR grid spanning sqrt-scaling (2.8e-3) to linear scaling (8e-3)
- warmup length
- LAMB everywhere vs LAMB-with-exclusions (plain Adam on 1-D vocab
  vectors and embedding tables — training.lr_schedule.lamb_partitioned)
- plain Adam at the same schedules
- equal-token 16-epoch variants of the best configs

All runs share one process (Mosaic kernels compile once); results print
as JSON lines. Target: VALID AUC within 0.005 of the anchor.

Usage: python tools/bench_config5.py [--rows 2097152] [--skip-anchor]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 65_536


def run_one(name, train, valid, y_valid, feat_dict, optimizer, epochs,
            batch_size, lr_for_hp=1e-3):
    import jax

    from recman_tpu.models import XDeepFM
    from recman_tpu.training import LogLoss, StreamingAUC, Trainer

    hp = {
        "learning_rate": lr_for_hp,
        "optimizer": optimizer,
        "embedding_size": 16,
        "cin_cross_layer_units": (100, 100),
        "cin_dropout": (1, 1, 1),
        "deep_hidden_units": (400, 400),
        "deep_dropout": (1.0, 1.0, 1.0),
    }
    model = XDeepFM(feat_dict, hp)
    trainer = Trainer(
        model, hp, metrics=(LogLoss(), StreamingAUC()), epoch=epochs,
        batch_size=batch_size, random_seed=2019,
    )
    t0 = time.perf_counter()
    trainer.fit(train, train["y"], random_seed_for_mini_batch=False)
    res = trainer.evaluate(valid, y_valid)
    rec = {
        "config": name,
        "batch": batch_size,
        "epochs": epochs,
        "valid_logloss": round(float(res[0]), 4),
        "valid_auc": round(float(res[1]), 4),
        "wall_s": round(time.perf_counter() - t0, 1),
    }
    print(json.dumps(rec), flush=True)
    del trainer, model
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_097_152)
    ap.add_argument("--skip-anchor", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma list of config-name substrings to run")
    args = ap.parse_args()

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.training.lr_schedule import (
        lamb_partitioned,
        warmup_schedule,
    )
    from recman_tpu.training.train_step import create_optimizer

    feat_dict = create_criteo_features(num_buckets=100_000)
    data = synthetic_criteo_arrays(args.rows, num_buckets=100_000, seed=2019)
    n = len(data["y"])
    split = int(n * 0.9)
    train = {k: v[:split] for k, v in data.items()}
    valid = {k: v[split:] for k, v in data.items()}
    y_valid = valid.pop("y")

    steps_per_epoch = split // BATCH + 1
    total8 = 8 * steps_per_epoch
    total16 = 16 * steps_per_epoch

    def sched(peak, warmup, total):
        return warmup_schedule(peak, warmup, total, decay="cosine")

    configs = []
    if not args.skip_anchor:
        configs.append(("anchor_b8192_adam_1e-3_1ep",
                        lambda: create_optimizer("adam", 1e-3), 1, 8192))
    grid = [
        # adam peak sweep, warmup 12 (r1 recipe used linear-scaled 8e-3)
        ("adam_p2e-3_w12_8ep", lambda: create_optimizer(
            "adam", sched(2e-3, 12, total8)), 8, BATCH),
        ("adam_p2.8e-3_w12_8ep", lambda: create_optimizer(
            "adam", sched(2.8e-3, 12, total8)), 8, BATCH),
        ("adam_p4e-3_w12_8ep", lambda: create_optimizer(
            "adam", sched(4e-3, 12, total8)), 8, BATCH),
        ("adam_p8e-3_w12_8ep", lambda: create_optimizer(
            "adam", sched(8e-3, 12, total8)), 8, BATCH),
        # warmup sweep at the sqrt-scaled peak
        ("adam_p2.8e-3_w29_8ep", lambda: create_optimizer(
            "adam", sched(2.8e-3, 29, total8)), 8, BATCH),
        # lamb everywhere (round-1 recipe re-baselined on this task)
        ("lamb_p8e-3_w12_8ep", lambda: create_optimizer(
            "lamb", sched(8e-3, 12, total8)), 8, BATCH),
        # lamb with exclusions: adam on tables + 1-D
        ("lambX_p8e-3_w12_8ep", lambda: lamb_partitioned(
            sched(8e-3, 12, total8)), 8, BATCH),
        ("lambX_p4e-3_w12_8ep", lambda: lamb_partitioned(
            sched(4e-3, 12, total8)), 8, BATCH),
        ("lambX_p2.8e-3_w12_8ep", lambda: lamb_partitioned(
            sched(2.8e-3, 12, total8)), 8, BATCH),
        # equal-token x2: 16 epochs at the sqrt-scaled adam peak
        ("adam_p2.8e-3_w12_16ep", lambda: create_optimizer(
            "adam", sched(2.8e-3, 12, total16)), 16, BATCH),
    ]
    configs += grid

    only = ([s.strip() for s in args.only.split(",")]
            if args.only else None)
    results = []
    for name, make_opt, epochs, bs in configs:
        if only and not any(s in name for s in only):
            continue
        results.append(run_one(
            name, train, valid, y_valid, feat_dict, make_opt(), epochs, bs
        ))

    print("\n== summary ==")
    for r in sorted(results, key=lambda r: -r["valid_auc"]):
        print(f"{r['config']:32s} logloss {r['valid_logloss']:.4f}  "
              f"auc {r['valid_auc']:.4f}  ({r['wall_s']}s)")


if __name__ == "__main__":
    main()

"""Config-5 follow-up: FRESH-DATA equal-step comparison (the regime big
batches exist for), plus a regularized equal-step probe.

Finding from tools/bench_config5.py (BASELINE.md round-4 config-5
table): at batch 65,536 with EQUAL STEPS on the fixed 1.9M-row training
set, every recipe overfits — the model sees the data 8x (adam peaks
below 8e-3 are WORSE: less gradient noise, more memorization; LAMB with
exclusions is best at 0.5862/0.7998 vs anchor 0.8155). The production
rationale for large batches is consuming MORE data per unit time, so
the apples-to-apples test is equal STEPS with each config seeing its
own batch-size worth of FRESH rows, one pass, same held-out valid set:

  anchor:  batch 8192,  rows[0 : 231*8192  = 1.89M], 1 epoch (231 steps)
  config5: batch 65536, rows[0 : 231*65536 = 15.1M], 1 epoch (231 steps)
  valid:   the LAST 262,144 rows of a 15.4M-row draw (disjoint from both)

Done criterion (VERDICT r3 item 2): a 65,536 config within 0.005 AUC of
the anchor — or the documented sweep grid as a negative result.

Usage: python tools/bench_config5b.py [--out /tmp/config5b.jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 65_536
STEPS = 231  # the anchor's step count (1.89M / 8192)
VALID_ROWS = 262_144


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--only", default=None)
    ap.add_argument("--b128k", action="store_true",
                    help="add the batch-131,072 fresh-data configs "
                    "(VERDICT r4 item 5: does sqrt LR scaling hold at "
                    "128k?); grows the generated dataset to ~30.5M rows")
    args = ap.parse_args()
    out_f = open(args.out, "a") if args.out else None

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import LogLoss, StreamingAUC, Trainer
    from recman_tpu.training.lr_schedule import (
        lamb_partitioned,
        warmup_schedule,
    )
    from recman_tpu.training.train_step import create_optimizer

    feat_dict = create_criteo_features(num_buckets=100_000)
    rows_big = STEPS * BATCH  # 15.1M fresh training rows
    rows_128k = STEPS * 131_072  # 30.3M
    total = (rows_128k if args.b128k else rows_big) + VALID_ROWS
    print(f"generating {total:,} rows...", flush=True)
    data = synthetic_criteo_arrays(total, num_buckets=100_000, seed=2019)
    valid = {k: v[total - VALID_ROWS:] for k, v in data.items()}
    y_valid = valid.pop("y")

    def sched(peak, warmup, total_steps=STEPS):
        return warmup_schedule(peak, warmup, total_steps, decay="cosine")

    def run(name, optimizer, batch_size, rows, epochs=1, hp_extra=None):
        hp = {
            "learning_rate": 1e-3,
            "optimizer": optimizer,
            "embedding_size": 16,
            "cin_cross_layer_units": (100, 100),
            "cin_dropout": (1, 1, 1),
            "deep_hidden_units": (400, 400),
            "deep_dropout": (1.0, 1.0, 1.0),
            **(hp_extra or {}),
        }
        model = XDeepFM(feat_dict, hp)
        trainer = Trainer(
            model, hp, metrics=(LogLoss(), StreamingAUC()), epoch=epochs,
            batch_size=batch_size, random_seed=2019,
        )
        train = {k: v[:rows] for k, v in data.items()}
        t0 = time.perf_counter()
        trainer.fit(train, train["y"], random_seed_for_mini_batch=False)
        res = trainer.evaluate(valid, y_valid)
        rec = {
            "config": name, "batch": batch_size, "train_rows": rows,
            "epochs": epochs,
            "valid_logloss": round(float(res[0]), 4),
            "valid_auc": round(float(res[1]), 4),
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        print(json.dumps(rec), flush=True)
        if out_f:
            out_f.write(json.dumps(rec) + "\n")
            out_f.flush()
        del trainer, model, train
        return rec

    small = STEPS * 8192
    configs = [
        ("anchor_b8192_adam1e-3_fresh1.9M",
         lambda: create_optimizer("adam", 1e-3), 8192, small, 1, None),
        ("b64k_adam_p2.8e-3_w12_fresh15M",
         lambda: create_optimizer("adam", sched(2.8e-3, 12)), BATCH,
         rows_big, 1, None),
        ("b64k_adam_p8e-3_w12_fresh15M",
         lambda: create_optimizer("adam", sched(8e-3, 12)), BATCH,
         rows_big, 1, None),
        ("b64k_lambX_p4e-3_w12_fresh15M",
         lambda: lamb_partitioned(sched(4e-3, 12)), BATCH, rows_big, 1, None),
        ("b64k_lamb_p8e-3_w12_fresh15M",
         lambda: create_optimizer("lamb", sched(8e-3, 12)), BATCH,
         rows_big, 1, None),
        # regularized equal-step probe on the SMALL set (8 passes): does
        # live dropout recover what fresh data gives?
        ("b64k_lambX_p4e-3_drop0.9_8ep_1.9M",
         lambda: lamb_partitioned(sched(4e-3, 12)), BATCH, small, 8,
         {"deep_dropout": (0.9, 0.9, 0.9), "cin_dropout": (0.9, 0.9, 0.9)}),
    ]
    if args.b128k:
        # the 128k row of the envelope (VERDICT r4 item 5): sqrt scaling
        # from the 8192 anchor gives peak 1e-3*sqrt(16) = 4e-3; linear
        # gives 1.6e-2 (the 64k sweep's pattern: sqrt > linear > lamb)
        configs += [
            ("b128k_adam_sqrt_p4e-3_w12_fresh30M",
             lambda: create_optimizer("adam", sched(4e-3, 12)), 131_072,
             rows_128k, 1, None),
            ("b128k_adam_lin_p1.6e-2_w12_fresh30M",
             lambda: create_optimizer("adam", sched(1.6e-2, 12)), 131_072,
             rows_128k, 1, None),
        ]
    only = [s.strip() for s in args.only.split(",")] if args.only else None
    results = []
    for name, mk, bs, rows, epochs, extra in configs:
        if only and not any(s in name for s in only):
            continue
        results.append(run(name, mk(), bs, rows, epochs, extra))

    print("\n== summary ==")
    for r in sorted(results, key=lambda r: -r["valid_auc"]):
        print(f"{r['config']:40s} logloss {r['valid_logloss']:.4f}  "
              f"auc {r['valid_auc']:.4f}")


if __name__ == "__main__":
    main()

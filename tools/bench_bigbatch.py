"""Large-batch single-chip scaling on the CURRENT default step.

BASELINE.md's round-1 large-batch rows (431k/457k/482k at 16k/32k/64k)
predate the field-major CIN kernel and the dispatch unroll; this
re-measures them, then runs the 2M-row quality check at batch 16384
with the linear-scaled LR to confirm the larger batch keeps the anchor
(0.523 / 0.8144 at batch 8192).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import NUM_BUCKETS
from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
from recman_tpu.models import XDeepFM
from recman_tpu.training import create_optimizer, init_state
from recman_tpu.training.train_step import (
    TrainState,
    make_train_step_stacked,
    make_train_step_unrolled,
    pack_dataset,
    stack_table_params,
)
from recman_tpu.training.trainer import batch_indices

UNROLL = 2  # fewer dispatches matter less at 30+ ms steps; 2 keeps
# compile time and HBM for the 64k activations in check


def main(batches=(16_384, 32_768, 65_536), quality=True, cin_remat=False,
         per_table=False):
    feat_dict = create_criteo_features(num_buckets=NUM_BUCKETS)
    model = XDeepFM(
        feat_dict,
        {
            "embedding_size": 16,
            "cin_cross_layer_units": (100, 100),
            "cin_dropout": (1, 1, 1),
            "deep_hidden_units": (400, 400),
            "deep_dropout": (1.0, 1.0, 1.0),
            "cin_remat": cin_remat,
        },
    )
    rows = 262_144
    data = synthetic_criteo_arrays(rows, num_buckets=NUM_BUCKETS, seed=2019)
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}

    for batch in batches:
        opt = create_optimizer("adam", 1e-3)
        state = init_state(model, opt, jax.random.PRNGKey(0))
        # stacked table storage is the product default (BASELINE.md
        # round-5 trajectory); --per-table measures the old form
        names = None if per_table else model.packed.stackable()
        if names:
            params_s, names = stack_table_params(model, state.params)
            state = TrainState(
                params_s, opt.init(params_s), state.step, state.rng
            )
            step = make_train_step_stacked(model, opt, UNROLL, names)
        else:
            step = make_train_step_unrolled(model, opt, UNROLL)
        idx_mat = batch_indices(rows, batch, shuffle_seed=0)
        idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
        packs = [
            jnp.asarray(idx_mat[(i * UNROLL) % len(idx_mat):][:UNROLL])
            for i in range(len(idx_mat) // UNROLL)
        ]
        for i in range(2):
            state, losses = step(state, data, packs[i % len(packs)], layout)
        float(losses[-1])
        n_dispatch = max(16 // UNROLL, 4)
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            state, losses = step(state, data, packs[i % len(packs)], layout)
        float(losses[-1])
        elapsed = time.perf_counter() - t0
        steps = n_dispatch * UNROLL
        print(json.dumps({
            "batch": batch,
            "examples_per_sec": round(steps * batch / elapsed, 1),
            "ms_per_step": round(1e3 * elapsed / steps, 2),
        }), flush=True)
        del state, step, packs
    del data

    if not quality:
        return
    # quality at batch 16384, linear-scaled LR (2x), 1 epoch, 2M rows
    from recman_tpu.examples.criteo_xdeepfm import main as criteo_main

    _, res = criteo_main(rows=2_097_152, epoch=1, batch_size=16_384,
                         learning_rate=2e-3)
    print(json.dumps({
        "quality": "adam_b16384_lr2e-3_2M_synthetic",
        "valid_logloss": round(float(res[0]), 4),
        "valid_auc": round(float(res[1]), 4),
        "anchor_b8192": {"logloss": 0.523, "auc": 0.8144},
    }), flush=True)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+",
                    default=[16_384, 32_768, 65_536])
    ap.add_argument("--no-quality", action="store_true")
    ap.add_argument("--cin-remat", action="store_true",
                    help="full-layer CIN remat (needed at batch 131072)")
    ap.add_argument("--per-table", action="store_true",
                    help="per-table table storage (the pre-round-5 default)")
    args = ap.parse_args()
    main(batches=tuple(args.batches), quality=not args.no_quality,
         cin_remat=args.cin_remat, per_table=args.per_table)

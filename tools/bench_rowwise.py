"""One TPU session: rowwise-Adam perf vs plain Adam (both at 4-step
dispatch unroll) + the 2M-row synthetic-Criteo quality gate.

Perf: bench.py config. Quality: the BASELINE.md "End-to-end Trainer
validation at scale" config (2,097,152 rows, 1 epoch, batch 8192) whose
plain-adam anchor is valid logloss 0.523 / AUC 0.8144 — the rowwise
recipe must land within noise of that to be eligible as a default.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp

from bench import BATCH_SIZE, MEASURE_STEPS, N_ROWS, NUM_BUCKETS, WARMUP_STEPS
from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
from recman_tpu.models import XDeepFM
from recman_tpu.training import create_optimizer, init_state
from recman_tpu.training.train_step import (
    make_train_step_unrolled,
    pack_dataset,
)
from recman_tpu.training.trainer import batch_indices

UNROLL = 4


def perf(model, data, layout, idx_mat, opt_name):
    opt = create_optimizer(opt_name, 1e-3)
    state = init_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step_unrolled(model, opt, UNROLL)
    packs = [
        jnp.asarray(idx_mat[(i * UNROLL) % len(idx_mat):][:UNROLL])
        for i in range(len(idx_mat) // UNROLL)
    ]
    for i in range(2):
        state, losses = step(state, data, packs[i % len(packs)], layout)
    float(losses[-1])
    n_dispatch = MEASURE_STEPS // UNROLL
    t0 = time.perf_counter()
    for i in range(n_dispatch):
        state, losses = step(state, data, packs[i % len(packs)], layout)
    float(losses[-1])
    elapsed = time.perf_counter() - t0
    steps = n_dispatch * UNROLL
    print(json.dumps({
        "variant": f"unroll{UNROLL}_{opt_name}",
        "examples_per_sec": round(steps * BATCH_SIZE / elapsed, 1),
        "ms_per_step": round(1e3 * elapsed / steps, 2),
    }), flush=True)
    del state


def main():
    feat_dict = create_criteo_features(num_buckets=NUM_BUCKETS)
    model = XDeepFM(
        feat_dict,
        {
            "embedding_size": 16,
            "cin_cross_layer_units": (100, 100),
            "cin_dropout": (1, 1, 1),
            "deep_hidden_units": (400, 400),
            "deep_dropout": (1.0, 1.0, 1.0),
        },
    )
    data = synthetic_criteo_arrays(N_ROWS, num_buckets=NUM_BUCKETS, seed=2019)
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    idx_mat = batch_indices(N_ROWS, BATCH_SIZE, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]

    import sys as _sys

    variants = _sys.argv[1:] or ["adam", "rowwise_adam"]
    for v in variants:
        perf(model, data, layout, idx_mat, v)
    del data

    # quality gate: 2M rows, 1 epoch, batch 8192 (anchor 0.523 / 0.8144)
    from recman_tpu.examples.criteo_xdeepfm import main as criteo_main

    t0 = time.perf_counter()
    qual_opt = variants[-1] if variants else "rowwise_adam"
    _, res = criteo_main(rows=2_097_152, epoch=1, batch_size=8192,
                         optimizer=qual_opt)
    print(json.dumps({
        "quality": f"{qual_opt}_2M_synthetic",
        "valid_logloss": round(float(res[0]), 4),
        "valid_auc": round(float(res[1]), 4),
        "anchor": {"logloss": 0.523, "auc": 0.8144},
        "wall_s": round(time.perf_counter() - t0, 1),
    }), flush=True)


if __name__ == "__main__":
    main()

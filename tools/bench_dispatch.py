"""Measure dispatch-batching and optimizer-precision variants on the TPU.

Variants (same model/data/config as bench.py):
  1. standard 1-step dispatch (the bench default; sanity anchor)
  2. make_train_step_unrolled(2) — two steps per dispatch
  3. make_train_step_unrolled(4)
  4. standard step with optax.adam(mu_dtype=bfloat16) — halves the first-
     moment read+write traffic of the dense Adam sweep (quality-gated
     before any default change)

Prints one JSON line per variant. One process = one compile session;
Mosaic kernels are shared across variants (same shapes).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, __import__("os").path.dirname(
    __import__("os").path.dirname(__import__("os").path.abspath(__file__))))

import jax
import jax.numpy as jnp
import optax

from bench import BATCH_SIZE, MEASURE_STEPS, N_ROWS, NUM_BUCKETS, WARMUP_STEPS
from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
from recman_tpu.models import XDeepFM
from recman_tpu.training import create_optimizer, init_state
from recman_tpu.training.train_step import (
    make_train_step,
    make_train_step_unrolled,
    pack_dataset,
)
from recman_tpu.training.trainer import batch_indices


def build():
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
    return model, data, layout, idx_mat


def measure(name, run_steps, total_steps):
    t0 = time.perf_counter()
    loss = run_steps()
    float(loss)  # device->host sync (block_until_ready is a no-op here)
    elapsed = time.perf_counter() - t0
    eps = total_steps * BATCH_SIZE / elapsed
    print(json.dumps({
        "variant": name,
        "examples_per_sec": round(eps, 1),
        "ms_per_step": round(1e3 * elapsed / total_steps, 2),
    }), flush=True)
    return eps


def main():
    model, data, layout, idx_mat = build()
    idx = [jnp.asarray(row) for row in idx_mat]

    results = {}

    # 1) standard 1-step
    opt = create_optimizer("adam", 1e-3)
    state = init_state(model, opt, jax.random.PRNGKey(0))
    step = make_train_step(model, opt)
    for i in range(WARMUP_STEPS):
        state, loss = step(state, data, idx[i % len(idx)], layout)
    float(loss)

    def run1():
        nonlocal state
        for i in range(MEASURE_STEPS):
            state, loss = step(state, data, idx[i % len(idx)], layout)
        return loss

    results["standard"] = measure("standard_1step", run1, MEASURE_STEPS)
    del state

    # 2/3) unrolled
    for unroll in (2, 4):
        opt = create_optimizer("adam", 1e-3)
        ustate = init_state(model, opt, jax.random.PRNGKey(0))
        ustep = make_train_step_unrolled(model, opt, unroll)
        pairs = [
            jnp.asarray(idx_mat[(i * unroll) % len(idx_mat):][:unroll])
            for i in range(len(idx_mat) // unroll)
        ]
        for i in range(max(WARMUP_STEPS // unroll, 2)):
            ustate, losses = ustep(ustate, data, pairs[i % len(pairs)], layout)
        float(losses[-1])
        n_dispatch = MEASURE_STEPS // unroll

        def run_u():
            nonlocal ustate
            for i in range(n_dispatch):
                ustate, losses = ustep(
                    ustate, data, pairs[i % len(pairs)], layout
                )
            return losses[-1]

        results[f"unroll{unroll}"] = measure(
            f"unrolled_{unroll}step", run_u, n_dispatch * unroll
        )
        del ustate

    # 4) bf16 first-moment Adam
    opt = optax.adam(1e-3, mu_dtype=jnp.bfloat16)
    bstate = init_state(model, opt, jax.random.PRNGKey(0))
    bstep = make_train_step(model, opt)
    for i in range(WARMUP_STEPS):
        bstate, loss = bstep(bstate, data, idx[i % len(idx)], layout)
    float(loss)

    def run_b():
        nonlocal bstate
        for i in range(MEASURE_STEPS):
            bstate, loss = bstep(bstate, data, idx[i % len(idx)], layout)
        return loss

    results["bf16_mu"] = measure("adam_bf16_mu_1step", run_b, MEASURE_STEPS)

    best = max(results, key=results.get)
    print(json.dumps({"best": best,
                      "speedup_vs_standard":
                          round(results[best] / results["standard"], 4)}))


if __name__ == "__main__":
    main()

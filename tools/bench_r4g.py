"""Round-4 ABAB bench #7: bf16 forward packed rows (quality-gated opt-in).

  A    f32 packed matrices (default)
  B16  ops.embedding.PACKED_FWD_BF16 — packed [table|w] matrices cast to
       bf16 before the forward gathers (halves packed-path bytes end to
       end; grads re-enter f32 at the cast's vjp)

Then a 2M-row synthetic quality run with the flag ON (the anchor is
0.523/0.8144; trajectories differ from f32, so the flag ships opt-in
regardless — this measures how much quality moves).

Usage: python tools/bench_r4g.py [--rounds 4] [--dispatches 8] [--skip-quality]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--skip-quality", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.ops import embedding as emb
    from recman_tpu.training import create_optimizer, init_state
    from recman_tpu.training.train_step import (
        make_train_step_unrolled,
        pack_dataset,
    )
    from recman_tpu.training.trainer import batch_indices

    UNROLL = 4
    feat_dict = create_criteo_features(num_buckets=bench.NUM_BUCKETS)
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
    data = synthetic_criteo_arrays(
        bench.N_ROWS, num_buckets=bench.NUM_BUCKETS, seed=2019
    )
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    optimizer = create_optimizer("adam", 1e-3)

    idx_mat = batch_indices(bench.N_ROWS, bench.BATCH_SIZE, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
    packs = [
        jnp.asarray(idx_mat[(i * UNROLL) % len(idx_mat):][:UNROLL])
        for i in range(len(idx_mat) // UNROLL)
    ]

    VARIANTS = {"A": False, "B16": True}
    steps, states = {}, {}
    for name, flag in VARIANTS.items():
        step = make_train_step_unrolled(model, optimizer, UNROLL)
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        emb.PACKED_FWD_BF16 = flag
        t0 = time.perf_counter()
        state, losses = step(state, data, packs[0], layout)
        float(losses[-1])
        emb.PACKED_FWD_BF16 = "auto"
        print(f"variant {name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        steps[name], states[name] = step, state

    results = {n: [] for n in VARIANTS}
    for r in range(args.rounds):
        for name in VARIANTS:
            step, state = steps[name], states[name]
            state, losses = step(state, data, packs[1], layout)
            float(losses[-1])
            t0 = time.perf_counter()
            for i in range(args.dispatches):
                state, losses = step(state, data, packs[i % len(packs)], layout)
            float(losses[-1])
            dt = time.perf_counter() - t0
            states[name] = state
            n_steps = args.dispatches * UNROLL
            exps = n_steps * bench.BATCH_SIZE / dt
            results[name].append(exps)
            print(f"round {r} {name}: {exps:,.0f} ex/s "
                  f"({dt / n_steps * 1e3:.2f} ms/step)", flush=True)

    import statistics

    print("\n== summary (median of rounds) ==")
    for name in VARIANTS:
        med = statistics.median(results[name])
        print(f"{name}: median {med:,.0f} ex/s  runs="
              f"{[f'{x/1e3:.1f}k' for x in results[name]]}")

    if args.skip_quality:
        return
    del steps, states, data
    emb.PACKED_FWD_BF16 = True
    try:
        from recman_tpu.examples.criteo_xdeepfm import main as criteo_main

        _, res = criteo_main(rows=2_097_152, epoch=1, batch_size=8192,
                             learning_rate=1e-3)
        print(json.dumps({
            "quality": "bf16_fwd_2M_synthetic_b8192",
            "valid_logloss": round(float(res[0]), 4),
            "valid_auc": round(float(res[1]), 4),
            "anchor": {"logloss": 0.523, "auc": 0.8144},
        }), flush=True)
    finally:
        emb.PACKED_FWD_BF16 = "auto"


if __name__ == "__main__":
    main()

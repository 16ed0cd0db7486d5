"""Round-4 ABAB bench: packed-lookup forward/permute variants, one process.

Variants of the standard bench step (xDeepFM, b=8192, 4-step unroll):

  A  concat + batched permute      (round-3 default)
  B  concat + PER-TABLE permute    (PERMUTE_BATCHED_MAX_N=0)
  C  SPLIT forward + batched permute
  D  SPLIT forward + per-table permute

Motivation (profile 2026-08-21, 12.30 ms device-busy): the packed
(V, 17) concat costs 0.63 ms and forces a 1.0 ms column->row relayout
before the forward gathers; the ONE batched cotangent permute runs at
5.8 ns/row while the 26 concurrent per-table forward gathers hit
1.6 ns/row. All four step functions are compiled in one process
(Mosaic remote compiles amortize) and timed interleaved round-robin,
several rounds, so tunnel drift cancels.

Usage: python tools/bench_r4.py [--rounds 4] [--dispatches 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--dispatches", type=int, default=8)
    ap.add_argument("--variants", default="A,B,C,D")
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

    VARIANTS = {
        "A": dict(split="off", permute_max=emb.PERMUTE_BATCHED_MAX_N),
        "B": dict(split="off", permute_max=0),
        "C": dict(split="on", permute_max=emb.PERMUTE_BATCHED_MAX_N),
        "D": dict(split="on", permute_max=0),
    }
    names = [v.strip() for v in args.variants.split(",")]
    default_permute_max = emb.PERMUTE_BATCHED_MAX_N

    steps, states = {}, {}
    for name in names:
        cfg = VARIANTS[name]
        step = make_train_step_unrolled(model, optimizer, UNROLL)
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        # contexts are consulted at TRACE time: run the compile call inside
        emb.PERMUTE_BATCHED_MAX_N = cfg["permute_max"]
        t0 = time.perf_counter()
        with emb.split_lookup(cfg["split"]):
            state, losses = step(state, data, packs[0], layout)
            float(losses[-1])
        emb.PERMUTE_BATCHED_MAX_N = default_permute_max
        print(f"variant {name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        steps[name], states[name] = step, state

    results = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            step, state = steps[name], states[name]
            # re-warm (donation keeps buffers hot)
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

    print("\n== summary (median of rounds) ==")
    import statistics

    for name in names:
        med = statistics.median(results[name])
        print(f"{name}: median {med:,.0f} ex/s  runs="
              f"{[f'{x/1e3:.1f}k' for x in results[name]]}")


if __name__ == "__main__":
    main()

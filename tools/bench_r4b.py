"""Round-4 ABAB bench #2: unpadded segmat out_shape x dispatch unroll.

  A   padded out + slice (default), UNROLL=4
  U   SEGMAT_UNPADDED_OUT=True,     UNROLL=4
  A8  padded out + slice,           UNROLL=8
  U8  SEGMAT_UNPADDED_OUT=True,     UNROLL=8

Motivation (profile 2026-08-21 post-permute-flip): the (26,17,100352)
-> (100001,17) lane slice costs 0.63 ms/step; the host/dispatch gap is
~1.0 ms at UNROLL=4.

Usage: python tools/bench_r4b.py [--rounds 4] [--steps 32]
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
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--variants", default="A,U,A8,U8")
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

    VARIANTS = {
        "A": dict(unpadded=False, unroll=4),
        "U": dict(unpadded=True, unroll=4),
        "A8": dict(unpadded=False, unroll=8),
        "U8": dict(unpadded=True, unroll=8),
    }
    names = [v.strip() for v in args.variants.split(",")]

    steps, states, packs_by = {}, {}, {}
    for name in names:
        cfg = VARIANTS[name]
        unroll = cfg["unroll"]
        packs = [
            jnp.asarray(idx_mat[(i * unroll) % len(idx_mat):][:unroll])
            for i in range(len(idx_mat) // unroll)
        ]
        step = make_train_step_unrolled(model, optimizer, unroll)
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        emb.SEGMAT_UNPADDED_OUT = cfg["unpadded"]
        t0 = time.perf_counter()
        state, losses = step(state, data, packs[0], layout)
        float(losses[-1])
        emb.SEGMAT_UNPADDED_OUT = False
        print(f"variant {name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        steps[name], states[name], packs_by[name] = step, state, packs

    results = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            step, state, packs = steps[name], states[name], packs_by[name]
            unroll = VARIANTS[name]["unroll"]
            n_disp = max(args.steps // unroll, 1)
            state, losses = step(state, data, packs[0], layout)
            float(losses[-1])
            t0 = time.perf_counter()
            for i in range(n_disp):
                state, losses = step(state, data, packs[i % len(packs)], layout)
            float(losses[-1])
            dt = time.perf_counter() - t0
            states[name] = state
            n_steps = n_disp * unroll
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

"""Round-5 ABAB bench #1: stacked (T, V, k) table storage vs per-table.

  A   default: 26 per-table (V, 16) leaves, UNROLL=8
  S   stacked: one (26, V, 16) leaf (ops.embedding.stacked_tables),
      UNROLL=8

Motivation (final round-4 profile, 9.18 ms busy): the table Adam sweep
runs as 26 separate fusions at ~0.09 ms each vs a ~0.055 ms bandwidth
floor — ~0.9 ms of per-fusion fixed overhead — and the batched segmat
grad is split 26 ways only to feed those 26 fusions. Stacked storage
makes the sweep ONE fusion and the grad flow unsplit; forward gathers
stay per-table (slices of the stack) per the round-4 permute
measurement. The segmat kernel signature is unchanged (same T/C/vocab),
so Mosaic compiles come from cache.

Usage: python tools/bench_r5a.py [--rounds 4] [--steps 64]
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
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--variants", default="A,S")
    ap.add_argument("--unroll", type=int, default=8)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench
    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import create_optimizer, init_state
    from recman_tpu.training.train_step import (
        STACKED_KEY,
        TrainState,
        make_train_step_stacked,
        make_train_step_unrolled,
        pack_dataset,
        stack_table_params,
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

    def make_packs(unroll):
        return [
            jnp.asarray(idx_mat[(i * unroll) % len(idx_mat):][:unroll])
            for i in range(max(len(idx_mat) // unroll, 1))
        ]

    from recman_tpu.ops import embedding as emb

    names = [v.strip() for v in args.variants.split(",")]
    # variant grammar: A | S | S2, with an optional uN suffix overriding
    # --unroll (e.g. S2u16)
    steps, states, packs_by, unroll_by = {}, {}, {}, {}
    for name in names:
        base, _, usfx = name.partition("u")
        unroll = int(usfx) if usfx else args.unroll
        unroll_by[name] = unroll
        packs = make_packs(unroll)
        packs_by[name] = packs
        # S = stacked storage, one (T, V, C) packed concat;
        # S2 = stacked storage, per-table packed concats (default form)
        emb.STACKED_SPLIT_CONCAT = base != "S"
        if base == "A":
            step = make_train_step_unrolled(model, optimizer, unroll)
            state = init_state(model, optimizer, jax.random.PRNGKey(0))
        else:
            bstate = init_state(model, optimizer, jax.random.PRNGKey(0))
            params_s, snames = stack_table_params(model, bstate.params)
            print(f"stacked leaf: {params_s[STACKED_KEY].shape} over "
                  f"{len(snames)} tables", flush=True)
            state = TrainState(
                params=params_s,
                opt_state=optimizer.init(params_s),
                step=bstate.step,
                rng=bstate.rng,
            )
            step = make_train_step_stacked(model, optimizer, unroll, snames)
        t0 = time.perf_counter()
        state, losses = step(state, data, packs[0], layout)
        l0 = float(losses[-1])
        print(f"variant {name}: compiled+warm in {time.perf_counter()-t0:.1f}s"
              f"  warm-dispatch last loss {l0:.6f}", flush=True)
        steps[name], states[name] = step, state

    results = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            step, state = steps[name], states[name]
            unroll, packs = unroll_by[name], packs_by[name]
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

"""The k>=96 decider for the frozen fused-Adam surface (VERDICT r4 item 7).

training/fused_adam.py + ops/sparse_adam.py were dead-end-frozen in
round 4 with the caveat that the design "wins only where C approaches
128 (k>=96 embeddings)" — a hypothesis never measured. This script
measures exactly that claim once, at k=96 (packed C=97 -> 76% VPU lane
use in the kernel's Adam sweep vs 13% at the bench config's C=17):

  A   standard step (whatever the product defaults resolve to at k=96)
  F   FusedAdamTrainer hot loop

Usage: python tools/bench_k96.py [--rounds 3] [--steps 32] [--batch 4096]
Outcome + the keep/delete decision are recorded in NOTES.md.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--num-buckets", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=96)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

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

    feat_dict = create_criteo_features(num_buckets=args.num_buckets)
    hp = {
        "embedding_size": args.k,
        "cin_cross_layer_units": (100, 100),
        "cin_dropout": (1, 1, 1),
        "deep_hidden_units": (400, 400),
        "deep_dropout": (1.0, 1.0, 1.0),
    }
    model = XDeepFM(feat_dict, hp)
    n_rows = max(4 * args.batch, 16_384)
    data = synthetic_criteo_arrays(
        n_rows, num_buckets=args.num_buckets, seed=2019
    )
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    optimizer = create_optimizer("adam", 1e-3)

    idx_mat = batch_indices(n_rows, args.batch, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]

    UNROLL = 4
    packs = [
        jnp.asarray(
            (list(idx_mat) * ((2 * UNROLL) // len(idx_mat) + 2))[i : i + UNROLL]
        )
        for i in range(len(idx_mat))
    ]

    variants = {}

    # A: standard defaults (stacked auto; k=96 CIN may exceed the fused
    # chain's o<=512 gate? no — o is the CIN width (100); it runs)
    state = init_state(model, optimizer, jax.random.PRNGKey(0))
    res = stack_table_params(model, state.params)
    if res is not None:
        params_s, names = res
        state = TrainState(
            params_s, optimizer.init(params_s), state.step, state.rng
        )
        step = make_train_step_stacked(model, optimizer, UNROLL, names)
    else:
        step = make_train_step_unrolled(model, optimizer, UNROLL)

    def run_std(n_disp, state=state, step=step):
        st = state
        for i in range(n_disp):
            st, losses = step(st, data, packs[i % len(packs)], layout)
        float(losses[-1])
        return st

    t0 = time.perf_counter()
    state = run_std(1)
    print(f"A compiled+warm {time.perf_counter()-t0:.1f}s", flush=True)
    variants["A"] = ("std", state, step)

    from recman_tpu.training.fused_adam import FusedAdamTrainer

    trainer = FusedAdamTrainer(
        model, {"learning_rate": 1e-3}, batch_size=args.batch
    )
    fstate = trainer._fstate
    t0 = time.perf_counter()
    for i in range(UNROLL):
        fstate, floss = trainer._fused_step(
            fstate, data, jnp.asarray(idx_mat[i % len(idx_mat)]), layout
        )
    float(floss)
    print(f"F compiled+warm {time.perf_counter()-t0:.1f}s", flush=True)

    results = {"A": [], "F": []}
    for r in range(args.rounds):
        # A
        st = variants["A"][1]
        n_disp = max(args.steps // UNROLL, 1)
        t0 = time.perf_counter()
        for i in range(n_disp):
            st, losses = variants["A"][2](st, data, packs[i % len(packs)], layout)
        float(losses[-1])
        dt = time.perf_counter() - t0
        variants["A"] = ("std", st, variants["A"][2])
        exps = n_disp * UNROLL * args.batch / dt
        results["A"].append(exps)
        print(f"round {r} A: {exps:,.0f} ex/s "
              f"({dt/(n_disp*UNROLL)*1e3:.2f} ms/step)", flush=True)
        # F
        t0 = time.perf_counter()
        for i in range(args.steps):
            fstate, floss = trainer._fused_step(
                fstate, data, jnp.asarray(idx_mat[i % len(idx_mat)]), layout
            )
        float(floss)
        dt = time.perf_counter() - t0
        exps = args.steps * args.batch / dt
        results["F"].append(exps)
        print(f"round {r} F: {exps:,.0f} ex/s "
              f"({dt/args.steps*1e3:.2f} ms/step)", flush=True)

    print("\n== summary (median) ==")
    for name in results:
        print(f"{name}: {statistics.median(results[name]):,.0f} ex/s")


if __name__ == "__main__":
    main()

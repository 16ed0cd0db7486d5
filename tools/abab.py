"""The parameterized ABAB measurement harness (replaces the per-round
bench_r* one-offs — VERDICT r4 item 7).

Measures interleaved variants of the headline train step on the current
backend (run on the TPU for real numbers). Every variant is the bench.py
default configuration plus zero or more modifiers, joined with '+':

    base            the shipping default (stacked storage, segmat, chain)
    nochain         CIN_CHAIN_MODE="off"  (per-layer CIN kernels)
    pertable        per-table (V, k) leaves instead of stacked storage
    scatter         sorted-hint scatter embedding backward
    uN              N-step dispatch unroll (default 16)
    bN              batch size N (default 8192)
    dp              the explicit shard_map DP step on a 1-device mesh
                    (parallel/train_explicit.py — fused kernels active
                    per shard; composes with pertable/nochain/uN)
    gspmd           today's GSPMD sharded step on a 1-device mesh
                    (fused_grad(False) — quantifies the gating tax;
                    forces unroll=1: that path has no unrolled form)
    savefm/nosavefm CHAIN_SAVE_FMAPS on/off (fwd writes fmaps vs bwd
                    recompute)
    ctfN / ctbN     chain kernel tile widths (CHAIN_TILE_FWD/BWD)
    tvN             segmat vocab tile (SEGMAT_TILE_V)
    bf16m           adam_bf16m optimizer (bf16 first moment —
                    NUMERICS-SHIFTING: flip needs quality gates)

Examples:
    python tools/abab.py --variants base,base+nochain       # chain ABAB
    python tools/abab.py --variants base,pertable+u8        # storage+unroll
    python tools/abab.py --variants base --rounds 1 --steps 32  # smoke

Method: each variant compiles+warms once, then --rounds interleaved
timed windows of --steps steps each run A,B,A,B,...; the summary reports
per-variant medians. Interleaving cancels the tunnel's session-level
drift (NOTES.md: same-code day-to-day spread is ~2-3%)."""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_variant(name: str, model, optimizer, default_unroll: int):
    """Parse modifiers, set trace-time flags, build (step, state, flags).

    Returns (step_fn, state, unroll, batch, restore_fn). Trace-time module
    flags stay applied until restore_fn() — call it AFTER the warmup
    dispatch that traces the step."""
    import jax

    from recman_tpu.layers import cin as cin_mod
    from recman_tpu.ops import embedding as emb
    from recman_tpu.training import init_state
    from recman_tpu.training.train_step import (
        TrainState,
        make_train_step_stacked,
        make_train_step_unrolled,
        stack_table_params,
    )

    from recman_tpu.ops import cin_chain

    # chain-tile modifiers mutate module globals read at trace time;
    # reset to the shipped defaults so variants don't leak into each other
    cin_chain.CHAIN_TILE_FWD = 1024
    cin_chain.CHAIN_TILE_BWD = 2048
    cin_chain.CHAIN_SAVE_FMAPS = True  # the shipped default (round 6)
    emb.SEGMAT_TILE_V = 1024
    emb.SEGMAT_CHUNK_CAP = 512

    mods = [] if name == "base" else [
        m for m in name.split("+") if m != "base"
    ]
    unroll, batch = default_unroll, None
    stacked, chain, kernel, mode = True, "auto", "auto", "local"
    for m in mods:
        if m == "nochain":
            chain = "off"
        elif m == "chain":
            chain = "auto"
        elif m == "pertable":
            stacked = False
        elif m == "scatter":
            kernel = "scatter"
        elif m == "dp":
            mode = "dp"
        elif m == "gspmd":
            mode, unroll = "gspmd", 1
        elif m == "savefm":
            from recman_tpu.ops import cin_chain

            cin_chain.CHAIN_SAVE_FMAPS = True
        elif m == "nosavefm":
            from recman_tpu.ops import cin_chain

            cin_chain.CHAIN_SAVE_FMAPS = False
        elif m == "bf16m":
            optimizer = __import__(
                "recman_tpu.training.train_step", fromlist=["create_optimizer"]
            ).create_optimizer("adam_bf16m", 1e-3)
        elif m.startswith("tv") and m[2:].isdigit():
            emb.SEGMAT_TILE_V = int(m[2:])
        elif m.startswith("cc") and m[2:].isdigit():
            emb.SEGMAT_CHUNK_CAP = int(m[2:])
        elif m.startswith("ctf") and m[3:].isdigit():
            from recman_tpu.ops import cin_chain

            cin_chain.CHAIN_TILE_FWD = int(m[3:])
        elif m.startswith("ctb") and m[3:].isdigit():
            from recman_tpu.ops import cin_chain

            cin_chain.CHAIN_TILE_BWD = int(m[3:])
        elif m.startswith("u") and m[1:].isdigit():
            unroll = int(m[1:])
        elif m.startswith("b") and m[1:].isdigit():
            batch = int(m[1:])
        else:
            raise SystemExit(f"unknown modifier {m!r} in variant {name!r}")

    prev_chain = cin_mod.CIN_CHAIN_MODE
    cin_mod.CIN_CHAIN_MODE = chain
    ctx = emb.grad_kernel(kernel)
    ctx.__enter__()

    def restore():
        cin_mod.CIN_CHAIN_MODE = prev_chain
        ctx.__exit__(None, None, None)

    if mode == "gspmd":
        # today's GSPMD sharded step on a 1-device mesh: quantifies the
        # fused_grad(False) gating tax of the partitioned path
        from recman_tpu.parallel import make_mesh, make_sharded_train_step
        from recman_tpu.parallel.train_pjit import shard_init_state

        mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        state = shard_init_state(model, optimizer, jax.random.PRNGKey(0),
                                 mesh)
        step1 = make_sharded_train_step(model, optimizer, mesh)

        def step(state, data, idx_mat, layout=()):
            state, loss = step1(state, data, idx_mat[0], layout)
            return state, loss[None]

        return step, state, 1, batch, restore

    state = init_state(model, optimizer, jax.random.PRNGKey(0))
    if mode == "dp":
        # the explicit shard_map DP step on a 1-device mesh — the
        # fused-kernel SPMD path (stacked composes via stacked_names)
        from recman_tpu.parallel import make_mesh
        from recman_tpu.parallel.train_explicit import (
            make_dp_train_step_explicit,
        )

        mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
        snames = None
        if stacked:
            params_s, snames = stack_table_params(model, state.params)
            state = TrainState(
                params_s, optimizer.init(params_s), state.step, state.rng
            )
        step = make_dp_train_step_explicit(
            model, optimizer, mesh, unroll, stacked_names=snames
        )
        return step, state, unroll, batch, restore

    if stacked:
        res = stack_table_params(model, state.params)
        params_s, snames = res
        state = TrainState(
            params_s, optimizer.init(params_s), state.step, state.rng
        )
        step = make_train_step_stacked(model, optimizer, unroll, snames)
    else:
        step = make_train_step_unrolled(model, optimizer, unroll)
    return step, state, unroll, batch, restore


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="base,base+nochain")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--unroll", type=int, default=16)
    ap.add_argument("--batch", type=int, default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    import bench
    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import create_optimizer
    from recman_tpu.training.train_step import pack_dataset
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

    names = [v.strip() for v in args.variants.split(",")]
    steps, states, packs_by, unroll_by, batch_by = {}, {}, {}, {}, {}
    for name in names:
        step, state, unroll, batch, restore = build_variant(
            name, model, optimizer, args.unroll
        )
        batch = batch or args.batch or bench.BATCH_SIZE
        idx_mat = batch_indices(bench.N_ROWS, batch, shuffle_seed=0)
        idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
        import numpy as np

        reps = -(-2 * unroll // len(idx_mat)) + 1
        pool = np.concatenate([idx_mat] * reps)
        packs = [
            jnp.asarray(pool[i % len(idx_mat):][:unroll])
            for i in range(len(idx_mat))
        ]
        t0 = time.perf_counter()
        try:
            state, losses = step(state, data, packs[0], layout)
            l0 = float(losses[-1])
        finally:
            restore()
        print(
            f"variant {name}: compiled+warm in "
            f"{time.perf_counter() - t0:.1f}s  last loss {l0:.6f}",
            flush=True,
        )
        steps[name], states[name] = step, state
        packs_by[name], unroll_by[name], batch_by[name] = packs, unroll, batch

    results = {n: [] for n in names}
    for r in range(args.rounds):
        for name in names:
            step, state = steps[name], states[name]
            unroll, packs = unroll_by[name], packs_by[name]
            batch = batch_by[name]
            n_disp = max(args.steps // unroll, 1)
            state, losses = step(state, data, packs[0], layout)
            float(losses[-1])
            t0 = time.perf_counter()
            for i in range(n_disp):
                state, losses = step(
                    state, data, packs[i % len(packs)], layout
                )
            float(losses[-1])
            dt = time.perf_counter() - t0
            states[name] = state
            n_steps = n_disp * unroll
            exps = n_steps * batch / dt
            results[name].append(exps)
            print(
                f"round {r} {name}: {exps:,.0f} ex/s "
                f"({dt / n_steps * 1e3:.2f} ms/step)",
                flush=True,
            )

    print("\n== summary (median of rounds) ==")
    for name in names:
        med = statistics.median(results[name])
        print(
            f"{name}: median {med:,.0f} ex/s  runs="
            f"{[f'{x / 1e3:.1f}k' for x in results[name]]}"
        )


if __name__ == "__main__":
    main()

"""Round-4 ABAB bench #6: pin embedding-table params ROW-MAJOR via the
jax layout API.

Hypothesis (profile 2026-08-21): XLA keeps the (V, 16) table params
column-major so the segmat backward's transposed grads feed Adam
bitcast-free, which forces ~1.0 ms/step of column->row relayout copies
on the packed matrices before the forward gathers. Pinning the params
(and their Adam moments) to major_to_minor=(0, 1) should move that cost
to the grad side — where the slice_bitcast fusion ALREADY materializes
a buffer, so changing its output layout may be ~free.

  A   auto layouts (default)
  L   *_feat_embed params + mu/nu pinned Layout((0, 1))

Usage: python tools/bench_r4f.py [--rounds 4] [--dispatches 8]
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    import bench
    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
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

    from jax.sharding import SingleDeviceSharding

    dev0 = jax.devices()[0]

    def pin_fmt(tree):
        """Format pytree: row-major for 2-D *_feat_embed-shaped leaves in
        params-keyed dicts, AUTO (None) elsewhere."""
        def fmt_for(path, leaf):
            keys = [getattr(p, "key", None) for p in path]
            if any(isinstance(k, str) and k.endswith("_feat_embed")
                   for k in keys) and getattr(leaf, "ndim", 0) == 2:
                return Format(Layout((0, 1)), SingleDeviceSharding(dev0))
            return None

        import jax.tree_util as jtu

        return jtu.tree_map_with_path(fmt_for, tree)

    steps, states = {}, {}
    for name in ("A", "L"):
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        if name == "L":
            fmt_state = pin_fmt(state)
            # re-jit the raw unrolled step fn with pinned state layouts
            from recman_tpu.training.train_step import _one_step

            def step_fn(state, data, idx_mat2, layout=()):
                losses = []
                for i in range(UNROLL):
                    state, loss = _one_step(model, optimizer, state, data,
                                            idx_mat2[i], layout)
                    losses.append(loss)
                return state, jnp.stack(losses)

            step = jax.jit(
                step_fn, donate_argnums=(0,), static_argnames=("layout",),
                in_shardings=(fmt_state, None, None),
                out_shardings=(fmt_state, None),
            )
            # place inputs in the pinned layout so steady-state needs no
            # entry relayout (donation keeps it)
            state = jax.tree.map(
                lambda a, f: jax.device_put(a, f) if f is not None else a,
                state, fmt_state,
                is_leaf=lambda x: x is None or isinstance(x, jax.Array),
            )
        else:
            step = make_train_step_unrolled(model, optimizer, UNROLL)
        t0 = time.perf_counter()
        state, losses = step(state, data, packs[0], layout)
        float(losses[-1])
        print(f"variant {name}: compiled+warm in {time.perf_counter()-t0:.1f}s",
              flush=True)
        steps[name], states[name] = step, state

    results = {n: [] for n in steps}
    for r in range(args.rounds):
        for name in steps:
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

    print("\n== summary (median of rounds) ==")
    import statistics

    for name in steps:
        med = statistics.median(results[name])
        print(f"{name}: median {med:,.0f} ex/s  runs="
              f"{[f'{x/1e3:.1f}k' for x in results[name]]}")


if __name__ == "__main__":
    main()

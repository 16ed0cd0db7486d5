"""Weak-scaling benchmark: examples/sec at 1 chip -> N chips.

The north-star metric (BASELINE.json) is xDeepFM on Criteo-shaped data
with row-sharded tables at >=80% weak-scaling efficiency. This harness
measures the SPMD trainer at increasing data-axis widths with a FIXED
per-device batch (weak scaling); on a single-chip machine it degenerates
to the 1-device row, and on a forced-CPU host mesh it validates the
collective code paths (numbers there are not hardware-representative).

Prints one JSON line per mesh config:
  {"devices": d, "mesh": [data, model], "examples_per_sec": v,
   "per_device": v/d, "efficiency_vs_1": r}

Usage: python bench_scaling.py [--per-device-batch 4096] [--model-axis 1]
       [--cpu-devices 8]   # force an 8-device CPU host mesh
"""

from __future__ import annotations

import argparse
import json
import time


def main(per_device_batch=4096, model_axis=1, num_buckets=100_000,
         rows=65_536, steps=20, cpu_devices=None, small=False):
    if cpu_devices:
        import os

        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={cpu_devices}"
        ).strip()
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.parallel import ShardedTrainer, make_mesh
    from recman_tpu.training.trainer import batch_indices

    n_devices = len(jax.devices())
    if small:
        num_buckets = min(num_buckets, 2000)
        rows = min(rows, 8192)
        # keep at least one full batch at the widest mesh
        per_device_batch = min(per_device_batch, rows // n_devices)
    feat_dict = create_criteo_features(num_buckets=num_buckets)
    raw = synthetic_criteo_arrays(rows, num_buckets=num_buckets, seed=2019)

    widths = [d for d in (1, 2, 4, 8, 16, 32, 64) if d * model_axis <= n_devices]
    base_per_dev = None
    results = []
    for d in widths:
        mesh = make_mesh(data=d, model=model_axis,
                         devices=jax.devices()[: d * model_axis])
        hp = {"embedding_size": 16, "cin_cross_layer_units": (100, 100),
              "cin_dropout": (1, 1, 1), "deep_hidden_units": (400, 400),
              "deep_dropout": (1.0, 1.0, 1.0)}
        if small:  # CPU smoke config
            hp.update({"embedding_size": 4, "cin_cross_layer_units": (8, 8),
                       "deep_hidden_units": (16,), "deep_dropout": (1.0, 1.0)})
        model = XDeepFM(feat_dict, hp)
        batch = per_device_batch * d
        trainer = ShardedTrainer(
            model, {"learning_rate": 1e-3, "optimizer": "adam"},
            epoch=1, batch_size=batch, random_seed=2019, mesh=mesh,
        )
        data, layout = trainer._to_device(raw, raw["y"])
        idx_mat = batch_indices(rows, batch, shuffle_seed=0)
        idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
        idx = [jnp.asarray(r) for r in idx_mat]

        for i in range(3):
            trainer.fit_on_batch(data, idx[i % len(idx)], layout)
        t0 = time.perf_counter()
        for i in range(steps):
            trainer.state, loss = trainer._train_step(
                trainer.state, data, jnp.asarray(idx[i % len(idx)]), layout
            )
        float(loss)  # sync (device->host transfer)
        elapsed = time.perf_counter() - t0

        eps = steps * batch / elapsed
        per_dev = eps / d
        if base_per_dev is None:
            base_per_dev = per_dev
        row = {
            "devices": d * model_axis,
            "mesh": [d, model_axis],
            "examples_per_sec": round(eps, 1),
            "per_device": round(per_dev, 1),
            "efficiency_vs_1": round(per_dev / base_per_dev, 3),
        }
        # analytic per-device collective bytes/step for this mesh
        # (parallel/traffic.py; ABAB-checkable vs compiled HLO via
        # tools/traffic_accounting.py)
        from recman_tpu.parallel.traffic import collective_traffic_model

        k = hp["embedding_size"]
        dnn_dims = [26 * k + 13, *hp["deep_hidden_units"], 1]
        dense_b = 4 * sum(a * b for a, b in zip(dnn_dims, dnn_dims[1:]))
        t = collective_traffic_model(
            n_tables=26, vocab=num_buckets + 1, k=k,
            batch_local=per_device_batch, data_shards=d,
            model_shards=model_axis, dense_param_bytes=dense_b,
        )
        row["traffic_MB_per_dev_step"] = {
            "model_psum": round(t["model_axis"]["psum_bytes"] / 1e6, 2),
            "model_dedup": round(t["model_axis"]["dedup_bytes"] / 1e6, 2),
            "data_grad": round(t["data_axis"]["grad_allreduce_bytes"] / 1e6, 2),
        }
        results.append(row)
        print(json.dumps(row), flush=True)
    return results


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-device-batch", type=int, default=4096)
    ap.add_argument("--model-axis", type=int, default=1)
    ap.add_argument("--cpu-devices", type=int, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--small", action="store_true", help="tiny CPU smoke config")
    args = ap.parse_args()
    main(per_device_batch=args.per_device_batch, model_axis=args.model_axis,
         cpu_devices=args.cpu_devices, steps=args.steps, small=args.small)

#!/usr/bin/env python
"""Collective-traffic accounting + dedup-capacity calibration.

Three measurements (VERDICT r2 items 5 and weak-7):

1. UNIQUE-SPREAD of the calibrated Zipf id streams: per Criteo-shaped
   table, the batch's unique fraction and how unevenly the uniques land
   on S model shards — the numbers that justify (or indict) the
   default_capacity factor 4.0 and set a data-driven capacity.
2. ANALYTIC per-device bytes/step over 'model' and 'data'
   (parallel/traffic.py collective_traffic_model) for psum vs dedup at
   the measured capacities.
3. HLO CROSS-CHECK: compiles the sharded step both ways on a forced-CPU
   mesh and counts the collectives XLA actually emitted.

Usage: python tools/traffic_accounting.py [--batch 8192] [--cpu-devices 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def unique_spread(ids, shard_counts=(2, 4, 8, 16), vocab=None):
    """Per-table dedup statistics: U/N and the per-shard spread factor
    max_owned/(U/S) for contiguous row-range ownership."""
    import numpy as np

    ids = np.asarray(ids).reshape(-1)
    n = len(ids)
    uniq = np.unique(ids)
    u = len(uniq)
    out = {"n": int(n), "unique": int(u), "unique_frac": round(u / n, 4)}
    v = int(vocab if vocab is not None else ids.max() + 1)
    for s in shard_counts:
        rows_per = -(-v // s)
        owned = np.bincount(np.clip(uniq // rows_per, 0, s - 1), minlength=s)
        spread = owned.max() / max(u / s, 1e-9)
        out[f"spread_s{s}"] = round(float(spread), 3)
        out[f"max_owned_s{s}"] = int(owned.max())
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--num-buckets", type=int, default=100_000)
    ap.add_argument("--cpu-devices", type=int, default=8)
    ap.add_argument("--skip-hlo", action="store_true")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={args.cpu_devices}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from recman_tpu.data import synthetic_criteo_arrays
    from recman_tpu.parallel.shard_lookup import default_capacity
    from recman_tpu.parallel.traffic import (
        collective_traffic_model,
        hlo_collective_bytes,
    )

    # ---- 1. unique spread of the calibrated generator -------------------
    raw = synthetic_criteo_arrays(args.batch, num_buckets=args.num_buckets,
                                  seed=2019)
    cat_cols = sorted(k for k in raw if k.startswith("C"))
    stats = [
        unique_spread(raw[c], vocab=args.num_buckets + 1) for c in cat_cols
    ]
    uf = np.array([s["unique_frac"] for s in stats])
    print("== unique-spread (batch %d, %d tables) ==" % (args.batch, len(stats)))
    print(json.dumps({
        "unique_frac_min": round(float(uf.min()), 4),
        "unique_frac_mean": round(float(uf.mean()), 4),
        "unique_frac_max": round(float(uf.max()), 4),
        **{
            f"spread_s{s}_max_over_tables": max(
                st[f"spread_s{s}"] for st in stats
            )
            for s in (2, 4, 8, 16)
        },
    }, indent=2))

    # the same streams under SHUFFLED-VOCAB encoding (the shipped lever:
    # FeatureSet.initialize(shuffle_vocab=<seed>) — a seeded bijective id
    # relabeling at encode time, encoders.VocabEncoder): Zipf-RANKED ids
    # put every hot id in shard 0's contiguous range (worst case); hashed
    # ids (the real Criteo path, HashedSparseFeat) or the shuffled
    # assignment spread uniques uniformly for ANY mesh size
    rng = np.random.RandomState(0)
    perm = rng.permutation(args.num_buckets + 1)
    stats_perm = [
        unique_spread(perm[np.asarray(raw[c]).reshape(-1)],
                      vocab=args.num_buckets + 1)
        for c in cat_cols
    ]
    print("== same streams, shuffled-vocab (hashed-like) id assignment ==")
    print(json.dumps({
        **{
            f"spread_s{s}_max_over_tables": max(
                st[f"spread_s{s}"] for st in stats_perm
            )
            for s in (2, 4, 8, 16)
        },
        "max_owned_s8_worst_table": max(
            st["max_owned_s8"] for st in stats_perm
        ),
    }, indent=2))

    # capacity implications at S=8 — capacity_from_sample is the function
    # ShardedTrainer now calls on the first fit batch when
    # dedup_capacity=None (auto-sizing)
    from recman_tpu.parallel.shard_lookup import capacity_from_sample

    s_m = 8
    n = args.batch
    max_owned = max(st["max_owned_s8"] for st in stats)
    cap_default = default_capacity(n, s_m)  # 4N/S
    cap_measured = capacity_from_sample(
        [raw[c] for c in cat_cols], s_m, args.num_buckets + 1
    )
    cap_perm_measured = capacity_from_sample(
        [perm[np.asarray(raw[c]).reshape(-1)] for c in cat_cols],
        s_m, args.num_buckets + 1,
    )
    print(json.dumps({
        "capacity_default_4N_over_S": cap_default,
        "max_owned_uniques_s8_worst_table": max_owned,
        "capacity_from_sample_ranked": cap_measured,
        "capacity_from_sample_shuffled": cap_perm_measured,
        "breakeven_capacity_N_over_S": n // s_m,
        "measured_dedup_over_psum_ranked": round(cap_measured * s_m / n, 3),
        "measured_dedup_over_psum_shuffled": round(
            cap_perm_measured * s_m / n, 3
        ),
        "note": "dedup:psum traffic ratio == capacity*S/N "
                "(parallel/traffic.py); capacity below N/S wins",
    }, indent=2))

    # ---- 2. analytic traffic at the candidate capacities ----------------
    for name, cap in (("default(4N/S)", cap_default),
                      ("measured-ranked(capacity_from_sample)", cap_measured),
                      ("measured-shuffled(capacity_from_sample)",
                       cap_perm_measured)):
        t = collective_traffic_model(
            n_tables=len(stats), vocab=args.num_buckets + 1, k=16,
            batch_local=n, data_shards=1, model_shards=s_m, capacity=cap,
            dense_param_bytes=4 * (429 * 400 + 400 * 400 + 400
                                   + 2 * 26 * 26 * 100),
        )
        print(f"== analytic bytes/step/device, capacity={name} ==")
        print(json.dumps({
            "model_axis_psum_MB": round(t["model_axis"]["psum_bytes"] / 1e6, 2),
            "model_axis_dedup_MB": round(t["model_axis"]["dedup_bytes"] / 1e6, 2),
            "dedup_over_psum": round(t["model_axis"]["dedup_over_psum"], 3),
        }, indent=2))

    if args.skip_hlo:
        return

    # ---- 3. HLO cross-check on the forced-CPU mesh ----------------------
    import jax.numpy as jnp

    from recman_tpu.data import create_criteo_features
    from recman_tpu.models import XDeepFM
    from recman_tpu.parallel import ShardedTrainer, make_mesh
    from recman_tpu.training.trainer import batch_indices

    buckets, rows, bs = 2000, 4096, 1024
    feat_dict = create_criteo_features(num_buckets=buckets)
    raw_s = synthetic_criteo_arrays(rows, num_buckets=buckets, seed=2019)
    mesh = make_mesh(data=args.cpu_devices // 2, model=2)
    hp = {"embedding_size": 4, "cin_cross_layer_units": (8, 8),
          "cin_dropout": (1, 1, 1), "deep_hidden_units": (16,),
          "deep_dropout": (1.0, 1.0)}
    for exch in ("psum", "dedup"):
        model = XDeepFM(feat_dict, hp)
        tr = ShardedTrainer(
            model, {"learning_rate": 1e-3, "optimizer": "adam"},
            epoch=1, batch_size=bs, random_seed=2019, mesh=mesh,
            embedding_exchange=exch, row_shard_threshold=256,
        )
        data, layout = tr._to_device(raw_s, raw_s["y"])
        idx = jnp.asarray(batch_indices(rows, bs, shuffle_seed=0)[0])
        tr.fit_on_batch(data, idx, layout)
        txt = tr._train_step.lower(tr.state, data, idx, layout).compile().as_text()
        h = hlo_collective_bytes(txt)
        n_local = bs // mesh.shape["data"]
        t = collective_traffic_model(
            n_tables=26, vocab=buckets + 1, k=4, batch_local=n_local,
            data_shards=mesh.shape["data"], model_shards=2,
            dense_param_bytes=0,
        )
        print(f"== HLO check ({exch}, mesh {dict(mesh.shape)}) ==")
        print(json.dumps({
            "hlo_counts": h["counts"],
            "hlo_output_MB": {k2: round(v / 1e6, 3)
                              for k2, v in h["output_bytes"].items()},
            "hlo_total_MB": round(h["total_bytes"] / 1e6, 3),
            "analytic_model_axis_MB": round(
                t["model_axis"][f"{exch}_bytes"] / 1e6, 3
            ),
            "analytic_data_axis_MB": round(
                t["data_axis"]["grad_allreduce_bytes"] / 1e6, 3
            ),
        }, indent=2))


if __name__ == "__main__":
    sys.exit(main())

"""Headline benchmark: xDeepFM train-step throughput on Criteo-shaped data.

Run on the default JAX platform (the real TPU chip under the driver).
Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no benchmark numbers (BASELINE.md — SURVEY.md §6),
so the baseline is self-established: BASELINE_EXAMPLES_PER_SEC is the
round-1 measurement on one TPU v5e chip; vs_baseline tracks speedups of
later rounds against it.

Config mirrors a production-ish Criteo xDeepFM: 26 hashed categorical
fields (100k buckets), 13 dense, k=16, CIN (100,100), DNN (400,400),
batch 8192.
"""

from __future__ import annotations

import json
import time

import numpy as np

# Round-1 reference point: measured 2026-08-17 on one TPU v5 lite chip
# (this repo @ milestone 4, f32, XLA-einsum CIN). vs_baseline = speedup
# over this.
BASELINE_EXAMPLES_PER_SEC = 211_878.7

BATCH_SIZE = 8192
NUM_BUCKETS = 100_000
N_ROWS = 65_536
WARMUP_STEPS = 5
MEASURE_STEPS = 30


def main(fused=None, packed_storage=None):
    import sys

    import jax
    import jax.numpy as jnp

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import create_optimizer, init_state, make_train_step
    from recman_tpu.training.trainer import batch_indices

    if fused is None:
        # --fused benches the fused backward+Adam hot loop
        # (training/fused_adam.py). NOT the default: measured 237.6k vs
        # 537.2k ex/s on this config — the segment-Adam kernel's
        # mask-matmul work scales with V*chunk_n and the 17-lane packed
        # width wastes VPU lanes (NOTES.md round-2 leads has the
        # analysis); it wins only at larger k / denser id streams
        fused = "--fused" in sys.argv
    if packed_storage is None:
        # --std benches the separate-parameter step; the default hot loop
        # is the persistent packed-storage trainer
        # (training/packed_storage.py): same scatter backward + optax,
        # minus the per-step [table|bias|w] concat/slice
        packed_storage = not fused and "--std" not in sys.argv

    feat_dict = create_criteo_features(num_buckets=NUM_BUCKETS)
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
    from recman_tpu.training.train_step import pack_dataset

    data = synthetic_criteo_arrays(N_ROWS, num_buckets=NUM_BUCKETS, seed=2019)
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}

    optimizer = create_optimizer("adam", 1e-3)
    if fused:
        from recman_tpu.training.fused_adam import FusedAdamTrainer

        trainer = FusedAdamTrainer(
            model, {"learning_rate": 1e-3}, batch_size=BATCH_SIZE
        )
        fstate = trainer._fstate

        def step(state, data, idx, layout):
            return trainer._fused_step(state, data, idx, layout)

        state = fstate
    elif packed_storage:
        from recman_tpu.training import PackedStorageTrainer

        trainer = PackedStorageTrainer(
            model, {"learning_rate": 1e-3}, batch_size=BATCH_SIZE
        )
        state = trainer._pstate
        step = trainer._packed_step
    else:
        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        step = make_train_step(model, optimizer)

    idx_mat = batch_indices(N_ROWS, BATCH_SIZE, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]  # full batches only
    idx = [jnp.asarray(row) for row in idx_mat]

    # per-step dispatch, async-pipelined — measured FASTER than a
    # lax.scan-of-steps epoch (535k vs 273k ex/s: XLA copies the ~550 MB
    # params+opt-state carry per scan iteration instead of aliasing it;
    # NOTES.md dead ends)
    for i in range(WARMUP_STEPS):
        state, loss = step(state, data, idx[i % len(idx)], layout)
    float(loss)  # device->host transfer: a real sync (block_until_ready is
    # a no-op on the tunneled axon platform — see .claude/skills/verify)

    t0 = time.perf_counter()
    for i in range(MEASURE_STEPS):
        state, loss = step(state, data, idx[i % len(idx)], layout)
    float(loss)
    elapsed = time.perf_counter() - t0

    examples_per_sec = MEASURE_STEPS * BATCH_SIZE / elapsed
    print(
        json.dumps(
            {
                "metric": "xdeepfm_criteo_train_examples_per_sec_per_chip",
                "value": round(examples_per_sec, 1),
                "unit": "examples/sec",
                "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
            }
        )
    )
    return examples_per_sec


if __name__ == "__main__":
    main()

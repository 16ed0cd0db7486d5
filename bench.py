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
# 96 = 6 dispatches at UNROLL=16. The historical 30-step window would be
# a single dispatch between syncs at unroll 16 — no steady-state window
# at all — and even at unroll 8 it charged one tunnel round trip to only
# 24 steps (~0.7 ms/step on this rig: the same round-4-default binary
# measured 750.4k official / ~810k at a 64-step window — BASELINE.md
# round-5 notes quantify the bias). Cross-round comparability: rounds
# 1-2 measured 70-27 ms steps where the window term was <1%.
MEASURE_STEPS = 96

# TPU v5e (v5 lite) peak specs for the utilization report
PEAK_BF16_FLOPS = 197e12  # per chip
PEAK_HBM_BYTES = 819e9  # per chip, per second


def step_cost_model(batch=BATCH_SIZE, n_cat=26, vocab=NUM_BUCKETS, k=16,
                    n_dense=13, cin_units=(100, 100), dnn=(400, 400)):
    """Analytic FLOPs + HBM bytes for ONE train step of the bench config.

    Used to convert measured ms/step into MFU and HBM-bandwidth
    utilization (VERDICT r1: self-relative speedups say nothing about
    distance to speed-of-light). Counts, per step:

    FLOPs — the matmul towers at 3x forward (fwd + 2x backward), plus the
    Adam elementwise sweep (~12 flops/param):
      * CIN layer l (fan-in H_in, units u): z = B*D*H_in*H0 mults, then a
        (B*D, H_in*H0) @ (H_in*H0, u) contraction (2*B*D*H_in*H0*u).
        Half the maps feed the next layer (direct-connect split).
      * DNN: 2*B*sum(d_in*d_out) over [in->h1->h2->1].
    Bytes — the flows that dominate a CTR step (all f32=4B except the
    bf16 CIN streams):
      * embedding/linear packed params P = n_cat*vocab*(k+1):
        fwd gathers (random reads), backward sort/permute/scatter of the
        cotangent stream, ONE dense-grad materialization + L2 fold, and
        the Adam sweep (read g,w,m,v; write w,m,v) = 7 passes over P.
      * CIN kernel streams x0/xk in and out per layer in bf16 (z stays in
        VMEM — the field-major Pallas design), 3x for training.
      * DNN activations fwd+bwd.
    The model is documented-approximate (+-20%): good enough to say
    whether the step is compute- or bandwidth-bound and how far from the
    roofline it sits.
    """
    D = k
    H0 = n_cat

    # --- FLOPs
    cin_fwd = 0.0
    h_in = H0
    for u in cin_units:
        cin_fwd += batch * D * h_in * H0  # z outer products
        cin_fwd += 2.0 * batch * D * (h_in * H0) * u  # filter contraction
        h_in = u // 2  # direct-connect half split
    dnn_dims = [n_cat * k + n_dense, *dnn, 1]
    dnn_fwd = sum(
        2.0 * batch * din * dout for din, dout in zip(dnn_dims, dnn_dims[1:])
    )
    P_emb = n_cat * vocab * (k + 1)
    P_dense = sum(din * dout for din, dout in zip(dnn_dims, dnn_dims[1:]))
    h_in, P_cin = H0, 0
    for u in cin_units:
        P_cin += h_in * H0 * u
        h_in = u // 2
    n_params = P_emb + P_dense + P_cin
    flops = 3.0 * (cin_fwd + dnn_fwd) + 12.0 * n_params

    # --- bytes
    row_bytes = (k + 1) * 4
    gathered = n_cat * batch * row_bytes  # fwd random reads
    backward_stream = 3 * gathered  # cotangent slice + sorted permute + read
    sort_keys = 2 * n_cat * batch * 8  # (id, iota) sort_key_val
    dense_grad = 2 * P_emb * 4  # scatter materializes + L2 fold reads w
    adam = 7 * P_emb * 4  # read g,w,m,v; write w,m,v
    emb_bytes = gathered + backward_stream + sort_keys + dense_grad + adam

    cin_bytes = 0.0
    h_in = H0
    for u in cin_units:
        cin_bytes += 3 * (batch * D * (h_in + H0) * 2 + batch * D * u * 2)
        h_in = u // 2
    dnn_bytes = 3 * sum(2 * batch * d * 4 for d in dnn_dims)
    batch_bytes = batch * (n_cat + n_dense + 1) * 4
    bytes_total = emb_bytes + cin_bytes + dnn_bytes + batch_bytes
    return flops, bytes_total


def main(fused=None, grad_kernel=None):
    import sys

    import jax
    import jax.numpy as jnp

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import create_optimizer, init_state, make_train_step
    from recman_tpu.training.trainer import batch_indices

    if grad_kernel is None:
        # default "auto" = the product default: the batched Pallas
        # segment-matmul backward on TPU at k>=8, ABAB-measured faster
        # than the sorted scatters in this exact step (581.1k vs 538.3k
        # ex/s same-session, BASELINE.md round-3 trajectory — the
        # VERDICT r2 item-3 measurement). --scatter opts back to the old
        # default; --segmat forces the kernel everywhere.
        grad_kernel = ("scatter" if "--scatter" in sys.argv
                       else "segmat" if "--segmat" in sys.argv
                       else "auto")
    if fused is None:
        # --fused benches the fused backward+Adam hot loop
        # (training/fused_adam.py). NOT the default: measured 237.6k vs
        # 537.2k ex/s on this config — the segment-Adam kernel's
        # mask-matmul work scales with V*chunk_n and the 17-lane packed
        # width wastes VPU lanes (NOTES.md round-2 leads has the
        # analysis); it wins only at larger k / denser id streams
        fused = "--fused" in sys.argv
    # the DEFAULT hot loop is the standard step — measured 545.2k ex/s on
    # TPU v5e 2026-08-19. The persistent packed-storage trainer was
    # measured at 244.8k (profiled: (V,17) storage is lane-layout-hostile)
    # and DELETED — postmortem in NOTES.md. Process rule (VERDICT r1): the
    # default never changes without a same-session TPU measurement
    # recorded in BASELINE.md.

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
    else:
        from recman_tpu.training.train_step import (
            TrainState,
            make_train_step_stacked,
            make_train_step_unrolled,
            stack_table_params,
        )

        state = init_state(model, optimizer, jax.random.PRNGKey(0))
        # UNROLL consecutive steps per dispatch: bit-identical to the
        # per-step loop (tests/test_training.py parity) and amortizes the
        # ~0.76 ms/step per-dispatch host latency of this machine's
        # tunnel (BASELINE.md dispatch study). An UNROLLED chain aliases
        # the donated carry; a lax.scan-of-steps epoch instead COPIES the
        # ~550 MB carry per iteration (measured 2x slower — NOTES.md dead
        # ends). 8 was noise at 12.2 ms steps but wins 4/4 ABAB rounds at
        # the round-4-final ~10.6 ms step (777.0k vs 770.6k median,
        # tools/bench_r4b.py --variants A,A8 2026-08-21): the dispatch
        # tail grew proportionally as the step shrank.
        # 16 wins 4/4 ABAB at the stacked step's ~9.1-9.3 ms
        # (tools/bench_r5a.py S2u16 vs S2u8 2026-08-21: 900.9k vs 882.6k
        # median, +2.1% — the dispatch tail keeps growing proportionally
        # as the step shrinks; 8 beat 4 at round-4's ~10.6 ms step).
        UNROLL = 16
        # DEFAULT: stacked (T, V, k) table storage — the 26 same-shape
        # tables live as ONE leaf, so the Adam sweep is one fusion
        # instead of 26 (~35 us fixed overhead each) and the batched
        # segmat grad flows to it unsplit. ABAB 2026-08-21
        # (tools/bench_r5a.py, 4/4 rounds): 864.0k vs 809.6k ex/s median
        # (9.49 vs 10.11 ms/step, +6.7%); losses bit-match the per-table
        # loop (tests/test_stacked.py CPU exactness + equal TPU loss
        # traces). --per-table opts back into per-table leaves.
        names = None if "--per-table" in sys.argv else (
            model.packed.stackable()
        )
        if names:
            params_s, names = stack_table_params(model, state.params)
            state = TrainState(
                params_s, optimizer.init(params_s), state.step, state.rng
            )
            step_u = make_train_step_stacked(model, optimizer, UNROLL, names)
        else:
            step_u = make_train_step_unrolled(model, optimizer, UNROLL)

    idx_mat = batch_indices(N_ROWS, BATCH_SIZE, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]  # full batches only
    idx = [jnp.asarray(row) for row in idx_mat]

    if fused:
        for i in range(WARMUP_STEPS):
            state, loss = step(state, data, idx[i % len(idx)], layout)
        float(loss)  # device->host transfer: a real sync
        # (block_until_ready is a no-op on the tunneled axon platform)
        t0 = time.perf_counter()
        for i in range(MEASURE_STEPS):
            state, loss = step(state, data, idx[i % len(idx)], layout)
        float(loss)
        elapsed = time.perf_counter() - t0
        measured_steps = MEASURE_STEPS
    else:
        from recman_tpu.ops import embedding as emb_ops

        # the dataset holds N_ROWS/BATCH_SIZE = 8 distinct full batches;
        # tile them cyclically so every pack carries UNROLL index rows
        # even when UNROLL exceeds the batch count
        reps = -(-2 * UNROLL // len(idx_mat)) + 1
        pool = np.concatenate([idx_mat] * reps)
        packs = [
            jnp.asarray(pool[(i * UNROLL) % len(idx_mat):][:UNROLL])
            for i in range(len(idx_mat))
        ]
        # the grad_kernel context is consulted at TRACE time (first call)
        with emb_ops.grad_kernel(grad_kernel):
            for i in range(max(WARMUP_STEPS // UNROLL, 2)):
                try:
                    state, losses = step_u(
                        state, data, packs[i % len(packs)], layout
                    )
                except jax.errors.JaxRuntimeError:
                    if i != 0:
                        raise
                    # this machine's remote-compile tunnel occasionally
                    # drops the response mid-read on large programs
                    # ("response body closed before all bytes were
                    # read", seen once on the unroll-16 compile
                    # 2026-08-21); one retry re-issues the compile
                    state, losses = step_u(
                        state, data, packs[i % len(packs)], layout
                    )
            float(losses[-1])
            n_dispatch = MEASURE_STEPS // UNROLL
            t0 = time.perf_counter()
            for i in range(n_dispatch):
                state, losses = step_u(state, data, packs[i % len(packs)], layout)
            float(losses[-1])
            elapsed = time.perf_counter() - t0
            measured_steps = n_dispatch * UNROLL

    examples_per_sec = measured_steps * BATCH_SIZE / elapsed
    sec_per_step = elapsed / measured_steps
    flops, hbm_bytes = step_cost_model()
    print(
        json.dumps(
            {
                "metric": "xdeepfm_criteo_train_examples_per_sec_per_chip",
                "value": round(examples_per_sec, 1),
                "unit": "examples/sec",
                "vs_baseline": round(examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3),
                # absolute-utilization view (analytic step_cost_model):
                # the step is HBM-bandwidth/latency-bound, so hbm_util is
                # the roofline distance that matters; mfu is reported for
                # completeness (CTR models are gather-dominated, not MXU)
                "ms_per_step": round(1e3 * sec_per_step, 2),
                "mfu": round(flops / sec_per_step / PEAK_BF16_FLOPS, 4),
                "hbm_util": round(hbm_bytes / sec_per_step / PEAK_HBM_BYTES, 3),
                "model_gflops_per_step": round(flops / 1e9, 1),
                "model_hbm_gb_per_step": round(hbm_bytes / 1e9, 3),
            }
        )
    )
    return examples_per_sec


if __name__ == "__main__":
    main()

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


def build_bench_setup():
    """(model, data, layout, optimizer) for the headline config — shared
    by the measurement loop and the --check numerics gate."""
    import jax.numpy as jnp

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import create_optimizer
    from recman_tpu.training.train_step import pack_dataset

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
    data = synthetic_criteo_arrays(N_ROWS, num_buckets=NUM_BUCKETS, seed=2019)
    data, layout = pack_dataset(data)
    data = {k: jnp.asarray(v) for k, v in data.items()}
    optimizer = create_optimizer("adam", 1e-3)
    return model, data, layout, optimizer


def run_check(check_steps=32, unroll=8, ml_anchor=True):
    """The automated TPU-path numerics gate (VERDICT r4 item 3).

    Trains the SHIPPED TPU hot path (stacked storage + segmat backward +
    bf16 packed rows + fused Pallas CIN chain) and the f32/unfused
    reference path (fused_grad(False) — the exact code the CPU suite and
    the sharded trainers certify) from IDENTICAL state on the SAME batch
    sequence, and asserts a bounded loss-trace delta; optionally re-runs
    the ML-100K anchor in a forced-CPU subprocess. One command replaces
    the manual flip protocol. Exits nonzero on any failed bound.

    Bounds (calibrated on TPU v5e, 2026-08-21): the shipped path differs
    from f32 only through bf16 forward rows / bf16 CIN multiplicands /
    MXU pooling reorder; measured max per-step |delta| over 32 steps was
    1.15-1.17e-4 across three runs (recompute chain, ctb2048 and
    save-fmaps defaults — identical traces). The 6e-3 bound gives ~50x
    headroom while still catching any quarter-lr-scale divergence.
    """
    import sys

    import jax
    import jax.numpy as jnp

    from recman_tpu.ops import embedding as emb_ops
    from recman_tpu.training import init_state
    from recman_tpu.training.train_step import (
        TrainState,
        make_train_step_stacked,
        make_train_step_unrolled,
        stack_table_params,
    )
    from recman_tpu.training.trainer import batch_indices

    model, data, layout, optimizer = build_bench_setup()
    idx_mat = batch_indices(N_ROWS, BATCH_SIZE, shuffle_seed=0)
    idx_mat = idx_mat[(idx_mat >= 0).all(axis=1)]
    reps = -(-check_steps // len(idx_mat)) + 1
    idx_pool = np.concatenate([np.asarray(idx_mat)] * reps)[:check_steps]
    packs = [
        jnp.asarray(idx_pool[s : s + unroll])
        for s in range(0, check_steps, unroll)
    ]

    base = init_state(model, optimizer, jax.random.PRNGKey(0))

    # --- shipped path: stacked storage, product-default flags
    params_s, snames = stack_table_params(model, base.params)
    state_a = TrainState(
        params_s, optimizer.init(params_s), base.step, base.rng
    )
    step_a = make_train_step_stacked(model, optimizer, unroll, snames)
    losses_a = []
    for pk in packs:
        state_a, lvec = step_a(state_a, data, pk, layout)
        losses_a.append(np.asarray(lvec))
    trace_a = np.concatenate(losses_a)

    # --- reference path: unfused f32 (scatter backward, einsum CIN,
    # f32 packed rows) — what the CPU suite bit-certifies
    state_b = init_state(model, optimizer, jax.random.PRNGKey(0))
    step_b = make_train_step_unrolled(model, optimizer, unroll)
    losses_b = []
    with emb_ops.fused_grad(False):
        for pk in packs:
            state_b, lvec = step_b(state_b, data, pk, layout)
            losses_b.append(np.asarray(lvec))
    trace_b = np.concatenate(losses_b)

    delta = np.abs(trace_a - trace_b)
    max_delta = float(delta.max())
    final_rel = float(abs(trace_a[-1] - trace_b[-1]) / max(trace_b[-1], 1e-9))
    bound_abs, bound_rel = 6e-3, 0.01
    ok = bool(max_delta <= bound_abs and final_rel <= bound_rel)
    result = {
        "metric": "tpu_path_numerics_check",
        "steps": int(check_steps),
        "max_loss_delta": round(max_delta, 6),
        "final_loss_shipped": round(float(trace_a[-1]), 6),
        "final_loss_reference": round(float(trace_b[-1]), 6),
        "final_rel_delta": round(final_rel, 6),
        "bound_abs": bound_abs,
        "bound_rel": bound_rel,
        "loss_trace_ok": ok,
    }

    if ml_anchor and ok:
        import re
        import subprocess

        proc = subprocess.run(
            [
                sys.executable,
                "-c",
                "import jax; jax.config.update('jax_platforms', 'cpu');"
                "from recman_tpu.examples.xdeepfm_ml import main;"
                "main(frac=0.5, epoch=1)",
            ],
            capture_output=True,
            text=True,
            timeout=1800,
        )
        m = re.search(
            r"TEST logloss=([\d.]+) auc=([\d.]+)",
            proc.stdout + proc.stderr,
        )
        if m:
            ll, auc = float(m.group(1)), float(m.group(2))
            ml_ok = 0.575 <= ll <= 0.615 and 0.718 <= auc <= 0.748
            result.update(
                ml_logloss=ll, ml_auc=auc, ml_anchor_ok=bool(ml_ok)
            )
            ok = ok and ml_ok
        else:
            result.update(ml_anchor_ok=False, ml_error="no result parsed")
            ok = False

    result["ok"] = bool(ok)
    print(json.dumps(result))
    if not ok:
        sys.exit(1)


def main(grad_kernel=None):
    import sys

    import jax
    import jax.numpy as jnp

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
    # the hot loop is the standard step. The fused backward+Adam trainer
    # was a frozen opt-in since round 4 and was DELETED in round 6 after
    # its k>=96 hypothesis measured a 38% LOSS (tools/bench_k96.py:
    # 78.7k vs 126.5k ex/s at k=96, b=4096 — NOTES.md has the decision).
    # The persistent packed-storage trainer was likewise measured and
    # deleted in round 2. Process rule (VERDICT r1): the default never
    # changes without a same-session TPU measurement in BASELINE.md.
    model, data, layout, optimizer = build_bench_setup()
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

    from recman_tpu.ops import embedding as emb_ops

    # the dataset holds N_ROWS/BATCH_SIZE = 8 distinct full batches;
    # tile them cyclically so every pack carries UNROLL index rows
    # even when UNROLL exceeds the batch count
    reps = -(-2 * UNROLL // len(idx_mat)) + 1
    pool = np.concatenate([idx_mat] * reps)
    # stagger pack i by i rows over the tiled pool so consecutive
    # dispatches start at different batch offsets (i*UNROLL %
    # len(idx_mat) degenerates to a single repeated pack whenever
    # UNROLL is a multiple of the batch count — round-4 advisor)
    packs = [
        jnp.asarray(pool[i % len(idx_mat):][:UNROLL])
        for i in range(len(idx_mat))
    ]
    # the grad_kernel context is consulted at TRACE time (first call)
    with emb_ops.grad_kernel(grad_kernel):
        for i in range(max(WARMUP_STEPS // UNROLL, 2)):
            try:
                state, losses = step_u(
                    state, data, packs[i % len(packs)], layout
                )
            except jax.errors.JaxRuntimeError as e:
                # this machine's remote-compile tunnel occasionally
                # drops the response mid-read on large programs
                # ("response body closed before all bytes were
                # read", seen once on the unroll-16 compile
                # 2026-08-21); one retry re-issues the compile.
                # Only the compile-time drop is retriable: it fires
                # BEFORE execution, so the donated state buffers are
                # still live. Any other runtime error may postdate
                # donation — retrying would mask it with a confusing
                # "Array has been deleted" (round-4 advisor).
                if i != 0 or "response body closed" not in str(e):
                    raise
                state, losses = step_u(
                    state, data, packs[i % len(packs)], layout
                )
        float(losses[-1])
        n_dispatch = max(MEASURE_STEPS // UNROLL, 1)
        t0 = time.perf_counter()
        for i in range(n_dispatch):
            state, losses = step_u(state, data, packs[i % len(packs)], layout)
        float(losses[-1])
        elapsed = time.perf_counter() - t0
        measured_steps = n_dispatch * UNROLL

        # SECOND window (VERDICT r4 item 4): the historical official
        # window synced every 24 steps (30//8 dispatches at unroll 8)
        # instead of every 96, charging ~1 extra tunnel round trip
        # per 24-32 steps. Re-measure at the closest
        # unroll-16-expressible equivalent (2 dispatches = 32 steps
        # between syncs, median of 3 windows) so the JSON carries
        # BOTH numbers and cross-round comparisons never silently
        # mix windows again.
        hist_rates = []
        for w in range(3):
            t0 = time.perf_counter()
            for i in range(2):
                state, losses = step_u(
                    state, data, packs[(w * 2 + i) % len(packs)], layout
                )
            float(losses[-1])
            hist_rates.append(
                2 * UNROLL * BATCH_SIZE / (time.perf_counter() - t0)
            )
        hist_examples_per_sec = float(np.median(hist_rates))

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
                # value = the 96-step window (1 sync per 96 steps);
                # value_hist_window = the historical-official-equivalent
                # 32-steps-between-syncs window (rounds 1-4 synced every
                # 24-30 steps; the window term was <1% at their 27-70 ms
                # steps). vs_baseline divides `value` by the round-1
                # 211,878.7 measured at the historical window.
                "value_hist_window": (
                    round(hist_examples_per_sec, 1)
                    if hist_examples_per_sec is not None else None
                ),
                "vs_baseline_hist_window": (
                    round(hist_examples_per_sec / BASELINE_EXAMPLES_PER_SEC, 3)
                    if hist_examples_per_sec is not None else None
                ),
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
    import sys as _sys

    if "--check" in _sys.argv:
        # the TPU-path numerics gate (VERDICT r4 item 3); --no-ml skips
        # the forced-CPU ML-100K anchor subprocess (~4 min)
        run_check(ml_anchor="--no-ml" not in _sys.argv)
    else:
        main()

#!/usr/bin/env python
"""Serving-path benchmark: AOT artifact throughput, f32 vs runtime-int8.

Exports the headline-config xDeepFM (26 x 100k-bucket tables, k=16) as
two artifacts — plain f32 and quantize_embeddings="runtime" (tables stay
int8 in HBM; dequantize after the gather) — and measures
ExportedPredictor scoring throughput plus the table memory actually held
by each. Logit agreement is asserted within quantization error.

Usage: python tools/bench_serving.py [--batch 8192] [--rows 65536]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--rows", type=int, default=65_536)
    ap.add_argument("--num-buckets", type=int, default=100_000)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import numpy as np

    import jax

    from recman_tpu.data import create_criteo_features, synthetic_criteo_arrays
    from recman_tpu.models import XDeepFM
    from recman_tpu.ops.embedding import QuantTable
    from recman_tpu.serving import ExportedPredictor, Predictor

    feat_dict = create_criteo_features(num_buckets=args.num_buckets)
    model = XDeepFM(feat_dict, {
        "embedding_size": 16,
        "cin_cross_layer_units": (100, 100),
        "cin_dropout": (1, 1, 1),
        "deep_hidden_units": (400, 400),
        "deep_dropout": (1.0, 1.0, 1.0),
    })
    params = model.init_params(jax.random.PRNGKey(0))
    data = synthetic_criteo_arrays(args.rows, num_buckets=args.num_buckets,
                                   seed=7)
    data.pop("y")

    pred = Predictor(model, params, batch_size=args.batch)
    results = {}
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        for mode, kw in (("f32", {}),
                         ("runtime_int8", {"quantize_embeddings": "runtime"})):
            d = pred.export(os.path.join(tmp, mode), data,
                            batch_size=args.batch, **kw)
            served = ExportedPredictor.load(d)
            table_bytes = 0
            for k, v in served.params.items():
                if not k.endswith("_feat_embed"):
                    continue
                if isinstance(v, QuantTable):
                    table_bytes += np.asarray(v.q).nbytes
                    table_bytes += np.asarray(v.scale).nbytes
                else:
                    table_bytes += np.asarray(v).nbytes
            # warm (compile-free: AOT) + one scored pass to settle
            out[mode] = served.predict(data)
            t0 = time.perf_counter()
            for _ in range(args.steps):
                preds = served.predict(data)
            elapsed = time.perf_counter() - t0
            results[mode] = {
                "examples_per_sec": round(args.steps * args.rows / elapsed, 1),
                "table_mb": round(table_bytes / 1e6, 1),
            }

    err = float(np.max(np.abs(out["f32"] - out["runtime_int8"])))
    print(json.dumps({
        **{f"{m}_{k}": v for m, r in results.items() for k, v in r.items()},
        "table_shrink_x": round(
            results["f32"]["table_mb"] / results["runtime_int8"]["table_mb"], 2
        ),
        "max_abs_logit_delta": round(err, 5),
        "throughput_ratio_int8_vs_f32": round(
            results["runtime_int8"]["examples_per_sec"]
            / results["f32"]["examples_per_sec"], 3
        ),
    }))
    assert err < 1e-2, f"quantization error too large: {err}"


if __name__ == "__main__":
    main()

"""Record ML-100K zoo quality numbers for BASELINE.md (forced CPU, the
same platform as the recorded round-1 zoo rows).

Usage: python tools/zoo_quality.py [--epoch N] [model ...]
Config matches the recorded rows: frac 0.5, lr 0.001, batch 128,
seed 2019, eval on the test split; --epoch 5 records the converged
anchors (BASELINE.md round-3 table).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from recman_tpu.examples.model_zoo_ml import run_model  # noqa: E402

DEFAULT = ["wide_deep", "nfm", "pnn", "fibinet", "fwfm"]

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--epoch", type=int, default=1)
    ap.add_argument("models", nargs="*", default=DEFAULT)
    args = ap.parse_args()
    results = {}
    for name in args.models or DEFAULT:
        _, (logloss, auc) = run_model(name, frac=0.5, epoch=args.epoch,
                                      batch_size=128)
        results[name] = (logloss, auc)
        print(f"RESULT {name} (epoch={args.epoch}): "
              f"logloss={logloss:.4f} auc={auc:.4f}", flush=True)
    print("\nSummary:")
    for name, (ll, auc) in results.items():
        print(f"  {name}: {ll:.4f} / {auc:.4f}")

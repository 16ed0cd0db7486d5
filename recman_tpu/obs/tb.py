"""TensorBoard logging + profiler hooks.

Reference surface: TensorBoardLogger (recman/tf/core/TensorBoardLogger.py:
12-87) — per-(run, session) writer, hparams registration, trace_on/off,
per-epoch variable histograms + TRAIN_/VALID_ scalar metrics. Backed by
tensorboardX here (TF-free); tracing maps to jax.profiler, whose XPlane
output TensorBoard's profile plugin reads (the TPU equivalent of
tf.summary.trace_on(profiler=True), TensorBoardLogger.py:58-69).
"""

from __future__ import annotations

import logging
from datetime import datetime

import numpy as np

log = logging.getLogger(__name__)


class TensorBoardLogger:
    def __init__(self, hp_params=None, sess_num=0, log_dir="./logs", run_name=None,
                 profile=False):
        if run_name is None:
            run_name = datetime.now().strftime("%Y%m%d-%H%M%S")
        self.hp_params = hp_params
        self.log_dir = log_dir
        self.run_name = run_name
        self.sess_num = sess_num
        self.profile = profile
        self._tracing = False
        self._traced_epochs = set()
        self.path = f"{self.log_dir}/{self.run_name}/hp_{self.sess_num}"
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(self.path)
        except Exception:  # pragma: no cover - fallback when tbX is absent
            self.writer = None
            log.warning("tensorboardX unavailable; falling back to JSONL metrics")
        self._jsonl = open(f"{self.path}.metrics.jsonl", "a") if self.writer is None else None

    # -- hparams (reference TensorBoardLogger.py:28-56) --------------------
    def configure_hparams(self, hp_val, metrics):
        log.info("Configure hyper-params on session %s: %s", self.sess_num, hp_val)
        if self.writer is None:
            return
        clean = {
            k: (v if isinstance(v, (bool, int, float, str)) else str(v))
            for k, v in dict(hp_val).items()
        }
        try:
            self.writer.add_hparams(clean, {f"TRAIN_{m}": 0.0 for m in metrics})
        except Exception as e:  # tbX hparams can be picky about dtypes
            log.debug("add_hparams failed: %s", e)

    # -- profiler (reference TensorBoardLogger.py:58-69) -------------------
    def trace_on(self, epoch=-1, **_):
        """Start a jax.profiler trace once per epoch when profiling is on."""
        if not self.profile or self._tracing or epoch in self._traced_epochs:
            return
        import jax

        try:
            jax.profiler.start_trace(self.path)
            self._tracing = True
            self._traced_epochs.add(epoch)
        except Exception as e:  # already profiling elsewhere etc.
            log.debug("start_trace failed: %s", e)

    def trace_off(self, epoch=-1):
        if not self._tracing:
            return
        import jax

        try:
            jax.profiler.stop_trace()
        finally:
            self._tracing = False

    # -- per-epoch logging (reference TensorBoardLogger.py:71-87) ----------
    def log_params(self, epoch, eval_results, metrics, variables):
        if self.writer is not None:
            for name, value in variables.items():
                try:
                    self.writer.add_histogram(name, np.asarray(value), epoch)
                except Exception:
                    pass
        self._log_eval(epoch, eval_results, metrics)

    def _log_eval(self, epoch, eval_results, metrics):
        train_res, valid_res = eval_results
        rows = {}
        for m, r in zip(metrics, train_res):
            rows[f"TRAIN_{m}"] = float(r)
        if valid_res is not None:
            for m, r in zip(metrics, valid_res):
                rows[f"VALID_{m}"] = float(r)
        if self.writer is not None:
            for tag, val in rows.items():
                self.writer.add_scalar(tag, val, epoch)
            self.writer.flush()
        elif self._jsonl is not None:
            import json

            self._jsonl.write(json.dumps({"epoch": epoch, **rows}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self.writer is not None:
            self.writer.close()
        if self._jsonl is not None:
            self._jsonl.close()

"""Trainer: sklearn-style fit / predict / evaluate with a compiled hot loop.

Mirrors the reference estimator surface (DeepModel.py:17-228: fit with
per-epoch shuffle + eval + TB logging + epoch callback, batched predict,
evaluate, restore) with the TPU execution model:

- the dataset is encoded ONCE and lives on device; mini-batches are
  device-side gathers of shuffled index slices (vs. the reference's
  per-batch host sklearn encoding, DataInputs.load in the hot loop)
- one held optimizer + donated jitted train step (the reference recreates
  Adam per batch, xDeepFM.py:121-126 — defect not replicated)
- the final partial batch is padded to the static batch size and masked,
  so XLA compiles exactly one step executable
- eval during fit defaults to training=False; pass
  ``eval_in_training_mode=True`` to reproduce the reference's
  dropout-in-eval quirk (DeepModel.py:103-111)
"""

from __future__ import annotations

import logging
from time import time

import numpy as np

import jax
import jax.numpy as jnp

from ..config import BaseHyperParameters
from .train_step import (
    TrainState,
    create_optimizer,
    init_state,
    make_eval_scan,
    make_eval_step,
    make_train_epoch,
    make_train_step,
    pack_dataset,
)

log = logging.getLogger(__name__)


def batch_indices(n: int, batch_size: int, shuffle_seed=None) -> np.ndarray:
    """(num_batches, batch_size) int32 index matrix, -1-padded at the tail.

    num_batches follows the reference's ``len // bs + 1`` (DeepModel.py:188,
    49): a full final slice yields one extra all-padding batch, which the
    masked loss turns into a no-op — kept for step-count parity.
    """
    order = np.arange(n)
    if shuffle_seed is not None:
        order = np.random.RandomState(shuffle_seed).permutation(n)
    num_batches = n // batch_size + 1
    padded = np.full((num_batches * batch_size,), -1, dtype=np.int32)
    padded[:n] = order
    return padded.reshape(num_batches, batch_size)


class Trainer:
    """Drives a zoo model. ``hparams`` needs learning_rate/optimizer
    (reference BaseHyperParameters.py:72-79); everything model-specific
    already lives in the model object."""

    def __init__(
        self,
        model,
        hparams: dict | None = None,
        metrics=(),
        epoch=10,
        batch_size=64,
        random_seed=2019,
        eval_in_training_mode=False,
        epoch_in_one_dispatch=False,
        steps_per_dispatch="auto",
        stacked_tables="auto",
    ):
        hp = hparams or {}
        self.model = model
        self.hparams = hp
        self.metrics = tuple(metrics)
        self.epoch = epoch
        self.batch_size = batch_size
        self.random_seed = random_seed
        self.eval_in_training_mode = eval_in_training_mode
        self.epoch_in_one_dispatch = epoch_in_one_dispatch
        # >1: group consecutive steps into one dispatch
        # (make_train_step_unrolled — donated carry aliased through the
        # unrolled chain; bit-identical to the per-step loop). Amortizes
        # per-dispatch host latency: ~0.76 ms/step through this machine's
        # tunnel, measured in BASELINE.md's dispatch study. "auto"
        # (round-6 default) = the bench-grade 16 on TPU — real Trainer
        # users get the same dispatch amortization as bench.py — and 1
        # elsewhere (CPU jobs pay 16x the step-graph compile for little:
        # dispatch is not their bottleneck). Trajectories are identical
        # either way (tests/test_training.py bit-parity).
        if steps_per_dispatch == "auto":
            import jax as _jax

            steps_per_dispatch = (
                16 if _jax.default_backend() == "tpu" else 1
            )
        self.steps_per_dispatch = int(steps_per_dispatch)
        self._train_step_unrolled = None  # built on first use
        # stacked (T, V, k) table storage for the unrolled hot loop
        # (ops.embedding.stacked_tables): one optimizer fusion for the
        # packed layer's same-shape tables instead of T. "auto" = on for
        # the TPU fused single-shard path only (ABAB 864.0k vs 809.6k
        # ex/s, +6.7%, tools/bench_r5a.py 2026-08-21; trajectory
        # bit-identical — tests/test_stacked.py). True forces it on any
        # backend; False disables. The state converts to stacked form
        # only INSIDE the epoch's dispatch loop; everything observable
        # (self.state, checkpoints, eval, resilience) stays per-table.
        self.stacked_tables = stacked_tables
        self._train_step_stacked = None  # built on first use

        self.optimizer = create_optimizer(
            hp.get(BaseHyperParameters.Optimizer, "adam"),
            hp.get(BaseHyperParameters.LearningRate, 0.001),
        )
        self._train_step = make_train_step(model, self.optimizer)
        self._train_epoch = make_train_epoch(model, self.optimizer)
        self._eval_step = make_eval_step(model)
        self._eval_scan = make_eval_scan(model)
        self.state: TrainState = init_state(
            model, self.optimizer, jax.random.PRNGKey(random_seed)
        )

    # -- data plumbing -----------------------------------------------------
    def _to_device(self, X, y=None):
        """DataFrame -> encoded device arrays (or pass through a dict that
        is already encoded). Columns are packed by dtype (pack_dataset) so
        each step gathers 2-3 matrices instead of one array per feature;
        returns (data, layout) with layout static for the jitted steps."""
        if isinstance(X, dict):
            data = dict(X)
            if y is not None:
                data["y"] = np.asarray(y, dtype=np.float32)
        else:
            data = self.model.feat_dict.transform(X, y)
        if "y" not in data:
            data["y"] = np.zeros(len(next(iter(data.values()))), dtype=np.float32)
        data, layout = pack_dataset(data)
        return {k: jnp.asarray(v) for k, v in data.items()}, layout

    def _override(self):
        """Linear-tower weight-override vector, rebuilt from the live
        feature schema each call (so set_weights takes effect immediately,
        reference layers.py:338-345)."""
        linear = getattr(self.model, "linear", None)
        if linear is None:
            return None
        return jnp.asarray(linear.override_vector())

    # -- public surface (reference DeepModel.py) ---------------------------
    @property
    def params(self) -> dict:
        return self.state.params

    def predict(self, X, training=False, batch_number_to_show_progress=50):
        """Batched forward (reference DeepModel.py:45-70). ``training=True``
        keeps dropout live, as the reference's in-fit eval does.

        Runs as ONE lax.scan dispatch over all batches (make_eval_scan)
        rather than the reference's per-batch host loop."""
        n = len(next(iter(X.values()))) if isinstance(X, dict) else len(X)
        data, layout = self._to_device(X)
        return self._predict_device(data, training, layout, n=n)

    def evaluate(self, X, y, training=False):
        """[metric(y, pred) for metric in metrics] (reference DeepModel.py:72-74)."""
        pred = self.predict(X, training=training)
        y = np.asarray(y, dtype=np.float32)
        return [metric(y, pred) for metric in self.metrics]

    def fit_on_batch(self, data: dict, idx, layout=()):
        """Single compiled step (reference fit_on_batch, xDeepFM.py:116-126).

        Returns the loss as a DEVICE array — converting to float here would
        force a device->host sync per step and stall the dispatch pipeline
        (the tunnel round-trip costs ~ms); the fit loop converts once per
        epoch."""
        self.state, loss = self._train_step(
            self.state, data, jnp.asarray(idx), layout
        )
        return loss

    def fit_stream(self, chunks, epochs=None, shuffle_in_chunk=True,
                   resilience=None):
        """Train over a stream of encoded host chunks with double-buffered
        host->device transfers (data.streaming iterators are the intended
        sources). While the device executes chunk c's steps, chunk c+1 is
        read/packed/transferred — HBM dataset footprint stays bounded by
        TWO chunks regardless of dataset size (the at-scale generalization
        of the reference's whole-dataset-resident fit loop,
        DeepModel.py:141).

        ``chunks``: an iterable of {'name': array, 'y': ...} dicts (one
        pass), or a zero-arg callable returning a fresh iterator (required
        when ``epochs`` > 1). Rows shuffle within each chunk per epoch
        when ``shuffle_in_chunk`` (global shuffles are the chunk source's
        job, e.g. iter_array_chunks(shuffle_seed=...)). Returns self.

        ``resilience``: a training.Resilience policy. Checkpoints record
        the STREAM position (epoch, chunk index, batches completed in the
        chunk) in LATEST.json, and resume restores the state then fast-
        forwards the chunk source to that position — in-chunk shuffle
        seeds are a deterministic function of (random_seed, epoch, chunk),
        so the resumed run replays the exact remaining batch sequence
        (bit-exact, like fit()'s mid-epoch resume). Requires a CALLABLE
        chunk factory whose iteration order is deterministic
        (iter_array_chunks and the native streaming readers are).
        """
        epochs = self.epoch if epochs is None else epochs
        if not callable(chunks):
            assert epochs == 1 and resilience is None, (
                "a plain iterator can only be consumed once; pass a "
                "zero-arg callable for multi-epoch or resumable streams"
            )
            chunk_iter = chunks
            chunks = lambda: chunk_iter  # noqa: E731

        from concurrent.futures import ThreadPoolExecutor

        start_epoch, resume_chunk, resume_batch = 1, 0, 0
        steps_done = 0
        if resilience is not None:
            meta = resilience.resume(self)
            if meta is not None:
                steps_done = int(meta["step"])
                pos = meta.get("stream")
                if pos is None:
                    log.warning(
                        "Resilience: checkpoint has no stream position "
                        "(written by fit()?); restarting the stream from "
                        "epoch %d chunk 0 with the restored state",
                        int(meta["epoch"]),
                    )
                    start_epoch = int(meta["epoch"])
                else:
                    start_epoch = int(pos["epoch"])
                    resume_chunk = int(pos["chunk"])
                    resume_batch = int(pos["batch"])
                    if start_epoch > epochs:
                        log.info("Resilience: stream run already complete "
                                 "at step %d", steps_done)
                        return self
            resilience.install()

        last_chunk = None
        try:
            for epoch in range(start_epoch, epochs + 1):
                it = iter(chunks())
                skip_chunks = resume_chunk if epoch == start_epoch else 0
                skip_batches = resume_batch if epoch == start_epoch else 0
                for _ in range(skip_chunks):
                    if next(it, None) is None:
                        break
                if skip_chunks:
                    log.info(
                        "Resilience: resuming stream epoch %d at chunk %d, "
                        "batch %d", epoch, skip_chunks, skip_batches,
                    )

                def prepare(c_i):
                    # runs on the prefetch thread: read + pack + DISPATCH
                    # the host->device transfer for the next chunk while
                    # the device executes the current one
                    chunk = next(it, None)
                    if chunk is None:
                        return None
                    nonlocal last_chunk
                    last_chunk = chunk  # Dice calibration sample (below)
                    data, layout = self._to_device(chunk, chunk.get("y"))
                    n = int(len(next(iter(chunk.values()))))
                    seed = (self.random_seed + 7919 * epoch + c_i
                            if shuffle_in_chunk else None)
                    idx = self._batch_index_matrix(n, shuffle_seed=seed)
                    return data, layout, idx

                total, batches, c_i = 0.0, 0, skip_chunks
                with ThreadPoolExecutor(max_workers=1) as pool:
                    cur = prepare(c_i)
                    while cur is not None:
                        data, layout, idx = cur
                        offset = skip_batches if c_i == skip_chunks else 0
                        c_i += 1
                        fut = pool.submit(prepare, c_i)  # overlap IO/copy
                        losses = []
                        for i in range(offset, idx.shape[0]):
                            losses.append(
                                self.fit_on_batch(data, idx[i], layout)
                            )
                            steps_done += 1
                            if resilience is not None:
                                resilience.step_boundary(
                                    self, steps_done, epoch,
                                    extra={"stream": {
                                        "epoch": epoch,
                                        "chunk": c_i - 1,
                                        "batch": i + 1,
                                    }},
                                )
                        # ONE device->host sync per chunk (a per-step
                        # float() costs a ~50 ms tunnel round-trip each);
                        # it also bounds HBM to ~2 live chunks
                        total += float(sum(losses)) if losses else 0.0
                        batches += len(losses)
                        del data, losses
                        cur = fut.result()
                mean_loss = total / max(batches, 1)
                log.info("fit_stream epoch %d: %d chunks, %d batches, "
                         "mean loss %.5f", epoch, c_i, batches, mean_loss)
                if resilience is not None:
                    resilience.epoch_boundary(
                        self, steps_done, epoch, mean_loss,
                        extra={"stream": {
                            "epoch": epoch + 1, "chunk": 0, "batch": 0,
                        }},
                    )
                if last_chunk is not None:
                    self.calibrate(last_chunk)  # Dice moments (no-op w/o)
        finally:
            if resilience is not None:
                resilience.uninstall()
        return self

    def predict_stream(self, chunks, training=False):
        """Batched forward over a stream of encoded host chunks — the
        beyond-HBM counterpart of ``predict`` (same double-buffered
        overlap as fit_stream; device holds <= 2 chunks). ``chunks`` is
        an iterable of encoded dicts ('y' allowed and ignored). Returns
        the (N,) prediction array in stream order.
        """
        from concurrent.futures import ThreadPoolExecutor

        it = iter(chunks() if callable(chunks) else chunks)
        override = None if training else self._override()

        def prepare():
            chunk = next(it, None)
            if chunk is None:
                return None
            n = int(len(next(iter(chunk.values()))))
            data, layout = self._to_device(
                {k: v for k, v in chunk.items() if k != "y"}
            )
            idx = self._batch_index_matrix(n)
            return data, layout, idx, n

        out = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            cur = prepare()
            while cur is not None:
                data, layout, idx, n = cur
                fut = pool.submit(prepare)
                preds = self._eval_scan(
                    self.state.params, data, jnp.asarray(idx), override,
                    training, layout,
                )
                out.append(self._unshard_preds(np.asarray(preds), n))
                del data, preds
                cur = fut.result()
        return np.concatenate(out) if out else np.zeros((0,), np.float32)

    def evaluate_stream(self, chunks, training=False):
        """[metric(y, pred)] over a chunk stream; chunks must carry 'y'.
        Streams predictions with predict_stream-style overlap while
        collecting labels chunk by chunk."""
        ys, ps = [], []
        it = iter(chunks() if callable(chunks) else chunks)

        def one_chunk_iter():
            for chunk in it:
                ys.append(np.asarray(chunk["y"], dtype=np.float32))
                yield chunk

        ps = self.predict_stream(one_chunk_iter(), training=training)
        y = np.concatenate(ys) if ys else np.zeros((0,), np.float32)
        return [metric(y, ps) for metric in self.metrics]

    def calibrate(self, X, max_rows=65536) -> bool:
        """Freeze Dice normalization moments into params.

        Dice (DIN paper §4.3) normalizes with mini-batch moments during
        training; a serving-safe inference path needs FIXED moments or
        predictions depend on batch composition. This runs one
        training-mode forward (dropout off: rng=None) over up to
        ``max_rows`` rows of ``X`` (dataframe or encoded dict), captures
        every Dice layer's batch moments, and writes them into the
        ``*_dice_mean_*`` / ``*_dice_var_*`` params consumed when
        training=False. fit/fit_stream call this before each epoch eval;
        call it manually if you drive fit_on_batch yourself.

        Returns True when the model has Dice moments and they were updated.
        """
        has_dice = any("_dice_mean_" in k for k in self.state.params)
        if not getattr(self.model, "supports_moment_capture", False):
            if has_dice:
                # A model configured with activation="dice" but whose apply()
                # doesn't thread moment_capture would silently serve with the
                # never-written init moments (mean=0, var=1) — a train/serve
                # normalization skew. Surface it instead of returning quietly.
                import warnings

                warnings.warn(
                    f"{type(self.model).__name__} has Dice moment params but "
                    "does not support moment capture: training=False "
                    "eval/serving will use the untrained init moments "
                    "(mean=0, var=1). Thread moment_capture through apply() "
                    "and set supports_moment_capture=True.",
                    stacklevel=2,
                )
            return False
        if not has_dice:
            return False

        if isinstance(X, dict):
            n = len(next(iter(X.values())))
            data = {k: np.asarray(v)[: min(n, max_rows)] for k, v in X.items()}
        else:
            Xs = X.iloc[:max_rows] if hasattr(X, "iloc") else X[:max_rows]
            data = self.model.feat_dict.transform(Xs)
        data.pop("y", None)
        batch = {k: jnp.asarray(v) for k, v in data.items()}

        # gather (possibly sharded) params to host once; the capture
        # forward runs single-device (it is outside any mesh context)
        params_host = jax.tree.map(
            lambda a: jnp.asarray(np.asarray(a)), self.state.params
        )

        def _capture(params, batch):
            cap = {}
            self.model.apply(
                params, batch, training=True, rng=None, moment_capture=cap
            )
            return cap

        cap = jax.jit(_capture)(params_host, batch)
        new_params = dict(self.state.params)
        for k, v in cap.items():
            arr = jnp.asarray(np.asarray(v), dtype=jnp.float32)
            old = self.state.params[k]
            if hasattr(old, "sharding"):
                arr = jax.device_put(arr, old.sharding)
            new_params[k] = arr
        self.state = self.state._replace(params=new_params)
        return True

    def _eval_at_epoch(self, data_train, y_train, X_valid, y_valid, start_time,
                       epoch, layout=()):
        """Per-epoch train/valid metric log (reference DeepModel.py:92-131)."""
        training = self.eval_in_training_mode
        train_pred = self._predict_device(
            data_train, training, layout, n=len(y_train)
        )
        train_res = [m(y_train, train_pred) for m in self.metrics]
        valid_res = None
        if X_valid is not None and y_valid is not None:
            valid_res = self.evaluate(X_valid, y_valid, training=training)
            log.info(
                "[%d] train-result=%s, valid-result=%s [%.1f s]",
                epoch,
                [(str(m), round(r, 4)) for m, r in zip(self.metrics, train_res)],
                [(str(m), round(r, 4)) for m, r in zip(self.metrics, valid_res)],
                time() - start_time,
            )
        else:
            log.info(
                "[%d] train-result=%s [%.1f s]",
                epoch,
                [(str(m), round(r, 4)) for m, r in zip(self.metrics, train_res)],
                time() - start_time,
            )
        return train_res, valid_res

    def _batch_index_matrix(self, n: int, shuffle_seed=None) -> np.ndarray:
        """Per-epoch index matrix; overridden by sharded-dataset trainers
        to produce per-shard local indices."""
        return batch_indices(n, self.batch_size, shuffle_seed=shuffle_seed)

    def _stacked_active(self) -> bool:
        """Should fit's dispatch loop run on stacked table storage?"""
        mode = self.stacked_tables
        if mode in (False, "off"):
            return False
        packed = getattr(self.model, "packed", None)
        eligible = packed is not None and packed.stackable() is not None
        if mode in (True, "on"):
            return eligible
        from ..ops.embedding import _fused_active

        return eligible and _fused_active()

    def _steps_per_epoch(self, n: int) -> int:
        """Rows of ``_batch_index_matrix(n)`` — fit()'s resume arithmetic
        must match it exactly (overridden alongside it by sharded-dataset
        trainers, where the count is per-LOCAL-shard)."""
        return n // self.batch_size + 1  # batch_indices contract

    def _predict_device(self, data: dict, training: bool, layout=(),
                        n=None) -> np.ndarray:
        """``n``: logical row count — required by callers of sharded-dataset
        trainers, whose device arrays carry padded rows."""
        n = int(data["y"].shape[0]) if n is None else n
        idx = self._batch_index_matrix(n)
        override = None if training else self._override()
        preds = self._eval_scan(
            self.state.params, data, jnp.asarray(idx), override, training,
            layout,
        )
        return self._unshard_preds(np.asarray(preds), n)

    def _unshard_preds(self, preds: np.ndarray, n: int) -> np.ndarray:
        """Map flat scan output back to dataset row order (identity here;
        sharded-dataset trainers reorder shard-major output)."""
        return preds[:n]

    def fit(
        self,
        X_train,
        y_train,
        X_valid=None,
        y_valid=None,
        random_seed_for_mini_batch=True,
        tb_logger=None,
        epoch_callback=None,
        show_progress=False,
        batch_number_to_show_progress=50,
        resilience=None,
    ):
        """Reference fit loop shape (DeepModel.py:141-228): epoch-0 eval
        (with an optional profiler trace), per-epoch reshuffle + step loop +
        eval + TB log + callback; ``show_progress`` drives a tqdm epoch bar
        (DeepModel.py:158).

        ``resilience``: a training.Resilience policy — periodic + preemption
        checkpointing, exact mid-epoch resume, divergence rollback
        (training/resilient.py). Forces DETERMINISTIC per-epoch shuffle
        seeds (a function of random_seed and the epoch) so a restored
        step count regenerates the same index matrix and resume is
        bit-exact; the reference's np.random.randint reshuffle quirk
        (DeepModel.py:183) is incompatible with that and is overridden."""
        assert X_train is not None and y_train is not None
        import contextlib

        try:
            import tqdm

            progress = tqdm.tqdm(desc="fit", total=self.epoch,
                                 disable=not show_progress)
        except ImportError:  # pragma: no cover
            progress = contextlib.nullcontext()
            progress.update = lambda *a, **k: None

        if tb_logger is not None:
            tb_logger.configure_hparams(self.hparams, self.metrics)

        data, layout = self._to_device(X_train, y_train)
        y_np = np.asarray(y_train, dtype=np.float32)
        n = len(y_np)

        steps_per_epoch = self._steps_per_epoch(n)
        start_epoch, resume_offset = 1, 0
        if resilience is not None:
            meta = resilience.resume(self)
            if meta is not None:
                done = int(meta["step"])
                start_epoch = done // steps_per_epoch + 1
                resume_offset = done % steps_per_epoch
                if start_epoch > self.epoch and resume_offset == 0:
                    log.info("Resilience: run already complete at step %d",
                             done)
                    return self
            resilience.install()

        if tb_logger is not None:
            tb_logger.trace_on(epoch=0)
        self.calibrate(X_train)  # Dice moments for training=False evals
        eval_results = self._eval_at_epoch(
            data, y_np, X_valid, y_valid, time(), epoch=0, layout=layout
        )
        if tb_logger is not None:
            tb_logger.trace_off(epoch=0)
            tb_logger.log_params(
                epoch=0,
                eval_results=eval_results,
                metrics=self.metrics,
                variables=self.state.params,
            )

        try:
            for epoch in range(start_epoch, self.epoch + 1):
                start_time = time()
                if resilience is not None:
                    # deterministic reshuffle so a restored step count
                    # regenerates this epoch's exact index matrix
                    seed = (self.random_seed + 104729 * epoch) % (2**31 - 1)
                elif random_seed_for_mini_batch:
                    seed = np.random.randint(1, 2019)  # DeepModel.py:183
                else:
                    seed = self.random_seed
                idx = self._batch_index_matrix(n, shuffle_seed=seed)
                epoch_base = (epoch - 1) * steps_per_epoch
                offset = resume_offset if epoch == start_epoch else 0
                if offset:
                    idx = idx[offset:]
                    log.info("Resilience: resuming epoch %d at batch %d/%d",
                             epoch, offset, steps_per_epoch)

                def _step_done(local_i):
                    if resilience is not None:
                        resilience.step_boundary(
                            self, epoch_base + offset + local_i + 1, epoch
                        )

                if tb_logger is None and self.epoch_in_one_dispatch:
                    # whole epoch in one dispatch (make_train_epoch). NOT the
                    # default: on TPU, XLA copies the params+opt-state scan
                    # carry per iteration instead of aliasing (measured 2x
                    # slower than the pipelined per-step loop — NOTES.md);
                    # useful where dispatch, not compute, dominates (tiny
                    # models, high-latency links)
                    self.state, losses = self._train_epoch(
                        self.state, data, jnp.asarray(idx), layout
                    )
                    mean_loss = float(jnp.mean(losses))
                elif tb_logger is None and self.steps_per_dispatch > 1:
                    # grouped dispatches; the non-divisible tail runs through
                    # the per-step path, preserving exact step-count/rng parity
                    u = self.steps_per_dispatch
                    losses = []
                    full = (idx.shape[0] // u) * u
                    # stacked table storage for the dispatch loop (see
                    # __init__): trajectory-identical, so mixing with the
                    # per-table tail/resume paths is safe. Resilience
                    # checkpoints read self.state INSIDE the loop
                    # (step_boundary), so it keeps the per-table loop.
                    if resilience is None and self._stacked_active():
                        from .train_step import (
                            make_train_step_stacked,
                            stack_train_state,
                            unstack_train_state,
                        )

                        if self._train_step_stacked is None:
                            self._train_step_stacked = make_train_step_stacked(
                                self.model, self.optimizer, u,
                                self.model.packed.stackable(),
                            )
                        sstate = stack_train_state(self.model, self.state)
                        try:
                            for s in range(0, full, u):
                                sstate, lvec = self._train_step_stacked(
                                    sstate, data, jnp.asarray(idx[s : s + u]),
                                    layout,
                                )
                                losses.append(lvec)
                        finally:
                            # Donation safety: stack_train_state shares
                            # non-stacked leaves (+step/rng) with
                            # self.state by reference and the step DONATES
                            # its carry, so inside this loop self.state
                            # points at deleted buffers. Restore it from
                            # the last valid sstate on ANY exit (incl.
                            # OOM/KeyboardInterrupt). If the failure hit
                            # mid-dispatch (sstate itself already
                            # donated), recovery is impossible — warn
                            # instead of exposing dead arrays silently.
                            try:
                                self.state = unstack_train_state(
                                    self.model, sstate
                                )
                            except Exception:  # pragma: no cover - device
                                log.warning(
                                    "Stacked dispatch interrupted "
                                    "mid-step: trainer state buffers were "
                                    "donated and cannot be recovered; "
                                    "restore from a checkpoint before "
                                    "reusing this Trainer."
                                )
                    else:
                        if self._train_step_unrolled is None:
                            from .train_step import make_train_step_unrolled

                            self._train_step_unrolled = make_train_step_unrolled(
                                self.model, self.optimizer, u
                            )
                        for s in range(0, full, u):
                            self.state, lvec = self._train_step_unrolled(
                                self.state, data, jnp.asarray(idx[s : s + u]),
                                layout,
                            )
                            losses.append(lvec)
                            _step_done(s + u - 1)
                    for i in range(full, idx.shape[0]):
                        losses.append(self.fit_on_batch(data, idx[i], layout))
                        _step_done(i)
                    mean_loss = float(np.mean(np.concatenate(
                        [np.atleast_1d(np.asarray(l)) for l in losses]
                    )))
                else:
                    losses = []
                    for i in range(idx.shape[0]):
                        if tb_logger is not None and i % batch_number_to_show_progress == 0:
                            tb_logger.trace_on(epoch)
                        losses.append(self.fit_on_batch(data, idx[i], layout))
                        _step_done(i)
                        if tb_logger is not None and i % batch_number_to_show_progress == 0:
                            tb_logger.trace_off(epoch)
                        if i % batch_number_to_show_progress == 0:
                            log.debug("Fit: %d/%d batches", i + 1, idx.shape[0])
                    mean_loss = float(np.mean([float(l) for l in losses]))
                self.last_mean_loss = mean_loss  # inspectable (e.g. the
                # multi-process demo compares it across processes)
                log.info(
                    "Fit epoch %d: %d batches, mean loss %.5f",
                    epoch, idx.shape[0], mean_loss,
                )
                if resilience is not None:
                    resilience.epoch_boundary(
                        self, epoch_base + steps_per_epoch, epoch, mean_loss
                    )

                self.calibrate(X_train)
                eval_results = self._eval_at_epoch(
                    data, y_np, X_valid, y_valid, start_time, epoch=epoch,
                    layout=layout,
                )
                if tb_logger is not None:
                    tb_logger.log_params(
                        epoch=epoch,
                        eval_results=eval_results,
                        metrics=self.metrics,
                        variables=self.state.params,
                    )
                if epoch_callback:
                    epoch_callback(
                        model=self,
                        eval_results=eval_results,
                        df_all=X_train[:1] if hasattr(X_train, "__getitem__") else None,
                    )
                progress.update(1)
            if hasattr(progress, "close"):
                progress.close()
        finally:
            if resilience is not None:
                resilience.uninstall()
        return self

    # -- checkpointing (reference DeepModel.py:83-86) ----------------------
    def save(self, directory):
        from ..ckpt import save_checkpoint

        save_checkpoint(
            directory,
            state=self.state,
            hparams=self.hparams,
            feat_dict=self.model.feat_dict,
        )

    def restore(self, directory):
        from ..ckpt import restore_checkpoint

        self.state = restore_checkpoint(directory, self.state)
        return self

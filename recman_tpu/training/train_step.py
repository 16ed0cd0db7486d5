"""Optimizer factory + jitted train/eval steps.

The reference's per-batch flow (xDeepFM.fit_on_batch, xDeepFM.py:116-126)
re-creates the Adam optimizer every step — resetting its moments, a real
defect (SURVEY.md §2.3) — and re-encodes features on host. Here the whole
step is one compiled, donated function:

    state, loss = train_step(state, data, idx)

``data`` is the full pre-encoded dataset resident on device; ``idx`` is the
shuffled index slice for this mini-batch (padded with -1 to a static batch
size — padded rows get zero loss weight, so every step has identical shapes
and XLA compiles exactly once). The gather happens on device, so the host
never touches feature arrays inside the hot loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def create_optimizer(optimizer, learning_rate, **kwargs) -> optax.GradientTransformation:
    """Name -> optax transformation (reference utils.py:201-213 surface:
    adam / adagrad / gd / momentum; plus lamb for the large-batch recipe).

    ``learning_rate`` may be a float or an optax schedule.
    """
    if not isinstance(optimizer, str):
        return optimizer  # already a GradientTransformation
    name = optimizer.lower()
    if name == "adam":
        return optax.adam(learning_rate, **kwargs)
    if name == "adam_bf16m":
        # adam with the first moment STORED in bfloat16: ~2 fewer f32
        # passes over every param-shaped state array per step (measured
        # -0.44 ms on the bench config — BASELINE.md dispatch study).
        # Trajectories differ from f32 adam in the last bits; quality
        # gates recorded in BASELINE.md before it became the bench
        # default.
        return optax.adam(learning_rate, mu_dtype=jnp.bfloat16, **kwargs)
    if name == "adagrad":
        return optax.adagrad(learning_rate, **kwargs)
    if name in ("gd", "sgd"):
        return optax.sgd(learning_rate, **kwargs)
    if name == "momentum":
        return optax.sgd(learning_rate, momentum=kwargs.pop("momentum", 0.9), **kwargs)
    if name == "lamb":
        return optax.lamb(learning_rate, **kwargs)
    if name == "rowwise_adam":
        from .rowwise_adam import rowwise_adam

        return rowwise_adam(learning_rate, **kwargs)
    raise ValueError(f"unknown optimizer {optimizer!r}")


class TrainState(NamedTuple):
    """Carried training state (donated through the jitted step)."""

    params: dict
    opt_state: tuple
    step: jnp.ndarray
    rng: jnp.ndarray


def init_state(model, optimizer, rng) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    return TrainState(
        params=params,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), dtype=jnp.int32),
        rng=state_rng,
    )


def gather_batch(data: dict, idx) -> tuple[dict, jnp.ndarray]:
    """Device-side batch gather: rows ``idx`` of every array in ``data``.

    idx entries < 0 are padding; returns (batch, weights) where weights
    zero out padded rows.
    """
    weights = (idx >= 0).astype(jnp.float32)
    safe = jnp.maximum(idx, 0)
    batch = {k: jnp.take(v, safe, axis=0) for k, v in data.items()}
    return batch, weights


# -- dataset packing --------------------------------------------------------
# A 40-feature schema means 40 row-gather kernels per step; packing all
# int columns into one (N, Ci) matrix and all float columns into one
# (N, Cf) matrix reduces that to 2-3 gathers, with per-feature views
# recovered as static column slices that fuse into their consumers.

PACKED_I32 = "__packed_i32"
PACKED_F32 = "__packed_f32"


def pack_dataset(data: dict) -> tuple[dict, tuple]:
    """Host-side: concat feature columns by dtype.

    Returns (packed dict, layout) where layout is a hashable tuple of
    (name, key, start, width, squeeze) entries for unpack_batch.
    """
    import numpy as np

    packed: dict = {}
    layout = []
    cols_by_key = {PACKED_I32: [], PACKED_F32: []}
    n = None
    for name, arr in data.items():
        arr = np.asarray(arr)
        if name == "y" or arr.ndim > 2:
            packed[name] = arr
            continue
        n = arr.shape[0]
        key = PACKED_I32 if np.issubdtype(arr.dtype, np.integer) else PACKED_F32
        width = 1 if arr.ndim == 1 else arr.shape[1]
        start = sum(w for _, w in cols_by_key[key])
        cols_by_key[key].append((arr, width))
        layout.append((name, key, start, width, arr.ndim == 1))
    # all-1-wide groups interleave with the threaded native kernel when
    # built (native/criteo_parser.cpp pack_columns_32 — this pack runs per
    # chunk in the streaming fit path and np.stack's single-threaded
    # strided write was its measured bottleneck: 0.28 s per 262k x 26
    # chunk, BASELINE.md); np.stack is the no-toolchain fallback (itself
    # the fastest numpy interleave measured: 0.28s vs 0.59s per-column
    # assignment vs 1.5s concatenate). Mixed widths use assignment.
    for key, cols in cols_by_key.items():
        if not cols:
            continue
        dtype = np.int32 if key == PACKED_I32 else np.float32
        if all(w == 1 for _, w in cols):
            arrs = [arr.astype(dtype, copy=False) for arr, _ in cols]
            if n is not None and n * len(arrs) >= 1 << 20:
                try:
                    from ..data.native_loader import pack_columns_32

                    packed[key] = pack_columns_32(arrs)
                    continue
                except Exception:  # no toolchain / build failure
                    pass
            packed[key] = np.stack(arrs, axis=1)
            continue
        out = np.empty((n, sum(w for _, w in cols)), dtype=dtype)
        s = 0
        for arr, w in cols:
            if arr.ndim == 1:
                out[:, s] = arr
            else:
                out[:, s: s + w] = arr
            s += w
        packed[key] = out
    return packed, tuple(layout)


def unpack_batch(batch: dict, layout) -> dict:
    """Static column slices back to the per-feature batch dict (traced)."""
    out = {k: v for k, v in batch.items() if k not in (PACKED_I32, PACKED_F32)}
    for name, key, start, width, squeeze in layout:
        col = jax.lax.slice_in_dim(batch[key], start, start + width, axis=1)
        out[name] = col[:, 0] if squeeze else col
    return out


def _one_step(model, optimizer, state: TrainState, data: dict, idx,
              layout=()) -> tuple[TrainState, jnp.ndarray]:
    """One un-jitted SGD step (shared by the jitted single/unrolled steps)."""
    rng, dropout_rng = jax.random.split(state.rng)
    batch, weights = gather_batch(data, idx)
    if layout:
        batch = unpack_batch(batch, layout)

    def loss_fn(params):
        return model.loss(
            params, batch, training=True, rng=dropout_rng, weights=weights
        )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    with jax.named_scope("optimizer_update"):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1, rng), loss


def make_train_step(model, optimizer):
    """Build the compiled train step for ``model``; state is donated so
    params/opt-state update in place in HBM. ``layout`` (static) unpacks a
    packed dataset (pack_dataset) after the gather."""

    def step_fn(state: TrainState, data: dict, idx,
                layout=()) -> tuple[TrainState, jnp.ndarray]:
        return _one_step(model, optimizer, state, data, idx, layout)

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=("layout",))


def make_train_step_unrolled(model, optimizer, unroll: int):
    """``unroll`` consecutive steps in ONE dispatch: (state, data,
    idx_mat (unroll, B), layout) -> (state, (unroll,) losses).

    Unlike the lax.scan epoch (make_train_epoch — XLA copies the ~550 MB
    donated carry per scan iteration; NOTES.md dead ends), a statically
    UNROLLED chain aliases the carry through the whole program, so this
    only trades dispatch count for graph size. Useful when per-dispatch
    host latency is visible next to the step time (e.g. remote-dispatch
    links); semantics are exactly ``unroll`` sequential steps
    (tests/test_training.py bit-parity)."""
    assert unroll >= 1

    def step_fn(state: TrainState, data: dict, idx_mat, layout=()):
        losses = []
        for i in range(unroll):
            state, loss = _one_step(model, optimizer, state, data,
                                    idx_mat[i], layout)
            losses.append(loss)
        return state, jnp.stack(losses)

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=("layout",))


# -- stacked same-shape table storage ---------------------------------------
# ops.embedding.stacked_tables has the rationale: one (T, V, k) leaf for
# the packed layer's same-shape tables = ONE optimizer fusion instead of
# T and an unsplit batched backward grad. Checkpoints/eval stay in the
# reference-parity per-table form via the transforms below.

STACKED_KEY = "__stacked_feat_embed"


def stack_table_params(model, params) -> tuple[dict, tuple] | None:
    """Per-table params -> stacked-storage params, or None if the model
    has no eligible packed group (PackedEmbeddingLinear.stackable)."""
    packed = getattr(model, "packed", None)
    names = packed.stackable() if packed is not None else None
    if not names:
        return None
    prefix = model.embeddings.prefix
    keys = {f"{prefix}{n}_feat_embed" for n in names}
    out = {k: v for k, v in params.items() if k not in keys}
    out[STACKED_KEY] = jnp.stack(
        [params[f"{prefix}{n}_feat_embed"] for n in names]
    )
    return out, names


def unstack_table_params(model, params) -> dict:
    """Stacked-storage params -> the reference-parity per-table dict
    (checkpoint/eval/export form). No-op for unstacked params."""
    if STACKED_KEY not in params:
        return dict(params)
    names = model.packed.stackable()
    prefix = model.embeddings.prefix
    out = {k: v for k, v in params.items() if k != STACKED_KEY}
    stack = params[STACKED_KEY]
    for i, n in enumerate(names):
        out[f"{prefix}{n}_feat_embed"] = stack[i]
    return out


def _map_param_shaped(tree, param_keys: frozenset, fn):
    """Apply ``fn`` to every dict node whose key set equals ``param_keys``
    — i.e. the param-shaped moment trees inside an optax state (adam's
    mu/nu, adagrad's sum_of_squares, ...). Other nodes recurse."""
    if isinstance(tree, dict):
        if frozenset(tree.keys()) == param_keys:
            return fn(tree)
        return {
            k: _map_param_shaped(v, param_keys, fn) for k, v in tree.items()
        }
    if hasattr(tree, "_fields"):  # optax NamedTuple states
        return type(tree)(*(
            _map_param_shaped(getattr(tree, f), param_keys, fn)
            for f in tree._fields
        ))
    if isinstance(tree, (list, tuple)):
        return type(tree)(
            _map_param_shaped(v, param_keys, fn) for v in tree
        )
    return tree


def stack_train_state(model, state: TrainState) -> TrainState:
    """Whole-TrainState per-table -> stacked transform: params AND every
    param-shaped optimizer-moment tree. Pure reshaping — resuming from
    the stacked form is trajectory-identical (tests/test_stacked.py)."""
    res = stack_table_params(model, state.params)
    if res is None:
        return state
    params_s, _ = res
    keys = frozenset(state.params.keys())
    opt_s = _map_param_shaped(
        state.opt_state, keys, lambda d: stack_table_params(model, d)[0]
    )
    return TrainState(params_s, opt_s, state.step, state.rng)


def unstack_train_state(model, state: TrainState) -> TrainState:
    """Inverse of stack_train_state (no-op on per-table states)."""
    if STACKED_KEY not in state.params:
        return state
    keys = frozenset(state.params.keys())
    opt = _map_param_shaped(
        state.opt_state, keys, lambda d: unstack_table_params(model, d)
    )
    return TrainState(
        unstack_table_params(model, state.params), opt, state.step, state.rng
    )


def _one_step_stacked(model, optimizer, names, state: TrainState, data: dict,
                      idx, layout=()) -> tuple[TrainState, jnp.ndarray]:
    """_one_step against stacked-storage params (STACKED_KEY leaf)."""
    from ..ops import embedding as _emb_ops

    rng, dropout_rng = jax.random.split(state.rng)
    batch, weights = gather_batch(data, idx)
    if layout:
        batch = unpack_batch(batch, layout)

    def loss_fn(params):
        with _emb_ops.stacked_tables(names, params[STACKED_KEY]):
            return model.loss(
                params, batch, training=True, rng=dropout_rng, weights=weights
            )

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    with jax.named_scope("optimizer_update"):
        updates, opt_state = optimizer.update(
            grads, state.opt_state, state.params
        )
        params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1, rng), loss


def make_train_step_stacked(model, optimizer, unroll: int, names: tuple):
    """Unrolled train step over stacked-storage params (init the state
    from stack_table_params' dict; same (state, data, idx_mat, layout)
    signature as make_train_step_unrolled)."""
    assert unroll >= 1

    def step_fn(state: TrainState, data: dict, idx_mat, layout=()):
        losses = []
        for i in range(unroll):
            state, loss = _one_step_stacked(
                model, optimizer, names, state, data, idx_mat[i], layout
            )
            losses.append(loss)
        return state, jnp.stack(losses)

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=("layout",))


def make_train_epoch(model, optimizer):
    """A whole epoch of train steps as ONE lax.scan dispatch.

    Per-step dispatch costs ~1 ms through this machine's tunnel (measured:
    14.2 ms device-busy vs ~15.3 ms wall per step on the bench config);
    scanning the step over the epoch's (num_batches, batch_size) index
    matrix removes it. Returns (state, per-step losses). The per-step
    path (make_train_step) remains for loops that hook TensorBoard traces
    between batches.
    """

    def epoch_fn(state: TrainState, data: dict, idx_mat, layout=()):
        def body(state, idx):
            return _one_step(model, optimizer, state, data, idx, layout)

        return jax.lax.scan(body, state, idx_mat)

    return jax.jit(epoch_fn, donate_argnums=(0,), static_argnames=("layout",))


def make_eval_scan(model):
    """Whole-dataset batched forward in ONE dispatch: lax.scan of the eval
    body over the (num_batches, batch_size) index matrix.

    The per-batch host loop (reference DeepModel.py:50-57) costs one
    dispatch round-trip per batch — ~ms each through this machine's
    tunnel, which dominates epoch evals at small batch sizes. Returns
    flat (num_batches*batch_size,) preds; the caller slices off the
    padding tail.
    """

    def scan_fn(params, data, idx_mat, override, training: bool, layout=()):
        rng = jax.random.PRNGKey(0) if training else None

        def body(carry, idx):
            batch, _ = gather_batch(data, idx)
            if layout:
                batch = unpack_batch(batch, layout)
            preds = model.apply(
                params, batch, training=training, rng=rng,
                linear_override=override,
            )
            return carry, preds

        _, preds = jax.lax.scan(body, 0, idx_mat)
        return preds.reshape(-1)

    return jax.jit(scan_fn, static_argnames=("training", "layout"))


def make_eval_step(model):
    """Compiled batched forward: (params, data, idx, override) -> (B,) preds.

    ``training`` is a static arg — the reference evaluates during fit with
    training=True (DeepModel.py:103-111, dropout live in eval metrics — a
    quirk we support but don't default to)."""

    def step_fn(params, data, idx, override, training: bool, layout=()):
        batch, _ = gather_batch(data, idx)
        if layout:
            batch = unpack_batch(batch, layout)
        rng = jax.random.PRNGKey(0) if training else None
        return model.apply(
            params, batch, training=training, rng=rng, linear_override=override
        )

    return jax.jit(step_fn, static_argnames=("training", "layout"))

"""Fused embedding-backward + Adam training: the scatter-free hot loop.

STATUS: DEAD-END-FROZEN (round 4, 2026-08-21 — the VERDICT r3 item-6
verdict). Measured 237.6k vs the standard path's 665k+ ex/s at the bench
config. The two prescribed revisit levers are now both accounted for:
(a) "one batched kernel over 26 tables" shipped INSIDE the standard path
as the segmat backward (ops/embedding.py, the round-3/4 defaults) — the
standard step already has the batched-kernel win without this module's
storage redesign; (b) "fold k into lanes for the (tile_v, 17) Adam
sweep" requires exactly the row-major/narrow-minor kernel orientation
that tools/bench_r4c.py measured CATASTROPHICALLY slow (29.8 vs 12.2
ms/step — Mosaic lane-pads narrow accumulators/stores; the field-major
rule is structural, not tunable), and the (V, 17) persistent storage
itself pays a 7.5x HBM layout tax on every Adam pass (the round-2
postmortem) that no kernel change removes — only (V, 32) padding would,
which adds +78% Adam bytes (~+1.3 ms) and erases the win. The module
stays as a bit-parity-tested opt-in (its trajectory-identity tests are
cheap CPU) for the regime it was designed for (k >= 96 embeddings /
dense-per-tile id streams), but it is NOT to be re-benchmarked on the
headline config each round.


Single-chip counterpart of the standard train step (train_step.py) for
models with a packed embedding+linear path (layers/packed.py). The
standard step's sparse-parameter pipeline per feature is

    concat [table|bias|w] -> gather -> ... -> slice cotangent ->
    sort -> permute -> scatter-add dense grad -> optax Adam
    (7 full-table HBM passes)

(~6 of 14.2 ms on the bench config — tools/profile_step.py; NOTES.md).
This module replaces it with

    persistent packed storage -> gather (+0 perturbation) -> ... ->
    pert cotangent -> batched sort/permute ->
    segment_adam_update kernel (ops/sparse_adam.py: grad build + L2 fold
    + Adam, all in VMEM; 6 table-sized HBM passes, the dense-Adam floor)

Semantics are IDENTICAL to the standard step (same Adam math, same L2
gradients, duplicates sum, untouched rows decay their moments) — checked
end-to-end by tests/test_fused_adam.py against the standard Trainer.

How the pieces fit (the three hooks this file ties together):

1. **Persistent packed storage**: per packable feature, one
   (storage_vpad(V), k [+1] + 1) f32 matrix [table | (bias) | w-slice].
   The per-step concat/slice of layers/packed.py phase 1 disappears;
   checkpoints keep the reference variable names (layers.py:95-110 /
   layers.py:317-328) via the export/import translation below.
2. **Zero-perturbation cotangent capture** (ops.embedding.fused_apply):
   packed.py gathers rows from ``stop_gradient(storage)`` and adds a
   zeros "perturbation" per feature; the gradient w.r.t. that
   perturbation IS the per-row cotangent stream — no dense table grad,
   no scatter, ever.
3. **segment_adam_update** (ops/sparse_adam.py): per vocab tile, builds
   the grad from the tile's sorted cotangent slice by MXU mask-matmul,
   folds the dense L2 term (the towers' l2() penalties — layers.py:
   188-193, 349-354 — contribute exactly ``l2_reg * w`` to each table's
   gradient given l2_loss = sum(x^2)/2), and applies exact optax.adam.

The loss value stays bit-equal too: inside the step, the model sees
live stop-gradient views of the storage under the reference parameter
names, so every layer's l2() reads current weights.

Scope: single shard, optimizer "adam" (the kernel implements Adam's
math). The SPMD path (parallel/train_pjit.py) keeps optax — same rule
as every fused op here (CLAUDE.md invariants).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import BaseHyperParameters
from ..features import MultiValCsvFeat, MultiValSparseFeat
from ..ops.embedding import fused_apply
from ..ops.sparse_adam import segment_adam_update, storage_vpad
from .train_step import TrainState, gather_batch, unpack_batch
from .trainer import Trainer

ADAM_B1, ADAM_B2, ADAM_EPS = 0.9, 0.999, 1e-8


def _packed_l2_cols(emb, lin) -> tuple:
    """Per-column L2 coefficient of the packed [table|(bias)|w] matrix in
    the kernel's convention (penalty = c * sum(w^2)). Layer penalties are
    ``l2_reg * l2_loss(x)`` with l2_loss = sum(x^2)/2 (utils/numerics.py),
    so c = l2_reg / 2. Bias tables carry no penalty (reference
    layers.py:188-193 sums table L2 only)."""
    cols = [0.5 * float(emb.l2_reg)] * emb.embedding_size
    if emb.use_bias:
        cols.append(0.0)
    cols.append(0.5 * float(lin.l2_reg))
    return tuple(cols)


def _feat_ids(feat, batch):
    """The exact id array layers/packed.py gathers with (multi-val ids are
    clamped; their padding positions produce zero cotangents through the
    presence masks, so clamped id 0 accumulates nothing)."""
    ids = batch[feat.name]
    if isinstance(feat, (MultiValCsvFeat, MultiValSparseFeat)):
        ids = jnp.maximum(ids, 0)
    return ids


def make_fused_train_step(model, optimizer, lr_fn, *, tile_v=1024,
                          chunk_n=512):
    """Compiled fused step: (fstate, data, idx, layout) -> (fstate, loss).

    ``fstate`` is the dict pytree built by FusedAdamTrainer._carve:
    {"rest", "opt", "w", "m", "v", "step", "rng"} — donated, so storage
    and moments update in place in HBM.
    """
    emb, lin = model.embeddings, model.linear
    feats = list(model.packed.packable)
    k = emb.embedding_size
    ncols = k + (1 if emb.use_bias else 0) + 1
    l2_cols = _packed_l2_cols(emb, lin)

    def step_fn(fstate, data, idx, layout=()):
        rng, dropout_rng = jax.random.split(fstate["rng"])
        batch, weights = gather_batch(data, idx)
        if layout:
            batch = unpack_batch(batch, layout)
        storage = fstate["w"]

        ids_by_name = {f.name: _feat_ids(f, batch) for f in feats}
        perts = {
            f.name: jnp.zeros((*ids_by_name[f.name].shape, ncols), jnp.float32)
            for f in feats
        }

        def loss_fn(rest, perts):
            # the model sees live stop-gradient views of the storage under
            # the reference parameter names: l2() values are current, and
            # their gradients are zero here (the kernel folds them instead)
            params = dict(rest)
            w_live = rest[f"{lin.prefix}linear_w"]
            for f in feats:
                sw = jax.lax.stop_gradient(storage[f.name])
                params[f"{emb.prefix}{f.name}_feat_embed"] = sw[: f.feat_size, :k]
                if emb.use_bias:
                    params[f"{emb.prefix}{f.name}_feat_bias"] = sw[: f.feat_size, k]
                # overwriting a segment zeroes its cotangent into rest's
                # linear_w, so optax only sees dense/unpacked-segment grads
                w_live = jax.lax.dynamic_update_slice(
                    w_live, sw[: f.feat_size, -1], (lin.offsets[f.name],)
                )
            params[f"{lin.prefix}linear_w"] = w_live
            with fused_apply(storage, perts):
                return model.loss(
                    params, batch, training=True, rng=dropout_rng,
                    weights=weights,
                )

        loss, (g_rest, g_perts) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(fstate["rest"], perts)

        updates, opt_state = optimizer.update(
            g_rest, fstate["opt"], fstate["rest"]
        )
        rest = optax.apply_updates(fstate["rest"], updates)

        lr = lr_fn(fstate["step"])  # optax evaluates schedules at the
        # pre-increment count; the kernel's bias correction is 1-based
        step1 = fstate["step"] + 1

        # batched sort/permute across same-shape features (one big sort
        # beats 26 — see ops.embedding._lookup_multi_bwd), then one
        # fused grad+L2+Adam kernel per table
        groups: dict = {}
        for f in feats:
            key = (int(np.prod(ids_by_name[f.name].shape)),
                   storage[f.name].shape[0])
            groups.setdefault(key, []).append(f)

        def auto_chunk(n, vpad):
            # the kernel's mask-matmul work is num_tiles * ceil(rows_in_
            # tile / chunk) * chunk * tile_v * C — i.e. ~V * chunk when
            # chunk >> rows-per-tile. Size chunks to ~2x the MEAN rows per
            # tile (skewed/hot tiles just run more fori_loop iterations)
            mean_rows = max(1, n * tile_v // max(vpad, 1))
            return max(64, min(chunk_n, -(-2 * mean_rows // 8) * 8))

        new_w, new_m, new_v = dict(storage), dict(fstate["m"]), dict(fstate["v"])
        for (n, _vp), group in groups.items():
            chunk = auto_chunk(n, _vp)
            ids_mat = jnp.stack(
                [ids_by_name[f.name].reshape(-1).astype(jnp.int32) for f in group]
            )
            g_mat = jnp.stack([g_perts[f.name].reshape(-1, ncols) for f in group])
            iota = jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32), (len(group), n)
            )
            sids, order = jax.lax.sort_key_val(ids_mat, iota, dimension=1)
            if n > 32_768:
                # batched take_along_axis gets a pathological layout at
                # large N (50 ms at N=65536 — ops/embedding.py
                # PERMUTE_BATCHED_MAX_N rationale); permute per-table
                sg = None
                sg_rows = [
                    jnp.take(g_mat[i], order[i], axis=0)
                    for i in range(len(group))
                ]
            else:
                sg = jnp.take_along_axis(g_mat, order[:, :, None], axis=1)
                sg_rows = [sg[i] for i in range(len(group))]
            for i, f in enumerate(group):
                new_w[f.name], new_m[f.name], new_v[f.name] = segment_adam_update(
                    storage[f.name], fstate["m"][f.name], fstate["v"][f.name],
                    sids[i], sg_rows[i], lr=lr, step=step1,
                    b1=ADAM_B1, b2=ADAM_B2, eps=ADAM_EPS,
                    l2=l2_cols, tile_v=tile_v, chunk_n=chunk,
                )

        out = {"rest": rest, "opt": opt_state, "w": new_w, "m": new_m,
               "v": new_v, "step": step1, "rng": rng}
        return out, loss

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=("layout",))


def _find_adam(opt_state):
    """The ScaleByAdamState inside an optax.adam chain state (or None)."""
    for leaf in jax.tree_util.tree_leaves(
        opt_state,
        is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState),
    ):
        if isinstance(leaf, optax.ScaleByAdamState):
            return leaf
    return None


def _set_counts(opt_state, step):
    """Every ``count`` field in an optax chain state set to ``step`` (so
    exported checkpoints resume schedules and bias correction exactly)."""
    step = jnp.asarray(step, jnp.int32)

    def fix(s):
        # NB: check _fields, not hasattr — namedtuples have a .count METHOD
        if hasattr(s, "_fields"):
            if "count" in s._fields:
                s = s._replace(count=step)
            return type(s)(*[fix(x) for x in s]) if any(
                hasattr(x, "_fields") for x in s
            ) else s
        return s

    return tuple(fix(s) for s in opt_state)


def storage_parts(model, params, feat):
    """[table | (bias) | w-slice] columns of one packable feature, 2-D each
    (reference-named params tree -> the feature's packed-storage columns)."""
    emb, lin = model.embeddings, model.linear
    cols = [params[f"{emb.prefix}{feat.name}_feat_embed"][: feat.feat_size]]
    if emb.use_bias:
        cols.append(
            params[f"{emb.prefix}{feat.name}_feat_bias"][: feat.feat_size, None]
        )
    off = lin.offsets[feat.name]
    cols.append(
        params[f"{lin.prefix}linear_w"][off: off + feat.feat_size][:, None]
    )
    return cols


def materialize_params(model, feats, tree_rest, stores) -> dict:
    """rest tree + per-feature storage-shaped dict -> full ref-named tree."""
    emb, lin = model.embeddings, model.linear
    k = emb.embedding_size
    out = dict(tree_rest)
    w_full = out[f"{lin.prefix}linear_w"]
    for f in feats:
        sw = stores[f.name]
        out[f"{emb.prefix}{f.name}_feat_embed"] = sw[: f.feat_size, :k]
        if emb.use_bias:
            out[f"{emb.prefix}{f.name}_feat_bias"] = sw[: f.feat_size, k]
        w_full = jax.lax.dynamic_update_slice(
            w_full, sw[: f.feat_size, -1], (lin.offsets[f.name],)
        )
    out[f"{lin.prefix}linear_w"] = w_full
    return out


def _copy_tree(tree):
    """Fresh buffers for every array leaf. The fused step donates its whole
    state dict, so (a) no two leaves may alias one buffer (jnp.zeros_like
    results can), and (b) carve/export must not share buffers with a live
    TrainState that a later donation would invalidate."""
    return jax.tree_util.tree_map(
        lambda x: jnp.array(x, copy=True) if isinstance(x, jax.Array) else x,
        tree,
    )


class FusedAdamTrainer(Trainer):
    """Trainer whose hot loop runs the fused backward+Adam step.

    Drop-in for the standard Trainer (same fit/predict/evaluate/save/
    restore surface, reference DeepModel.py:17-228); requires optimizer
    "adam" and a model with a PackedEmbeddingLinear (``model.packed``).
    Checkpoints stay interchangeable with the standard Trainer:
    export_state()/save() translate the kernel-owned storage and moments
    back into the reference-named params + one optax.adam state, and
    restore()/import_state() carve them out again.
    """

    def __init__(self, model, hparams=None, *, tile_v=1024, chunk_n=512,
                 **kwargs):
        assert not kwargs.get("epoch_in_one_dispatch"), \
            "fused trainer keeps the pipelined per-step loop"
        super().__init__(model, hparams, **kwargs)
        opt_name = self.hparams.get(BaseHyperParameters.Optimizer, "adam")
        assert isinstance(opt_name, str) and opt_name.lower() == "adam", (
            "FusedAdamTrainer implements Adam's update rule; got "
            f"{opt_name!r}"
        )
        packed = getattr(model, "packed", None)
        assert packed is not None and packed.packable, \
            "model has no packed embedding+linear path"
        lr = self.hparams.get(BaseHyperParameters.LearningRate, 0.001)
        self._lr_fn = lr if callable(lr) else (
            lambda step, _lr=float(lr): jnp.float32(_lr)
        )
        self.tile_v = tile_v
        self._feats = list(packed.packable)
        self._fused_step = make_fused_train_step(
            model, self.optimizer, self._lr_fn, tile_v=tile_v, chunk_n=chunk_n
        )
        self._fstate = self._carve(self.state.params, self.state.opt_state,
                                   self.state.step, self.state.rng)
        # the full-tree opt state from init_state is dead weight now
        # (rest-tree moments live in _fstate); drop its HBM
        self.state = self.state._replace(opt_state=())
        self._dirty = False

    # -- state surgery -------------------------------------------------------
    def _storage_parts(self, params, feat):
        return storage_parts(self.model, params, feat)

    def _carve(self, params, opt_state, step, rng) -> dict:
        """Full reference-named (params, optax state) -> fused state dict."""
        emb = self.model.embeddings
        adam = _find_adam(opt_state)
        rest = dict(params)
        storage, mom_m, mom_v = {}, {}, {}
        for f in self._feats:
            vpad = storage_vpad(f.feat_size, self.tile_v)
            pad = [(0, vpad - f.feat_size), (0, 0)]
            w = jnp.pad(jnp.concatenate(self._storage_parts(params, f), axis=1), pad)
            storage[f.name] = w.astype(jnp.float32)
            for box, tree in ((mom_m, adam.mu if adam else None),
                              (mom_v, adam.nu if adam else None)):
                if tree is None:
                    box[f.name] = jnp.zeros_like(w)
                else:
                    box[f.name] = jnp.pad(
                        jnp.concatenate(self._storage_parts(tree, f), axis=1), pad
                    ).astype(jnp.float32)
            rest.pop(f"{emb.prefix}{f.name}_feat_embed")
            if emb.use_bias:
                rest.pop(f"{emb.prefix}{f.name}_feat_bias")
        # linear_w stays whole in rest: its packable segments get zero
        # gradients (the step overwrites them under stop_gradient), so
        # optax never moves them; export() refreshes them from storage
        if adam is not None:
            mu = {k: v for k, v in adam.mu.items() if k in rest}
            nu = {k: v for k, v in adam.nu.items() if k in rest}
            opt_rest = _set_counts(self.optimizer.init(rest), step)
            opt_rest = tuple(
                s._replace(mu=mu, nu=nu, count=jnp.asarray(step, jnp.int32))
                if isinstance(s, optax.ScaleByAdamState) else s
                for s in opt_rest
            )
        else:
            opt_rest = self.optimizer.init(rest)
        return _copy_tree(
            {"rest": rest, "opt": opt_rest, "w": storage, "m": mom_m,
             "v": mom_v, "step": jnp.asarray(step, jnp.int32), "rng": rng}
        )

    def _materialize(self, tree_rest, stores) -> dict:
        return materialize_params(self.model, self._feats, tree_rest, stores)

    def _sync(self):
        """Refresh self.state.params from the fused state (cheap slices;
        runs once per epoch before eval, not in the hot loop)."""
        if not self._dirty:
            return
        fs = self._fstate
        params = self._materialize(fs["rest"], fs["w"])
        self.state = TrainState(params, self.state.opt_state,
                                fs["step"], fs["rng"])
        self._dirty = False

    def export_state(self) -> TrainState:
        """Full standard-Trainer TrainState: reference-named params + ONE
        optax.adam state whose mu/nu carry the kernel-owned moments."""
        self._sync()
        fs = self._fstate
        params = self.state.params
        adam_rest = _find_adam(fs["opt"])

        def full_moments(rest_tree, stores):
            # rest moments (zeros for anything optax lacks), then the
            # table entries + linear_w packable segments from the
            # kernel-owned moment storage — the same translation
            # _materialize does for the weights themselves
            base = {
                k: (rest_tree[k] if rest_tree and k in rest_tree
                    else jnp.zeros_like(v))
                for k, v in fs["rest"].items()
            }
            return self._materialize(base, stores)

        mu = full_moments(adam_rest.mu if adam_rest else None, fs["m"])
        nu = full_moments(adam_rest.nu if adam_rest else None, fs["v"])
        full_opt = _set_counts(self.optimizer.init(params), fs["step"])
        full_opt = tuple(
            s._replace(mu=mu, nu=nu, count=jnp.asarray(fs["step"], jnp.int32))
            if isinstance(s, optax.ScaleByAdamState) else s
            for s in full_opt
        )
        return _copy_tree(TrainState(params, full_opt, fs["step"], fs["rng"]))

    def import_state(self, state: TrainState):
        """Adopt a standard-Trainer TrainState (e.g. a restored ckpt)."""
        # a moment-less state at step>0 (e.g. this trainer's own .state,
        # whose opt_state is dropped) would silently reset Adam moments
        # while keeping the nonzero step (ADVICE r1)
        assert _find_adam(state.opt_state) is not None or int(state.step) == 0, (
            "import_state got a state without Adam moments at step "
            f"{int(state.step)}: moments would silently reset. Pass a "
            "full state (e.g. from export_state())."
        )
        self._fstate = self._carve(state.params, state.opt_state,
                                   state.step, state.rng)
        self.state = TrainState(state.params, (), state.step, state.rng)
        self._dirty = False
        return self

    # -- Trainer overrides ---------------------------------------------------
    def fit_on_batch(self, data: dict, idx, layout=()):
        self._fstate, loss = self._fused_step(
            self._fstate, data, jnp.asarray(idx), layout
        )
        self._dirty = True
        return loss

    def _predict_device(self, *args, **kwargs):
        self._sync()
        return super()._predict_device(*args, **kwargs)

    def save(self, directory):
        # sync FIRST so the state captured for the finally-restore is the
        # post-training one; capturing pre-sync left _dirty=False with
        # stale params after save() (ADVICE r1, medium)
        self._sync()
        state, self.state = self.state, self.export_state()
        try:
            super().save(directory)
        finally:
            self.state = state

    def restore(self, directory):
        from ..ckpt import restore_checkpoint

        template = self.export_state()
        return self.import_state(restore_checkpoint(directory, template))

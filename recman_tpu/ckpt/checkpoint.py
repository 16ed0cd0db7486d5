"""Checkpoint save/restore via Orbax + schema/hparam sidecars.

Reference: name-keyed flat variable dict -> tf.train.Checkpoint
(DeepModel.py:83-86) with dill-pickled hparams / feat_dict sidecars written
by BestModelFinder (BestModelFinder.py:57-68). Here the whole TrainState
pytree (params + optimizer state + step + rng) is checkpointed — so resume
continues Adam moments exactly — alongside JSON/pickle sidecars. Orbax
handles sharded arrays transparently, so the same call works for
row-sharded embedding tables on a mesh.
"""

from __future__ import annotations

import json
import logging
import os
import pickle

log = logging.getLogger(__name__)

STATE_DIR = "state"
HPARAMS_FILE = "hparams.json"
FEAT_DICT_FILE = "feat_dict.pkl"  # legacy/custom-type fallback
FEAT_DICT_JSON_FILE = "feat_dict.json"  # preferred: pure data, no code exec


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer()


def save_checkpoint(directory, state, hparams=None, feat_dict=None):
    """Write TrainState + sidecars under ``directory``."""
    directory = os.path.abspath(directory)
    os.makedirs(directory, exist_ok=True)

    ckptr = _checkpointer()
    path = os.path.join(directory, STATE_DIR)
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()

    if hparams is not None:
        clean = {
            k: (v if isinstance(v, (bool, int, float, str)) else str(v))
            for k, v in dict(hparams).items()
        }
        with open(os.path.join(directory, HPARAMS_FILE), "w") as f:
            json.dump(clean, f, indent=2)
    if feat_dict is not None:
        # JSON when every feature type round-trips (loads without code
        # execution); pickle fallback for custom encoder/scaler objects
        try:
            from ..features import schema_to_json

            schema_json = schema_to_json(feat_dict)
        except TypeError:
            with open(os.path.join(directory, FEAT_DICT_FILE), "wb") as f:
                pickle.dump(feat_dict, f, protocol=pickle.HIGHEST_PROTOCOL)
        else:
            with open(os.path.join(directory, FEAT_DICT_JSON_FILE), "w") as f:
                f.write(schema_json)
    log.info("Checkpoint saved to %s", directory)


def restore_checkpoint(directory, state_template):
    """Restore a TrainState matching ``state_template``'s structure/shapes
    (the reference requires one forward pass before restore because of lazy
    variables, DeepModel.py:83-86; our params exist at init so the template
    is always available)."""
    import jax

    directory = os.path.abspath(directory)
    ckptr = _checkpointer()
    restored = ckptr.restore(os.path.join(directory, STATE_DIR), state_template)

    from jax.sharding import NamedSharding

    def _replace(r, t):
        # restored leaves come back COMMITTED to device 0; a mixed-placement
        # state then fails at the next jitted step. Mesh-sharded template
        # leaves get re-placed onto their NamedSharding; everything else
        # (replicated scalars/params the template holds UNCOMMITTED) goes
        # back through the host so jit stays free to place it
        if isinstance(t, jax.Array) and isinstance(t.sharding, NamedSharding):
            return jax.device_put(r, t.sharding)
        if isinstance(r, jax.Array):
            import numpy as np

            return jax.numpy.asarray(np.asarray(r))
        return r

    restored = jax.tree.map(_replace, restored, state_template)
    log.info("Checkpoint restored from %s", directory)
    return restored


def load_feat_dict(directory):
    json_path = os.path.join(directory, FEAT_DICT_JSON_FILE)
    if os.path.exists(json_path):
        from ..features import schema_from_json

        with open(json_path) as f:
            return schema_from_json(f.read())
    # legacy/custom-type checkpoints: unpickling executes arbitrary code —
    # only load checkpoints from a trusted source
    with open(os.path.join(directory, FEAT_DICT_FILE), "rb") as f:
        return pickle.load(f)


def load_hparams(directory):
    with open(os.path.join(directory, HPARAMS_FILE)) as f:
        return json.load(f)

"""recman_tpu — a TPU-native CTR training framework (JAX / XLA / Pallas / pjit).

A ground-up rebuild of the capabilities of the ``recman`` reference
(single-device TensorFlow, see /root/reference) as an idiomatic TPU stack:

- feature schema + one-shot host preprocessing into dense device arrays
  (the reference re-encodes every mini-batch on host in the hot loop,
  reference: recman/tf/inputs.py DataInputs.load + DeepModel.py:190-197)
- pure-functional layer library and model zoo (FM, DeepFM, DCN, xDeepFM,
  AFM, DIN) as init/apply pairs
- a single jitted, donated train step with a held optimizer
  (the reference recreates Adam every batch — xDeepFM.py:116-126 — a defect
  we deliberately do not replicate)
- SPMD parallelism via jax.sharding Mesh (data × model axes): batch over
  `data`, row-sharded embedding tables over `model`
- Pallas TPU kernels for the hot ops (CIN interaction, embedding combine)

Logging mirrors recman/__init__.py:1-21 (stream handler, INFO).
"""

import logging

__version__ = "0.1.0"


def config_logger(level=logging.INFO):
    """Configure root stdlib logging like the reference (recman/__init__.py:1-21)."""
    logging.basicConfig(
        level=level,
        format="%(levelname)s:%(asctime)s:%(name)s:%(lineno)d: %(message)s",
    )


from .features import (  # noqa: E402,F401
    FeatureSet,
    HashedSparseFeat,
    SparseFeat,
    SparseValueFeat,
    DenseFeat,
    MultiValSparseFeat,
    MultiValCsvFeat,
    SequenceFeat,
    schema_from_json,
    schema_to_json,
)

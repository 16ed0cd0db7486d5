"""Test configuration: run everything on a virtual 8-device CPU mesh.

This forces the same pjit / collective code paths that run on a TPU pod
slice without real chips — the standard JAX answer to distributed testing
(see SURVEY.md §4). Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# jax is pre-imported by this machine's sitecustomize (axon PJRT plugin),
# so env vars alone don't stick — force the platform via jax.config too,
# and turn on the persistent compilation cache: XLA CPU compiles take
# ~1-2s each here and dominate test time otherwise.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def synthetic_df():
    """The reference's 16-row synthetic fixture (examples/xDeepFM_test.py:24-44)."""
    import pandas as pd

    rows = [
        ["USER_1", "ITEM_1", ["Treadmill", 3], "Outdoor", 123, "a|b|d", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_1", "ITEM_4", ["Treadmill", 3], "Treadmill", 123, "a|b", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_1", "ITEM_3", ["Outdoor", 3], "Outdoor", 124, "a|b", ["a", "b"], ["ITEM_1", "ITEM_2", "ITEM_3"], 1],
        ["USER_1", "ITEM_5", ["Outdoor", 3], "Outdoor", 124, "a|b", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_4", "ITEM_6", ["Rest", 3], "Rest", 124, "a|b", ["a", "b"], ["ITEM_1", "ITEM_2"], 0],
        ["USER_2", "ITEM_1", ["Treadmill", 3], "Treadmill", 125, "b|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 0],
        ["USER_2", "ITEM_4", ["Treadmill", 3], "Treadmill", 125, "b|c", ["a", "b"], ["ITEM_1", "ITEM_2", "ITEM_3"], 0],
        ["USER_2", "ITEM_2", ["Outdoor", 3], "Outdoor", 125, "b|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_2", "ITEM_5", ["Outdoor", 3], "Outdoor", 125, "b|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_5", "ITEM_1", ["Treadmill", 3], "Treadmill", 125, "b|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 0],
        ["USER_5", "ITEM_3", ["Rest", 3], "Rest", 125, "b|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_3", "ITEM_1", ["Treadmill", 3], "Treadmill", 125, "a|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_3", "ITEM_4", ["Treadmill", 3], "Treadmill", 125, "a|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 1],
        ["USER_3", "ITEM_2", ["Outdoor", 3], "Outdoor", 125, "a|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 0],
        ["USER_6", "ITEM_2", ["Outdoor", 3], "Outdoor", 125, "a|c", ["a", "b"], ["ITEM_1", "ITEM_2"], 0],
        ["USER_6", "ITEM_5", ["Outdoor", 3], "Outdoor", 125, "a|b|c|d", ["a", "b"], ["ITEM_1", "ITEM_2"], 0],
    ]
    return pd.DataFrame(
        rows,
        columns=[
            "USER_ID", "CLASS_ID", "CATEGORY_COUNT", "CATEGORY", "TIMESTAMP",
            "HISTORICAL_CATEGORIES", "MULTI_VAL_1", "SEQUENCE_VAL_1", "LABEL",
        ],
    )


@pytest.fixture
def synthetic_features(synthetic_df):
    """The reference's synthetic feature schema (examples/xDeepFM_test.py:47-72)."""
    from recman_tpu.features import FeatureSet, MultiValCsvFeat, SparseFeat

    df = synthetic_df
    fs = FeatureSet()
    fs["USER_ID"] = SparseFeat("USER_ID", feat_size=len(np.unique(df.USER_ID.values)))
    fs["CLASS_ID"] = SparseFeat("CLASS_ID", feat_size=len(np.unique(df.CLASS_ID.values)))
    fs["CATEGORY"] = SparseFeat("CATEGORY", feat_size=len(np.unique(df.CATEGORY.values)))
    fs["HISTORICAL_CATEGORIES"] = MultiValCsvFeat(
        "HISTORICAL_CATEGORIES", tags=("a", "b", "c", "d")
    )
    fs.initialize(df)
    return fs

"""Weight-transplant logit oracle vs THE REFERENCE ITSELF.

Loads one set of weights into both frameworks and compares forward logits
on a fixed 16-row batch — upgrading "numerically validated vs a port of the
reference loop" to "numerically validated vs the reference".

Protocol:
1. Build the 16-row synthetic fixture (reference examples/xDeepFM_test.py:24-44,
   4-feature subset) and the same schema in both frameworks.
2. Assert the two encoders produce identical ids (sorted classes -> 1..n,
   OOV=0; reference inputs.py:116-145 vs our features/encoders.py).
3. Init recman_tpu's xDeepFM params (flat name-keyed dict, CLAUDE.md
   invariant: names match the reference's variable names).
4. Lazy-init the reference xDeepFM (one forward; core/layers.py:98-110
   upsert) and assign our arrays into its ``variables`` by NAME (reshape
   only — flattened orders match: CIN filters are H0-major both sides,
   reference core/layers.py:722-726 vs ops/cin_interact.py).
5. Compare ``_out(training=False)`` (reference xDeepFM.py:47-102) against
   our ``Trainer.predict(training=False)`` to <= 1e-4.

Skips when TF or the reference tree is absent.
"""

import os
import sys

import numpy as np
import pandas as pd
import pytest

REFERENCE_ROOT = os.environ.get("RECMAN_REFERENCE_ROOT", "/root/reference")

tf = pytest.importorskip("tensorflow")
if not os.path.isdir(os.path.join(REFERENCE_ROOT, "recman")):
    pytest.skip("reference tree not available", allow_module_level=True)

# fmt: off
ROWS = [
    ["USER_1", "ITEM_1", "Outdoor",   "a|b|d",   1],
    ["USER_1", "ITEM_4", "Treadmill", "a|b",     1],
    ["USER_1", "ITEM_3", "Outdoor",   "a|b",     1],
    ["USER_1", "ITEM_5", "Outdoor",   "a|b",     1],
    ["USER_4", "ITEM_6", "Rest",      "a|b",     0],
    ["USER_2", "ITEM_1", "Treadmill", "b|c",     0],
    ["USER_2", "ITEM_4", "Treadmill", "b|c",     0],
    ["USER_2", "ITEM_2", "Outdoor",   "b|c",     1],
    ["USER_2", "ITEM_5", "Outdoor",   "b|c",     1],
    ["USER_5", "ITEM_1", "Treadmill", "b|c",     0],
    ["USER_5", "ITEM_3", "Rest",      "b|c",     1],
    ["USER_3", "ITEM_1", "Treadmill", "a|c",     1],
    ["USER_3", "ITEM_4", "Treadmill", "a|c",     1],
    ["USER_3", "ITEM_2", "Outdoor",   "a|c",     0],
    ["USER_6", "ITEM_2", "Outdoor",   "a|c",     0],
    ["USER_6", "ITEM_5", "Outdoor",   "a|b|c|d", 0],
]
# fmt: on
COLUMNS = ["USER_ID", "CLASS_ID", "CATEGORY", "HISTORICAL_CATEGORIES", "LABEL"]
TAGS = ("a", "b", "c", "d")


@pytest.fixture(scope="module")
def ref():
    """Import the reference with the pandas-compat transform shim
    (tools/run_reference_ml.py substitution 4 — explicit object upcast,
    semantics identical to reference inputs.py:128-139 under old pandas)."""
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from recman.tf import inputs as ref_inputs

    def _transform(self, X):
        if not isinstance(X, pd.Series):
            X = pd.Series(X)
        all_classes = set(self._encoder.classes_)
        copy = X.to_frame()
        col_name = copy.columns[0]
        copy[col_name] = copy[col_name].astype(object)
        copy.loc[~copy[col_name].isin(all_classes), col_name] = self.null_val
        return copy.apply(self._encoder.transform).values

    ref_inputs.ResilientLabelEncoder.transform = _transform

    from recman.tf.core import xDeepFM as RefXDeepFM
    from recman.tf.inputs import (
        DataInputs,
        FeatureDictionary,
        MultiValCsvFeat,
        SparseFeat,
    )

    return {
        "xDeepFM": RefXDeepFM,
        "DataInputs": DataInputs,
        "FeatureDictionary": FeatureDictionary,
        "MultiValCsvFeat": MultiValCsvFeat,
        "SparseFeat": SparseFeat,
    }


def _our_side(df):
    from recman_tpu import FeatureSet, MultiValCsvFeat, SparseFeat
    from recman_tpu.models import XDeepFM
    from recman_tpu.training import Trainer

    feat_dict = FeatureSet()
    for name in ("USER_ID", "CLASS_ID", "CATEGORY"):
        feat_dict[name] = SparseFeat(
            name, feat_size=len(np.unique(df[name].values))
        )
    feat_dict["HISTORICAL_CATEGORIES"] = MultiValCsvFeat(
        "HISTORICAL_CATEGORIES", tags=TAGS
    )
    feat_dict.initialize(df)

    # strict f32 CIN so the oracle compares at full precision
    model = XDeepFM(feat_dict, {"cin_compute_dtype": "float32"})
    trainer = Trainer(
        model,
        {"learning_rate": 0.01, "optimizer": "adam"},
        epoch=1,
        batch_size=16,
        random_seed=2019,
    )
    return feat_dict, trainer


def _ref_side(ref, df):
    feat_dict = ref["FeatureDictionary"]()
    for name in ("USER_ID", "CLASS_ID", "CATEGORY"):
        feat_dict[name] = ref["SparseFeat"](
            name=name,
            feat_size=len(np.unique(df[name].values)),
            dtype=tf.int64,
        )
    feat_dict["HISTORICAL_CATEGORIES"] = ref["MultiValCsvFeat"](
        name="HISTORICAL_CATEGORIES", tags=TAGS, dtype=tf.string
    )
    feat_dict.initialize(df)

    from recman.tf.hparams import xDeepFM as RefHyperParams

    hp_params = RefHyperParams()
    hp_val = next(iter(hp_params.grid_search()))
    hp_val["learning_rate"] = 0.01
    model = ref["xDeepFM"](
        feat_dict, hp_val, batch_size=16, metrics=(), random_seed=2019, epoch=1
    )
    return feat_dict, model


def test_weight_transplant_logit_oracle(ref):
    df = pd.DataFrame(ROWS, columns=COLUMNS)
    y = df["LABEL"].values.astype(np.float32)

    our_fd, trainer = _our_side(df)
    ref_fd, ref_model = _ref_side(ref, df)

    # 2. encoder agreement: identical ids for every sparse feature
    for name in ("USER_ID", "CLASS_ID", "CATEGORY"):
        ref_ids = np.asarray(
            ref_fd[name].encoder.transform(df[name])
        ).reshape(-1)
        our_ids = np.asarray(our_fd[name].encoder.transform(df[name].values))
        np.testing.assert_array_equal(ref_ids, our_ids, err_msg=name)

    # our logits (training=False; no overrides set)
    ours = np.asarray(trainer.predict(df, training=False))

    # 4. lazy-init reference variables with one forward pass
    inputs = ref["DataInputs"]()
    inputs.load(ref_fd, df, y)
    _ = ref_model._out(inputs, training=False)

    our_params = {k: np.asarray(v) for k, v in trainer.params.items()}
    ref_vars = ref_model.variables
    assert set(ref_vars) == set(our_params), (
        f"param-name mismatch:\n only-ref={sorted(set(ref_vars) - set(our_params))}"
        f"\n only-ours={sorted(set(our_params) - set(ref_vars))}"
    )
    for name, var in ref_vars.items():
        arr = our_params[name]
        assert int(np.prod(var.shape)) == arr.size, (
            f"{name}: ref {var.shape} vs ours {arr.shape}"
        )
        var.assign(arr.reshape(var.shape).astype(np.float32))

    ref_out = np.asarray(ref_model._out(inputs, training=False))

    np.testing.assert_allclose(ref_out, ours, atol=1e-4, rtol=1e-4)

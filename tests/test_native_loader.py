"""Native C++ Criteo parser vs the Python path: bit-for-bit parity.

The parser (native/criteo_parser.cpp, built on demand by
data/native_loader.py) must reproduce exactly what load_criteo_tsv +
create_criteo_features().transform produce — same siphash bucket ids
(pandas hash_array semantics), same log1p dense values, same missing-value
handling."""

import os

import numpy as np
import pytest

from recman_tpu.data import (
    CAT_NAMES,
    INT_NAMES,
    create_criteo_features,
    load_criteo_tsv,
)

pytestmark = pytest.mark.skipif(
    os.environ.get("RECMAN_SKIP_NATIVE") == "1", reason="native build disabled"
)


def _make_tsv(path, n_rows=200, seed=0):
    """Criteo-format TSV with edge cases: empty fields, negative ints,
    short (truncated) lines, repeated categorical values."""
    rs = np.random.RandomState(seed)
    vocab = ["ad4305ef", "68fd1e64", "", "x", "longish_token_value_0123456789"]
    lines = []
    for i in range(n_rows):
        label = str(rs.randint(0, 2))
        ints = [
            "" if rs.rand() < 0.2 else str(rs.randint(-3, 1000))
            for _ in range(13)
        ]
        cats = [
            vocab[rs.randint(len(vocab))] if rs.rand() < 0.9
            else f"tok{rs.randint(10_000)}"
            for _ in range(26)
        ]
        fields = [label] + ints + cats
        if i % 37 == 5:  # short line: trailing fields missing entirely
            fields = fields[: 1 + 13 + rs.randint(0, 26)]
        lines.append("\t".join(fields))
    with open(path, "w") as f:
        f.write("\n".join(lines))
        if seed % 2 == 0:
            f.write("\n")  # exercise both trailing-newline variants
    return path


@pytest.fixture(scope="module")
def tsv(tmp_path_factory):
    return _make_tsv(str(tmp_path_factory.mktemp("criteo") / "day.tsv"))


@pytest.fixture(scope="module")
def native():
    from recman_tpu.data.native_loader import NativeBuildError, get_lib

    try:
        get_lib()
    except NativeBuildError as e:  # pragma: no cover - no toolchain
        pytest.skip(f"no native toolchain: {e}")
    from recman_tpu.data.native_loader import load_criteo_tsv_native

    return load_criteo_tsv_native


class TestNativeParser:
    def test_matches_python_path(self, tsv, native):
        num_buckets = 1000
        got = native(tsv, num_buckets=num_buckets)

        raw = load_criteo_tsv(tsv)
        fs = create_criteo_features(num_buckets=num_buckets)
        want = fs.transform(raw, y=raw["y"])

        np.testing.assert_array_equal(got["y"], want["y"])
        for name in INT_NAMES:
            np.testing.assert_allclose(got[name], want[name], rtol=1e-6,
                                       err_msg=name)
        for name in CAT_NAMES:
            np.testing.assert_array_equal(got[name], want[name], err_msg=name)

    def test_no_trailing_newline(self, tmp_path, native):
        path = _make_tsv(str(tmp_path / "odd.tsv"), n_rows=57, seed=1)
        got = native(path, num_buckets=97)
        raw = load_criteo_tsv(path)
        fs = create_criteo_features(num_buckets=97)
        want = fs.transform(raw, y=raw["y"])
        assert got["y"].shape == (57,)
        for name in CAT_NAMES:
            np.testing.assert_array_equal(got[name], want[name], err_msg=name)

    def test_max_rows(self, tsv, native):
        got = native(tsv, num_buckets=50, max_rows=10)
        assert got["y"].shape == (10,)
        full = native(tsv, num_buckets=50)
        for k in got:
            np.testing.assert_array_equal(got[k], full[k][:10])

    def test_single_thread_matches_parallel(self, tsv, native):
        a = native(tsv, num_buckets=500, n_threads=1)
        b = native(tsv, num_buckets=500, n_threads=8)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])

"""Driver-contract tests: entry() jit-compiles; dryrun_multichip executes
one sharded train step on the 8-device CPU mesh."""

import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def graft():
    sys.path.insert(0, ".")
    import __graft_entry__

    return __graft_entry__


def test_entry_forward_jits(graft):
    import jax

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    out = np.asarray(out)
    assert out.shape == (32,)
    assert np.isfinite(out).all()
    assert (out >= 0).all() and (out <= 1).all()


def test_dryrun_multichip_8(graft):
    graft.dryrun_multichip(8)


def test_dryrun_multichip_odd(graft):
    # model axis falls back to 1 when the count isn't even
    graft.dryrun_multichip(1)

"""Driver-contract checks: entry() compiles, dryrun_multichip runs on the
virtual 8-device mesh."""
import sys

import numpy as np
import pytest
import jax

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


def test_entry_compiles_and_runs():
    fn, example_args = graft.entry()
    out = jax.jit(fn)(*example_args)
    out = np.asarray(out)
    assert out.shape == (example_args[0].shape[0],)
    assert np.all(np.isfinite(out))


@pytest.mark.slow
def test_dryrun_multichip():
    assert len(jax.devices()) == 8
    graft.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_multichip_4():
    graft.dryrun_multichip(4)

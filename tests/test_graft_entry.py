"""Driver-contract smoke tests (__graft_entry__)."""

import sys

import pytest

import jax

sys.path.insert(0, "/root/repo")

import __graft_entry__ as graft


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip_8():
    graft.dryrun_multichip(8)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs 4 virtual devices")
def test_dryrun_multichip_4():
    graft.dryrun_multichip(4)


def test_entry_shapes():
    fn, args = graft.entry()
    # Trace-only check on CPU (full 224x224 forward is heavy eagerly).
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (8, 3000)

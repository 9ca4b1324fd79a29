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


def test_dryrun_bootstraps_bare_environment():
    """The driver calls dryrun_multichip(8) bare — no XLA_FLAGS, no forced
    platform. It must bootstrap the virtual CPU mesh itself (VERDICT r1 #1)."""
    import os
    import subprocess

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "_DLVQA_DRYRUN_CHILD")
    }
    env["PYTHONPATH"] = "/root/repo"
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=env,
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_entry_shapes():
    fn, args = graft.entry()
    # Trace-only check on CPU (full 224x224 forward is heavy eagerly).
    shape = jax.eval_shape(fn, *args)
    assert shape.shape == (8, 3000)

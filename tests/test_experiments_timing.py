"""The shared probe timing helper (experiments/_timing.py) must keep
working: every experiments/probe_* measurement routes through it, so an
import or tracing regression there silently breaks the repo's bench
methodology (CLAUDE.md calls the on-device differenced-loop method
load-bearing for trusting timings)."""

import os
import sys

import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "experiments"),
)
from _timing import timed_ms  # noqa: E402


def test_timed_ms_runs_array_and_scalar_outputs(capsys):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).standard_normal((4, 4)),
                    jnp.float32)
    ms_arr = timed_ms("tiny matmul", lambda a, b: a @ b, x, w)
    ms_scalar = timed_ms("tiny sum", lambda a: a.sum(), x, width=12,
                         verbose=True)
    # On CPU at toy scale the differenced value can be ~0 or slightly
    # negative (sub-dispatch noise); the contract here is "runs, returns
    # a float, prints one line per call", not a meaningful magnitude.
    assert isinstance(ms_arr, float) and isinstance(ms_scalar, float)
    out = capsys.readouterr().out
    assert "tiny matmul" in out and "ms/iter" in out
    assert "tiny sum: compiling..." in out

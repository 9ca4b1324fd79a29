"""Shared on-device timing helper for the experiment probes.

One implementation of the repo's bench methodology (CLAUDE.md;
docs/PERF_NOTES.md "Environment gotchas") so a fix to it cannot drift
between probes: never wall-clock individual dispatches through the
relay (~30 ms RTT) — instead jit ONE ``lax.fori_loop`` that runs the
op n times with a chained data dependency (a 1e-30 perturbation of the
first argument defeats loop-invariant hoisting without changing the
math), fetch one scalar, and difference a short run against a long run
so dispatch/fetch costs cancel.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
from jax import lax

SHORT_ITERS, LONG_ITERS = 2, 22


def timed_ms(name, fn, *args, width: int = 34, verbose: bool = False):
    """Per-iteration device time of ``fn(*args)`` in ms.

    ``fn`` may return an array of any shape (its f32 sum feeds the loop
    carry) or a scalar. The FIRST argument must be a floating-point
    array — it carries the iteration-to-iteration data dependency.
    Prints one aligned line and returns the per-iteration milliseconds.
    """

    def looped(n, *xs):
        # xs are REAL jit parameters, not closure captures: a closed-over
        # array is embedded in the program as a lowering constant, which
        # at probe shapes (multi-GB tensors) stalls compilation and trips
        # jax's captured-constants warning. n is a TRACED scalar so the
        # short and long runs share ONE compiled program — on relay-backed
        # runtimes each compile RPC can cost minutes (round 5: 30-60 min
        # under a degraded relay), so one program per probe matters.
        def body(i, acc):
            out = fn(*((xs[0] + acc.astype(xs[0].dtype) * 1e-30,)
                       + xs[1:]))
            out = out.astype(jnp.float32)
            if out.ndim:
                out = out.sum()
            return acc + out * 1e-30

        return lax.fori_loop(0, n, body, jnp.float32(0.0))

    run = jax.jit(looped)
    if verbose:
        print(f"  {name}: compiling...", flush=True)
    float(run(SHORT_ITERS, *args))  # compile the shared loop body; warm
    float(run(LONG_ITERS, *args))
    t0 = time.perf_counter()
    float(run(SHORT_ITERS, *args))
    t_short = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(run(LONG_ITERS, *args))
    t_long = time.perf_counter() - t0
    ms = (t_long - t_short) / (LONG_ITERS - SHORT_ITERS) * 1e3
    print(f"{name:{width}s}: {ms:7.3f} ms/iter "
          f"(short {t_short * 1e3:.1f} ms, long {t_long * 1e3:.1f} ms)",
          flush=True)
    return ms

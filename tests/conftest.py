"""Test harness: run everything on CPU with 8 virtual XLA devices so
mesh/sharding tests work without TPU hardware (SURVEY.md §4 item 4)."""

import os

# Must be set before jax initializes its backends. Note: a plain
# JAX_PLATFORMS env var is NOT enough on machines where a TPU plugin's
# sitecustomize programmatically sets jax.config.jax_platforms — the
# config update below wins over both.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _isolate_jax_globals():
    """Entry-point tests legitimately run main.py, which updates global
    jax config (prng impl, debug_nans). Those leaks are real trouble for
    later tests: a different prng impl changes the rng key SHAPE, so the
    same step traces to a different program whose fusion/reduction
    rounding differs — enough (Adam-amplified) to flake borderline
    equality tolerances. Restore the globals after every test."""
    prng = jax.config.jax_default_prng_impl
    debug_nans = jax.config.jax_debug_nans
    yield
    if jax.config.jax_default_prng_impl != prng:
        jax.config.update("jax_default_prng_impl", prng)
    if jax.config.jax_debug_nans != debug_nans:
        jax.config.update("jax_debug_nans", debug_nans)

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

"""Persistent XLA compilation cache setup.

On relay-backed TPU runtimes the compile RPC is the dominant (and
highly variable — 80-140 s measured for the full eval program) cost of
cold-starting any entry point.  JAX's persistent compilation cache
turns that into a ~20 s disk load for repeat invocations, which keeps
`bench.py` / `main.py` robust against relay contention.

Mirrors the intent of the reference's implicit torch kernel caching
(there is no explicit counterpart file; PyTorch caches cuDNN autotune
results process-internally) — on TPU the unit of caching is the whole
XLA program, so an explicit on-disk cache is the idiomatic equivalent.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable(cache_dir: str | None = None) -> str:
    """Point JAX at an on-disk compilation cache (idempotent).

    The directory defaults to ``<repo>/.jax_cache`` and can be overridden
    via the ``DL_VQA_COMPILE_CACHE`` environment variable (set it to the
    empty string to disable caching entirely).
    """
    import jax

    env = os.environ.get("DL_VQA_COMPILE_CACHE")
    # An explicit argument wins over the environment: the empty-string
    # env var disables only the DEFAULT cache location.
    if env == "" and cache_dir is None:
        return ""
    path = os.path.abspath(cache_dir or env or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Anything that takes >1 s to compile is worth persisting: the relay
    # RTT alone makes real recompiles far more expensive than disk reads.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

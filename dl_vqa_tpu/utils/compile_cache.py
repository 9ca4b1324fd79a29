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


def _platform_env() -> str:
    """Best-effort platform resolution WITHOUT initializing jax backends
    (enable() runs at import time): the explicit override, else
    JAX_PLATFORMS, else the jax config value (managed-TPU hosts set it
    programmatically via sitecustomize — reading the config does not
    initialize a backend). An undetermined result is treated as 'cpu':
    the unconfigured case IS the plain CPU-only host, and namespacing a
    TPU host's cache by mistake only costs a recompile, while sharing a
    CPU host's cache by mistake costs silent wrong numbers."""
    env = (
        os.environ.get("DL_VQA_PLATFORM")
        or os.environ.get("JAX_PLATFORMS", "")
    ).split(",")[0].strip().lower()
    if env:
        return env
    import jax

    cfg = (jax.config.jax_platforms or "").split(",")[0].strip().lower()
    return cfg or "cpu"


def _host_fingerprint() -> str:
    """Short digest of the host CPU's identity + the XLA flag environment
    — the two inputs that make a cached XLA:CPU executable non-portable."""
    import hashlib
    import platform as plat

    txt = plat.machine() + "\0" + os.environ.get("XLA_FLAGS", "")
    try:
        with open("/proc/cpuinfo") as fd:
            for line in fd:
                if line.startswith(("flags", "Features")):
                    txt += "\0" + line
                    break
    except OSError:
        pass
    return hashlib.sha1(txt.encode()).hexdigest()[:10]


def apply_platform_override() -> None:
    """Honor ``DL_VQA_PLATFORM=cpu|tpu``: on managed TPU hosts a plugin
    ``sitecustomize`` programmatically forces the TPU platform, so the
    standard ``JAX_PLATFORMS`` env var is silently ignored there —
    ``jax.config.update`` after import wins over both (the same trick
    ``tests/conftest.py`` uses). Lets any entry point run on CPU for
    debugging/verification when the TPU (or its relay) is unavailable."""
    platform = os.environ.get("DL_VQA_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)


def enable(cache_dir: str | None = None) -> str:
    """Point JAX at an on-disk compilation cache (idempotent), honoring
    the ``DL_VQA_PLATFORM`` override first (every entry point routes
    through this call before touching a backend).

    The directory defaults to ``<repo>/.jax_cache`` and can be overridden
    via the ``DL_VQA_COMPILE_CACHE`` environment variable (set it to the
    empty string to disable caching entirely).
    """
    import jax

    apply_platform_override()

    env = os.environ.get("DL_VQA_COMPILE_CACHE")
    # An explicit argument wins over the environment: the empty-string
    # env var disables only the DEFAULT cache location.
    if env == "" and cache_dir is None:
        return ""
    path = os.path.abspath(cache_dir or env or _DEFAULT_DIR)
    if _platform_env() == "cpu":
        # XLA:CPU cache entries are AOT machine code whose cache key does
        # NOT cover the compile-time machine features; loading an entry
        # written on another host (or under different XLA flags) is
        # accepted with a warning and can execute INCORRECTLY — observed
        # as silent NaN outputs from a cross-host entry (round 5). TPU
        # entries are target-keyed serialized programs and safe to share,
        # so only the CPU backend gets a per-host/per-flags namespace.
        path = os.path.join(path, f"cpu-{_host_fingerprint()}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Anything that takes >1 s to compile is worth persisting: the relay
    # RTT alone makes real recompiles far more expensive than disk reads.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path

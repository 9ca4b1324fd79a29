"""Persistent-compilation-cache helper behavior."""

import os

from dl_vqa_tpu.utils import compile_cache


def test_enable_points_jax_at_directory(tmp_path):
    import jax

    path = compile_cache.enable(str(tmp_path / "cache"))
    assert os.path.isdir(path)
    assert jax.config.jax_compilation_cache_dir == path


def test_env_empty_disables(tmp_path, monkeypatch):
    monkeypatch.setenv("DL_VQA_COMPILE_CACHE", "")
    assert compile_cache.enable() == ""


def test_env_overrides_default(tmp_path, monkeypatch):
    target = str(tmp_path / "envcache")
    monkeypatch.setenv("DL_VQA_COMPILE_CACHE", target)
    got = compile_cache.enable()
    # The suite runs with JAX_PLATFORMS=cpu, so the per-host CPU
    # namespace applies under the requested directory.
    assert got.startswith(os.path.abspath(target))


def test_cpu_cache_is_host_namespaced(tmp_path, monkeypatch):
    """XLA:CPU cache entries are non-portable AOT machine code (loading a
    cross-host/cross-flags entry executes incorrectly — observed as
    silent NaNs); the CPU backend therefore gets a per-host/per-flags
    subdirectory. TPU entries are target-keyed and shared at the root."""
    import jax

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.delenv("DL_VQA_PLATFORM", raising=False)
    base = str(tmp_path / "cache")
    path = compile_cache.enable(base)
    assert os.path.dirname(path) == os.path.abspath(base)
    assert os.path.basename(path).startswith("cpu-")

    # Different XLA flags -> different namespace (flag-derived machine
    # features are part of what makes an entry non-portable).
    monkeypatch.setenv("XLA_FLAGS", "--xla_cpu_enable_fast_math=false")
    assert compile_cache.enable(base) != path

    # A TPU-resolved platform keeps the shared root. enable() applies
    # the DL_VQA_PLATFORM override to jax config as a side effect —
    # restore it (monkeypatch only undoes the env var), or every later
    # test in this process tries to initialize a 'tpu' backend.
    platforms_before = jax.config.jax_platforms
    try:
        monkeypatch.setenv("DL_VQA_PLATFORM", "tpu")
        assert compile_cache.enable(base) == os.path.abspath(base)
    finally:
        jax.config.update("jax_platforms", platforms_before)


def test_platform_override_applies(monkeypatch):
    import jax

    before = jax.config.jax_platforms
    try:
        monkeypatch.setenv("DL_VQA_PLATFORM", "cpu")
        compile_cache.apply_platform_override()
        assert jax.config.jax_platforms == "cpu"
    finally:
        jax.config.update("jax_platforms", before)

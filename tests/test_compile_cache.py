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
    assert compile_cache.enable() == os.path.abspath(target)

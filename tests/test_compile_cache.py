"""Persistent-compilation-cache helper (utils/compile_cache.py)."""
import os

import jax

from airgym_tpu.utils.compile_cache import enable_compilation_cache


def _restore(old):
    jax.config.update("jax_compilation_cache_dir", old)


def test_explicit_env_var_wins(tmp_path, monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    target = str(tmp_path / "explicit")
    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", target)
    monkeypatch.delenv("AIRGYM_TPU_NO_CACHE", raising=False)
    try:
        assert enable_compilation_cache() == target
        assert jax.config.jax_compilation_cache_dir == target
        assert os.path.isdir(target)
    finally:
        _restore(old)


def test_opt_out(monkeypatch):
    old = jax.config.jax_compilation_cache_dir
    monkeypatch.setenv("AIRGYM_TPU_NO_CACHE", "1")
    try:
        assert enable_compilation_cache() is None
        assert jax.config.jax_compilation_cache_dir == old
    finally:
        _restore(old)


def test_default_dir(monkeypatch, tmp_path):
    old = jax.config.jax_compilation_cache_dir
    monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
    monkeypatch.delenv("AIRGYM_TPU_NO_CACHE", raising=False)
    monkeypatch.setenv("HOME", str(tmp_path))
    try:
        got = enable_compilation_cache()
        assert got == str(tmp_path / ".cache" / "airgym_tpu" / "jax")
        assert os.path.isdir(got)
    finally:
        _restore(old)

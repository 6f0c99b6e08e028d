"""Persistent-compilation-cache wiring (core/compile_cache.py)."""

import os

import jax
import pytest

from nnal_tpu.core.compile_cache import enable_compilation_cache


@pytest.fixture(autouse=True)
def _restore_cache_dir():
    """conftest.py points the cache at the shared test dir to cut gate
    wall time; every test here redirects it (often at a tmp_path pytest
    deletes), so restore — and reset the lazily-pinned cache object — or
    every alphabetically-later test file compiles uncached."""
    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)
    from jax._src import compilation_cache as _cc
    if _cc.is_initialized():
        _cc.reset_cache()


def test_enable_sets_config_and_creates_dir(tmp_path, monkeypatch):
    monkeypatch.delenv("NNAL_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "xla_cache")
    out = enable_compilation_cache(d)
    assert out == d and os.path.isdir(d)
    assert jax.config.jax_compilation_cache_dir == d


def test_env_var_overrides_default(tmp_path, monkeypatch):
    d = str(tmp_path / "env_cache")
    monkeypatch.setenv("NNAL_COMPILE_CACHE", d)
    assert enable_compilation_cache() == d
    assert os.path.isdir(d)


@pytest.mark.parametrize("spelling", ["0", "off", "none", "OFF"])
def test_disable_via_env(monkeypatch, spelling):
    monkeypatch.setenv("NNAL_COMPILE_CACHE", spelling)
    before = jax.config.jax_compilation_cache_dir
    assert enable_compilation_cache() is None
    assert jax.config.jax_compilation_cache_dir == before


@pytest.mark.parametrize("spelling", ["1", "on", "true", "YES"])
def test_enable_spellings_mean_default_dir(monkeypatch, spelling, tmp_path):
    """NNAL_COMPILE_CACHE=1 must enable at the default dir, not create a
    literal ./1 directory (which it once did)."""
    monkeypatch.setenv("NNAL_COMPILE_CACHE", spelling)
    monkeypatch.chdir(tmp_path)
    out = enable_compilation_cache()
    assert out is not None
    assert os.path.isabs(out) and os.path.basename(out) != spelling
    assert not os.path.exists(tmp_path / spelling)


def test_explicit_path_beats_env_disable(tmp_path, monkeypatch):
    """A caller-supplied path wins over every env disable spelling."""
    monkeypatch.setenv("NNAL_COMPILE_CACHE", "0")
    d = str(tmp_path / "explicit")
    assert enable_compilation_cache(d) == d
    assert jax.config.jax_compilation_cache_dir == d


def test_cache_round_trip_on_cpu(tmp_path, monkeypatch):
    """A compiled program lands in the cache dir and a fresh compile of
    the same program in-process reuses it (entry count stays put)."""
    monkeypatch.delenv("NNAL_COMPILE_CACHE", raising=False)
    d = str(tmp_path / "cc")
    enable_compilation_cache(d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    try:
        f = jax.jit(lambda a: (a * 2.0).sum())
        f(jax.numpy.ones((16, 16))).block_until_ready()
        n1 = len(os.listdir(d))
        assert n1 >= 1
        # identical program, new jit object: cache key must match
        g = jax.jit(lambda a: (a * 2.0).sum())
        g(jax.numpy.ones((16, 16))).block_until_ready()
        assert len(os.listdir(d)) == n1
    finally:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

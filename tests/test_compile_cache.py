"""Persistent compile cache helper (espresso_tpu/compile_cache.py).

The oversized-entry prune is load-bearing: a cache READ of a multi-MB
executable through the axon tunnel measured as a multi-minute stall
(CLAUDE.md), so every entry point prunes big entries at startup."""

import os

from espresso_tpu.compile_cache import _prune_oversized, enable_persistent_cache


def test_prune_oversized(tmp_path):
    small = tmp_path / "small-cache"
    big = tmp_path / "big-cache"
    small.write_bytes(b"x" * 1024)
    big.write_bytes(b"y" * (5 * 1024 * 1024))
    _prune_oversized(str(tmp_path), 4 * 1024 * 1024)
    assert small.exists()
    assert not big.exists()


def test_enable_persistent_cache_configures_dir(tmp_path, monkeypatch):
    import jax

    prev = {
        k: getattr(jax.config, k)
        for k in (
            "jax_compilation_cache_dir",
            "jax_persistent_cache_min_compile_time_secs",
            "jax_persistent_cache_min_entry_size_bytes",
        )
    }
    target = tmp_path / "cache"
    monkeypatch.setenv("ESPRESSO_COMPILE_CACHE_DIR", str(target))
    try:
        got = enable_persistent_cache()
        assert got == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
    finally:
        # leave the suite's process with its previous cache config — the
        # tmp dir is deleted after this test
        for k, v in prev.items():
            jax.config.update(k, v)


def test_enable_persistent_cache_disabled(monkeypatch):
    monkeypatch.setenv("ESPRESSO_COMPILE_CACHE", "0")
    assert enable_persistent_cache() is None

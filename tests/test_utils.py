"""Utility-layer tests: persistent-cache setup and stale-cache recovery."""

import os

import pytest

from densesurfelmapping_tpu.utils import cache


@pytest.fixture(autouse=True)
def restore_cache_dir():
    """These tests point the GLOBAL jax cache at a tmp dir; put the suite's
    cache back afterwards so later compiles stay warm."""
    import jax

    before = jax.config.jax_compilation_cache_dir
    yield
    jax.config.update("jax_compilation_cache_dir", before)


def test_stale_cache_detection_and_clear(tmp_path, monkeypatch):
    import jax

    d = str(tmp_path / "jitcache")
    monkeypatch.setenv("DSM_CACHE_DIR", d)
    path = cache.enable_compilation_cache()
    assert path.startswith(d)
    marker = os.path.join(path, "stale.bin")
    with open(marker, "wb") as f:
        f.write(b"x" * 16)

    # unrelated errors leave the cache alone
    assert not cache.maybe_clear_stale_cache(ValueError("bad shape"))
    assert os.path.exists(marker)

    # libtpu/AOT mismatch wording triggers a wipe
    err = RuntimeError(
        "FAILED_PRECONDITION: libtpu version mismatch: client 1.2 vs 1.1")
    assert cache.maybe_clear_stale_cache(err)
    assert not os.path.exists(marker)
    assert os.path.isdir(path)          # dir recreated for the retry
    assert jax.config.jax_compilation_cache_dir == path


def test_enable_cache_idempotent(tmp_path, monkeypatch):
    monkeypatch.setenv("DSM_CACHE_DIR", str(tmp_path / "c"))
    a = cache.enable_compilation_cache()
    b = cache.enable_compilation_cache()
    assert a == b and os.path.isdir(a)


def test_plain_failed_precondition_does_not_wipe(tmp_path, monkeypatch):
    """FAILED_PRECONDITION alone is a common transient relay status; only
    wordings that implicate the cached executable may clear the cache
    (a wipe costs every program a 40-500 s remote recompile)."""
    import jax

    d = str(tmp_path / "jc")
    monkeypatch.setenv("DSM_CACHE_DIR", d)
    path = cache.enable_compilation_cache()
    marker = os.path.join(path, "keep.bin")
    with open(marker, "wb") as f:
        f.write(b"x")
    err = RuntimeError("FAILED_PRECONDITION: donated buffer was reused")
    assert not cache.maybe_clear_stale_cache(err)
    assert os.path.exists(marker)

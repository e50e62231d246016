"""Persistent XLA compilation cache setup.

The mapping pipeline is a handful of large jitted programs; on TPU pods the
first compile of the full fuse step runs minutes (remote compile service).
Enabling JAX's persistent compilation cache makes every process after the
first start in seconds.  Call `enable_compilation_cache()` before the first
jit (bench.py, the driver CLI, and tests all do).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    `$DSM_CACHE_DIR` or `<repo>/.jax_cache`).  Idempotent."""
    import jax

    if path is None:
        path = os.environ.get(
            "DSM_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    # scope by backend: CPU AOT artifacts carry machine-feature strings the
    # TPU-process compiles don't, and vice versa (cpu_aot_loader warnings)
    path = os.path.join(path, jax.default_backend())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


# Error-message fragments that mean "the persistent cache holds executables
# compiled against a different runtime" (e.g. a libtpu roll between the AOT
# compile and this process): the fix is to drop the cache and recompile, not
# to retry the same load.
_STALE_CACHE_MARKERS = (
    # deliberately narrow: XLA/gRPC uses FAILED_PRECONDITION for plenty of
    # transient relay conditions, and wiping the cache costs every program
    # a 40-500 s remote recompile — only fire on wordings that point at
    # the cached executable itself
    "libtpu version mismatch",
    "compiled with a different version",
    # anchored to executable-cache wording: a bare "deserializ" substring
    # would also match unrelated proto/RPC deserialization errors and wipe
    # a healthy cache (ADVICE r2)
    "deserialize executable",
    "deserializing executable",
    "failed to deserialize",
    "incompatible serialized executable",
)


def maybe_clear_stale_cache(exc: BaseException) -> bool:
    """If `exc` looks like a stale-compilation-cache failure (libtpu/AOT
    version mismatch after a runtime roll), wipe the current backend's cache
    directory so the retry recompiles fresh.  Returns True if cleared."""
    import shutil

    import jax

    msg = f"{type(exc).__name__}: {exc}"
    if not any(m.lower() in msg.lower() for m in _STALE_CACHE_MARKERS):
        return False
    path = jax.config.jax_compilation_cache_dir
    if not path or not os.path.isdir(path):
        return False
    shutil.rmtree(path, ignore_errors=True)
    os.makedirs(path, exist_ok=True)
    # also drop JAX's in-process executable cache so re-jit recompiles
    jax.clear_caches()
    return True

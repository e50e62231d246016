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

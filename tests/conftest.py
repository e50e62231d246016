"""Test harness config: force the CPU backend with an 8-device virtual mesh
so sharding tests run without TPU hardware.

Note the container may pin JAX_PLATFORMS to a TPU plugin (axon), and that
plugin wins over the env var — we must also update jax.config after import.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from densesurfelmapping_tpu.utils.cache import enable_compilation_cache  # noqa: E402

# backend-scoped cache dir (CPU artifacts kept apart from TPU ones)
enable_compilation_cache()

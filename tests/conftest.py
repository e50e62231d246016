"""Test harness config: force the CPU backend with an 8-device virtual mesh
so sharding tests run without TPU hardware.

Note the container may pin JAX_PLATFORMS to a TPU plugin (axon), and that
plugin wins over the env var — we must also update jax.config after import.
"""
import atexit
import os
import time

# One-TPU-client coordination (CLAUDE.md): the CPU pytest suite has wedged
# concurrent TPU runs before (round 2), and the round-3 window watcher
# (tools/window_watch.sh) fires TPU probes on a schedule.  Take the lock
# HERE, before the (slow, ~30-80 s) jax import below — pytest_sessionstart
# would only cover the last seconds of the session.
_CPU_LOCK = "/tmp/dsm_cpu_busy"
for _ in range(240):                     # TPU probes run ~2-6 min
    if not os.path.exists("/tmp/dsm_tpu_busy"):
        break
    time.sleep(5)
open(_CPU_LOCK, "a").close()
atexit.register(lambda: os.path.exists(_CPU_LOCK) and os.remove(_CPU_LOCK))

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

def pytest_sessionfinish(session, exitstatus):
    # early release (the atexit hook above is the crash fallback)
    try:
        os.remove(_CPU_LOCK)
    except OSError:
        pass

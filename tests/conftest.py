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

# One-TPU-client coordination (CLAUDE.md): the CPU pytest suite has wedged
# concurrent TPU runs before (round 2), and the round-3 window watcher
# (tools/window_watch.sh) fires TPU probes on a schedule.  Hold
# /tmp/dsm_cpu_busy for the whole session — the watcher waits on it — and
# don't start while a TPU client holds /tmp/dsm_tpu_busy.
_CPU_LOCK = "/tmp/dsm_cpu_busy"


def pytest_sessionstart(session):
    import time
    for _ in range(240):                 # probes run ~2-6 min
        if not os.path.exists("/tmp/dsm_tpu_busy"):
            break
        time.sleep(5)
    open(_CPU_LOCK, "a").close()


def pytest_sessionfinish(session, exitstatus):
    try:
        os.remove(_CPU_LOCK)
    except OSError:
        pass

"""Device-health calibration: is the CHIP slow, or is our program slow?

The batch/loop bench numbers (bench.py `batch_fps`/`loop_fps`) bound
device throughput independent of relay weather — but round-5 measured
~17-26 ms per fuse step inside one lax.scan program vs the 1.25 ms/step
round-1 async record, and that gap has two possible causes:

  (a) the shared v5e executes programs slower in degraded windows
      (multi-tenant time-slicing at the relay), or
  (b) the scan-of-fuse-steps program is structurally worse-compiled than
      the per-frame program.

This probe separates them with programs whose speed-of-light is KNOWN:
one lax.scan of N dependent 1024x1024 f32 matmuls (MXU roofline) and one
of N dependent full-array multiplies on a 64 MB buffer (HBM roofline).
Both are single programs with one hard D2H fence — the relay contributes
~2 RPCs total, so the measured slope IS device execution time.

If the matmul slope lands near the MXU roofline while the fuse-step scan
runs 14x its round-1 rate, the gap is our program (b).  If the matmul
slope itself is ~10x roofline, the chip/window is degraded (a) and no
program change can recover the headline in this window.

Usage: python experiments/roofline_probe.py [N]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(n: int = 400):
    import jax
    import jax.numpy as jnp
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    print(f"backend={jax.default_backend()}", flush=True)

    # --- MXU roofline: N dependent 1024x1024 f32 matmuls ----------------
    # f32 on v5e MXU runs via bf16 passes; peak ~ 197/4 ~ 50 TFLOP/s.
    # 2*1024^3 = 2.15 GFLOP/step -> speed-of-light ~ 43 us/step.
    k = 1024
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.standard_normal((k, k)).astype(np.float32))
    # orthogonal multiplier: the chain is norm-preserving, so the body is
    # a PURE dependent matmul (no renormalization reduce to serialize the
    # MXU pipeline)
    q, _ = np.linalg.qr(rng.standard_normal((k, k)))
    b = jnp.asarray(q.astype(np.float32))

    @jax.jit
    def matmul_chain(a, b, seed):
        def body(c, _):
            return c @ b, None
        return jax.lax.scan(body, a + seed, None, length=n)[0]

    np.asarray(matmul_chain(a0, b, jnp.float32(0)))       # compile + warm
    t0 = time.perf_counter()
    out = matmul_chain(a0, b, jnp.float32(1e-6))
    np.asarray(out)                                       # hard fence
    dt = time.perf_counter() - t0
    us = dt / n * 1e6
    sol = 2 * k**3 / 50e12 * 1e6
    print(f"matmul scan: {us:8.1f} us/step  (roofline ~{sol:.0f} us; "
          f"{us / sol:.1f}x)", flush=True)

    # --- HBM roofline: N dependent elementwise passes over 512 MB -------
    # (must NOT fit in VMEM, or the scan carry stays on-chip and this
    # measures VMEM bandwidth instead of HBM)
    m = 1 << 27  # 128M f32 = 512 MB; read+write = 1 GB/step
    nh = max(n // 8, 25)
    v0 = jnp.ones((m,), jnp.float32)

    @jax.jit
    def hbm_chain(v, seed):
        def body(c, _):
            return c * 1.0000001 + 1e-9, None
        return jax.lax.scan(body, v + seed, None, length=nh)[0]

    np.asarray(hbm_chain(v0, jnp.float32(0))[:8])         # compile + warm
    t0 = time.perf_counter()
    out = hbm_chain(v0, jnp.float32(1e-6))
    np.asarray(out[:8])                                   # hard fence
    dt = time.perf_counter() - t0
    us = dt / nh * 1e6
    sol = 2 * 4 * m / 819e9 * 1e6
    print(f"hbm scan:    {us:8.1f} us/step  (roofline ~{sol:.0f} us; "
          f"{us / sol:.1f}x)", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 400)

"""Device-link health diagnostics.

The TPU in this deployment sits behind a shared relay whose character
varies wildly (CLAUDE.md): dispatch latency 1-10 ms, H2D bandwidth from
GB/s down to ~10 MB/s in degraded windows, and `block_until_ready` that
can return before remote work completes.  These probes separate the three
failure axes so operators (and the bench harness) can tell a framework
regression from link weather:

* dispatch_ms   — chained tiny jit calls, D2H-fenced: per-call round cost
* h2d_mbps      — a frame-sized upload, fenced by a readback
* fuse_ms       — the real packed fuse step, chained, fenced once
* block_lies    — whether block_until_ready returned implausibly early

All probes fence with a real `np.asarray` readback, so run them in a
throwaway process: the first readback permanently degrades the current
process's async dispatch mode.
"""

from __future__ import annotations

import time
from typing import Dict

import numpy as np


def probe_dispatch_ms(iters: int = 20) -> float:
    """Per-call cost of a chained tiny jit, D2H-fenced.  NOTE: the fence
    degrades the current process's async dispatch mode — probe in a
    throwaway process or after measurements."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1.0)
    x = f(jnp.zeros(()))
    np.asarray(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = f(x)
    np.asarray(x)
    return (time.perf_counter() - t0) / iters * 1e3


def probe_h2d_mbps(n_bytes: int = 1 << 24, overhead_ms: float = 0.0) -> float:
    """Effective host->device bandwidth of one fresh large upload, fenced by
    a readback.  Same caveat as probe_dispatch_ms.

    The default 16 MB buffer makes transfer time dominate the fixed
    relay round-trip folded into the fence; pass the independently measured
    `overhead_ms` (dispatch round cost) to subtract what remains of it
    (ADVICE r2: the old 2 MB probe understated healthy bandwidth ~2x)."""
    import jax

    buf = np.random.randint(0, 255, size=(n_bytes,), dtype=np.uint8)
    d = jax.device_put(buf)
    np.asarray(d[:4])                       # warm the slice program
    t0 = time.perf_counter()
    d = jax.device_put(buf[::-1].copy())    # fresh content
    np.asarray(d[:4])
    elapsed = time.perf_counter() - t0 - overhead_ms / 1e3
    return n_bytes / max(elapsed, 1e-6) / 1e6


def run_diagnostics(n_fuse: int = 15) -> Dict[str, float]:
    import jax
    import jax.numpy as jnp
    import densesurfelmapping_tpu as dsm
    from .cache import enable_compilation_cache
    enable_compilation_cache()
    from ..core.state import SurfelBank, pack_frame
    from ..pipeline.fuse_step import jitted_fuse_frame_packed
    from ..io import synthetic

    out: Dict[str, float] = {"backend": jax.default_backend()}
    out["dispatch_ms"] = round(probe_dispatch_ms(), 2)
    # adaptive probe size: a quick 2 MB probe decides whether the link is
    # healthy enough to afford the accurate 16 MB probe (in a degraded
    # window the big buffer alone would take tens of seconds)
    quick = probe_h2d_mbps(n_bytes=1 << 21,
                           overhead_ms=out["dispatch_ms"])
    out["h2d_mbps"] = round(
        probe_h2d_mbps(overhead_ms=out["dispatch_ms"])
        if quick >= 200.0 else quick, 1)

    # 3) the real fuse step, chained (fresh upload per frame, like the
    # online driver), one fence at the end
    cfg = dsm.kitti_config(surfel_capacity=1 << 19)
    scene = synthetic.default_scene()
    poses = synthetic.forward_trajectory(n_fuse + 2, step=0.4)
    bufs = [pack_frame(cfg, *scene.render(cfg, p)) for p in poses]
    step = jitted_fuse_frame_packed(cfg)
    bank = SurfelBank.empty(cfg.surfel_capacity)
    for i in range(2):
        bank, _ = step(bank, jnp.asarray(bufs[i]),
                       jnp.asarray(poses[i].astype(np.float32)),
                       jnp.int32(i))
    jax.block_until_ready(bank.count)
    t_soft0 = time.perf_counter()
    for i in range(2, n_fuse + 2):
        bank, _ = step(bank, jnp.asarray(bufs[i]),
                       jnp.asarray(poses[i].astype(np.float32)),
                       jnp.int32(i))
    jax.block_until_ready(bank.count)
    soft = time.perf_counter() - t_soft0
    np.asarray(bank.count)
    fenced = time.perf_counter() - t_soft0
    out["fuse_ms"] = round(fenced / n_fuse * 1e3, 2)
    out["block_lies"] = bool(soft < 0.5 * fenced)

    # verdicts against the healthy-window envelope (CLAUDE.md)
    out["healthy"] = bool(out["dispatch_ms"] < 10.0
                          and out["h2d_mbps"] > 200.0
                          and out["fuse_ms"] < 20.0)
    return out

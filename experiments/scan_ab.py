"""Scan-mode vs async-dispatch fuse-step device cost, disentangled from
relay weather (round 5).

bench.py's weather-independent `batch_fps` (one `fuse_frames_scan`
program per K frames) measured ~17-23 ms/step in a degraded window while
the round-1 async-dispatch chain recorded ~1.25 ms/step — either the TPU
while-loop step genuinely costs more than the same math dispatched as
individual programs (carry copy-in/copy-out? per-iteration overhead?) or
one of the measurements is weather-polluted.  This probe separates the
two IN ONE PROCESS, each pass hard-fenced:

* scan slope: time fuse_frames_scan at K and 2K in the same window — the
  difference is K steps of pure device work with the (constant) relay tax
  subtracted out.  No lie-detector needed.
* async chain: N successive donated-bank dispatches, one hard fence at
  the end (the round-1 methodology), reported alongside the same-window
  link health so a poisoned number is identifiable.

Usage: python experiments/scan_ab.py [K] [async_n]
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(k: int = 100, async_n: int = 200):
    import jax
    import jax.numpy as jnp
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from densesurfelmapping_tpu.core.state import SurfelBank, compact_frame
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.pipeline import fuse_step

    cfg = dsm.kitti_config()
    scene = synthetic.default_scene()
    poses = synthetic.forward_trajectory(2 * k, 0.25)
    frames = []
    for pose in poses:
        img, dep = scene.render(cfg, pose)
        frames.append(compact_frame(cfg, img, dep)
                      + (pose.astype(np.float32),))
    imgs = jnp.asarray(np.stack([f[0] for f in frames]))
    deps = jnp.asarray(np.stack([f[1] for f in frames]))
    pss = jnp.asarray(np.stack([f[2] for f in frames]))

    scan = fuse_step.jitted_fuse_frames_scan(cfg)

    def run(n):
        # the scan donates its bank argument: allocate fresh per call
        bank0 = SurfelBank.empty(cfg.surfel_capacity)
        fidx = jnp.arange(n, dtype=jnp.int32)
        c = scan.lower(bank0, imgs[:n], deps[:n], pss[:n], fidx).compile()
        jax.block_until_ready((imgs, deps, pss, bank0))
        t0 = time.perf_counter()
        bank, _ = c(bank0, imgs[:n], deps[:n], pss[:n], fidx)
        count = int(np.asarray(bank.count))          # hard fence
        return time.perf_counter() - t0, count

    run(k)                                           # warm the window
    t_k, c_k = run(k)
    t_2k, c_2k = run(2 * k)
    slope_ms = (t_2k - t_k) / k * 1e3
    print(f"scan: K={k} {t_k:.3f}s  K={2*k} {t_2k:.3f}s  "
          f"slope {slope_ms:.3f} ms/step  (counts {c_k}/{c_2k})")

    # async chain, same process/window: N donated dispatches, one fence
    step = fuse_step.jitted_fuse_frame_compact(cfg)
    bank = SurfelBank.empty(cfg.surfel_capacity)
    bank, _ = step(bank, imgs[0], deps[0], pss[0], jnp.int32(0))
    jax.block_until_ready(bank)
    t0 = time.perf_counter()
    for i in range(async_n):
        j = i % (2 * k)
        bank, _ = step(bank, imgs[j], deps[j], pss[j], jnp.int32(i + 1))
    n_live = int(np.asarray(bank.count))             # hard fence
    t_async = time.perf_counter() - t0
    print(f"async: {async_n} dispatches {t_async:.3f}s = "
          f"{t_async/async_n*1e3:.3f} ms/step (count {n_live})")

    from densesurfelmapping_tpu.utils import diagnostics
    print("link:", diagnostics.run_diagnostics())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 100,
         int(sys.argv[2]) if len(sys.argv) > 2 else 200)

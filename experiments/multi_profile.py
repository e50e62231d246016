"""Multi-session scaling breakdown (VERDICT r2 weak #5).

Round 1 measured 624 fps single-stream -> 802 aggregate at B=4 (1.29x for
4x streams) with no attribution.  This drives MultiSessionMapping at
several batch sizes and prints the per-round phase means (prep = host
session loop incl. pack_frame, upload = jnp.asarray of the batched
buffers, dispatch = batched step enqueue) plus the fenced aggregate fps,
so the lost 3x is attributable to a specific phase.

Host-side numbers (prep) are valid in any relay window; upload/dispatch
need a healthy one.

Usage: python experiments/multi_profile.py [n_rounds]
"""

import sys
import time

import numpy as np


def run_batch(B: int, n_rounds: int):
    import jax
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.pipeline.multi_session import (
        MultiSessionMapping)
    from densesurfelmapping_tpu.io import synthetic

    cfg = dsm.kitti_config(surfel_capacity=1 << 17)
    scene = synthetic.default_scene()
    n_frames = n_rounds + 1
    poses = synthetic.forward_trajectory(n_frames, step=0.4)
    frames = [scene.render(cfg, p) for p in poses]

    m = MultiSessionMapping(cfg, n_streams=B)
    # stagger streams one pose apart
    def feed(i):
        for s in range(B):
            j = (i + s) % n_frames
            m.feed_pose(s, float(i), poses[j], is_keyframe=(i % 2 == 0))
            m.feed_image(s, float(i), frames[j][0])
            m.feed_depth(s, float(i), frames[j][1])

    feed(0)
    m.step(flush=True)
    jax.block_until_ready(m.banks.position)
    m.timer.totals.clear()
    m.timer.counts.clear()

    t0 = time.perf_counter()
    for i in range(1, n_rounds):
        feed(i)
        m.step(flush=True)
    jax.block_until_ready(m.banks.position)
    np.asarray(m.banks.count)        # hard fence
    dt = time.perf_counter() - t0
    per_round = dt / (n_rounds - 1) * 1e3
    agg_fps = B * (n_rounds - 1) / dt
    means = m.timer.means_ms()
    phases = " ".join(f"{k}={means.get(k, 0.0):.2f}"
                      for k in ("prep", "upload", "dispatch"))
    print(f"B={B}: {per_round:6.2f} ms/round  {agg_fps:7.1f} agg fps   "
          f"[{phases}] ms", flush=True)


def main(n_rounds: int = 80):
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    for B in (1, 2, 4, 8):
        run_batch(B, n_rounds)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)

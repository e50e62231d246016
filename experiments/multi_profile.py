"""Multi-session scaling breakdown (VERDICT r2 weak #5).

Round 1 measured 624 fps single-stream -> 802 aggregate at B=4 (1.29x for
4x streams) with no attribution.  This drives MultiSessionMapping at
several batch sizes and prints the per-round phase means (prep = host
session loop incl. pack_frame, upload = jnp.asarray of the round payload,
dispatch = batched step enqueue) plus the aggregate fps, for BOTH round
modes (eager and pipelined=True, where upload+dispatch run on a worker
thread overlapping the next round's prep).

Fencing: soft fences between batches, ONE hard D2H fence at the very end
with a measured-vs-wall validity cross-check — an earlier revision hard-
fenced after EVERY batch, which permanently degrades the process's
dispatch mode (CLAUDE.md) and silently poisons every later batch's
numbers (a plausible source of the round-1 "sub-linear scaling" reading).

Host-side numbers (prep) are valid in any relay window; upload/dispatch
and aggregate fps need a healthy one.

Usage: python experiments/multi_profile.py [n_rounds]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def run_batch(B: int, n_rounds: int, pipelined: bool, measured, overhead):
    import jax
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.pipeline.multi_session import (
        MultiSessionMapping)
    from densesurfelmapping_tpu.io import synthetic

    cfg = dsm.kitti_config(surfel_capacity=1 << 17)
    scene = synthetic.default_scene()
    n_frames = n_rounds + 1
    poses = synthetic.forward_trajectory(n_frames, step=0.4)
    t_r0 = time.perf_counter()
    frames = [scene.render(cfg, p) for p in poses]
    overhead[0] += time.perf_counter() - t_r0

    m = MultiSessionMapping(cfg, n_streams=B, pipelined=pipelined)
    # stagger streams one pose apart
    def feed(i):
        for s in range(B):
            j = (i + s) % n_frames
            m.feed_pose(s, float(i), poses[j], is_keyframe=(i % 2 == 0))
            m.feed_image(s, float(i), frames[j][0])
            m.feed_depth(s, float(i), frames[j][1])

    t_w0 = time.perf_counter()
    feed(0)
    m.step(flush=True)
    m.flush_rounds()
    jax.block_until_ready(m.banks.position)
    m.timer.totals.clear()
    m.timer.counts.clear()
    # warmup/compile excluded from the validity wall (cold cache = minutes
    # of remote compile; must not fake a RUN INVALID)
    overhead[0] += time.perf_counter() - t_w0

    t0 = time.perf_counter()
    for i in range(1, n_rounds):
        feed(i)
        m.step(flush=True)
    m.flush_rounds()
    jax.block_until_ready(m.banks.position)   # soft fence only
    dt = time.perf_counter() - t0
    measured[0] += dt
    per_round = dt / (n_rounds - 1) * 1e3
    agg_fps = B * (n_rounds - 1) / dt
    means = m.timer.means_ms()
    phases = " ".join(f"{k}={means.get(k, 0.0):.2f}"
                      for k in ("prep", "upload", "dispatch"))
    tag = "piped" if pipelined else "eager"
    print(f"B={B} {tag}: {per_round:6.2f} ms/round  {agg_fps:7.1f} agg fps"
          f"   [{phases}] ms", flush=True)
    return m


def main(n_rounds: int = 80):
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    measured = [0.0]
    overhead = [0.0]
    t_wall0 = time.perf_counter()
    last = None
    for B in (1, 2, 4, 8):
        for pipelined in (False, True):
            last = run_batch(B, n_rounds, pipelined, measured, overhead)
    # validity: one hard fence at the very end (see module docstring)
    int(np.asarray(last.banks.count).sum())
    wall = time.perf_counter() - t_wall0 - overhead[0]
    if measured[0] < 0.5 * wall - 10.0:
        print(f"RUN INVALID: soft fences measured {measured[0]:.1f}s of a "
              f"{wall:.1f}s fenced wall — block_until_ready lied; re-run")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 80)

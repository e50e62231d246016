"""Host-slice breakdown + pipelined-feed A/B of the DeviceResidentMapping
frame budget.

Round-1 measured the full driver at 5.5 ms/frame while the device step is
1.25 ms — a >4 ms host slice that was never attributed (VERDICT r2 weak
#4).  This runs the driver's feed loop on synthetic KITTI-size frames with
per-stage StageTimer instrumentation (bfs / pack / dispatch / migrate /
fuse) and prints the means, for BOTH feed modes:

  eager      — pack then dispatch, serial (the round-1/2 driver);
  pipelined  — frame i's native pack runs on a worker thread while the
               main thread sits in frame i-1's dispatch relay waits
               (device_driver.DeviceResidentMapping(pipelined=True)).

Passes run eager, pipelined, eager (the repeat controls for in-process
relay drift); soft fences only between passes — ONE hard D2H fence at the
very end cross-checks total measured time against the fenced wall clock
(a blocking readback between passes would permanently degrade the
process's dispatch mode and poison the later passes; CLAUDE.md).

Host-only numbers (pack, bfs, sync bookkeeping) are valid even in a
degraded relay window; end-to-end and "dispatch" need a healthy one.

Usage: python experiments/host_profile.py [n_frames]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(n_frames: int = 120):
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from densesurfelmapping_tpu.pipeline.device_driver import (
        DeviceResidentMapping)
    from densesurfelmapping_tpu.io import synthetic
    import jax

    cfg = dsm.kitti_config(surfel_capacity=1 << 19)
    scene = synthetic.default_scene()
    poses = synthetic.forward_trajectory(n_frames, step=0.4)
    print("rendering frames...", flush=True)
    frames = [scene.render(cfg, p) for p in poses]

    measured = [0.0]
    overhead = [0.0]   # warmup/compile time — excluded from the validity
    #                    wall (a cold cache costs 40-500 s of remote
    #                    compile and must not fake a RUN INVALID)

    def run(tag, pipelined):
        t_w0 = time.perf_counter()
        m = DeviceResidentMapping(cfg, pipelined=pipelined)
        # warmup / compile
        m.feed_pose(0.0, poses[0], is_keyframe=True)
        m.feed_image(0.0, frames[0][0])
        m.feed_depth(0.0, frames[0][1])
        m.flush()
        jax.block_until_ready(m.bank.position)
        m.timer.totals.clear()
        m.timer.counts.clear()
        overhead[0] += time.perf_counter() - t_w0

        t0 = time.perf_counter()
        for i in range(1, n_frames):
            img, dep = frames[i]
            m.feed_pose(float(i), poses[i], is_keyframe=(i % 2 == 0))
            m.feed_image(float(i), img)
            m.feed_depth(float(i), dep)
        m.flush()
        jax.block_until_ready(m.bank.position)   # soft fence only
        dt = (time.perf_counter() - t0) / (n_frames - 1) * 1e3
        measured[0] += dt * (n_frames - 1) / 1e3

        print(f"[{tag}] end-to-end: {dt:.2f} ms/frame "
              f"({1000.0 / dt:.0f} fps)")
        means = m.timer.means_ms()
        for k in sorted(means, key=means.get, reverse=True):
            print(f"  {k:12s} {means[k]:7.3f} ms/frame x{m.timer.counts[k]}")
        other = dt - sum(means[k] for k in ("migrate", "fuse") if k in means)
        print(f"  (unattributed host+feed: {other:.3f} ms/frame)",
              flush=True)
        return m

    t_wall0 = time.perf_counter()
    run("eager      ", False)
    run("pipelined  ", True)
    last = run("eager-again", False)
    # validity: one hard fence at the very end (see module docstring)
    int(np.asarray(last.bank.count))
    wall = time.perf_counter() - t_wall0 - overhead[0]
    if measured[0] < 0.5 * wall - 5.0:
        print(f"RUN INVALID: soft fences measured {measured[0]:.1f}s of a "
              f"{wall:.1f}s fenced wall — block_until_ready lied; re-run")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 120)

"""H2D pipelining A/B (VERDICT r1 #8): the fuse step is upload-latency
bound (BASELINE.md ablation), so the remaining single-stream levers are all
in how frames reach the device.  Three strategies, measured in ONE process
(the relay varies 3-10x across processes — only within-process comparisons
are meaningful, CLAUDE.md):

All strategies ride the one-payload step (frame + aux in a single u8
buffer, `fuse_frame_onebuf` — the product path bench.py measures):

  A  baseline     — per-frame jnp.asarray(payload) right before the step
                    (what bench.py does today);
  B  prefetch     — jax.device_put of frame i+1 issued immediately after
                    dispatching step i, so the next upload overlaps the
                    current step's execution;
  C  chunked-K    — K payloads ride in ONE (K, bytes) upload; the step
                    indexes its frame with lax.dynamic_index_in_dim on
                    device, amortizing per-transfer latency over K
                    dispatches.

Usage: python experiments/h2d_ab.py [n_frames] — prints one line per
strategy; record the winner in BASELINE.md.
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(n_frames: int = 200, warmup: int = 5):
    import jax
    import jax.numpy as jnp
    import functools
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from densesurfelmapping_tpu.core.state import (SurfelBank, pack_aux,
                                                   pack_frame_with_aux)
    from densesurfelmapping_tpu.pipeline.fuse_step import (
        fuse_frame_onebuf, jitted_fuse_frame_onebuf)
    from densesurfelmapping_tpu.io import synthetic

    cfg = dsm.kitti_config(surfel_capacity=1 << 19)
    scene = synthetic.default_scene()
    poses = synthetic.forward_trajectory(n_frames + warmup, step=0.4)
    # one-payload frames (bench.py's product path: ONE put per frame)
    mask = np.ones(cfg.max_keyframes, bool)
    rendered = [pack_frame_with_aux(
        cfg, *scene.render(cfg, p),
        pack_aux(p.astype(np.float32), i, mask))
        for i, p in enumerate(poses)]

    step = jitted_fuse_frame_onebuf(cfg)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def step_chunk(bank, bufs, k):
        buf = jax.lax.dynamic_index_in_dim(bufs, k, 0, keepdims=False)
        return fuse_frame_onebuf(cfg, bank, buf)

    measured_total = [0.0]

    def timed(name, body):
        # soft fences only: ANY np.asarray/D2H here would permanently
        # degrade this process's dispatch mode and poison the remaining
        # strategies.  Validity is instead established once at program
        # end: a single hard fence + wall-clock cross-check (see main's
        # tail); if block_until_ready lied, the whole run is INVALID.
        bank = SurfelBank.empty(cfg.surfel_capacity)
        bank = body(bank, 0, warmup)                 # warmup/compile
        jax.block_until_ready(bank.count)
        t0 = time.perf_counter()
        bank = body(bank, warmup, n_frames)
        jax.block_until_ready(bank.count)
        cnt = "-"
        dt = time.perf_counter() - t0
        measured_total[0] += dt
        print(f"{name:12s} {n_frames / dt:8.1f} fps "
              f"({1e3 * dt / n_frames:.3f} ms/frame), "
              f"map {cnt}", flush=True)
        return n_frames / dt

    def run_a(bank, start, n):
        for i in range(start, start + n):
            bank, _ = step(bank, jnp.asarray(rendered[i]))
        return bank

    def run_b(bank, start, n):
        nxt = jax.device_put(rendered[start])
        for i in range(start, start + n):
            buf = nxt
            if i + 1 < len(rendered):
                nxt = jax.device_put(rendered[i + 1])  # overlaps step i
            bank, _ = step(bank, buf)
        return bank

    def make_run_c(K):
        def run_c(bank, start, n):
            for c0 in range(start, start + n, K):
                k_n = min(K, start + n - c0)
                bufs = jnp.asarray(
                    np.stack([rendered[c0 + k] for k in range(k_n)] +
                             [rendered[c0]] * (K - k_n)))
                for k in range(k_n):
                    bank, _ = step_chunk(bank, bufs, jnp.int32(k))
            return bank
        return run_c

    t_wall0 = time.perf_counter()
    results = {}
    results["A baseline"] = timed("A baseline", run_a)
    results["B prefetch"] = timed("B prefetch", run_b)
    for K in (4, 8):
        results[f"C chunk-{K}"] = timed(f"C chunk-{K}", make_run_c(K))
    # second pass in reverse order to control for relay drift in-process
    print("-- second pass (reverse order) --")
    for K in (8, 4):
        timed(f"C chunk-{K}", make_run_c(K))
    timed("B prefetch", run_b)
    timed("A baseline", run_a)
    # validity: ONE hard fence, at the very end, checks the soft fences
    # didn't lie (lying shows as measured-time << fenced wall time)
    final_bank = run_a(SurfelBank.empty(cfg.surfel_capacity), 0, 1)
    int(np.asarray(final_bank.count))
    wall = time.perf_counter() - t_wall0
    if measured_total[0] < 0.5 * wall:
        print(f"RUN INVALID: soft fences measured {measured_total[0]:.1f}s "
              f"of a {wall:.1f}s fenced wall — block_until_ready lied; "
              f"discard and re-run")
    else:
        best = max(results, key=results.get)
        print(f"winner (first pass): {best}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 200)

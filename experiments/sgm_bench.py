"""SGM backend A/B on the real TPU: Pallas VMEM-carry kernel vs lax.scan.

In-process comparison (relay latency varies between processes); chained
dispatch with a changing scalar arg (defeats identical-input result
memoization) and ONE D2H fence per timed chain (the fence is the reliable
completion barrier; block_until_ready can return early — CLAUDE.md).
Prints ms/frame for the full disparity pipeline and the aggregation alone,
for both backends, plus accuracy equality.

Round 5 (VERDICT r4 #3): every variant is ALSO timed as a one-program
batch chain — `iters` full disparity solves inside ONE lax.scan program
(each step's input perturbed by the previous step's output sum, so the
solves are sequential and non-DCE-able), one dispatch + one hard D2H
fence.  The relay contributes ~2 RPCs total however degraded the window,
so the `1prog` column is a valid device-throughput bound from ANY
weather; the per-dispatch column stays for healthy-window cross-checks.

Usage: python experiments/sgm_bench.py [iters]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(iters: int = 15):
    import jax
    import jax.numpy as jnp
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.models import stereo

    cfg = dsm.kitti_config()
    scene = synthetic.Scene(ground_y=1.5, wall_z=60.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=29.0, texture="multisine")
    lp = np.eye(4)
    rp = np.eye(4)
    rp[0, 3] = 0.54
    li, _ = scene.render(cfg, lp)
    ri, _ = scene.render(cfg, rp)
    l, r = jnp.asarray(li), jnp.asarray(ri)

    def timeit(name, fn):
        # prev enters as a scalar so outputs of any shape can chain
        chain = jax.jit(lambda l, r, prev, i: fn(
            l + 1e-3 * i + 1e-12 * jnp.sum(prev).astype(l.dtype), r))
        out = chain(l, r, jnp.zeros_like(l), np.float32(0))
        np.asarray(out)                      # fence after warmup/compile
        t0 = time.perf_counter()
        for k in range(iters):
            out = chain(l, r, out, np.float32(k + 1))
        np.asarray(out)                      # hard fence
        dt = (time.perf_counter() - t0) / iters * 1e3

        # one-program batch chain (weather-independent; module doc): the
        # seed scalar differs between the compile/warmup call and the
        # timed call so the relay's identical-input result cache cannot
        # serve the timed one (CLAUDE.md)
        @jax.jit
        def prog(l, r, seed):
            def body(c, i):
                out = fn(l + 1e-3 * i + 1e-12 * c.astype(l.dtype), r)
                return jnp.sum(out).astype(jnp.float32), None
            return jax.lax.scan(
                body, seed, jnp.arange(iters, dtype=jnp.float32))[0]
        np.asarray(prog(l, r, jnp.float32(0)))   # compile + warm, fenced
        t0 = time.perf_counter()
        v = prog(l, r, jnp.float32(1))
        np.asarray(v)                            # hard fence
        dt1 = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:44s} {dt:6.1f} ms   1prog {dt1:6.1f} ms", flush=True)
        return out

    outs = {}
    variants = (("pallas-fused-bf16", True, True, True),
                ("pallas-fused", True, True, False),
                ("pallas", True, False, False),
                ("lax.scan", False, False, False))
    for tag, use_pallas, fused, bf16 in variants:
        scfg = stereo.StereoConfig(max_disparity=128, min_disparity=1,
                                   radius=4, aggregation="sgm",
                                   cost="census", sgm_paths=8,
                                   sgm_pallas=use_pallas,
                                   sgm_fused_census=fused,
                                   sgm_carry_bf16=bf16)
        outs[tag] = np.asarray(stereo.jitted_disparity(scfg)(l, r))
        # only the FULL pipeline is timed: sliced-output sub-stage chains
        # measured nonsense (tiny outputs defeat the chain methodology)
        timeit(f"sgm8 census full ({tag})", stereo.jitted_disparity(scfg))

    # round-4 WTA backend A/B: chunked streaming scan (default; one
    # volume pass, ~0.6 GB) vs full masked reductions (~4.6 GB traffic,
    # BASELINE r3) — outputs bitwise-equal (tests/test_stereo.py)
    scfg_red = stereo.StereoConfig(max_disparity=128, min_disparity=1,
                                   radius=4, aggregation="sgm",
                                   cost="census", sgm_paths=8,
                                   wta_streaming=False)
    outs["wta-reductions"] = np.asarray(
        stereo.jitted_disparity(scfg_red)(l, r))
    timeit("sgm8 census full (wta-reductions)",
           stereo.jitted_disparity(scfg_red))

    # isolate the round-3 median/speckle post-filter's own cost
    scfg_np = stereo.StereoConfig(max_disparity=128, min_disparity=1,
                                  radius=4, aggregation="sgm",
                                  cost="census", sgm_paths=8,
                                  post_median=False)
    timeit("sgm8 census full (fused, post_median=False)",
           stereo.jitted_disparity(scfg_np))

    # round-4 hierarchical opt-in mode (half-res solve + band refine;
    # fidelity cost recorded in BASELINE — timed here for the record)
    scfg_h = stereo.StereoConfig(max_disparity=128, min_disparity=1,
                                 radius=4, aggregation="sgm",
                                 cost="census", sgm_paths=8,
                                 hierarchical=True)
    timeit("sgm8 census full (hierarchical)",
           stereo.jitted_disparity(scfg_h))

    same = np.array_equal(outs["pallas"], outs["lax.scan"])
    same_fused = np.array_equal(outs["pallas-fused"], outs["pallas"])
    same_wta = np.array_equal(outs["wta-reductions"], outs["pallas-fused"])
    print(f"disparity maps identical: pallas==scan {same}, "
          f"fused==materialized {same_fused}, "
          f"streaming-wta==reductions {same_wta}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 15)

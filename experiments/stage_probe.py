"""Per-stage DEVICE wall-clock of the fuse step, weather-proof (round 5).

scan_ab measured the full fuse step at ~17 ms/step on-device (scan slope
AND async chain agree; the same-window HBM roofline chain runs at full
speed, so the chip is healthy) vs the 1.25 ms/step round-1 record.  This
probe times each stage as ONE lax.scan program of `iters` dependent
steps with a single hard D2H fence — per-stage device cost with the
relay tax amortized to noise, valid in any window.

Usage: python experiments/stage_probe.py [iters]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np


def main(iters: int = 50):
    import jax
    import jax.numpy as jnp
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from densesurfelmapping_tpu.core.state import SurfelBank, compact_frame
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.ops import superpixel, normals, fusion
    from densesurfelmapping_tpu.pipeline import fuse_step

    cfg = dsm.kitti_config()
    scene = synthetic.default_scene()
    pose_np = synthetic.forward_trajectory(2, 0.25)[0].astype(np.float32)
    img_np, dep_np = scene.render(cfg, pose_np)
    u8, f16 = compact_frame(cfg, img_np, dep_np)
    imgc = jnp.asarray(u8)
    depc = jnp.asarray(f16)
    pose = jnp.asarray(pose_np)

    ph, pw = cfg.padded_height, cfg.padded_width
    img, dep = fuse_step.ingest_frame(cfg, imgc, depc)
    img, dep = jax.device_put(img), jax.device_put(dep)

    print(f"backend={jax.default_backend()}  iters={iters}", flush=True)

    def time_scan(name, prog, *args):
        c = jax.jit(prog).lower(*args).compile()
        np.asarray(c(*args))                          # warm + fence
        t0 = time.perf_counter()
        out = c(*args)
        np.asarray(out)                               # hard fence
        ms = (time.perf_counter() - t0) / iters * 1e3
        print(f"{name:36s} {ms:8.3f} ms/step", flush=True)
        return ms

    # full step (carry = bank; pose perturbed per step => non-degenerate)
    bank0 = SurfelBank.empty(cfg.surfel_capacity)

    def full(bank, imgc, depc, pose):
        def body(b, t):
            p = pose.at[0, 3].add(0.05 * t.astype(jnp.float32))
            b, _ = fuse_step.fuse_frame_compact(cfg, b, imgc, depc, p, t)
            return b, None
        b, _ = jax.lax.scan(body, bank,
                            jnp.arange(iters, dtype=jnp.int32))
        return b.count

    time_scan("full fuse_frame_compact", full, bank0, imgc, depc, pose)

    # superpixel (SLIC) alone
    def slic(img, dep):
        def body(c, t):
            seeds, assign = superpixel.run_slic(
                cfg, img + 1e-6 * c, dep)
            return jnp.sum(assign).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    time_scan("superpixel run_slic", slic, img, dep)

    # superpixel + plane fit
    def planes(img, dep):
        def body(c, t):
            seeds, assign = superpixel.run_slic(cfg, img + 1e-6 * c, dep)
            seeds, _ = normals.compute_seed_planes(cfg, seeds, assign, dep)
            return jnp.sum(seeds.mean_depth).astype(jnp.float32), None
        return jax.lax.scan(body, jnp.float32(0),
                            jnp.arange(iters, dtype=jnp.float32))[0]

    time_scan("slic + plane fit", planes, img, dep)

    # fusion stage alone over a REAL populated bank: build one via a few
    # full steps first (outside timing)
    seed_bank = SurfelBank.empty(cfg.surfel_capacity)
    stepj = fuse_step.jitted_fuse_frame_compact(cfg)
    for t in range(5):
        p = jnp.asarray(pose_np).at[0, 3].add(0.05 * t)
        seed_bank, _ = stepj(seed_bank, imgc, depc, p, jnp.int32(t))
    seed_bank = jax.block_until_ready(seed_bank)
    seeds0, assign0 = jax.jit(
        lambda i, d: superpixel.run_slic(cfg, i, d))(img, dep)
    seeds0, _sp = jax.jit(
        lambda s, a, d: normals.compute_seed_planes(cfg, s, a, d))(
            seeds0, assign0, dep)
    seeds0 = jax.block_until_ready(seeds0)

    def fuse_only(bank, seeds, assign, dep, pose):
        def body(b, t):
            p = pose.at[0, 3].add(1e-4 * t.astype(jnp.float32))
            b, fused = fusion.fuse_surfels(cfg, b, seeds, assign, dep, p,
                                           t)
            return b, None
        b, _ = jax.lax.scan(body, bank,
                            jnp.arange(iters, dtype=jnp.int32))
        return b.count

    time_scan("fuse_surfels (assoc+update)", fuse_only, seed_bank, seeds0,
              assign0, dep, pose)

    # extract + append alone
    fused0 = jnp.zeros((cfg.sp_rows, cfg.sp_cols), bool)

    def init_only(bank, seeds, pose):
        def body(b, t):
            p = pose.at[0, 3].add(1e-4 * t.astype(jnp.float32))
            nf, nm = fusion.extract_new_surfels(cfg, seeds, fused0, p, t)
            b, _ = fusion.append_new(b, nf, nm)
            return b, None
        b, _ = jax.lax.scan(body, bank,
                            jnp.arange(iters, dtype=jnp.int32))
        return b.count

    time_scan("extract_new + append_new", init_only, seed_bank, seeds0,
              pose)

    from densesurfelmapping_tpu.utils import diagnostics
    print("link:", diagnostics.run_diagnostics())


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 50)

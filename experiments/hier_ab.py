"""Hierarchical (coarse-to-fine) SGM A/B: fidelity + device cost (round 4).

`StereoConfig.hierarchical` runs the SGM solve at half resolution / half
disparity range (~4x less aggregation work) and refines full-res with a
band-limited census WTA.  This experiment scores both modes on rendered
stress frames (coverage / MAE / median / >3px / in-10cm vs exact truth),
prints `cost_analysis` traffic for each compiled pipeline (valid in any
relay window), and an in-process wall-clock A/B (D2H-fenced; trust only
in a healthy window — relative numbers are still indicative when the
dispatch overhead is a small fraction of the program).

Usage:
    python experiments/hier_ab.py [n_frames]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import densesurfelmapping_tpu as dsm
from densesurfelmapping_tpu.utils.cache import enable_compilation_cache


def main(n_frames=4, radius=15.0):
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from densesurfelmapping_tpu.io import stressfeed
    from densesurfelmapping_tpu.models import stereo

    cfg = dsm.kitti_config()
    scene = stressfeed.stress_scene(radius=radius)
    poses = stressfeed.circuit_trajectory(120, radius=radius)
    baseline_m = 0.54
    bf = cfg.camera.fx * baseline_m

    variants = {
        "full SGM (shipped)": stereo.StereoConfig(aggregation="sgm"),
        "hier band=3": stereo.StereoConfig(aggregation="sgm",
                                           hierarchical=True),
        "hier band=5": stereo.StereoConfig(aggregation="sgm",
                                           hierarchical=True, hier_band=5),
        "hier band=3 r=3": stereo.StereoConfig(aggregation="sgm",
                                               hierarchical=True,
                                               hier_refine_radius=3),
        "hier kpen=0": stereo.StereoConfig(aggregation="sgm",
                                           hierarchical=True,
                                           hier_k_penalty=0.0),
        "hier kpen=2": stereo.StereoConfig(aggregation="sgm",
                                           hierarchical=True,
                                           hier_k_penalty=2.0),
        "hier kpen=4": stereo.StereoConfig(aggregation="sgm",
                                           hierarchical=True,
                                           hier_k_penalty=4.0),
    }
    fns = {k: stereo.jitted_disparity(v) for k, v in variants.items()}

    stats = {}

    def add(name, disp, true_disp, in_range, dep):
        sel = (disp > 0) & in_range
        err = np.abs(disp[sel] - true_disp[sel])
        z = np.where(disp > 0, bf / np.maximum(disp, 1e-6), 0.0)
        good = sel & (np.abs(z - dep) <= 0.10)
        s = stats.setdefault(name, dict(cov=[], mae=[], med=[], out3=[],
                                        in10=[]))
        s["cov"].append(sel.sum() / max(in_range.sum(), 1))
        s["mae"].append(err.mean() if err.size else np.nan)
        s["med"].append(np.median(err) if err.size else np.nan)
        s["out3"].append((err > 3.0).mean() if err.size else np.nan)
        s["in10"].append(good.sum() / max(in_range.sum(), 1))

    frame_ids = np.linspace(5, 115, n_frames).astype(int)
    pairs = []
    for fi in frame_ids:
        pose = poses[fi]
        img, dep = scene.render(cfg, pose)
        rp = np.array(pose, np.float64).copy()
        rp[:3, 3] += rp[:3, 0] * baseline_m
        rimg, _ = scene.render(cfg, rp)
        true_disp = np.where(dep > 0, bf / np.maximum(dep, 1e-6), 0.0)
        in_range = (true_disp >= 2.0) & (true_disp < 127.0) & (dep > 0)
        pairs.append((img, rimg, dep, true_disp, in_range))
        l = jnp.asarray(img.astype(np.float32))
        r = jnp.asarray(rimg.astype(np.float32))
        for name, fn in fns.items():
            add(name, np.asarray(fn(l, r)), true_disp, in_range, dep)

    print(f"\n{'variant':22s} {'cov':>6s} {'mae':>7s} {'med':>7s} "
          f"{'>3px':>7s} {'in10cm':>7s}")
    for name, s in stats.items():
        print(f"{name:22s} {np.mean(s['cov']):6.3f} "
              f"{np.nanmean(s['mae']):7.3f} {np.nanmean(s['med']):7.4f} "
              f"{np.nanmean(s['out3']):7.4f} {np.mean(s['in10']):7.4f}")

    # device cost (compile-time; valid in any window)
    l = jnp.asarray(pairs[0][0].astype(np.float32))
    r = jnp.asarray(pairs[0][1].astype(np.float32))
    print("\ncost_analysis (GB accessed / GB temp / GFLOP):")
    for name, fn in fns.items():
        comp = fn.lower(l, r).compile()
        ca = comp.cost_analysis()
        ma = comp.memory_analysis()
        gb = ca.get("bytes accessed", 0.0) / 1e9
        tmp = getattr(ma, "temp_size_in_bytes", 0) / 1e9
        gf = ca.get("flops", 0.0) / 1e9
        print(f"  {name:22s} {gb:6.2f} / {tmp:5.2f} / {gf:6.2f}")

    # wall-clock A/B (one process; D2H-fenced; healthy windows only)
    print("\nwall-clock (20 iters, D2H-fenced):")
    for name, fn in fns.items():
        fn(l, r).block_until_ready()
        t0 = time.perf_counter()
        out = None
        for i in range(20):
            out = fn(l + np.float32(i), r + np.float32(i))
        np.asarray(out)          # hard fence
        dt = (time.perf_counter() - t0) / 20
        print(f"  {name:22s} {dt * 1e3:7.2f} ms")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

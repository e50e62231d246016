"""Per-gate coverage accounting for the stereo front-end (round 4).

The stereo-resident radius-15 stress twin maps ~29% less than the depth-fed
twin (BASELINE.md: coverage 0.518 vs 0.728).  This experiment attributes
the loss gate by gate on representative frames of the SAME scene:

  raw WTA -> LR consistency -> texture -> cost ceiling -> uniqueness
  -> median post-filter -> depthfilter.clean_depth

For every cumulative gate combination it reports in-range coverage, MAE /
median error (px), and the >3 px outlier rate vs the renderer's ground
truth — the evidence for which lever to pull (relax / replace / keep) at
matched error, and for the post-median & clean_depth BASELINE rows.

Timing-independent (pure fidelity): valid in any relay window.  Usage:
    python experiments/stereo_gates.py [n_frames]
"""

import os
import sys

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
    from densesurfelmapping_tpu.ops import depthfilter

    cfg = dsm.kitti_config()
    scene = stressfeed.stress_scene(radius=radius)
    poses = stressfeed.circuit_trajectory(120, radius=radius)
    scfg = stereo.StereoConfig(aggregation="sgm", post_median=False)
    baseline_m = 0.54
    bf = cfg.camera.fx * baseline_m

    sgm_diag = jax.jit(lambda l, r: stereo._disparity_sgm(
        l, r, scfg, diagnostics=True))
    postfilter = jax.jit(lambda d, fs: stereo._median_postfilter(
        d, scfg.speckle_tol, fs), static_argnums=1)
    scanfill = jax.jit(lambda d, g, t: stereo._scanline_fill(d, g, t),
                       static_argnums=(1, 2))
    clean = jax.jit(depthfilter.clean_depth)

    # accumulate per-config stats over frames
    stats = {}

    def add(name, disp, true_disp, in_range, dep=None, bf_=None):
        sel = (disp > 0) & in_range
        n_in = in_range.sum()
        err = np.abs(disp[sel] - true_disp[sel])
        s = stats.setdefault(name, dict(cov=[], mae=[], med=[], out3=[],
                                        in10=[]))
        s["cov"].append(sel.sum() / max(n_in, 1))
        s["mae"].append(err.mean() if err.size else np.nan)
        s["med"].append(np.median(err) if err.size else np.nan)
        s["out3"].append((err > 3.0).mean() if err.size else np.nan)
        if dep is not None:
            # depth-domain: fraction of IN-RANGE gt pixels recovered
            # within 10 cm (proxy for the map-level recall@10cm row)
            z = np.where(disp > 0, bf_ / np.maximum(disp, 1e-6), 0.0)
            good = sel & (np.abs(z - dep) <= 0.10)
            s["in10"].append(good.sum() / max(n_in, 1))
        else:
            s["in10"].append(np.nan)

    frame_ids = np.linspace(5, 115, n_frames).astype(int)
    for fi in frame_ids:
        pose = poses[fi]
        img, dep = scene.render(cfg, pose)
        rp = np.array(pose, np.float64).copy()
        rp[:3, 3] += rp[:3, 0] * baseline_m
        rimg, _ = scene.render(cfg, rp)

        true_disp = np.where(dep > 0, bf / np.maximum(dep, 1e-6), 0.0)
        in_range = (true_disp >= scfg.min_disparity + 1) \
            & (true_disp < scfg.max_disparity - 1) & (dep > 0)

        l = jnp.asarray(img.astype(np.float32))
        r = jnp.asarray(rimg.astype(np.float32))
        out, d = sgm_diag(l, r)
        disp = np.asarray(d["disp"])
        masks = {k: np.asarray(v) for k, v in d.items() if k != "disp"}

        def chain(mask_disp, fs=None, n_med=0, do_clean=False,
                  fill_after=0, occl_gap=0, occl_lerp=0.0):
            """host-side post chain: optional occlusion scanline fill
            (occl_gap px cap), then n_med post-median passes (fill_support
            fs), then optional clean_depth, then fill_after more median
            passes (restores coverage clean_depth's non-filling median
            removed); returns disparity"""
            d_ = mask_disp
            if occl_gap:
                d_ = np.asarray(scanfill(jnp.asarray(
                    d_.astype(np.float32)), occl_gap, occl_lerp))
            for _ in range(n_med):
                d_ = np.asarray(postfilter(jnp.asarray(
                    d_.astype(np.float32)), fs))
            if do_clean:
                z = np.where(d_ > 0, bf / np.maximum(d_, 1e-6), 0.0)
                z = np.asarray(clean(jnp.asarray(z.astype(np.float32))))
                d_ = np.where(z > 0, bf / np.maximum(z, 1e-6), 0.0)
            for _ in range(fill_after):
                d_ = np.asarray(postfilter(jnp.asarray(
                    d_.astype(np.float32)), fs))
            return d_

        add("0 raw WTA (no gates)", disp, true_disp, in_range, dep, bf)
        add("1 + LR consistency", np.where(masks["consistent"], disp, 0),
            true_disp, in_range, dep, bf)
        add("2 + texture", np.where(
            masks["consistent"] & masks["textured"], disp, 0),
            true_disp, in_range, dep, bf)
        add("3 + cost ceiling", np.where(
            masks["consistent"] & masks["textured"] & masks["cost_ok"],
            disp, 0), true_disp, in_range, dep, bf)
        gated = np.asarray(out)
        add("4 + uniqueness (= shipped gates)", gated, true_disp, in_range,
            dep, bf)
        add("5 + post-median", chain(gated, 6, 1), true_disp, in_range,
            dep, bf)
        add("6 + clean_depth (= shipped chain)", chain(gated, 6, 1, True),
            true_disp, in_range, dep, bf)

        # ---- chain variants (candidate levers) ----
        no_tex = np.where(masks["consistent"] & masks["cost_ok"]
                          & masks["unique"], disp, 0)
        add("v1 drop texture gate, full chain", chain(no_tex, 6, 1, True),
            true_disp, in_range, dep, bf)
        add("v2 post-median x2", chain(gated, 6, 2, True),
            true_disp, in_range, dep, bf)
        add("v3 fill_support=4", chain(gated, 4, 1, True),
            true_disp, in_range, dep, bf)
        add("v4 fill_support=4, x2", chain(gated, 4, 2, True),
            true_disp, in_range, dep, bf)
        add("v5 no clean_depth, median x2", chain(gated, 5, 2),
            true_disp, in_range, dep, bf)
        add("v6 drop tex, fs=4, x2", chain(no_tex, 4, 2, True),
            true_disp, in_range, dep, bf)
        lr_only = np.where(masks["consistent"] & masks["cost_ok"], disp, 0)
        add("v7 LR+ceiling only, full chain", chain(lr_only, 6, 1, True),
            true_disp, in_range, dep, bf)
        add("v8 v6 + fill-after-clean x1", chain(no_tex, 4, 2, True, 1),
            true_disp, in_range, dep, bf)
        add("v9 v6 + fill-after-clean x2", chain(no_tex, 4, 2, True, 2),
            true_disp, in_range, dep, bf)
        add("va fs=3 x2 + clean + fill x1", chain(no_tex, 3, 2, True, 1),
            true_disp, in_range, dep, bf)
        # ---- round-4 occlusion-fill variants on the shipped chain
        # (all gates incl. the texture floor, fs=4, median x2, clean) ----
        add("w0 shipped chain (fs=4 x2 clean)",
            chain(gated, 4, 2, True), true_disp, in_range, dep, bf)
        add("w1 occl-fill 16 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=16),
            true_disp, in_range, dep, bf)
        add("w2 occl-fill 32 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=32),
            true_disp, in_range, dep, bf)
        add("w3 occl-fill 64 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=64),
            true_disp, in_range, dep, bf)
        add("w4 occl-fill 127 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=127),
            true_disp, in_range, dep, bf)
        # lerp variants: interpolate within-surface gaps (anchors within
        # tol), min-fill only across discontinuities
        add("w5 fill 32/lerp 3 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=32, occl_lerp=3.0),
            true_disp, in_range, dep, bf)
        add("w6 fill 64/lerp 3 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=64, occl_lerp=3.0),
            true_disp, in_range, dep, bf)
        add("w7 fill 64/lerp 6 + shipped chain",
            chain(gated, 4, 2, True, occl_gap=64, occl_lerp=6.0),
            true_disp, in_range, dep, bf)
        add("w8 fill 127/lerp 1e9 (pure lerp)",
            chain(gated, 4, 2, True, occl_gap=127, occl_lerp=1e9),
            true_disp, in_range, dep, bf)

    print(f"\n{'config':38s} {'cov':>6s} {'mae':>7s} {'med':>7s} "
          f"{'>3px':>7s} {'in10cm':>7s}")
    for name in sorted(stats):
        s = stats[name]
        print(f"{name:38s} {np.mean(s['cov']):6.3f} "
              f"{np.nanmean(s['mae']):7.3f} {np.nanmean(s['med']):7.4f} "
              f"{np.nanmean(s['out3']):7.4f} {np.nanmean(s['in10']):7.4f}")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    main(n)

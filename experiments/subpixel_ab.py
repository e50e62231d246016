"""Subpixel-estimator A/B for the SGM front-end (round 4).

At the radius-15 twin's working depth (~15 m, bf = 382), 10 cm of depth is
only ~0.17 px of disparity — while the shipped pipeline's median disparity
error is ~0.34 px (experiments/stereo_gates.py).  Map-level recall@10cm is
therefore SUBPIXEL-accuracy-bound, not coverage-bound.  Two known biases
of the shipped estimator:

* parabola vs V-fit: census/SAD-family costs grow ~linearly away from the
  minimum, so the equiangular (V-shape) fit models them better than the
  parabola (Shimizu & Okutomi, "Precise sub-pixel estimation on area-based
  matching");
* P1 flattening: SGM path costs add ~P1 per path to the winner's NEIGHBOR
  bins (paths whose own winner is d* pay the adjacent-jump penalty there),
  inflating cm/cp symmetrically, growing the denominator, and shrinking
  |delta| — a systematic pull toward integer disparities ("pixel
  locking").  Subtracting n_paths * P1 from cm/cp before the fit undoes
  the expected offset.

This experiment scores every combination on rendered stress frames
against exact ground truth: median/MAE disparity error and the fraction
of in-range pixels within 10 cm of true depth (the map-recall proxy).
Timing-independent; valid in any relay window.  Usage:
    python experiments/subpixel_ab.py [n_frames]
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

    cfg = dsm.kitti_config()
    scene = stressfeed.stress_scene(radius=radius)
    poses = stressfeed.circuit_trajectory(120, radius=radius)
    scfg = stereo.StereoConfig(aggregation="sgm", post_median=False)
    baseline_m = 0.54
    bf = cfg.camera.fx * baseline_m
    n_d = scfg.max_disparity - scfg.min_disparity

    def wta_parts(l, r):
        """aggregated volume -> (idx, best, cm, cp, valid-gates output)"""
        from densesurfelmapping_tpu.ops.pallas.sgm import census_aggregate
        cl = stereo._census(l, scfg.census_radius)
        cr = stereo._census(r, scfg.census_radius)
        rolls = (0,) if scfg.sgm_paths == 4 else (0, 1, -1)
        agg = census_aggregate(cl, cr, rolls, scfg.sgm_p1, scfg.sgm_p2,
                               scfg.min_disparity, n_d,
                               carry_bf16=scfg.sgm_carry_bf16)
        idx, best, cm, cp, second, bestR_d = stereo._wta_scan(agg, scfg)
        gated = stereo._wta_and_gates(l, agg, scfg)
        return idx, best, cm, cp, gated

    parts = jax.jit(wta_parts)
    stats = {}

    def add(name, disp, true_disp, in_range, dep):
        sel = (disp > 0) & in_range
        err = np.abs(disp[sel] - true_disp[sel])
        z = np.where(disp > 0, bf / np.maximum(disp, 1e-6), 0.0)
        good = sel & (np.abs(z - dep) <= 0.10)
        s = stats.setdefault(name, dict(mae=[], med=[], in10=[], cov=[]))
        s["cov"].append(sel.sum() / max(in_range.sum(), 1))
        s["mae"].append(err.mean())
        s["med"].append(np.median(err))
        s["in10"].append(good.sum() / max(in_range.sum(), 1))

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

        idx, best, cm, cp, gated = [np.asarray(a) for a in parts(
            jnp.asarray(img.astype(np.float32)),
            jnp.asarray(rimg.astype(np.float32)))]
        vmask = np.asarray(gated) > 0
        d0 = (idx + scfg.min_disparity).astype(np.float32)
        interior = (idx > 0) & (idx < n_d - 1) & np.isfinite(cm) \
            & np.isfinite(cp)

        def score(name, delta):
            d = np.where(interior, d0 + np.clip(delta, -0.5, 0.5), d0)
            add(name, np.where(vmask, d, 0.0), true_disp, in_range, dep)

        add("integer WTA (no subpixel)", np.where(vmask, d0, 0.0),
            true_disp, in_range, dep)

        def parabola(cm_, cp_, best_):
            den = cm_ + cp_ - 2.0 * best_
            return np.where(den > 1e-9,
                            0.5 * (cm_ - cp_) / np.maximum(den, 1e-9), 0.0)

        def vfit(cm_, cp_, best_):
            s = np.maximum(np.maximum(cm_, cp_) - best_, 1e-9)
            return (cm_ - cp_) / (2.0 * s)

        score("parabola (shipped)", parabola(cm, cp, best))
        score("V-fit (equiangular)", vfit(cm, cp, best))
        for k_paths in (4, 8):
            off = k_paths * scfg.sgm_p1
            cmk = np.maximum(cm - off, best)
            cpk = np.maximum(cp - off, best)
            score(f"parabola - {k_paths}*P1", parabola(cmk, cpk, best))
            score(f"V-fit - {k_paths}*P1", vfit(cmk, cpk, best))

        # ---- photometric one-step Newton refinement: census costs are
        # integer-quantized (the subpixel ceiling above); the IMAGES are
        # not.  Linearize I_R(x - (d0 + delta)) around the integer winner
        # and solve the box-windowed least squares for delta:
        #   delta = sum(e * g_d) / sum(g_d^2),  e = I_L - I_R(x - d0),
        #   g_d = d/dd I_R(x - d)|_{d0} = -I_R'(x - d0)
        def boxsum(a, r):
            k = 2 * r + 1
            for ax in (0, 1):
                pad = [(0, 0), (0, 0)]
                pad[ax] = (r + 1, r)
                c = np.cumsum(np.pad(a, pad, mode="edge"), axis=ax)
                a = (np.take(c, range(k, c.shape[ax]), axis=ax)
                     - np.take(c, range(0, c.shape[ax] - k), axis=ax))
            return a

        h, w = img.shape
        xg = np.arange(w)[None, :].repeat(h, 0)
        iL = img.astype(np.float64)
        iR = rimg.astype(np.float64)
        xs = np.clip(xg - d0.astype(np.int64), 1, w - 2)
        r0 = np.take_along_axis(iR, xs, axis=1)
        g = 0.5 * (np.take_along_axis(iR, xs + 1, axis=1)
                   - np.take_along_axis(iR, xs - 1, axis=1))
        e = iL - r0
        gd = -g
        for rr in (1, 2, 4):
            num = boxsum(e * gd, rr)
            den = boxsum(gd * gd, rr)
            delta = np.where(den > 1e-6, num / np.maximum(den, 1e-6), 0.0)
            fallback = np.where(interior,
                                np.clip(parabola(cm, cp, best), -0.5, 0.5),
                                0.0)
            d = np.where((den > 1e-3) & (np.abs(delta) <= 0.75),
                         d0 + np.clip(delta, -0.75, 0.75), d0 + fallback)
            add(f"photometric newton r={rr}", np.where(vmask, d, 0.0),
                true_disp, in_range, dep)

    print(f"\n{'estimator':26s} {'cov':>6s} {'mae':>7s} {'med':>7s} "
          f"{'in10cm':>7s}")
    for name, s in stats.items():
        print(f"{name:26s} {np.mean(s['cov']):6.3f} "
              f"{np.mean(s['mae']):7.3f} {np.mean(s['med']):7.4f} "
              f"{np.mean(s['in10']):7.4f}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4)

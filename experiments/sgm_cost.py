"""Stage-by-stage cost_analysis of the SGM stereo pipeline (no timing).

`compiled.cost_analysis()` + `memory_analysis()` work even in degraded
relay windows (CLAUDE.md) — this is the tool that found the 38 GB
cost-volume copy chain in round 2.  Prints bytes-accessed / peak-temp /
flops for the full sgm8-census pipeline and each stage in isolation, so
kernel work can be gated on traffic deltas rather than noisy wall time.

Usage: python experiments/sgm_cost.py [--cpu]
"""

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

import numpy as np


def analyze(name, fn, *args):
    import jax
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    ma = c.memory_analysis()
    gb = ca.get("bytes accessed", 0.0) / 1e9
    fl = ca.get("flops", 0.0) / 1e9
    tmp = getattr(ma, "temp_size_in_bytes", 0) / 1e9
    out = getattr(ma, "output_size_in_bytes", 0) / 1e9
    print(f"{name:34s} {gb:7.2f} GB access  {tmp:6.2f} GB temp  "
          f"{out:5.2f} GB out  {fl:7.1f} GFLOP", flush=True)
    return c


def main():
    if "--cpu" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from densesurfelmapping_tpu.models import stereo

    cfg = dsm.kitti_config()
    h, w = cfg.height, cfg.width
    l = jnp.zeros((h, w), jnp.float32)
    r = jnp.zeros((h, w), jnp.float32)
    scfg = stereo.StereoConfig(max_disparity=128, min_disparity=1,
                               radius=4, aggregation="sgm", cost="census",
                               sgm_paths=8, sgm_pallas=True)
    D = scfg.max_disparity - scfg.min_disparity
    vol = jnp.zeros((D, h, w), jnp.bfloat16)

    print(f"backend={jax.default_backend()}  frame {w}x{h}  D={D}")
    analyze("full pipeline (fused census)",
            lambda l, r: stereo.disparity(l, r, scfg), l, r)
    scfg_red = scfg._replace(wta_streaming=False)
    analyze("full pipeline (wta-reductions)",
            lambda l, r: stereo.disparity(l, r, scfg_red), l, r)
    scfg_mat = scfg._replace(sgm_fused_census=False)
    analyze("full pipeline (materialized)",
            lambda l, r: stereo.disparity(l, r, scfg_mat), l, r)
    analyze("cost volume (scan builder)",
            lambda l, r: stereo._cost_volume_scan(l, r, scfg), l, r)
    analyze("x aggregation (pallas)",
            lambda v: jnp.transpose(
                __import__("densesurfelmapping_tpu.ops.pallas.sgm",
                           fromlist=["axis_scan_pallas"]).axis_scan_pallas(
                    jnp.transpose(v, (2, 1, 0)), (0,),
                    scfg.sgm_p1, scfg.sgm_p2), (2, 1, 0)), vol)
    analyze("y aggregation 3-roll (pallas)",
            lambda v: jnp.transpose(
                __import__("densesurfelmapping_tpu.ops.pallas.sgm",
                           fromlist=["axis_scan_pallas"]).axis_scan_pallas(
                    jnp.transpose(v, (1, 2, 0)), (0, 1, -1),
                    scfg.sgm_p1, scfg.sgm_p2), (2, 0, 1)), vol)
    analyze("full aggregation (both axes)",
            lambda v: stereo._sgm_aggregate(
                v, scfg.sgm_p1, scfg.sgm_p2, 8, True), vol)

    agg = jnp.zeros((D, h, w), jnp.float32)

    def wta_from_agg(agg, left):
        # mirror of the post-aggregation section of _disparity_sgm
        idx = jnp.argmin(agg, axis=0)
        best = jnp.min(agg, axis=0)
        return idx, best
    analyze("WTA argmin/min only", wta_from_agg, agg, l)

    print("done")


if __name__ == "__main__":
    main()

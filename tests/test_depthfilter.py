"""Depth post-filter tests: median denoise, flyer suppression, and the
effect on stereo-matcher output quality."""

import jax
import jax.numpy as jnp
import numpy as np

from densesurfelmapping_tpu.ops import depthfilter as DF


def test_median_removes_speckle():
    d = np.full((16, 20), 5.0, np.float32)
    d[7, 9] = 50.0          # speckle
    d[3, 4] = 0.0           # hole
    out = np.asarray(DF.median3x3(jnp.asarray(d)))
    assert out[7, 9] == 5.0
    assert out[3, 4] == 0.0          # invalid center stays invalid (no-fill)
    filled = np.asarray(DF.median3x3(jnp.asarray(d), fill_invalid=True))
    assert filled[3, 4] == 5.0       # opt-in hole-fill from valid neighbors
    np.testing.assert_allclose(out[10:, 10:], 5.0)


def test_median_respects_min_valid():
    d = np.zeros((10, 10), np.float32)
    d[5, 5] = 4.0            # isolated valid pixel: < min_valid neighbors
    out = np.asarray(DF.median3x3(jnp.asarray(d), min_valid=5))
    assert out[5, 5] == 0.0
    assert (out == 0).all()


def test_flyer_suppression():
    d = np.full((12, 12), 8.0, np.float32)
    d[6, 6] = 9.5            # flying pixel between surfaces
    d[:, :4] = 2.0           # nearer surface, internally consistent
    out = np.asarray(DF.suppress_flyers(jnp.asarray(d)))
    assert out[6, 6] == 0.0
    assert out[2, 2] == 2.0 and out[8, 8] == 8.0
    # boundary column pixels still have >=3 same-surface neighbors
    assert out[6, 3] == 2.0 and out[6, 4] == 8.0


def test_clean_depth_improves_stereo_output():
    """End to end: matcher depth -> clean_depth removes isolated outliers
    without degrading inlier accuracy."""
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.models import stereo

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=1024)
    scene = synthetic.Scene(ground_y=1.5, wall_z=12.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=20.0, texture="multisine")
    lp = np.eye(4)
    rp = np.eye(4)
    rp[0, 3] = 0.5
    li, gt = scene.render(cfg, lp)
    ri, _ = scene.render(cfg, rp)
    scfg = stereo.StereoConfig(max_disparity=64, radius=3)
    raw = stereo.depth_from_stereo(jnp.asarray(li), jnp.asarray(ri),
                                   bf=cam.fx * 0.5, config=scfg)
    clean = np.asarray(jax.jit(DF.clean_depth)(raw))
    raw = np.asarray(raw)

    def gross_rate(d):
        sel = (d > 0) & (gt > 0)
        if sel.sum() == 0:
            return 0.0, 0
        rel = np.abs(d[sel] - gt[sel]) / gt[sel]
        return float((rel > 0.1).mean()), int(sel.sum())

    raw_bad, raw_n = gross_rate(raw)
    clean_bad, clean_n = gross_rate(clean)
    assert clean_n > 0.5 * raw_n          # keeps most coverage
    assert clean_bad <= raw_bad + 1e-9    # never increases gross outliers

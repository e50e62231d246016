"""Tests of the stereo-resident fuse path: depth computed on device
INSIDE the fuse program from a packed u8 left/right pair
(`fuse_step.fuse_frame_stereo_packed`, driver `enable_stereo`/`feed_stereo`).

Replaces the reference's offline-PSMNet depth source
(`kitti_publisher/scripts/publisher.py:36-41`) with an on-TPU front-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.core.state import (SurfelBank, FrameInput,
                                               pack_stereo_pair)
from densesurfelmapping_tpu.io import synthetic
from densesurfelmapping_tpu.models.stereo import StereoConfig
from densesurfelmapping_tpu.pipeline import fuse_step
from densesurfelmapping_tpu.pipeline.driver import SurfelMapping
from densesurfelmapping_tpu.pipeline.device_driver import DeviceResidentMapping


CAM = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                       cx=59.5, cy=27.5)
BASELINE = 0.5
SCFG = StereoConfig(max_disparity=64, min_disparity=1, radius=3)


def small_config(**kw):
    kw.setdefault("surfel_capacity", 16384)
    kw.setdefault("lane_align", 8)
    kw.setdefault("drift_free_poses", 3)
    return SurfelMapConfig(camera=CAM, **kw)


@pytest.fixture(scope="module")
def stereo_scene():
    cfg = small_config()
    scene = synthetic.Scene(ground_y=1.5, wall_z=18.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=25.0, texture="multisine")
    return cfg, scene


def render_pair(cfg, scene, pose):
    rp = np.array(pose, np.float64).copy()
    rp[:3, 3] += rp[:3, 0] * BASELINE
    li, ld = scene.render(cfg, pose)
    ri, _ = scene.render(cfg, rp)
    return li, ri, ld


def test_fused_step_matches_two_stage(stereo_scene):
    """One-program stereo+fuse == stereo depth computed separately then
    fed through the plain fuse step (same in-jit ops, f32 end to end)."""
    cfg, scene = stereo_scene
    pose = np.eye(4)
    li, ri, _ = render_pair(cfg, scene, pose)
    bf = CAM.fx * BASELINE
    buf = pack_stereo_pair(cfg, li, ri)
    pose_j = jnp.asarray(np.eye(4, dtype=np.float32))

    fused = fuse_step.jitted_fuse_frame_stereo_packed(cfg, SCFG)
    bank_a, stats_a = fused(SurfelBank.empty(cfg.surfel_capacity),
                            jnp.asarray(buf), pose_j, jnp.int32(0),
                            jnp.float32(bf))

    # two-stage: same decode + depth ops, then the generic fuse step
    @jax.jit
    def two_stage(bank, buf, pose, bf):
        left, right = fuse_step.unpack_stereo(cfg, buf)
        depth, _ = fuse_step.compute_depth_stereo(cfg, SCFG, left, right, bf)
        ph, pw = cfg.padded_height, cfg.padded_width
        img = jnp.pad(left, ((0, ph - cfg.height), (0, pw - cfg.width)))
        dep = jnp.pad(depth, ((0, ph - cfg.height), (0, pw - cfg.width)))
        return fuse_step.fuse_frame(cfg, bank, FrameInput(
            image=img, depth=dep, pose=pose, frame_index=jnp.int32(0)))

    bank_b, stats_b = two_stage(SurfelBank.empty(cfg.surfel_capacity),
                                jnp.asarray(buf), pose_j, jnp.float32(bf))

    assert int(stats_a["n_new"]) == int(stats_b["n_new"])
    np.testing.assert_allclose(np.asarray(bank_a.position),
                               np.asarray(bank_b.position),
                               rtol=0, atol=1e-5)


def test_stereo_depth_matches_ground_truth(stereo_scene):
    """The in-step depth front-end reproduces the rendered scene depth on
    valid pixels (sanity on the bf/disparity contract + filtering)."""
    cfg, scene = stereo_scene
    li, ri, ld = render_pair(cfg, scene, np.eye(4))
    bf = CAM.fx * BASELINE
    depth = np.asarray(jax.jit(
        lambda l, r: fuse_step.compute_depth_stereo(
            cfg, SCFG, l, r, jnp.float32(bf))[0])(
        jnp.asarray(li, jnp.float32), jnp.asarray(ri, jnp.float32)))
    sel = (depth > 0) & (ld > 1.0) & (ld < 15.0)
    assert sel.mean() > 0.1     # post-filter chain trims borders/flyers
    rel = np.abs(depth[sel] - ld[sel]) / ld[sel]
    assert np.median(rel) < 0.05


@pytest.mark.parametrize("cls", [SurfelMapping, DeviceResidentMapping])
def test_driver_feed_stereo_e2e(stereo_scene, cls):
    cfg, scene = stereo_scene
    m = cls(cfg)
    m.enable_stereo(bf=CAM.fx * BASELINE, stereo_config=SCFG)
    n = 6
    for i in range(n):
        pose = np.eye(4)
        pose[0, 3] = 0.15 * i
        li, ri, _ = render_pair(cfg, scene, pose)
        m.feed_pose(float(i), pose, is_keyframe=(i % 2 == 0))
        m.feed_stereo(float(i), li, ri)
    assert m.frames_fused == n
    metr = m.metrics()
    assert metr["active_count"] > 100
    surf = m.map_surfels()
    assert np.isfinite(surf["position"]).all()


def test_feed_stereo_requires_enable(stereo_scene):
    cfg, _ = stereo_scene
    m = DeviceResidentMapping(cfg)
    with pytest.raises(RuntimeError, match="enable_stereo"):
        m.feed_stereo(0.0, np.zeros((CAM.height, CAM.width), np.uint8),
                      np.zeros((CAM.height, CAM.width), np.uint8))


def test_pack_stereo_pair_shapes(stereo_scene):
    cfg, scene = stereo_scene
    li, ri, _ = render_pair(cfg, scene, np.eye(4))
    buf = pack_stereo_pair(cfg, li, ri)
    assert buf.dtype == np.uint8
    assert buf.shape == (2 * CAM.height * CAM.width,)
    with pytest.raises(ValueError, match="shape"):
        pack_stereo_pair(cfg, li[:-1], ri)

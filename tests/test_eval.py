"""Map-fidelity harness tests: splat rendering + metrics on synthetic GT."""

import numpy as np
import pytest

from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.eval import render_depth, depth_metrics, evaluate_map
from densesurfelmapping_tpu.pipeline.driver import SurfelMapping
from densesurfelmapping_tpu.io import synthetic


CAM = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                       cx=59.5, cy=27.5)


def test_render_depth_single_surfel():
    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=1024)
    surfels = {
        "position": np.array([[0.0, 0.0, 5.0]], np.float32),
        "normal": np.array([[0.0, 0.0, -1.0]], np.float32),
        "size": np.array([0.5], np.float32),   # big radius -> 2px footprint
    }
    d = render_depth(cfg, surfels, np.eye(4))
    cy, cx = int(CAM.cy + 0.5), int(CAM.cx + 0.5)
    assert d[cy, cx] == pytest.approx(5.0)
    assert d[cy + 1, cx] == pytest.approx(5.0)   # footprint splat
    assert (d > 0).sum() == 49                   # radius-4 Euclidean disk
    # behind-camera surfel renders nothing
    surfels["position"][0, 2] = -5.0
    assert (render_depth(cfg, surfels, np.eye(4)) > 0).sum() == 0


def test_depth_metrics():
    gt = np.full((4, 4), 10.0, np.float32)
    gt[0, 0] = 0.0
    r = gt.copy()
    r[1, 1] = 10.05
    r[2, 2] = 0.0
    m = depth_metrics(r, gt)
    assert m["gt_pixels"] == 15
    assert m["coverage"] == pytest.approx(14 / 15)
    assert m["mae"] == pytest.approx(0.05 / 14, rel=1e-3)  # f32 sum
    assert m["inlier_0p1m"] == 1.0


def test_end_to_end_map_fidelity():
    """Map a synthetic scene, then re-render the map: high coverage and
    centimeter-level agreement with ground-truth depth.

    Geometry note: at this test focal length a 16x16-px seed window spans a
    large world footprint, so grazing surfaces (the ground plane at range)
    legitimately fail the reference's 80%-inlier plane gate.  The scene is
    therefore wall-dominated — near-frontoparallel, like the KITTI facades
    the full-resolution pipeline reconstructs."""
    wall_cam = CameraIntrinsics(width=120, height=56, fx=160.0, fy=160.0,
                                cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=wall_cam, surfel_capacity=32768,
                          stable_update_times=3)
    scene = synthetic.Scene(ground_y=1.5, wall_z=12.0, boxes=[],
                            max_depth=25.0)
    poses = synthetic.forward_trajectory(8, step=0.3)
    m = SurfelMapping(cfg)
    frames = []
    for i, pose in enumerate(poses):
        img, dep = scene.render(cfg, pose)
        frames.append((img, dep))
        m.feed_pose(float(i), pose, is_keyframe=True)
        m.feed_image(float(i), img)
        m.feed_depth(float(i), dep)

    res = evaluate_map(m, frames[3:6], poses[3:6])
    assert res["coverage"] > 0.5, res
    assert res["mae"] < 0.25, res
    assert res["inlier_1pct"] > 0.6, res


def test_render_empty_map():
    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=128)
    d = render_depth(cfg, {"position": np.zeros((0, 3), np.float32),
                           "normal": np.zeros((0, 3), np.float32),
                           "size": np.zeros((0,), np.float32)}, np.eye(4))
    assert d.shape == (CAM.height, CAM.width)
    assert (d == 0).all()
    m = depth_metrics(d, np.zeros((CAM.height, CAM.width), np.float32))
    assert m["gt_pixels"] == 0 and m["coverage"] == 0


def test_cloud_metrics_known_offsets():
    from densesurfelmapping_tpu.eval import cloud_metrics

    rng = np.random.default_rng(3)
    gt = rng.uniform(-1, 1, (5000, 3)).astype(np.float32)
    # exact copy: all distances zero, perfect precision/recall
    m = cloud_metrics(gt, gt, threshold=0.05)
    assert m["accuracy_mean"] == 0.0 and m["completeness_mean"] == 0.0
    assert m["precision"] == m["recall"] == m["f1"] == 1.0
    # constant 0.2 m offset: accuracy == completeness == 0.2 (dense cloud
    # caveat avoided by comparing against the SHIFTED copy of itself)
    shifted = gt + np.float32([0.2, 0, 0])
    m = cloud_metrics(shifted, gt, threshold=0.05)
    # nearest neighbor of a shifted point can be a different gt point
    # closer than 0.2 in a dense cloud; bound loosely from below
    assert 0.03 < m["accuracy_mean"] <= 0.2 + 1e-6
    assert m["chamfer"] == pytest.approx(
        0.5 * (m["accuracy_mean"] + m["completeness_mean"]))
    # half the map is garbage far away: precision halves, recall stays
    junk = gt[:2500] + np.float32([10, 0, 0])
    m = cloud_metrics(np.concatenate([gt, junk]), gt, threshold=0.05)
    assert m["precision"] == pytest.approx(2.0 / 3.0, abs=0.02)
    assert m["recall"] == 1.0
    # empty map
    m = cloud_metrics(np.zeros((0, 3), np.float32), gt)
    assert m["f1"] == 0.0 and np.isinf(m["chamfer"])


def test_end_to_end_cloud_metrics():
    """Same wall-dominated setup as test_end_to_end_map_fidelity (see its
    geometry note — the tiny default camera yields almost no stable
    surfels), scored with the cloud-to-cloud metrics."""
    from densesurfelmapping_tpu.eval import evaluate_map_clouds

    wall_cam = CameraIntrinsics(width=120, height=56, fx=160.0, fy=160.0,
                                cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=wall_cam, surfel_capacity=32768,
                          stable_update_times=3)
    scene = synthetic.Scene(ground_y=1.5, wall_z=12.0, boxes=[],
                            max_depth=25.0)
    poses = synthetic.forward_trajectory(8, step=0.3)
    m = SurfelMapping(cfg)
    frames = []
    for i, pose in enumerate(poses):
        img, dep = scene.render(cfg, pose)
        frames.append((img, dep))
        m.feed_pose(float(i), pose, is_keyframe=True)
        m.feed_image(float(i), img)
        m.feed_depth(float(i), dep)

    res = evaluate_map_clouds(m, frames[3:6], poses[3:6], threshold=0.15)
    assert res["accuracy_median"] < 0.15, res
    assert res["recall"] > 0.5, res
    assert res["f1"] > 0.5, res

"""Tests for the TPU-native block-matching stereo depth model."""

import jax.numpy as jnp
import numpy as np
import pytest

from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.io import synthetic
from densesurfelmapping_tpu.models import stereo


CAM = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                       cx=59.5, cy=27.5)
BASELINE = 0.5  # m


@pytest.fixture(scope="module")
def stereo_pair():
    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=1024)
    scene = synthetic.Scene(ground_y=1.5, wall_z=18.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=25.0, texture="multisine")
    left_pose = np.eye(4)
    right_pose = np.eye(4)
    right_pose[0, 3] = BASELINE
    li, ld = scene.render(cfg, left_pose)
    ri, _ = scene.render(cfg, right_pose)
    return cfg, li, ld, ri


def test_disparity_accuracy(stereo_pair):
    cfg, left, true_depth, right = stereo_pair
    scfg = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3)
    disp = np.asarray(stereo.jitted_disparity(scfg)(
        jnp.asarray(left), jnp.asarray(right)))

    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6),
                         0.0)
    in_range = (true_disp >= 2.0) & (true_disp < 63.0)
    valid = (disp > 0) & in_range
    assert valid.mean() > 0.25, f"too few valid matches: {valid.mean():.3f}"
    err = np.abs(disp[valid] - true_disp[valid])
    assert np.median(err) < 0.5, f"median disparity error {np.median(err)}"
    assert (err < 1.5).mean() > 0.85, "too many gross outliers"


def test_depth_from_stereo_contract(stereo_pair):
    cfg, left, true_depth, right = stereo_pair
    scfg = stereo.StereoConfig(max_disparity=64, radius=3)
    bf = CAM.fx * BASELINE
    depth = np.asarray(stereo.depth_from_stereo(
        jnp.asarray(left), jnp.asarray(right), bf=bf, config=scfg,
        max_depth=20.0))
    assert depth.shape == left.shape
    assert (depth <= 20.0).all() and (depth >= 0).all()
    sel = (depth > 0) & (true_depth > 1.0) & (true_depth < 15.0)
    assert sel.mean() > 0.1
    rel = np.abs(depth[sel] - true_depth[sel]) / true_depth[sel]
    assert np.median(rel) < 0.05, f"median relative depth error {np.median(rel)}"


def test_textureless_rejected():
    """Uniform images must produce no (or almost no) valid disparities."""
    h, w = 40, 96
    flat = jnp.full((h, w), 80.0)
    scfg = stereo.StereoConfig(max_disparity=32)
    disp = np.asarray(stereo.disparity(flat, flat, scfg))
    assert (disp > 0).mean() < 0.2

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


def test_sgm_accuracy(stereo_pair):
    """SGM aggregation: at least as accurate as box WTA and at least as
    dense on the textured scene."""
    cfg, left, true_depth, right = stereo_pair
    box_cfg = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3)
    sgm_cfg = box_cfg._replace(aggregation="sgm")
    d_box = np.asarray(stereo.jitted_disparity(box_cfg)(
        jnp.asarray(left), jnp.asarray(right)))
    d_sgm = np.asarray(stereo.jitted_disparity(sgm_cfg)(
        jnp.asarray(left), jnp.asarray(right)))

    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6), 0.)
    in_range = (true_disp >= 2.0) & (true_disp < 63.0)

    def stats(d):
        valid = (d > 0) & in_range
        err = np.abs(d[valid] - true_disp[valid])
        return valid.mean(), np.median(err), (err < 1.5).mean()

    v_box, med_box, in_box = stats(d_box)
    v_sgm, med_sgm, in_sgm = stats(d_sgm)
    assert med_sgm < 0.5, f"sgm median err {med_sgm}"
    assert v_sgm >= 0.9 * v_box, (v_sgm, v_box)
    assert in_sgm >= in_box - 0.03


def test_sgm_denser_on_weak_texture():
    """On a weakly textured wall, SGM resolves more pixels than box WTA."""
    from densesurfelmapping_tpu.config import SurfelMapConfig
    from densesurfelmapping_tpu.io import synthetic

    cfg = SurfelMapConfig(camera=CAM, surfel_capacity=1024)
    scene = synthetic.Scene(ground_y=10.0, wall_z=8.0, boxes=[],
                            max_depth=15.0,
                            intensity_freq=(0.02, 0.02))  # very low contrast
    lp = np.eye(4)
    rp = np.eye(4)
    rp[0, 3] = BASELINE
    li, gt = scene.render(cfg, lp)
    ri, _ = scene.render(cfg, rp)
    box_cfg = stereo.StereoConfig(max_disparity=64, radius=3,
                                  texture_threshold=0.2)
    sgm_cfg = box_cfg._replace(aggregation="sgm")
    d_box = np.asarray(stereo.jitted_disparity(box_cfg)(
        jnp.asarray(li), jnp.asarray(ri)))
    d_sgm = np.asarray(stereo.jitted_disparity(sgm_cfg)(
        jnp.asarray(li), jnp.asarray(ri)))
    true_disp = CAM.fx * BASELINE / 8.0
    ok_box = (np.abs(d_box - true_disp) < 1.0) & (d_box > 0)
    ok_sgm = (np.abs(d_sgm - true_disp) < 1.0) & (d_sgm > 0)
    assert ok_sgm.mean() >= ok_box.mean(), (ok_sgm.mean(), ok_box.mean())
    assert ok_sgm.mean() > 0.2


def test_census_8path_sgm(stereo_pair):
    """Production SGM config (census cost, 8 paths): accuracy and density
    at least match the 4-path SAD variant on the textured scene."""
    cfg, left, true_depth, right = stereo_pair
    base = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3,
                               aggregation="sgm")
    sad4 = base._replace(cost="sad", sgm_paths=4)
    cen8 = base._replace(cost="census", sgm_paths=8)
    d_sad = np.asarray(stereo.jitted_disparity(sad4)(
        jnp.asarray(left), jnp.asarray(right)))
    d_cen = np.asarray(stereo.jitted_disparity(cen8)(
        jnp.asarray(left), jnp.asarray(right)))

    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6), 0.)
    in_range = (true_disp >= 2.0) & (true_disp < 63.0)

    def stats(d):
        valid = (d > 0) & in_range
        err = np.abs(d[valid] - true_disp[valid])
        return valid.mean(), np.median(err), (err < 1.5).mean()

    v_s, med_s, in_s = stats(d_sad)
    v_c, med_c, in_c = stats(d_cen)
    assert med_c < 0.5, f"census median err {med_c}"
    assert v_c >= 0.9 * v_s, (v_c, v_s)
    assert in_c >= in_s - 0.05


def test_census_transform_is_radiometric_invariant():
    """Census depends only on intensity ORDER: gain/bias changes leave the
    transform untouched (the property SAD lacks)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (20, 30)).astype(np.float32)
    a = np.asarray(stereo._census(jnp.asarray(img), 2))
    b = np.asarray(stereo._census(jnp.asarray(img * 1.7 + 11.0), 2))
    np.testing.assert_array_equal(a, b)


def test_sgm_rejects_constant_image():
    h, w = 40, 96
    flat = jnp.full((h, w), 80.0)
    scfg = stereo.StereoConfig(max_disparity=32, aggregation="sgm")
    disp = np.asarray(stereo.disparity(flat, flat, scfg))
    assert (disp > 0).mean() < 0.05

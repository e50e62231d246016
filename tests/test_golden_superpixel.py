"""Golden-value tests: JAX superpixel/normal kernels vs the NumPy oracle.

The oracle (tests/reference_impl.py) is a scalar float64 transcription of the
reference semantics; the TPU kernels must match it at float32 tolerance on
small synthetic frames with realistic structure (smooth surfaces + depth
holes + discontinuities).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.core.state import pad_frame
from densesurfelmapping_tpu.ops import superpixel as SPX
from densesurfelmapping_tpu.ops import normals as NRM
from densesurfelmapping_tpu.ops import windows as W

import reference_impl as ref


def make_config(width=64, height=48):
    cam = CameraIntrinsics(width=width, height=height,
                           fx=80.0, fy=82.0, cx=width / 2.0 - 0.5,
                           cy=height / 2.0 - 0.5)
    return SurfelMapConfig(camera=cam, surfel_capacity=8192, lane_align=8)


def make_ref_params(cfg):
    return ref.RefParams(
        width=cfg.width, height=cfg.height,
        fx=cfg.camera.fx, fy=cfg.camera.fy,
        cx=cfg.camera.cx, cy=cfg.camera.cy,
        sp_size=cfg.sp_size, iterations=cfg.sp_iters,
        max_angle_cos=cfg.max_angle_cos,
        huber_range=cfg.profile.huber_range,
        baseline=cfg.profile.baseline,
        disparity_error=cfg.profile.disparity_error,
        min_tolerate_diff=cfg.profile.min_tolerate_diff,
        fuse_near=cfg.fuse_near, fuse_far=cfg.fuse_far)


def synthetic_frame(cfg, seed=0, holes=True):
    """Structured test frame: tilted plane + a step + smooth intensity."""
    rng = np.random.default_rng(seed)
    h, w = cfg.height, cfg.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    image = (128 + 60 * np.sin(xx / 9.0) * np.cos(yy / 7.0)
             + rng.normal(0, 2.0, (h, w))).clip(0, 255)
    # intensity quantized like a mono8 camera
    image = np.floor(image).astype(np.float32).astype(np.float64)

    # tilted plane: z = 3 + 0.01x + 0.005y, with a nearer box
    depth = 3.0 + 0.01 * xx + 0.005 * yy + rng.normal(0, 0.002, (h, w))
    box = (yy > h * 0.4) & (yy < h * 0.75) & (xx > w * 0.3) & (xx < w * 0.6)
    depth = np.where(box, depth - 1.2, depth)
    if holes:
        hole = rng.random((h, w)) < 0.03
        depth = np.where(hole, 0.0, depth)
        depth[:, : w // 10] = 0.0
    return image.astype(np.float32), depth.astype(np.float32)


def remap_assignment(cfg, assign_padded):
    """Padded flat ids -> reference flat ids (or -1)."""
    a = np.asarray(assign_padded)[:cfg.height, :cfg.width].astype(np.int64)
    rows = a // cfg.sp_cols
    cols = a % cfg.sp_cols
    ok = (a >= 0) & (rows < cfg.valid_sp_rows) & (cols < cfg.valid_sp_cols)
    return np.where(ok, rows * cfg.valid_sp_cols + cols, -1)


def seeds_to_ref_layout(cfg, seeds):
    """Crop padded (R, C) seed planes to the reference grid, flat."""
    vr, vc = cfg.valid_sp_rows, cfg.valid_sp_cols
    crop = lambda f: np.asarray(f)[:vr, :vc].reshape(vr * vc, -1).squeeze(-1) \
        if f.ndim == 2 else np.asarray(f)[:vr, :vc].reshape(vr * vc, f.shape[-1])
    return crop


@pytest.fixture(scope="module")
def golden_case():
    cfg = make_config()
    p = make_ref_params(cfg)
    image, depth = synthetic_frame(cfg)
    ref_seeds, ref_assign, ref_space, ref_norms = ref.generate_superpixels(
        p, image.astype(np.float64), depth.astype(np.float64))

    pi, pd = pad_frame(cfg, image, depth)
    jit_seg = jax.jit(lambda i, d: _full_seg(cfg, i, d))
    seeds, assign = jit_seg(jnp.asarray(pi), jnp.asarray(pd))
    return cfg, p, image, depth, ref_seeds, ref_assign, seeds, assign


def _full_seg(cfg, image, depth):
    seeds, assignment = SPX.run_slic(cfg, image, depth)
    seeds, _ = NRM.compute_seed_planes(cfg, seeds, assignment, depth)
    return seeds, assignment


def test_seed_init_matches(golden_case):
    cfg, p, image, depth, *_ = golden_case
    ref_seeds = ref.initialize_seeds(p, image.astype(np.float64),
                                     depth.astype(np.float64))
    pi, pd = pad_frame(cfg, image, depth)
    seeds = jax.jit(lambda i, d: SPX.initialize_seeds(cfg, i, d))(
        jnp.asarray(pi), jnp.asarray(pd))
    crop = seeds_to_ref_layout(cfg, seeds)
    np.testing.assert_allclose(crop(seeds.x), ref_seeds.x, atol=1e-5)
    np.testing.assert_allclose(crop(seeds.y), ref_seeds.y, atol=1e-5)
    np.testing.assert_allclose(crop(seeds.mean_intensity),
                               ref_seeds.mean_intensity, atol=1e-4)
    np.testing.assert_allclose(crop(seeds.mean_depth),
                               ref_seeds.mean_depth, atol=1e-5)


def test_assignment_matches(golden_case):
    cfg, p, image, depth, ref_seeds, ref_assign, seeds, assign = golden_case
    got = remap_assignment(cfg, assign)
    mismatch = (got != ref_assign).mean()
    # float32 cost ties near SLIC boundaries can flip a handful of pixels
    assert mismatch < 0.01, f"assignment mismatch ratio {mismatch}"


def test_seed_stats_match(golden_case):
    cfg, p, image, depth, ref_seeds, ref_assign, seeds, assign = golden_case
    crop = seeds_to_ref_layout(cfg, seeds)
    got = remap_assignment(cfg, assign)
    clean = np.ones(len(ref_seeds.x), bool)
    # only compare seeds whose member sets agree (boundary flips excluded)
    for s in np.unique(np.concatenate([got[got != ref_assign],
                                       ref_assign[got != ref_assign]])):
        if s >= 0:
            clean[s] = False
    for name, mine, theirs, tol in [
            ("x", crop(seeds.x), ref_seeds.x, 1e-3),
            ("y", crop(seeds.y), ref_seeds.y, 1e-3),
            ("intensity", crop(seeds.mean_intensity),
             ref_seeds.mean_intensity, 1e-2),
            ("depth", crop(seeds.mean_depth), ref_seeds.mean_depth, 1e-3)]:
        np.testing.assert_allclose(mine[clean], theirs[clean], atol=tol,
                                   err_msg=name)


def test_plane_fit_matches(golden_case):
    cfg, p, image, depth, ref_seeds, ref_assign, seeds, assign = golden_case
    crop = seeds_to_ref_layout(cfg, seeds)
    got = remap_assignment(cfg, assign)
    clean = np.ones(len(ref_seeds.x), bool)
    for s in np.unique(np.concatenate([got[got != ref_assign],
                                       ref_assign[got != ref_assign]])):
        if s >= 0:
            clean[s] = False
    mine_norm = crop(seeds.norm)
    mine_pos = crop(seeds.pos)
    mine_vc = crop(seeds.view_cos)
    has_ref = ref_seeds.norm.any(axis=1)
    has_mine = mine_norm.any(axis=1)
    both = clean & has_ref & has_mine
    # same seeds should succeed/fail the gates
    agree = (has_ref == has_mine) | ~clean
    assert agree.mean() > 0.97, f"plane-fit gate agreement {agree.mean()}"
    # fitted normals within 0.5 degrees, positions within 2 mm at ~3 m range
    cosang = np.sum(mine_norm[both] * ref_seeds.norm[both], axis=1)
    assert np.all(cosang > 0.9999), f"worst normal cos {cosang.min()}"
    np.testing.assert_allclose(mine_pos[both], ref_seeds.pos[both], atol=2e-3)
    np.testing.assert_allclose(mine_vc[both], ref_seeds.view_cos[both],
                               atol=1e-3)
    np.testing.assert_allclose(crop(seeds.size)[both], ref_seeds.size[both],
                               atol=1e-3)


def test_pixel_normals_match(golden_case):
    cfg, p, image, depth, *_ = golden_case
    space64 = ref.compute_space_map(p, depth.astype(np.float64))
    norms64 = ref.compute_pixel_norms(p, space64)
    pi, pd = pad_frame(cfg, image, depth)
    space = NRM.space_map(cfg, jnp.asarray(pd))
    norms = jax.jit(lambda s: NRM.pixel_normals(cfg, s))(space)
    got = np.asarray(norms)[:cfg.height, :cfg.width]
    np.testing.assert_allclose(got, norms64, atol=5e-4)


def test_windows_roundtrip():
    cfg = make_config(width=32, height=24)
    rng = np.random.default_rng(1)
    field = rng.normal(size=(cfg.padded_height, cfg.padded_width)
                       ).astype(np.float32)
    win = np.asarray(W.extract_windows(jnp.asarray(field), cfg.sp_size))
    sp = cfg.sp_size
    pad = np.pad(field, sp // 2)
    for r in [0, 1, cfg.sp_rows - 1]:
        for c in [0, 2, cfg.sp_cols - 1]:
            expect = pad[r * sp:r * sp + 2 * sp, c * sp:c * sp + 2 * sp]
            np.testing.assert_array_equal(
                win[r, c].reshape(2 * sp, 2 * sp), expect)

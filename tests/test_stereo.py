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


def _sgm_path_oracle(vol, dy, dx, p1, p2, entry_min_d=None):
    """Scalar float64 single-direction SGM path sum L for direction
    (dy, dx) over a (D, H, W) volume — the textbook recurrence.

    entry_min_d: the wedge free-entry restart (models/stereo._SGM_BIG
    note): on +x-moving directions (dx == +1, the only ones whose history
    crosses the x < d wedge into range), plane k restarts at L = C at its
    entry column x == k + entry_min_d."""
    v = vol.astype(np.float64)
    D, H, W = v.shape
    L = np.zeros_like(v)
    ys = range(H) if dy >= 0 else range(H - 1, -1, -1)
    xs = range(W) if dx >= 0 else range(W - 1, -1, -1)
    for y in ys:
        for x in xs:
            py, px = y - dy, x - dx
            if 0 <= py < H and 0 <= px < W:
                Lp = L[:, py, px]
                Lmin = Lp.min()
                cand = np.minimum(Lp, Lmin + p2)
                cand[1:] = np.minimum(cand[1:], Lp[:-1] + p1)
                cand[:-1] = np.minimum(cand[:-1], Lp[1:] + p1)
                L[:, y, x] = v[:, y, x] + cand - Lmin
            else:
                L[:, y, x] = v[:, y, x]
            if entry_min_d is not None and dx > 0:
                for k in range(D):
                    if x == k + entry_min_d:
                        L[k, y, x] = v[k, y, x]
    return L


def test_sgm_axis_scan_matches_oracle():
    """_axis_scan (batched-direction scans, reverse=True for the backward
    orientation) must equal the per-direction scalar oracle exactly in
    f32 for every axis/roll combination, including through a masked-BIG
    left wedge like the real volume's x < d region.

    Regression context: an earlier formulation fed v[::-1] as a second
    scan input sequence, which XLA:TPU miscompiled at KITTI size
    (backward channel corrupted at x >= W - d).  The reverse=True
    formulation is exact on both backends."""
    rng = np.random.RandomState(3)
    H, W, D = 10, 40, 8
    vol = rng.randint(0, 25, size=(D, H, W)).astype(np.float32)
    wedge = np.broadcast_to(
        np.arange(W)[None, None, :] < (np.arange(D) + 1)[:, None, None],
        (D, H, W))
    vol = np.where(wedge, 1e4, vol)
    p1, p2 = 1.0, 8.0
    volj = jnp.asarray(vol)          # f32 so the oracle comparison is exact

    def check(got, want):
        # exact where costs are small integers (bf16-representable);
        # inside the BIG wedge the bf16 path outputs round (~1e4 scale),
        # which is harmless — those entries are >> the validity ceiling
        np.testing.assert_array_equal(got[~wedge], want[~wedge])
        np.testing.assert_allclose(got[wedge], want[wedge], rtol=2e-2)

    vh = jnp.transpose(volj, (2, 1, 0))      # (W, H, D): scan over x
    got = np.transpose(
        np.asarray(stereo._axis_scan(vh, (0,), p1, p2), np.float32),
        (2, 1, 0))
    want = (_sgm_path_oracle(vol, 0, 1, p1, p2)
            + _sgm_path_oracle(vol, 0, -1, p1, p2))
    check(got, want)

    vv = jnp.transpose(volj, (1, 2, 0))      # (H, W, D): scan over y
    got = np.transpose(
        np.asarray(stereo._axis_scan(vv, (0, 1, -1), p1, p2), np.float32),
        (2, 0, 1))
    want = sum(_sgm_path_oracle(vol, dy, dx, p1, p2)
               for dy, dx in [(1, 0), (-1, 0), (1, 1), (-1, 1),
                              (1, -1), (-1, -1)])
    check(got, want)

    # production entry modes: the wedge free-entry restart (this volume's
    # wedge is x < k + 1, i.e. min_d = 1)
    got = np.transpose(
        np.asarray(stereo._axis_scan(vh, (0,), p1, p2,
                                     entry="x", min_d=1), np.float32),
        (2, 1, 0))
    want = (_sgm_path_oracle(vol, 0, 1, p1, p2, entry_min_d=1)
            + _sgm_path_oracle(vol, 0, -1, p1, p2))
    check(got, want)

    got = np.transpose(
        np.asarray(stereo._axis_scan(vv, (0, 1, -1), p1, p2,
                                     entry="y", min_d=1), np.float32),
        (2, 0, 1))
    want = sum(_sgm_path_oracle(vol, dy, dx, p1, p2,
                                entry_min_d=(1 if dx > 0 else None))
               for dy, dx in [(1, 0), (-1, 0), (1, 1), (-1, 1),
                              (1, -1), (-1, -1)])
    check(got, want)


def test_sgm_rejects_constant_image():
    h, w = 40, 96
    flat = jnp.full((h, w), 80.0)
    scfg = stereo.StereoConfig(max_disparity=32, aggregation="sgm")
    disp = np.asarray(stereo.disparity(flat, flat, scfg))
    assert (disp > 0).mean() < 0.05


def test_pallas_sgm_matches_xla_axis_scan():
    """ops/pallas/sgm.axis_scan_pallas must equal the lax.scan twin
    exactly (interpret mode off-TPU), including through the masked-BIG
    wedge and at non-granule sizes."""
    from densesurfelmapping_tpu.ops.pallas import sgm as sgm_pallas

    rng = np.random.RandomState(7)
    for (H, W, D) in [(24, 40, 30), (17, 33, 7)]:
        vol = rng.randint(0, 25, size=(D, H, W)).astype(np.float32)
        wedge = np.arange(W)[None, None, :] < (np.arange(D) + 1)[:, None,
                                                                 None]
        vol = np.where(wedge, 1e4, vol)
        volj = jnp.asarray(vol, jnp.bfloat16)
        for v, rolls, entry in [
            (jnp.transpose(volj, (2, 1, 0)), (0,), None),
            (jnp.transpose(volj, (1, 2, 0)), (0, 1, -1), None),
            (jnp.transpose(volj, (2, 1, 0)), (0,), "x"),
            (jnp.transpose(volj, (1, 2, 0)), (0, 1, -1), "y"),
        ]:
            want = np.asarray(stereo._axis_scan(v, rolls, 1.0, 8.0,
                                                entry=entry, min_d=1),
                              np.float32)
            got = np.asarray(
                sgm_pallas.axis_scan_pallas(v, rolls, 1.0, 8.0,
                                            entry=entry, min_d=1),
                np.float32)
            np.testing.assert_array_equal(got, want,
                                          err_msg=f"{rolls} {entry}")


def test_pallas_sgm_disparity_matches_xla(stereo_pair):
    """Full SGM disparity: the Pallas aggregation backend reproduces the
    lax.scan backend's output bitwise."""
    cfg, left, true_depth, right = stereo_pair
    base = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3,
                               aggregation="sgm", cost="census",
                               sgm_paths=8)
    d_p = np.asarray(stereo.jitted_disparity(
        base._replace(sgm_pallas=True))(jnp.asarray(left),
                                        jnp.asarray(right)))
    d_x = np.asarray(stereo.jitted_disparity(
        base._replace(sgm_pallas=False))(jnp.asarray(left),
                                         jnp.asarray(right)))
    np.testing.assert_array_equal(d_p, d_x)


def test_disparity_gain_bias_invariance_census(stereo_pair):
    """Census cost => global gain/bias on BOTH images leaves the SGM
    disparity map unchanged."""
    cfg, left, true_depth, right = stereo_pair
    scfg = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3,
                               aggregation="sgm", cost="census",
                               sgm_paths=8, texture_threshold=0.0,
                               sgm_texture_floor=0.0)
    fn = stereo.jitted_disparity(scfg)
    a = np.asarray(fn(jnp.asarray(left), jnp.asarray(right)))
    b = np.asarray(fn(jnp.asarray(left * 1.4 + 9.0),
                      jnp.asarray(right * 1.4 + 9.0)))
    # the intensity-based gates (texture + degenerate floor) are disabled
    # above, so the only image-dependent pieces are census costs —
    # order-invariant
    np.testing.assert_array_equal(a, b)


def test_uniqueness_gate_monotone(stereo_pair):
    """The uniqueness gate only ever removes matches (tightening the
    ratio shrinks the valid set), never changes surviving values, and the
    survivors' accuracy does not degrade.  post_median=False and
    occlusion_fill=False: the gate's monotonicity is a RAW-map invariant —
    both post stages re-derive values from neighborhoods, so removing a
    match can legitimately change a filled neighbor downstream."""
    cfg, left, true_depth, right = stereo_pair
    base = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3,
                               aggregation="sgm", cost="census",
                               sgm_paths=8, post_median=False,
                               occlusion_fill=False)
    maps = {}
    for ratio in (0.0, 0.95, 0.5):
        maps[ratio] = np.asarray(stereo.jitted_disparity(
            base._replace(uniqueness_ratio=ratio))(
            jnp.asarray(left), jnp.asarray(right)))
    v0, v95, v50 = [(maps[r] > 0) for r in (0.0, 0.95, 0.5)]
    assert v50.sum() <= v95.sum() <= v0.sum()
    assert v50.sum() < v0.sum()           # a 0.5 ratio must bite
    # survivors keep their values
    for r in (0.95, 0.5):
        sel = maps[r] > 0
        np.testing.assert_array_equal(maps[r][sel], maps[0.0][sel])

    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6),
                         0.0)
    in_range = (true_disp >= 2.0) & (true_disp < 63.0)

    def med(d):
        sel = (d > 0) & in_range
        return np.median(np.abs(d[sel] - true_disp[sel]))
    assert med(maps[0.95]) <= med(maps[0.0]) + 0.02


def test_census_radius_bound():
    with pytest.raises(ValueError, match="radius"):
        stereo._census(jnp.zeros((8, 8)), 3)


def test_sgm_right_wta_bf16_shear_vs_f32_oracle(stereo_pair):
    """Pins the intentional bf16 shear in the right-image WTA (ADVICE r2).

    models/stereo.py casts the aggregated volume to bf16 for the gather-free
    right-WTA shear while the left WTA/argmin runs f32; near-tie disparities
    can resolve differently on the two sides and flip the LR gate.  This
    compares the production shear against an all-f32 take_along_axis oracle
    and pins the accepted LR-validity flip rate.
    """
    import jax

    cfg, left, _, right = stereo_pair
    scfg = stereo.StereoConfig(max_disparity=64, min_disparity=1, radius=3,
                               aggregation="sgm", cost="census")
    l, r = jnp.asarray(left), jnp.asarray(right)
    vol = stereo._cost_volume(l, r, scfg)
    agg = np.asarray(stereo._sgm_aggregate(
        vol, scfg.sgm_p1, scfg.sgm_p2, scfg.sgm_paths, False,
        min_d=scfg.min_disparity),
        np.float32)                           # (D, H, W); plane k <-> d=k+min
    D, h, w = agg.shape
    dL = np.argmin(agg, axis=0).astype(np.int32) + scfg.min_disparity

    # production bf16 shear (mirror of _disparity_sgm's right WTA)
    w2 = w + D + scfg.min_disparity + 1
    sh = jnp.pad(jnp.asarray(agg).astype(jnp.bfloat16),
                 ((0, 0), (0, 0), (0, w2 - w)), constant_values=np.inf)
    sh = jnp.moveaxis(sh, 0, 1).reshape(h, D * w2)
    sh = jnp.pad(sh, ((0, 0), (0, D)), constant_values=np.inf)
    volR = sh.reshape(h, D, w2 + 1)[:, :, scfg.min_disparity:
                                    scfg.min_disparity + w]
    bestR_bf16 = np.asarray(jnp.argmin(volR, axis=1),
                            np.int32) + scfg.min_disparity

    # f32 oracle: costR(y, x, k) = costL(y, x + k + min_d, k)
    volR_f32 = np.full((h, D, w), np.inf, np.float32)
    for k in range(D):
        shift = k + scfg.min_disparity
        if shift < w:
            volR_f32[:, k, :w - shift] = agg[k, :, shift:]
    bestR_f32 = volR_f32.argmin(axis=1).astype(np.int32) + scfg.min_disparity

    def lr_mask(bestR):
        xl = np.arange(w)[None, :] - dL
        dR_at = np.take_along_axis(bestR, np.clip(xl, 0, w - 1), axis=1)
        return (xl >= 0) & (np.abs(dR_at - dL) <= scfg.lr_threshold)

    m_bf16, m_f32 = lr_mask(bestR_bf16), lr_mask(bestR_f32)
    flip = (m_bf16 != m_f32).mean()
    assert flip < 0.02, f"LR-validity flip rate {flip:.4f} vs f32 oracle"
    # flips must be confined to near-ties: where the right-WTA winner
    # differs, the f32 cost gap between the two candidates is within the
    # bf16 quantization of the cost scale
    diff = bestR_bf16 != bestR_f32
    if diff.any():
        yy, xx = np.nonzero(diff)
        c_bf = volR_f32[yy, bestR_bf16[diff] - scfg.min_disparity, xx]
        c_f3 = volR_f32[yy, bestR_f32[diff] - scfg.min_disparity, xx]
        finite = np.isfinite(c_bf) & np.isfinite(c_f3)
        gap = np.abs(c_bf[finite] - c_f3[finite])
        rel = gap / np.maximum(np.maximum(c_bf[finite], c_f3[finite]), 1e-6)
        assert rel.max() < 1.0 / 64, f"non-tie flip: rel gap {rel.max()}"


def test_census_fused_matches_materialized(stereo_pair):
    """census_aggregate (cost computed in-kernel from census images) must
    reproduce the materialized-volume aggregation bitwise — same DP, same
    bf16-rounded mask constants, no cost volume in HBM."""
    cfg, left, _, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    from densesurfelmapping_tpu.ops.pallas.sgm import census_aggregate

    for paths, min_d in ((8, 1), (4, 1), (8, 3)):
        scfg = stereo.StereoConfig(max_disparity=64, min_disparity=min_d,
                                   aggregation="sgm", cost="census",
                                   sgm_paths=paths)
        vol = stereo._cost_volume(l, r, scfg)
        want = np.asarray(stereo._sgm_aggregate(
            vol, scfg.sgm_p1, scfg.sgm_p2, paths, True, min_d=min_d))
        v_rolls = (0,) if paths == 4 else (0, 1, -1)
        got = np.asarray(census_aggregate(
            stereo._census(l, scfg.census_radius),
            stereo._census(r, scfg.census_radius),
            v_rolls, scfg.sgm_p1, scfg.sgm_p2, min_d,
            scfg.max_disparity - min_d))
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"paths={paths} min_d={min_d}")


def test_fused_census_disparity_end_to_end(stereo_pair):
    """The sgm_fused_census pipeline flag produces the identical disparity
    map to the materialized-volume pipeline."""
    cfg, left, _, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    base = dict(max_disparity=64, min_disparity=1, radius=3,
                aggregation="sgm", cost="census", sgm_paths=8)
    d_fused = np.asarray(stereo.jitted_disparity(
        stereo.StereoConfig(sgm_fused_census=True, **base))(l, r))
    d_mat = np.asarray(stereo.jitted_disparity(
        stereo.StereoConfig(sgm_fused_census=False, **base))(l, r))
    np.testing.assert_array_equal(d_fused, d_mat)


def test_sgm_bf16_carries_cross_backend_and_accuracy(stereo_pair):
    """sgm_carry_bf16 mode: all three aggregation backends stay bitwise-
    equal to EACH OTHER (the clamp keeps every carry bf16-exact), and the
    resulting disparity map is accuracy-equivalent to f32 carries (they
    differ only in BIG transition bands the gates reject)."""
    cfg, left, true_depth, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    from densesurfelmapping_tpu.ops.pallas.sgm import census_aggregate

    base = dict(max_disparity=64, min_disparity=1, radius=3,
                aggregation="sgm", cost="census", sgm_paths=8)
    scfg = stereo.StereoConfig(sgm_carry_bf16=True, **base)
    cl = stereo._census(l, scfg.census_radius)
    cr = stereo._census(r, scfg.census_radius)
    vol = stereo._cost_volume(l, r, scfg)

    agg_scan = np.asarray(stereo._sgm_aggregate(
        vol, scfg.sgm_p1, scfg.sgm_p2, 8, use_pallas=False,
        carry_bf16=True, min_d=1))
    agg_pal = np.asarray(stereo._sgm_aggregate(
        vol, scfg.sgm_p1, scfg.sgm_p2, 8, use_pallas=True,
        carry_bf16=True, min_d=1))
    agg_fused = np.asarray(census_aggregate(
        cl, cr, (0, 1, -1), scfg.sgm_p1, scfg.sgm_p2, 1, 63,
        carry_bf16=True))
    np.testing.assert_array_equal(agg_pal, agg_scan)
    np.testing.assert_array_equal(agg_fused, agg_pal)

    # accuracy parity vs f32 carries on the real scene
    d_bf16 = np.asarray(stereo.jitted_disparity(scfg)(l, r))
    d_f32 = np.asarray(stereo.jitted_disparity(
        stereo.StereoConfig(sgm_carry_bf16=False, **base))(l, r))
    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6),
                         0.0)
    in_range = (true_disp >= 2.0) & (true_disp < 63.0)

    flip = ((d_bf16 > 0) != (d_f32 > 0)).mean()
    assert flip < 0.02, f"validity flip rate {flip}"

    def med(d):
        sel = (d > 0) & in_range
        return np.median(np.abs(d[sel] - true_disp[sel]))
    assert abs(med(d_bf16) - med(d_f32)) < 0.05, (med(d_bf16), med(d_f32))
    both = (d_bf16 > 0) & (d_f32 > 0)
    assert np.median(np.abs(d_bf16[both] - d_f32[both])) < 0.05


# ---------------------------------------------------------------------------
# post-filter (masked 3x3 median gate + hole fill)
# ---------------------------------------------------------------------------

def _median_oracle(disp, speckle_tol, fill_support, min_support=2):
    """NumPy transcription of stereo._median_postfilter semantics."""
    h, w = disp.shape
    out = np.zeros_like(disp)
    for y in range(h):
        for x in range(w):
            vals = []
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < h and 0 <= xx < w and disp[yy, xx] > 0:
                        vals.append(disp[yy, xx])
            n = len(vals)   # includes the center when it is valid
            med = sorted(vals)[(n - 1) // 2] if n else 0.0
            if disp[y, x] > 0:
                if abs(disp[y, x] - med) <= speckle_tol \
                        and n - 1 >= min_support:
                    out[y, x] = disp[y, x]
            elif n >= fill_support:
                out[y, x] = med
    return out


def test_median_postfilter_rejects_isolated_pixel():
    """A fully isolated valid pixel trivially equals its own median —
    the min_support gate must still remove it (ADVICE r3)."""
    disp = np.zeros((16, 16), np.float32)
    disp[8, 8] = 12.0               # zero valid neighbors
    disp[2, 2] = 7.0
    disp[2, 3] = 7.0                # exactly one valid neighbor each
    out = np.asarray(stereo._median_postfilter(jnp.asarray(disp), 2.0, 6))
    assert out[8, 8] == 0.0, "isolated speckle survived"
    assert out[2, 2] == 0.0 and out[2, 3] == 0.0, \
        "under-supported pair survived"
    # a 3x3 block has >= 3 valid neighbors everywhere: all kept
    disp2 = np.zeros((16, 16), np.float32)
    disp2[5:8, 5:8] = 9.0
    out2 = np.asarray(stereo._median_postfilter(jnp.asarray(disp2), 2.0, 9))
    np.testing.assert_array_equal(out2, disp2)


def test_sort9_network_sorts():
    rng = np.random.default_rng(0)
    v = rng.normal(size=(9, 64, 64)).astype(np.float32)
    planes = [jnp.asarray(v[i]) for i in range(9)]
    for a, b in stereo._SORT9:
        lo = jnp.minimum(planes[a], planes[b])
        planes[b] = jnp.maximum(planes[a], planes[b])
        planes[a] = lo
    got = np.stack([np.asarray(p) for p in planes])
    np.testing.assert_array_equal(got, np.sort(v, axis=0))


def test_median_postfilter_matches_oracle():
    rng = np.random.default_rng(1)
    disp = rng.uniform(1.0, 60.0, size=(40, 50)).astype(np.float32)
    disp[rng.uniform(size=disp.shape) < 0.35] = 0.0       # invalid holes
    # sprinkle speckles: isolated values far from their neighborhood
    ys, xs = rng.integers(1, 39, 20), rng.integers(1, 49, 20)
    disp[ys, xs] = np.where(disp[ys, xs] > 0, disp[ys, xs] + 25.0,
                            disp[ys, xs])
    got = np.asarray(stereo._median_postfilter(jnp.asarray(disp), 2.0, 6))
    want = _median_oracle(disp, 2.0, 6)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-6)


def test_median_postfilter_speckle_and_fill():
    # constant 10 px plane: one speckle pixel and one hole
    disp = np.full((16, 16), 10.0, np.float32)
    disp[8, 8] = 30.0                                     # speckle
    disp[4, 4] = 0.0                                      # hole
    out = np.asarray(stereo._median_postfilter(jnp.asarray(disp), 2.0, 6))
    assert out[8, 8] == 0.0, "speckle not rejected"
    assert out[4, 4] == 10.0, "hole not filled"
    keep = np.ones_like(disp, bool)
    keep[8, 8] = keep[4, 4] = False
    np.testing.assert_array_equal(out[keep], disp[keep])


def test_median_postfilter_in_pipeline(stereo_pair):
    """post_median=True must not hurt accuracy on the render pair and
    must strictly remove or fill at least some pixels; post_median=False
    reproduces the raw map."""
    cfg, left, true_depth, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    base = dict(max_disparity=64, min_disparity=1, radius=3,
                aggregation="sgm")
    d_raw = np.asarray(stereo.jitted_disparity(
        stereo.StereoConfig(post_median=False, **base))(l, r))
    d_fil = np.asarray(stereo.jitted_disparity(
        stereo.StereoConfig(post_median=True, fill_support=6,
                            post_median_passes=1, **base))(l, r))
    assert not np.array_equal(d_raw, d_fil)
    # filtered == oracle applied to raw
    np.testing.assert_allclose(
        d_fil, _median_oracle(d_raw, 2.0, 6), atol=1e-6)
    # the default config (round 4: fill_support=4, two passes) == the
    # oracle applied twice
    d_def = np.asarray(stereo.jitted_disparity(
        stereo.StereoConfig(post_median=True, **base))(l, r))
    np.testing.assert_allclose(
        d_def, _median_oracle(_median_oracle(d_raw, 2.0, 4), 2.0, 4),
        atol=1e-6)

    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6),
                         0.0)
    in_range = (true_disp >= 2.0) & (true_disp < 63.0)

    def stats(d):
        sel = (d > 0) & in_range
        return sel.mean(), np.median(np.abs(d[sel] - true_disp[sel]))
    cov_raw, med_raw = stats(d_raw)
    cov_fil, med_fil = stats(d_fil)
    assert cov_fil >= cov_raw - 0.01, (cov_raw, cov_fil)
    assert med_fil <= med_raw + 0.02, (med_raw, med_fil)


@pytest.mark.parametrize("paths,subpixel,uniq,min_d,chunk", [
    (8, True, 0.95, 1, 16),
    (8, True, 0.95, 1, 5),      # chunk not dividing D' (pad planes)
    (8, False, 0.0, 4, 16),     # no subpixel, no uniqueness, min_d > 1
    (4, True, 0.0, 1, 16),
    (4, False, 0.95, 2, 16),
])
def test_wta_streaming_matches_reductions(stereo_pair, paths, subpixel,
                                          uniq, min_d, chunk):
    """The chunked streaming WTA (one volume pass; wta_streaming default)
    equals the full-reduction WTA BITWISE across subpixel/uniqueness/
    min_disparity/chunk-padding combinations — including cm/cp via the
    box-path streaming trick, `second` via the prefix/suffix-min
    decomposition, and the bf16 sheared right WTA."""
    _, li, _, ri = stereo_pair
    l, r = jnp.asarray(li), jnp.asarray(ri)
    base = dict(max_disparity=48, min_disparity=min_d, aggregation="sgm",
                cost="census", sgm_paths=paths, sgm_pallas=False,
                post_median=False, subpixel=subpixel,
                uniqueness_ratio=uniq)
    want = stereo.jitted_disparity(
        stereo.StereoConfig(wta_streaming=False, **base))(l, r)
    got = stereo.jitted_disparity(
        stereo.StereoConfig(wta_streaming=True, wta_chunk=chunk,
                            **base))(l, r)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    assert (np.asarray(want) > 0).mean() > 0.3


def test_scanline_fill_background_min():
    """An interior invalid run bounded both sides takes the MIN of its
    anchors (background disparity — the occluded surface); valid pixels
    and runs missing an anchor are untouched."""
    d = np.zeros((2, 10), np.float32)
    d[0, 2] = 5.0
    d[0, 7] = 9.0          # gap of 4 invalid pixels between anchors
    d[1, 4] = 3.0          # no right anchor on row 1
    out = np.asarray(stereo._scanline_fill(jnp.asarray(d), max_gap=8))
    assert out[0, 2] == 5.0 and out[0, 7] == 9.0
    np.testing.assert_array_equal(out[0, 3:7], 5.0)   # min(5, 9)
    assert (out[0, :2] == 0).all()                    # no left anchor
    assert (out[0, 8:] == 0).all()                    # no right anchor
    assert out[1, 4] == 3.0 and (np.delete(out[1], 4) == 0).all()


def test_scanline_fill_gap_cap():
    """Runs longer than max_gap are NOT bridged; runs at the cap are."""
    d = np.zeros((1, 12), np.float32)
    d[0, 1] = 4.0
    d[0, 6] = 6.0          # run of 4
    out = np.asarray(stereo._scanline_fill(jnp.asarray(d), max_gap=3))
    np.testing.assert_array_equal(out, d)             # 4 > 3: untouched
    out = np.asarray(stereo._scanline_fill(jnp.asarray(d), max_gap=4))
    np.testing.assert_array_equal(out[0, 2:6], 4.0)


def test_scanline_fill_rows_independent():
    """Anchors never leak across rows."""
    d = np.zeros((3, 8), np.float32)
    d[0, 0] = 2.0
    d[0, 7] = 3.0
    d[2, 0] = 7.0
    d[2, 7] = 7.5
    out = np.asarray(stereo._scanline_fill(jnp.asarray(d), max_gap=8))
    np.testing.assert_array_equal(out[0], [2, 2, 2, 2, 2, 2, 2, 3])
    np.testing.assert_array_equal(out[1], 0.0)
    np.testing.assert_array_equal(out[2], [7, 7, 7, 7, 7, 7, 7, 7.5])


def test_occlusion_fill_improves_coverage(stereo_pair):
    """On the rendered pair the fill lifts SGM coverage without degrading
    the error statistics beyond a small tolerance (the map-level A/B is
    the BASELINE radius-15 twin row)."""
    cfg, left, true_depth, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    base = dict(max_disparity=48, aggregation="sgm", cost="census",
                sgm_pallas=False, post_median=False)
    off = np.asarray(stereo.jitted_disparity(stereo.StereoConfig(
        occlusion_fill=False, **base))(l, r))
    on = np.asarray(stereo.jitted_disparity(stereo.StereoConfig(
        occlusion_fill=True, **base))(l, r))
    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6),
                         0.0)
    in_range = (true_disp >= 2.0) & (true_disp < 47.0)

    def stats(d):
        sel = (d > 0) & in_range
        err = np.abs(d[sel] - true_disp[sel])
        return sel.mean(), np.median(err)

    cov_off, med_off = stats(off)
    cov_on, med_on = stats(on)
    # fill only ever adds pixels, never removes or changes valid ones
    assert ((on > 0) & (off > 0)).sum() == (off > 0).sum()
    np.testing.assert_array_equal(on[off > 0], off[off > 0])
    assert cov_on > cov_off
    assert med_on <= med_off + 0.1, (med_off, med_on)


def test_hierarchical_sgm(stereo_pair):
    """Coarse-to-fine SGM (cfg.hierarchical): valid pixels stay within
    hier_band + 0.5 px of the coarse solve's doubled winner, accuracy is
    comparable to the full-resolution solve, and the mode composes with
    the post chain (fill + median) without error."""
    cfg, left, true_depth, right = stereo_pair
    l, r = jnp.asarray(left), jnp.asarray(right)
    base = dict(max_disparity=48, aggregation="sgm", cost="census",
                sgm_pallas=False, post_median=False, occlusion_fill=False)
    full = np.asarray(stereo.jitted_disparity(stereo.StereoConfig(
        **base))(l, r))
    hier = np.asarray(stereo.jitted_disparity(stereo.StereoConfig(
        hierarchical=True, **base))(l, r))

    true_disp = np.where(true_depth > 0,
                         CAM.fx * BASELINE / np.maximum(true_depth, 1e-6),
                         0.0)
    in_range = (true_disp >= 2.0) & (true_disp < 47.0)

    def med(d):
        sel = (d > 0) & in_range
        assert sel.mean() > 0.25, sel.mean()
        return np.median(np.abs(d[sel] - true_disp[sel]))

    # half the work, comparable accuracy (generous factor: the coarse
    # solve quantizes structure at 2 px)
    assert med(hier) <= 2.5 * med(full) + 0.25, (med(full), med(hier))

    # the full post chain runs without shape errors and keeps validity
    posted = np.asarray(stereo.jitted_disparity(stereo.StereoConfig(
        max_disparity=48, aggregation="sgm", cost="census",
        sgm_pallas=False, hierarchical=True))(l, r))
    assert (posted > 0).mean() >= (hier > 0).mean() * 0.9


def test_hierarchical_band_respected(stereo_pair):
    """Every valid hierarchical disparity lies within hier_band + 0.5 px
    of SOME value in [min_disparity, max_disparity) — i.e. the refine
    never leaves the legal range (the band clamp gates it)."""
    cfg, left, _, right = stereo_pair
    scfg = stereo.StereoConfig(max_disparity=48, min_disparity=2,
                               aggregation="sgm", cost="census",
                               sgm_pallas=False, hierarchical=True,
                               post_median=False, occlusion_fill=False)
    d = np.asarray(stereo.jitted_disparity(scfg)(
        jnp.asarray(left), jnp.asarray(right)))
    sel = d > 0
    assert sel.any()
    assert (d[sel] >= scfg.min_disparity).all()
    assert (d[sel] < scfg.max_disparity).all()

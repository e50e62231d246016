"""Dirty-data stress: the DirtModel defects and the moving-object scene
(VERDICT r3 item 5).

The clean synthetic scenes are benign; real depth is dirty — the
reference's drive-profile constants (`fusion_functions.h:13-16`,
DISPARITY_ERROR 4.0 / MIN_TOLERATE_DIFF 0.1) exist to survive it.  These
tests pin (a) the defect injection itself (deterministic, correct rates),
(b) the moving-box renderer, and (c) the thing that matters: a mapping run
fed DIRTY frames converges to the CLEAN static world — the fusion
outlier/staleness gates (`ops/fusion.py`, mirroring
`fusion_functions.cpp:207-211`) reject the injected defects instead of
baking them into the map.
"""

import numpy as np
import pytest

from densesurfelmapping_tpu.eval import fidelity
from densesurfelmapping_tpu.io import stressfeed, synthetic
from densesurfelmapping_tpu.pipeline.device_driver import DeviceResidentMapping

from test_driver import tiny_config

BF = 60.0 * 0.54  # tiny_config fx * KITTI baseline


def test_dirt_deterministic():
    cfg = tiny_config()
    scene = stressfeed.stress_scene(6.0, seed=1)
    pose = stressfeed.circuit_trajectory(10, 6.0)[3]
    img, dep = scene.render(cfg, pose)
    d = synthetic.DirtModel()
    a = synthetic.apply_dirt(img, dep, 5, d, BF)
    b = synthetic.apply_dirt(img, dep, 5, d, BF)
    np.testing.assert_array_equal(a[0], b[0])
    np.testing.assert_array_equal(a[1], b[1])
    c = synthetic.apply_dirt(img, dep, 6, d, BF)
    assert not np.array_equal(a[0], c[0])


def test_dirt_injection_rates():
    cfg = tiny_config()
    scene = stressfeed.stress_scene(6.0, seed=1)
    pose = stressfeed.circuit_trajectory(10, 6.0)[0]
    img, dep = scene.render(cfg, pose)
    d = synthetic.DirtModel(outlier_burst_every=7, dropout_rate=0.02)

    # frame 7: burst frame — blobs of grossly scaled depth appear
    _, dep7 = synthetic.apply_dirt(img, dep, 7, d, BF)
    v = (dep > 0) & (dep7 > 0)
    rel = np.abs(dep7[v] - dep[v]) / dep[v]
    assert (rel > 0.2).sum() > 50          # gross outliers present
    # dropout ~2%
    dropped = ((dep > 0) & (dep7 == 0)).sum() / max((dep > 0).sum(), 1)
    assert 0.005 < dropped < 0.06

    # frame 8: no burst — only disparity-domain noise (grows with depth)
    _, dep8 = synthetic.apply_dirt(img, dep, 8, d, BF)
    v = (dep > 0) & (dep8 > 0)
    err = np.abs(dep8[v] - dep[v])
    near, far = dep[v] < 5.0, dep[v] > 15.0
    assert near.any() and far.any()
    assert err[far].mean() > 3.0 * err[near].mean()
    assert (np.abs(dep8[v] - dep[v]) / dep[v] > 0.5).mean() < 0.01

    # right image gets a different gain than the left
    l5, _ = synthetic.apply_dirt(img, None, 5, d, BF)
    r5, rd = synthetic.apply_dirt(img, None, 5, d, BF, right=True)
    assert rd is None
    assert not np.array_equal(l5, r5)


def test_moving_box_render():
    cfg = tiny_config()
    n = 60
    scene = stressfeed.stress_scene(6.0, seed=1, n_frames=n, moving=True)
    assert scene.movers
    poses = stressfeed.circuit_trajectory(n, 6.0)
    # as the camera circles and the box crosses, SOME frames must see it:
    # their render differs from the static world at the same pose
    seen = sum(
        not np.array_equal(
            scene.render(cfg, poses[i], time=float(i))[1],
            scene.render(cfg, poses[i], time=float(i),
                         include_movers=False)[1])
        for i in range(0, n, 3))
    assert seen >= 3, seen


@pytest.fixture(scope="module")
def twins():
    """Clean vs dirty mapping twins over the same circuit; both evaluated
    against the CLEAN static world."""
    n, kf = 120, 2
    cfg = tiny_config(surfel_capacity=1 << 15, drift_free_poses=3,
                      compact_interval=16, stats_interval=4,
                      max_keyframes=128)
    seq = stressfeed.make_seq00_like(
        n_frames=n, keyframe_every=kf, radius=6.0, drift_yaw=1.5e-3,
        drift_trans=3e-3, revisit_radius=1.5, moving_box=True)
    # the DirtModel defaults are calibrated for KITTI-size frames: sigma
    # 0.5 px at bf ~382 is ~3% depth error at 25 m, and 10 r=8 blobs are
    # 0.6% of the image.  This camera has bf = 32.4 and 64x48 px, so the
    # equivalent-severity model is sigma ~0.05 and 2 r=4 blobs (~5%)
    dirt = synthetic.DirtModel(disparity_sigma=0.05, outlier_blobs=2,
                               outlier_blob_radius=4)

    clean, dirty = DeviceResidentMapping(cfg), DeviceResidentMapping(cfg)
    truth = []
    for i, m in enumerate(seq.feed.messages):
        img, dep = seq.scene.render(cfg, seq.gt_poses[i], time=float(i))
        fimg, fdep = synthetic.apply_dirt(img, dep, i, dirt, BF)
        for mapping, im, de in ((clean, img, dep), (dirty, fimg, fdep)):
            mapping.feed_pose(m.stamp, m.pose, loop_path=m.loop_path,
                              loop_edges=m.loop_edges,
                              is_keyframe=m.is_keyframe,
                              reference_index=m.reference_index)
            mapping.feed_image(m.stamp, im)
            mapping.feed_depth(m.stamp, de)
        if i % 20 == 0:
            truth.append((seq.scene.render(cfg, seq.gt_poses[i],
                                           include_movers=False),
                          seq.gt_poses[i]))
    return clean, dirty, truth, seq, cfg


def test_dirty_map_converges_to_static_world(twins):
    clean, dirty, truth, seq, cfg = twins
    frames = [f for f, _ in truth]
    poses = [p for _, p in truth]
    ec = fidelity.evaluate_map(clean, frames, poses)
    ed = fidelity.evaluate_map(dirty, frames, poses)
    # the gates must hold the dirty map close to the clean twin: the
    # injected outliers/noise may not wreck accuracy or coverage.  Median
    # (not mean) error is the gate: BOTH twins see the moving box, and its
    # not-yet-stale residue near the run's end puts the same heavy tail on
    # both means (the early-ghost reclamation is pinned separately below)
    assert ed["median"] <= max(2.5 * ec["median"], 0.08), (ec, ed)
    assert ed["coverage"] >= 0.5 * ec["coverage"], (ec, ed)
    # and the clean twin itself is a real map (the 64x48 camera on the
    # radius-6 circuit maps sparsely; the KITTI-size twin rows live in
    # BASELINE.md)
    assert ec["coverage"] > 0.1 and ec["median"] < 0.1, ec


def test_transient_object_rejected(twins):
    """Surfels fused on the moving box while it sat in early frames must
    be reclaimed by the staleness/occlusion kills after it moves on —
    the map should NOT retain a ghost at the box's early positions."""
    _, dirty, _, seq, cfg = twins
    mover = seq.scene.movers[0]
    pos = dirty.map_surfels()["position"]
    ghosts = 0
    for t in range(0, 30, 6):            # early positions, long since left
        b = mover.at(float(t))
        inside = np.all((pos >= b.lo - 0.05) & (pos <= b.hi + 0.05), axis=1)
        # exclude the ground plane the box sits on (y near ground_y)
        inside &= pos[:, 1] < seq.scene.ground_y - 0.1
        ghosts += int(inside.sum())
    # a handful of stragglers is acceptable; a persistent ghost object
    # (hundreds of surfels) is not
    assert ghosts < 40, ghosts

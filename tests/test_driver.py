"""Integration tests of the host driver: sync, keyframe lifecycle,
active/inactive migration, loop-closure warping, checkpoint/resume.

Uses a tiny camera + synthetic planar scene so the whole pipeline runs in
seconds on the CPU backend.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
from densesurfelmapping_tpu.pipeline.driver import SurfelMapping
from densesurfelmapping_tpu.pipeline.pose_graph import PoseGraph


def tiny_config(**kw):
    cam = CameraIntrinsics(width=64, height=48, fx=60.0, fy=60.0,
                           cx=31.5, cy=23.5)
    kw.setdefault("surfel_capacity", 16384)
    kw.setdefault("migration_buffer", 4096)
    kw.setdefault("lane_align", 8)
    kw.setdefault("drift_free_poses", 3)
    return SurfelMapConfig(camera=cam, **kw)


def render_plane(cfg, pose, z_plane=4.0, noise=0.0, seed=0):
    """Depth of the world plane z = z_plane seen from pose (camera +z)."""
    rng = np.random.default_rng(seed)
    h, w = cfg.height, cfg.width
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    img = np.floor(128 + 80 * np.sin(xx / 5.0) * np.sin(yy / 4.0)).clip(0, 255)
    # ray through pixel in world coords
    inv = np.linalg.inv(pose)
    cam_z = pose[2, 3]
    rz = pose[2, 2]  # assume rotation approx identity for these tests
    depth = (z_plane - cam_z) / max(rz, 1e-6) * np.ones((h, w))
    if noise:
        depth = depth + rng.normal(0, noise, (h, w))
    return img.astype(np.float32), depth.astype(np.float32)


def feed_frame(mapper, stamp, pose, img, dep, is_keyframe, ref=None,
               loop_path=None, loop_edges=()):
    mapper.feed_image(stamp, img)
    mapper.feed_depth(stamp, dep)
    mapper.feed_pose(stamp, pose, loop_path=loop_path, loop_edges=loop_edges,
                     is_keyframe=is_keyframe, reference_index=ref)


def test_sync_requires_all_three():
    cfg = tiny_config()
    m = SurfelMapping(cfg)
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    m.feed_image(0.0, img)
    assert m.frames_fused == 0
    m.feed_depth(0.0, dep)
    assert m.frames_fused == 0
    m.feed_pose(0.0, pose, is_keyframe=True)
    assert m.frames_fused == 1
    assert int(m.bank.count) > 0


def test_keyframe_window_migration():
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    # chain of keyframes moving sideways; window radius 2 (BFS depth<2 => root
    # + direct neighbors). Old keyframes must migrate to the inactive pool.
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    assert m.frames_fused == 5
    # with radius 2 only {4, 3} stay local
    assert m.local_indices == {3, 4}
    assert m.pool.num_poses >= 1
    assert len(m.pool) > 0
    # conservation: every surfel is exactly one of active/inactive
    total = int(m.bank.count) + len(m.pool)
    assert total > 0


def test_loop_revisit_reactivates():
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    pooled_before = set(m.pool.slabs)
    assert 0 in pooled_before
    # now a loop edge connects newest keyframe to keyframe 0: keyframe 0
    # re-enters the BFS window and its surfels must come back
    pose = np.eye(4)
    pose[0, 3] = 0.0
    img, dep = render_plane(cfg, pose)
    feed_frame(m, 5.0, pose, img, dep, is_keyframe=True,
               loop_edges=[(5, 0)])
    assert 0 in m.local_indices
    assert 0 not in m.pool.slabs


def test_loop_closure_warps_map():
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    slabs_before = {k: v["position"].copy() for k, v in m.pool.slabs.items()}
    act_before = np.asarray(m.bank.position[:int(m.bank.count)]).copy()

    # pose-graph update shifts every keyframe by +1 in y
    shift = np.eye(4)
    shift[1, 3] = 1.0
    loop_path = [shift @ kf.cam_pose for kf in m.graph.keyframes]
    pose = np.eye(4)
    pose[0, 3] = 0.4 * 5
    pose = shift @ pose
    img, dep = render_plane(cfg, np.eye(4))
    feed_frame(m, 5.0, pose, img, dep, is_keyframe=True,
               loop_path=loop_path)

    # pre-existing inactive slabs must be shifted by the pose correction
    # (frame 5's own fuse may migrate additional poses afterwards)
    for k, before in slabs_before.items():
        after = m.pool.slabs[k]["position"]
        np.testing.assert_allclose(after[:, 1], before[:, 1] + 1.0, atol=1e-4)
    # active surfels warped by the first local pose's correction (same shift)
    n0 = act_before.shape[0]
    act_after = np.asarray(m.bank.position)
    # find the warped originals among current bank rows: compare y-median
    assert np.median(act_after[:n0, 1]) == pytest.approx(
        np.median(act_before[:, 1]) + 1.0, abs=0.3)
    # pose graph committed
    for kf in m.graph.keyframes[:-1]:
        np.testing.assert_allclose(kf.cam_pose, kf.loop_pose)


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    path = str(tmp_path / "ckpt.npz")
    m.save_checkpoint(path)

    m2 = SurfelMapping(cfg)
    m2.load_checkpoint(path)
    assert int(m2.bank.count) == int(m.bank.count)
    assert m2.local_indices == m.local_indices
    assert set(m2.pool.slabs) == set(m.pool.slabs)
    np.testing.assert_allclose(
        np.asarray(m2.bank.position[:int(m2.bank.count)]),
        np.asarray(m.bank.position[:int(m.bank.count)]))
    assert len(m2.graph) == len(m.graph)
    assert m2.graph.keyframes[2].linked == m.graph.keyframes[2].linked

    # resumed mapper keeps working
    pose = np.eye(4)
    pose[0, 3] = 0.4 * 5
    img, dep = render_plane(cfg, pose)
    feed_frame(m2, 5.0, pose, img, dep, is_keyframe=True)
    assert m2.frames_fused == m.frames_fused + 1


def test_bfs_window():
    g = PoseGraph()
    for i in range(6):
        g.add_keyframe(np.eye(4), float(i),
                       reference_index=i - 1 if i else None)
    # chain 0-1-2-3-4-5 ; radius 3 from root 5 => {5,4,3}
    assert set(g.driftfree_window(5, 3)) == {5, 4, 3}
    g.add_loop_edges([(5, 0)])
    assert set(g.driftfree_window(5, 3)) == {5, 4, 3, 0, 1}
    add, rem = g.add_remove_sets(5, 3, {3, 4, 5, 2})
    assert set(add) == {0, 1} and rem == [2]


def test_unmatched_timestamps_stall_then_recover():
    cfg = tiny_config()
    m = SurfelMapping(cfg)
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    # pose arrives with no matching image/depth: nothing fuses
    m.feed_pose(1.0, pose, is_keyframe=True)
    assert m.frames_fused == 0
    # stale frames (older stamps) must be dropped, exact match fuses
    m.feed_image(0.5, img)
    m.feed_depth(0.5, dep)
    assert m.frames_fused == 0
    m.feed_image(1.0, img)
    m.feed_depth(1.0, dep)
    assert m.frames_fused == 1


def test_compact_frame_path_matches_f32():
    """fuse_frame_compact (u8+f16 upload, on-device decode) == fuse_frame
    for integral intensities, up to f16 depth quantization."""
    import jax.numpy as jnp
    import numpy as np
    import densesurfelmapping_tpu as dsm
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.core.state import (SurfelBank, FrameInput,
                                                   pad_frame, compact_frame)
    from densesurfelmapping_tpu.pipeline import fuse_step
    from densesurfelmapping_tpu.io import synthetic

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=4096)
    scene = synthetic.default_scene()
    img, dep = scene.render(cfg, np.eye(4))
    dep = np.asarray(dep, np.float16).astype(np.float32)  # pre-quantize

    pi, pd = pad_frame(cfg, img, dep)
    bank_a, stats_a = fuse_step.jitted_fuse_frame(cfg)(
        SurfelBank.empty(cfg.surfel_capacity),
        FrameInput(image=jnp.asarray(pi), depth=jnp.asarray(pd),
                   pose=jnp.eye(4, dtype=jnp.float32),
                   frame_index=jnp.int32(0)))

    ci, cd = compact_frame(cfg, img, dep)
    bank_b, stats_b = fuse_step.jitted_fuse_frame_compact(cfg)(
        SurfelBank.empty(cfg.surfel_capacity),
        jnp.asarray(ci), jnp.asarray(cd),
        jnp.eye(4, dtype=jnp.float32), jnp.int32(0))

    assert int(stats_a["n_new"]) == int(stats_b["n_new"])
    n = int(bank_a.count)
    assert int(bank_b.count) == n
    np.testing.assert_allclose(np.asarray(bank_a.position[:n]),
                               np.asarray(bank_b.position[:n]),
                               rtol=1e-6, atol=1e-6)


def test_fuse_frames_scan_matches_sequential():
    """Batch scan mode == N sequential compact fuse calls."""
    import jax.numpy as jnp
    import numpy as np
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.core.state import SurfelBank, compact_frame
    from densesurfelmapping_tpu.pipeline import fuse_step
    from densesurfelmapping_tpu.io import synthetic

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=8192)
    scene = synthetic.default_scene()
    poses = synthetic.forward_trajectory(4, step=0.3)
    cis, cds, ps = [], [], []
    for pose in poses:
        img, dep = scene.render(cfg, pose)
        ci, cd = compact_frame(cfg, img, dep)
        cis.append(ci), cds.append(cd), ps.append(pose.astype(np.float32))

    seq_bank = SurfelBank.empty(cfg.surfel_capacity)
    step = fuse_step.jitted_fuse_frame_compact(cfg)
    for i in range(4):
        seq_bank, _ = step(seq_bank, jnp.asarray(cis[i]), jnp.asarray(cds[i]),
                           jnp.asarray(ps[i]), jnp.int32(i))

    scan_bank, stats = fuse_step.jitted_fuse_frames_scan(cfg)(
        SurfelBank.empty(cfg.surfel_capacity),
        jnp.asarray(np.stack(cis)), jnp.asarray(np.stack(cds)),
        jnp.asarray(np.stack(ps)), jnp.arange(4, dtype=jnp.int32))

    assert int(scan_bank.count) == int(seq_bank.count)
    n = int(seq_bank.count)
    np.testing.assert_allclose(np.asarray(seq_bank.position[:n]),
                               np.asarray(scan_bank.position[:n]),
                               rtol=1e-6, atol=1e-6)
    assert stats["n_new"].shape == (4,)

    # the looped-replay bench program (one lap) == the batch scan BITWISE:
    # its dynamic_slice frame fetch + modulo indexing must not change the
    # math (bench.py's loop_fps rides this)
    loop_bank, counts = fuse_step.jitted_fuse_frames_looped(cfg, 1)(
        SurfelBank.empty(cfg.surfel_capacity),
        jnp.asarray(np.stack(cis)), jnp.asarray(np.stack(cds)),
        jnp.asarray(np.stack(ps)))
    assert int(loop_bank.count) == n
    np.testing.assert_array_equal(np.asarray(loop_bank.position[:n]),
                                  np.asarray(scan_bank.position[:n]))
    assert counts.shape == (4,)
    assert int(counts[-1]) == n

    # two laps: the map keeps evolving (counts monotone, final >= one lap —
    # re-fused frames fuse into existing surfels instead of duplicating)
    loop2_bank, counts2 = fuse_step.jitted_fuse_frames_looped(cfg, 2)(
        SurfelBank.empty(cfg.surfel_capacity),
        jnp.asarray(np.stack(cis)), jnp.asarray(np.stack(cds)),
        jnp.asarray(np.stack(ps)))
    c2 = np.asarray(counts2)
    assert c2.shape == (8,)
    assert (np.diff(c2) >= 0).all()
    assert int(loop2_bank.count) >= n


def test_native_bfs_matches_python():
    """The C++ BFS and the Python BFS walk identical windows."""
    import numpy as np
    from densesurfelmapping_tpu.pipeline.pose_graph import PoseGraph
    from densesurfelmapping_tpu.native import loader as native

    if not native.available():
        import pytest
        pytest.skip("native library unavailable")

    rng = np.random.default_rng(3)
    g = PoseGraph()
    for i in range(600):
        g.add_keyframe(np.eye(4), float(i),
                       reference_index=i - 1 if i else None)
    # random extra loop edges
    edges = rng.integers(0, 600, size=(120, 2))
    g.add_loop_edges([tuple(e) for e in edges if e[0] != e[1]])

    for root in (0, 37, 599):
        for radius in (1, 3, 10):
            nat = g._native_bfs(root, radius)
            # python walk (bypass the size dispatch by inlining small logic)
            seen = [root]
            seen_set = {root}
            level = [root]
            for _ in range(1, radius):
                nxt = []
                for node in level:
                    for nb in g.keyframes[node].linked:
                        if nb not in seen_set:
                            seen_set.add(nb)
                            seen.append(nb)
                            nxt.append(nb)
                level = nxt
            assert nat == seen, (root, radius)


def test_topic_parity_readouts():
    """raw_pointcloud / fusion_path / driftfree_path / loop_edges match the
    reference's published topic contents."""
    import numpy as np
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(4):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)

    raw = m.raw_pointcloud(dep, pose, img)
    n_valid = (dep > 0.01).sum()
    assert raw["position"].shape == (n_valid, 3)
    assert raw["color"].shape == (n_valid,)
    # plane at z=4 viewed from x=1.2: world z must be ~4
    np.testing.assert_allclose(raw["position"][:, 2], 4.0, atol=1e-3)

    assert len(m.fusion_path()) == 4
    np.testing.assert_allclose([p[0, 3] for p in m.driftfree_path()],
                               [0.8, 1.2])
    assert all(a < b for a, b in m.loop_edges())


def test_input_validation_and_drop_accounting():
    import numpy as np
    import pytest as _pytest
    cfg = tiny_config()
    m = SurfelMapping(cfg)
    with _pytest.raises(ValueError):
        m.feed_image(0.0, np.zeros((10, 10), np.float32))
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    # non-finite depth is sanitized, not fused as garbage
    bad = dep.copy()
    bad[0, 0] = np.nan
    bad[1, 1] = np.inf
    m.feed_pose(0.0, pose, is_keyframe=True)
    m.feed_image(0.0, img)
    m.feed_depth(0.0, bad)
    assert m.frames_fused == 1
    assert m.dropped["nonfinite_depth_px"] == 2  # counts pixels, not frames
    assert not np.isnan(np.asarray(m.bank.position)).any()
    # stale image (stamp older than next pose) is dropped and counted
    m.feed_image(0.5, img)
    m.feed_pose(1.0, pose, is_keyframe=False)
    m.feed_image(1.0, img)
    m.feed_depth(1.0, dep)
    assert m.frames_fused == 2
    assert m.dropped["images"] == 1
    metr = m.metrics()
    assert metr["frames_fused"] == 2 and metr["dropped_images"] == 1
    assert metr["active_count"] > 0


def test_rgbd_profile_end_to_end():
    """The RGBD preset (tight noise profile, short range) maps a near-range
    scene end to end."""
    import numpy as np
    from densesurfelmapping_tpu.config import rgbd_config, CameraIntrinsics
    from densesurfelmapping_tpu.io import synthetic

    cam = CameraIntrinsics(width=64, height=48, fx=70.0, fy=70.0,
                           cx=31.5, cy=23.5)
    cfg = rgbd_config(camera=cam, surfel_capacity=16384, lane_align=8,
                      drift_free_poses=3)
    assert cfg.profile.huber_range == 0.05 and cfg.fuse_far == 5.0
    scene = synthetic.Scene(ground_y=1.0, wall_z=2.5, boxes=[],
                            max_depth=4.5)
    m = SurfelMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.05 * i
        img, dep = scene.render(cfg, pose)
        m.feed_pose(float(i), pose, is_keyframe=True)
        m.feed_image(float(i), img)
        m.feed_depth(float(i), dep)
    assert m.frames_fused == 5
    n = int(m.bank.count)
    assert n > 0
    pos = np.asarray(m.bank.position[:n])
    assert np.isfinite(pos).all()
    # wall surfels sit at z ~ 2.5 within the tight RGBD noise profile
    ut = np.asarray(m.bank.update_times[:n])
    nrm = np.asarray(m.bank.normal[:n])
    wall = (ut >= 3) & (np.abs(nrm[:, 2]) > 0.9)
    assert wall.sum() > 10
    assert np.abs(pos[wall, 2] - 2.5).mean() < 0.01


def test_loop_closure_rotation_warp():
    """A rotational pose-graph correction must rotate BOTH surfel positions
    and normals consistently (active bank and inactive pool)."""
    import numpy as np
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)

    # 90-degree yaw + translation applied to every keyframe.  (The shift
    # matters: like the reference, pose-change detection compares
    # translations only — surfel_map.cpp:236-253 — so a pure rotation of a
    # keyframe sitting at the origin would be classed as unmoved.)
    c, s = 0.0, 1.0
    R = np.array([[c, 0, s, 0.3], [0, 1, 0, -0.2], [-s, 0, c, 0.5],
                  [0, 0, 0, 1]])
    slabs_before = {k: (v["position"].copy(), v["normal"].copy())
                    for k, v in m.pool.slabs.items()}
    n0 = int(m.bank.count)
    act_pos = np.asarray(m.bank.position[:n0]).copy()
    act_nrm = np.asarray(m.bank.normal[:n0]).copy()

    loop_path = [R @ kf.cam_pose for kf in m.graph.keyframes]
    pose = R @ np.eye(4)
    # pose-only feed: triggers the warp without a subsequent fusion pass
    m.feed_pose(5.0, pose, is_keyframe=True, loop_path=loop_path)

    for k, (pb, nb) in slabs_before.items():
        pa = m.pool.slabs[k]["position"]
        na = m.pool.slabs[k]["normal"]
        np.testing.assert_allclose(pa, pb @ R[:3, :3].T + R[:3, 3],
                                   atol=1e-4)
        np.testing.assert_allclose(na, nb @ R[:3, :3].T, atol=1e-4)
    # active surfels rotated by the first local pose's warp (same R here)
    bank_pos = np.asarray(m.bank.position)
    bank_nrm = np.asarray(m.bank.normal)
    np.testing.assert_allclose(bank_pos[:n0], act_pos @ R[:3, :3].T
                               + R[:3, 3], atol=1e-3)
    np.testing.assert_allclose(bank_nrm[:n0], act_nrm @ R[:3, :3].T,
                               atol=1e-3)
    # normals stay unit length
    ln = np.linalg.norm(bank_nrm[:n0], axis=1)
    live = np.asarray(m.bank.update_times[:n0]) > 0
    np.testing.assert_allclose(ln[live], 1.0, atol=1e-3)


def test_packed_frame_path_matches_compact():
    """Single-buffer packed upload == compact two-buffer path bitwise."""
    import jax.numpy as jnp
    import numpy as np
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.core.state import (SurfelBank, compact_frame,
                                                   pack_frame)
    from densesurfelmapping_tpu.pipeline import fuse_step
    from densesurfelmapping_tpu.io import synthetic

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=4096)
    scene = synthetic.default_scene()
    img, dep = scene.render(cfg, np.eye(4))

    ci, cd = compact_frame(cfg, img, dep)
    a, _ = fuse_step.jitted_fuse_frame_compact(cfg)(
        SurfelBank.empty(cfg.surfel_capacity), jnp.asarray(ci),
        jnp.asarray(cd), jnp.eye(4, dtype=jnp.float32), jnp.int32(0))

    buf = pack_frame(cfg, img, dep)
    assert buf.shape == (3 * cfg.height * cfg.width,) and buf.dtype == np.uint8
    b, _ = fuse_step.jitted_fuse_frame_packed(cfg)(
        SurfelBank.empty(cfg.surfel_capacity), jnp.asarray(buf),
        jnp.eye(4, dtype=jnp.float32), jnp.int32(0))

    n = int(a.count)
    assert int(b.count) == n
    np.testing.assert_array_equal(np.asarray(a.position[:n]),
                                  np.asarray(b.position[:n]))


def test_invalid_poses_dropped():
    """NaN/non-rigid poses are dropped with accounting instead of
    poisoning the pose graph (failure detection, SURVEY.md §5)."""
    cfg = tiny_config()
    m = SurfelMapping(cfg)
    bad_nan = np.eye(4)
    bad_nan[0, 3] = np.nan
    bad_scale = np.eye(4)
    bad_scale[:3, :3] *= 2.0              # det = 8: not a rotation
    img, dep = render_plane(cfg, np.eye(4))

    m.feed_pose(0.0, bad_nan, is_keyframe=True)
    m.feed_pose(0.0, bad_scale, is_keyframe=True)
    assert m.dropped["invalid_pose"] == 2
    assert len(m.graph) == 0

    feed_frame(m, 1.0, np.eye(4), img, dep, is_keyframe=True)
    assert m.frames_fused == 1


def test_rotation_only_correction_warps():
    """Divergence #14: a keyframe whose translation is unchanged but whose
    rotation was corrected must still be detected as moved and warp its
    surfels.  The reference compares translations only
    (surfel_map.cpp:236-253,693-711) and would silently skip it."""
    th = 0.3
    c, s = np.cos(th), np.sin(th)
    R = np.array([[c, 0, s, 0], [0, 1, 0, 0],
                  [-s, 0, c, 0], [0, 0, 0, 1]])

    # graph-level: pure rotation at the origin is a change
    g = PoseGraph()
    g.add_keyframe(np.eye(4), 0.0)
    assert g.update_loop_path([R]) is True
    warps, moved = g.pose_warps()
    assert moved[0]
    np.testing.assert_allclose(warps[0], R, atol=1e-12)

    # driver-level: keyframe 0 sits at the world origin, so a yaw about
    # the origin keeps its translation bit-identical while rotating it
    cfg = tiny_config(drift_free_poses=2)
    m = SurfelMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    assert np.allclose((R @ m.graph.keyframes[0].cam_pose)[:3, 3],
                       m.graph.keyframes[0].cam_pose[:3, 3])
    slabs_before = {k: v["position"].copy() for k, v in m.pool.slabs.items()}
    assert 0 in slabs_before, "keyframe 0 must have migrated out"

    loop_path = [R @ kf.cam_pose for kf in m.graph.keyframes]
    m.feed_pose(5.0, R.copy(), is_keyframe=True, loop_path=loop_path)

    # keyframe 0's inactive surfels rotated despite unchanged translation
    pb = slabs_before[0]
    pa = m.pool.slabs[0]["position"]
    np.testing.assert_allclose(pa, pb @ R[:3, :3].T, atol=1e-4)
    for kf in m.graph.keyframes[:-1]:
        np.testing.assert_allclose(kf.cam_pose, kf.loop_pose)

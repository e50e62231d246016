"""MultiSessionMapping: batched sessions == independent device drivers."""

import numpy as np
import pytest

from densesurfelmapping_tpu.pipeline.device_driver import DeviceResidentMapping
from densesurfelmapping_tpu.pipeline.multi_session import MultiSessionMapping

from test_driver import tiny_config, render_plane


def test_two_sessions_match_independent_drivers():
    cfg = tiny_config(surfel_capacity=8192, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2)
    solos = [DeviceResidentMapping(cfg) for _ in range(2)]

    offsets = [0.0, 0.2]
    for i in range(5):
        for k in range(2):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i + offsets[k]
            img, dep = render_plane(cfg, pose)
            multi.feed_pose(k, float(i), pose, is_keyframe=True)
            multi.feed_image(k, float(i), img)
            multi.feed_depth(k, float(i), dep)
            solos[k].feed_pose(float(i), pose, is_keyframe=True)
            solos[k].feed_image(float(i), img)
            solos[k].feed_depth(float(i), dep)
        assert multi.step_ready()
        multi.step()

    for k in range(2):
        got = multi.session_surfels(k, min_updates=1)
        want = {kk: np.asarray(vv) for kk, vv in
                solos[k].active_surfels(min_updates=1).items()}
        # solo active == all live here (window covers everything: 5 kfs,
        # radius 3 BFS on a chain keeps last 3... compare full live sets)
        n_solo = int(np.asarray(solos[k].bank.count))
        rows = {kk: np.asarray(getattr(solos[k].bank, kk))[:n_solo]
                for kk in got}
        live = rows["update_times"] > 0
        want = {kk: vv[live] for kk, vv in rows.items()}
        assert len(got["position"]) == len(want["position"])
        np.testing.assert_allclose(np.sort(got["position"], axis=0),
                                   np.sort(want["position"], axis=0),
                                   atol=1e-5)


def test_flush_pads_missing_sessions():
    cfg = tiny_config(surfel_capacity=4096, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2)
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    # only session 0 has a frame
    multi.feed_pose(0, 0.0, pose, is_keyframe=True)
    multi.feed_image(0, 0.0, img)
    multi.feed_depth(0, 0.0, dep)
    assert not multi.step_ready()
    with pytest.raises(RuntimeError):
        multi.step()
    n = multi.step(flush=True)
    assert n == 1
    assert multi.sessions[0].frames_fused == 1
    assert multi.sessions[1].frames_fused == 0
    # padded session fused nothing
    assert int(np.asarray(multi.banks.count[1])) == 0
    assert int(np.asarray(multi.banks.count[0])) > 0


def _feed_and_step(multi, k_list, i, offsets=None):
    for k in k_list:
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i + (offsets[k] if offsets else 0.0)
        img, dep = render_plane(multi.config, pose)
        multi.feed_pose(k, float(i), pose, is_keyframe=True)
        multi.feed_image(k, float(i), img)
        multi.feed_depth(k, float(i), dep)
    multi.step(flush=True)


def test_add_remove_session_mid_run():
    cfg = tiny_config(surfel_capacity=8192, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2)
    for i in range(3):
        _feed_and_step(multi, [0, 1], i)
    before1 = np.sort(multi.session_surfels(1)["position"], axis=0)

    # runtime add: new session starts empty and fuses
    k2 = multi.add_session()
    assert k2 == 2 and multi.n_streams == 3
    for i in range(3, 5):
        _feed_and_step(multi, [0, 1, 2], i)
    assert multi.sessions[2].frames_fused == 2
    assert int(np.asarray(multi.banks.count[2])) > 0

    # runtime remove: returns the removed map, survivors untouched
    n0 = len(multi.session_map_surfels(0)["position"])
    rows = multi.remove_session(0)
    assert len(rows["position"]) == n0
    assert multi.n_streams == 2
    # old session 1 is now stream 0; its early surfels are intact
    after = np.sort(multi.session_surfels(0)["position"], axis=0)
    assert len(after) >= len(before1)
    # and the re-batched fleet keeps stepping
    _feed_and_step(multi, [0, 1], 5)
    assert multi.sessions[0].frames_fused == 6


def test_session_export_matches_solo_driver(tmp_path):
    cfg = tiny_config(surfel_capacity=8192, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2)
    solo = DeviceResidentMapping(cfg)
    for i in range(5):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(cfg, pose)
        for feed in (multi, ):
            feed.feed_pose(0, float(i), pose, is_keyframe=True)
            feed.feed_image(0, float(i), img)
            feed.feed_depth(0, float(i), dep)
        # stream 1 gets the same frames (keeps step_ready simple)
        multi.feed_pose(1, float(i), pose, is_keyframe=True)
        multi.feed_image(1, float(i), img)
        multi.feed_depth(1, float(i), dep)
        multi.step()
        solo.feed_pose(float(i), pose, is_keyframe=True)
        solo.feed_image(float(i), img)
        solo.feed_depth(float(i), dep)

    a = multi.session_map_surfels(0)
    b = solo.map_surfels()
    assert len(a["position"]) == len(b["position"])
    np.testing.assert_allclose(np.sort(a["position"], axis=0),
                               np.sort(b["position"], axis=0), atol=1e-5)
    n_cloud = multi.save_cloud(0, str(tmp_path / "s0.pcd"))
    n_mesh = multi.save_mesh(0, str(tmp_path / "s0.ply"))
    assert n_cloud == len(a["position"]) and n_mesh > 0
    n_solo = solo.save_cloud(str(tmp_path / "solo.pcd"))
    assert n_cloud == n_solo


def test_session_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(surfel_capacity=4096, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2)
    for i in range(4):
        _feed_and_step(multi, [0, 1], i, offsets=[0.0, 0.2])
    path = str(tmp_path / "s1.npz")
    multi.save_checkpoint(1, path)

    fresh = MultiSessionMapping(cfg, n_streams=2)
    fresh.load_checkpoint(1, path)
    a = np.sort(fresh.session_surfels(1)["position"], axis=0)
    b = np.sort(multi.session_surfels(1)["position"], axis=0)
    np.testing.assert_allclose(a, b, atol=1e-6)
    assert fresh.sessions[1].frames_fused == 4
    # restored session keeps fusing
    _feed_and_step(fresh, [1], 4, offsets=[0.0, 0.2])
    assert fresh.sessions[1].frames_fused == 5


def test_pump_flush_timeout_and_drop_counters():
    cfg = tiny_config(surfel_capacity=4096, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2, flush_timeout=0.05)
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    multi.feed_pose(0, 0.0, pose, is_keyframe=True)
    multi.feed_image(0, 0.0, img)
    multi.feed_depth(0, 0.0, dep)
    # not ready (stream 1 empty) and not timed out yet -> no step
    assert multi.pump(now=multi.sessions[0].pose_buffer[0][3] + 0.01) == 0
    # past the timeout -> padded step fires
    assert multi.pump(now=multi.sessions[0].pose_buffer[0][3] + 1.0) == 1
    assert multi.sessions[0].frames_fused == 1

    # stale-frame drops are counted per session
    multi.feed_image(0, 0.5, img)           # no pose will ever match 0.5
    multi.feed_pose(0, 1.0, pose, is_keyframe=False)
    multi.feed_image(0, 1.0, img)
    multi.feed_depth(0, 1.0, dep)
    multi.step(flush=True)
    m = multi.session_metrics()
    assert m[0]["dropped_images"] == 1
    assert m[0]["frames_fused"] == 2
    assert 0.0 < m[0]["saturation"] < 1.0
    assert m[0]["surfels_dropped"] == 0


def test_saturation_reports_overflow_drops():
    # capacity so small that new surfels must be dropped
    cfg = tiny_config(surfel_capacity=64, compact_interval=2)
    multi = MultiSessionMapping(cfg, n_streams=1)
    for i in range(4):
        _feed_and_step(multi, [0], i)
    m = multi.session_metrics()[0]
    assert m["surfels_dropped"] > 0          # overflow is visible, not silent
    assert m["saturation"] > 0.5             # compaction reclaims some rows


def test_multi_session_loop_warp():
    cfg = tiny_config(surfel_capacity=4096, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=2)
    for i in range(3):
        for k in range(2):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i
            img, dep = render_plane(cfg, pose)
            multi.feed_pose(k, float(i), pose, is_keyframe=True)
            multi.feed_image(k, float(i), img)
            multi.feed_depth(k, float(i), dep)
        multi.step()
    before = [multi.session_surfels(k)["position"].copy() for k in range(2)]

    # loop correction only for session 0: +1 m in y
    s0 = multi.sessions[0]
    shift = np.eye(4)
    shift[1, 3] = 1.0
    loop_path = [shift @ kf.cam_pose for kf in s0.graph.keyframes]
    pose = shift @ np.eye(4)
    multi.feed_pose(0, 3.0, pose, is_keyframe=False, loop_path=loop_path)

    after0 = multi.session_surfels(0)["position"]
    after1 = multi.session_surfels(1)["position"]
    np.testing.assert_allclose(after0[:, 1], before[0][:, 1] + 1.0, atol=1e-4)
    np.testing.assert_allclose(after1, before[1], atol=1e-6)


def test_stereo_fleet_matches_solo_stereo_driver():
    """Fleet-wide on-device stereo: a 2-stream stereo fleet produces the
    same per-session maps as solo DeviceResidentMapping drivers running
    the same stereo-resident path."""
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.models.stereo import StereoConfig

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=8192, lane_align=8,
                          drift_free_poses=3, compact_interval=1000)
    scene = synthetic.Scene(ground_y=1.5, wall_z=18.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=25.0, texture="multisine")
    scfg = StereoConfig(max_disparity=64, min_disparity=1, radius=3)
    baseline = 0.5
    bf = cam.fx * baseline

    multi = MultiSessionMapping(cfg, n_streams=2)
    multi.enable_stereo(bf=bf, stereo_config=scfg)
    solos = [DeviceResidentMapping(cfg) for _ in range(2)]
    for m in solos:
        m.enable_stereo(bf=bf, stereo_config=scfg)

    with pytest.raises(RuntimeError, match="stereo mode"):
        multi.feed_depth(0, 0.0, np.zeros((cam.height, cam.width)))

    offsets = [0.0, 0.2]
    for i in range(4):
        for k in range(2):
            pose = np.eye(4)
            pose[0, 3] = 0.3 * i + offsets[k]
            rp = pose.copy()
            rp[:3, 3] += rp[:3, 0] * baseline
            li, _ = scene.render(cfg, pose)
            ri, _ = scene.render(cfg, rp)
            multi.feed_pose(k, float(i), pose, is_keyframe=True)
            multi.feed_stereo(k, float(i), li, ri)
            solos[k].feed_pose(float(i), pose, is_keyframe=True)
            solos[k].feed_stereo(float(i), li, ri)
        assert multi.step_ready()
        multi.step()

    for k in range(2):
        got = multi.session_surfels(k, min_updates=1)
        n_solo = int(np.asarray(solos[k].bank.count))
        rows = {kk: np.asarray(getattr(solos[k].bank, kk))[:n_solo]
                for kk in got}
        live = rows["update_times"] > 0
        want = {kk: vv[live] for kk, vv in rows.items()}
        assert len(got["position"]) > 50
        assert len(got["position"]) == len(want["position"])
        np.testing.assert_allclose(np.sort(got["position"], axis=0),
                                   np.sort(want["position"], axis=0),
                                   atol=1e-5)


def test_stereo_fleet_flush_pad_is_noop():
    """A padded stereo step (all-zero pair) must fuse nothing into the
    padded session."""
    from densesurfelmapping_tpu.config import SurfelMapConfig, CameraIntrinsics
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.models.stereo import StereoConfig

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=8192, lane_align=8,
                          drift_free_poses=3, compact_interval=1000)
    scene = synthetic.Scene(ground_y=1.5, wall_z=18.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=25.0, texture="multisine")
    multi = MultiSessionMapping(cfg, n_streams=2)
    multi.enable_stereo(bf=cam.fx * 0.5,
                        stereo_config=StereoConfig(max_disparity=64,
                                                   min_disparity=1,
                                                   radius=3))
    pose = np.eye(4)
    rp = pose.copy()
    rp[0, 3] += 0.5
    li, _ = scene.render(cfg, pose)
    ri, _ = scene.render(cfg, rp)
    multi.feed_pose(0, 0.0, pose, is_keyframe=True)
    multi.feed_stereo(0, 0.0, li, ri)
    assert not multi.step_ready()
    multi.step(flush=True)
    counts = np.asarray(multi.banks.count)
    assert counts[0] > 30        # real stereo frame fused
    assert counts[1] == 0        # padded session untouched


def test_session_trajectory_export(tmp_path):
    cfg = tiny_config(surfel_capacity=4096, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=1)
    for i in range(3):
        pose = np.eye(4)
        pose[0, 3] = 0.25 * i
        img, dep = render_plane(cfg, pose)
        multi.feed_pose(0, float(i), pose, is_keyframe=True)
        multi.feed_image(0, float(i), img)
        multi.feed_depth(0, float(i), dep)
        multi.step()
    out = tmp_path / "s0.txt"
    assert multi.save_trajectory(0, str(out)) == 3
    rows = np.loadtxt(str(out))
    assert rows.shape == (3, 12)
    np.testing.assert_allclose(rows[1].reshape(3, 4)[0, 3], 0.25, atol=1e-8)


def test_invalid_pose_dropped_per_session():
    cfg = tiny_config(surfel_capacity=4096)
    multi = MultiSessionMapping(cfg, n_streams=1)
    bad = np.eye(4)
    bad[1, 3] = np.inf
    multi.feed_pose(0, 0.0, bad, is_keyframe=True)
    assert multi.sessions[0].dropped["invalid_pose"] == 1
    assert len(multi.sessions[0].graph) == 0


def test_checkpoint_restore_dead_rows_match_empty(tmp_path):
    """Restored dead rows must carry SurfelBank.empty defaults
    (last_update = -1, not 0 == 'owned by keyframe 0')."""
    cfg = tiny_config(surfel_capacity=4096, compact_interval=1000)
    multi = MultiSessionMapping(cfg, n_streams=1)
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    multi.feed_pose(0, 0.0, pose, is_keyframe=True)
    multi.feed_image(0, 0.0, img)
    multi.feed_depth(0, 0.0, dep)
    multi.step()
    p = tmp_path / "s.npz"
    multi.save_checkpoint(0, str(p))

    fresh = MultiSessionMapping(cfg, n_streams=1)
    fresh.load_checkpoint(0, str(p))
    n = int(np.asarray(fresh.banks.count[0]))
    lu = np.asarray(fresh.banks.last_update[0])
    assert n > 0
    assert (lu[n:] == -1).all()


def _drive_fleet(m, n_frames=6):
    for i in range(n_frames):
        for k in range(2):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i + 0.2 * k
            img, dep = render_plane(cfg_of(m), pose)
            m.feed_pose(k, float(i), pose, is_keyframe=True)
            m.feed_image(k, float(i), img)
            m.feed_depth(k, float(i), dep)
        m.step()
    # loop correction for stream 0 arriving while a pipelined round is
    # still in flight: the warp must flush it first (ordering test)
    shift = np.eye(4)
    shift[1, 3] = 0.3
    g = m.sessions[0].graph
    loop_path = [shift @ kf.cam_pose for kf in g.keyframes]
    last = np.eye(4)
    last[0, 3] = 0.4 * (n_frames - 1)
    m.feed_pose(0, float(n_frames), shift @ last, loop_path=loop_path,
                is_keyframe=False)
    return m


def cfg_of(m):
    return m.config


def test_pipelined_rounds_match_eager():
    """MultiSessionMapping(pipelined=True) defers each round's upload+
    dispatch to a worker thread; every consumer flushes first, so maps,
    counters, and warps must match the eager fleet bitwise."""
    cfg = tiny_config(surfel_capacity=8192, compact_interval=3)
    eager = _drive_fleet(MultiSessionMapping(cfg, n_streams=2))
    piped = _drive_fleet(MultiSessionMapping(cfg, n_streams=2,
                                             pipelined=True))
    piped.flush_rounds()
    assert piped.rounds == eager.rounds
    for k in range(2):
        a = piped.session_surfels(k, min_updates=1)
        b = eager.session_surfels(k, min_updates=1)
        assert len(a["position"]) == len(b["position"])
        order_a = np.lexsort(a["position"].T)
        order_b = np.lexsort(b["position"].T)
        for key in a:
            np.testing.assert_array_equal(a[key][order_a], b[key][order_b],
                                          err_msg=f"stream {k} field {key}")
    ma = piped.session_metrics()
    mb = eager.session_metrics()
    for x, y in zip(ma, mb):
        assert x == y

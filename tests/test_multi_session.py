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

"""DeviceResidentMapping (window-mask lifecycle, zero steady-state D2H)
must be semantically identical to the host-pool SurfelMapping."""

import numpy as np
import pytest

from densesurfelmapping_tpu.pipeline.driver import SurfelMapping
from densesurfelmapping_tpu.pipeline.device_driver import DeviceResidentMapping

from test_driver import tiny_config, render_plane, feed_frame


def run_scenario(m):
    for i in range(6):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(m.config, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    # loop edge reactivates keyframe 0's surfels
    pose = np.eye(4)
    img, dep = render_plane(m.config, pose)
    feed_frame(m, 6.0, pose, img, dep, is_keyframe=True, loop_edges=[(6, 0)])
    # pose-graph correction
    shift = np.eye(4)
    shift[1, 3] = 0.5
    loop_path = [shift @ kf.cam_pose for kf in m.graph.keyframes]
    m.feed_pose(7.0, shift @ pose, is_keyframe=False, loop_path=loop_path)
    return m


def sorted_rows(d):
    pos = d["position"]
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return {k: np.asarray(v)[order] for k, v in d.items()}


@pytest.fixture(scope="module")
def pair():
    cfg = tiny_config(drift_free_poses=2, surfel_capacity=8192,
                      migration_buffer=1024, stats_interval=2,
                      compact_interval=4)
    host = run_scenario(SurfelMapping(cfg))
    dev = run_scenario(DeviceResidentMapping(cfg))
    return host, dev


def test_same_active_window(pair):
    host, dev = pair
    assert dev.local_indices == host.local_indices
    assert dev.frames_fused == host.frames_fused == 7


def test_same_map(pair):
    host, dev = pair
    a = sorted_rows(dev.map_surfels())
    b = sorted_rows(host.map_surfels())
    assert len(a["position"]) == len(b["position"])
    np.testing.assert_allclose(a["position"], b["position"], atol=1e-4)
    np.testing.assert_allclose(a["normal"], b["normal"], atol=1e-4)
    np.testing.assert_array_equal(a["update_times"], b["update_times"])


def test_same_active_frozen_split(pair):
    host, dev = pair
    for getter in ("active_surfels", "inactive_surfels"):
        a = sorted_rows(getattr(dev, getter)())
        b = sorted_rows(getattr(host, getter)())
        assert len(a["position"]) == len(b["position"]), getter
        np.testing.assert_allclose(a["position"], b["position"], atol=1e-4,
                                   err_msg=getter)


def test_device_checkpoint_roundtrip(pair, tmp_path):
    _, dev = pair
    path = str(tmp_path / "dev.npz")
    dev.save_checkpoint(path)
    cfg = dev.config
    m2 = DeviceResidentMapping(cfg)
    m2.load_checkpoint(path)
    assert m2.local_indices == dev.local_indices
    a = sorted_rows(m2.map_surfels())
    b = sorted_rows(dev.map_surfels())
    np.testing.assert_allclose(a["position"], b["position"], atol=1e-5)
    # resumed mapper keeps working
    pose = np.eye(4)
    pose[0, 3] = 2.8
    img, dep = render_plane(cfg, pose)
    feed_frame(m2, 8.0, pose, img, dep, is_keyframe=True)
    assert m2.frames_fused == dev.frames_fused + 1


def test_keyframe_capacity_grows():
    """Outgrowing max_keyframes must grow the window mask (re-jit), not
    crash, and produce the same map as a driver sized right from the start
    (mirrors the unbounded pose DB of surfel_map.h:36-46)."""
    small = tiny_config(max_keyframes=4, drift_free_poses=2)
    big = tiny_config(max_keyframes=16, drift_free_poses=2)
    ms, mb = DeviceResidentMapping(small), DeviceResidentMapping(big)
    for i in range(10):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(small, pose)
        for m in (ms, mb):
            feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    assert ms.config.max_keyframes == 16   # grew 4 -> 8 -> 16
    assert ms.frames_fused == mb.frames_fused == 10
    a, b = sorted_rows(ms.map_surfels()), sorted_rows(mb.map_surfels())
    assert len(a["position"]) == len(b["position"])
    np.testing.assert_allclose(a["position"], b["position"], atol=1e-4)
    # checkpoint saved under the grown capacity loads into a small config
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "grown.npz")
        ms.save_checkpoint(path)
        m2 = DeviceResidentMapping(tiny_config(max_keyframes=4,
                                               drift_free_poses=2))
        m2.load_checkpoint(path)
        assert m2.config.max_keyframes >= 10
        assert m2.local_indices == ms.local_indices


def test_warp_grows_keyframe_capacity():
    """A loop_path arriving after the pose graph outgrew max_keyframes
    (poses can run ahead of fused frames) must grow capacity on the WARP
    path instead of crashing on the stack build."""
    from densesurfelmapping_tpu.pipeline.device_driver import \
        DeviceResidentMapping
    from test_driver import tiny_config, render_plane, feed_frame

    cfg = tiny_config(max_keyframes=4)
    m = DeviceResidentMapping(cfg)
    img, dep = render_plane(cfg, np.eye(4))
    feed_frame(m, 0.0, np.eye(4), img, dep, is_keyframe=True)
    # poses only: the graph outgrows the 4-entry window mask
    for i in range(1, 7):
        pose = np.eye(4)
        pose[0, 3] = 0.3 * i
        m.feed_pose(float(i), pose, is_keyframe=True)
    assert len(m.graph) == 7 > 4
    # correction arrives BEFORE any further fuse: previously a broadcast
    # ValueError in _warp_surfels
    shift = np.eye(4)
    shift[1, 3] = 0.25
    loop_path = [shift @ kf.cam_pose for kf in m.graph.keyframes]
    m.feed_pose(7.0, shift @ m.graph.keyframes[-1].cam_pose,
                loop_path=loop_path)
    assert m.config.max_keyframes >= 7
    assert len(m._window_np) == m.config.max_keyframes
    assert not np.isnan(np.asarray(m.bank.position)).any()


def test_onebuf_alltrue_mask_matches_unwindowed():
    """The windowed one-payload step with an all-true window must equal
    the unwindowed packed step bitwise (bench.py rides the onebuf path
    with an all-true mask; nothing may be frozen or gated differently)."""
    import jax.numpy as jnp
    from densesurfelmapping_tpu.core.state import (SurfelBank, pack_aux,
                                                   pack_frame,
                                                   pack_frame_with_aux)
    from densesurfelmapping_tpu.pipeline.fuse_step import (
        jitted_fuse_frame_onebuf, jitted_fuse_frame_packed)

    cfg = tiny_config(surfel_capacity=8192, max_keyframes=64)
    a = SurfelBank.empty(cfg.surfel_capacity)
    b = SurfelBank.empty(cfg.surfel_capacity)
    step_a = jitted_fuse_frame_packed(cfg)
    step_b = jitted_fuse_frame_onebuf(cfg)
    mask = np.ones(cfg.max_keyframes, bool)
    for i in range(6):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.3 * i
        img, dep = render_plane(cfg, pose)
        buf = pack_frame(cfg, img, dep)
        a, sa = step_a(a, jnp.asarray(buf), jnp.asarray(pose), jnp.int32(i))
        payload = pack_frame_with_aux(cfg, img, dep, pack_aux(pose, i, mask))
        b, sb = step_b(b, jnp.asarray(payload))
        assert int(sa["n_new"]) == int(sb["n_new"]), i
    assert int(a.count) == int(b.count)
    n = int(a.count)
    from densesurfelmapping_tpu.pipeline.inactive_pool import FIELDS
    for k in FIELDS:
        np.testing.assert_array_equal(np.asarray(getattr(a, k))[:n],
                                      np.asarray(getattr(b, k))[:n],
                                      err_msg=k)

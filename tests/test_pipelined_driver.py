"""Pipelined DeviceResidentMapping (frame pack overlapped with the
previous frame's dispatch; one-frame feed lag) must be observably
identical to the eager device driver: every bank consumer flushes the
in-flight frame first, so maps, counters, warps, and checkpoints match
bitwise."""

import numpy as np
import pytest

from densesurfelmapping_tpu.pipeline.device_driver import DeviceResidentMapping

from test_driver import tiny_config, render_plane, feed_frame
from test_device_driver import run_scenario, sorted_rows


def make_cfg(**kw):
    kw.setdefault("drift_free_poses", 2)
    kw.setdefault("surfel_capacity", 8192)
    kw.setdefault("migration_buffer", 1024)
    kw.setdefault("stats_interval", 2)
    kw.setdefault("compact_interval", 4)
    return tiny_config(**kw)


@pytest.fixture(scope="module")
def pair():
    cfg = make_cfg()
    eager = run_scenario(DeviceResidentMapping(cfg))
    piped = run_scenario(DeviceResidentMapping(cfg, pipelined=True))
    return eager, piped


def test_identical_map(pair):
    eager, piped = pair
    a = sorted_rows(piped.map_surfels())
    b = sorted_rows(eager.map_surfels())
    assert len(a["position"]) == len(b["position"])
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_identical_active_frozen_split(pair):
    eager, piped = pair
    for getter in ("active_surfels", "inactive_surfels"):
        a = sorted_rows(getattr(piped, getter)())
        b = sorted_rows(getattr(eager, getter)())
        np.testing.assert_array_equal(a["position"], b["position"],
                                      err_msg=getter)


def test_same_counters(pair):
    eager, piped = pair
    assert piped.frames_fused == eager.frames_fused
    assert piped.local_indices == eager.local_indices
    assert piped.metrics()["active_count"] == eager.metrics()["active_count"]


def test_checkpoint_flushes_pending(tmp_path):
    """A checkpoint taken while a frame is still in flight must include
    that frame (save goes through _rows_host -> flush)."""
    cfg = make_cfg()
    eager = DeviceResidentMapping(cfg)
    piped = DeviceResidentMapping(cfg, pipelined=True)
    for m in (eager, piped):
        for i in range(3):
            pose = np.eye(4)
            pose[0, 3] = 0.4 * i
            img, dep = render_plane(cfg, pose)
            feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    assert piped._pending is not None    # a frame really was in flight
    pe = str(tmp_path / "eager.npz")
    pp = str(tmp_path / "piped.npz")
    eager.save_checkpoint(pe)
    piped.save_checkpoint(pp)
    ze, zp = np.load(pe), np.load(pp)
    assert int(zp["frames_fused"]) == int(ze["frames_fused"]) == 3
    np.testing.assert_array_equal(
        np.sort(zp["bank_position"], axis=0),
        np.sort(ze["bank_position"], axis=0))


def test_flush_is_idempotent_and_public():
    cfg = make_cfg()
    m = DeviceResidentMapping(cfg, pipelined=True)
    pose = np.eye(4)
    img, dep = render_plane(cfg, pose)
    feed_frame(m, 0.0, pose, img, dep, is_keyframe=True)
    assert m._pending is not None
    m.flush()
    assert m._pending is None
    assert m.frames_fused == 1
    m.flush()                             # no-op
    assert m.frames_fused == 1


def test_keyframe_capacity_growth_with_pending():
    """Growth re-jits with a new aux length; the pending frame (packed at
    the old length) must dispatch through the old program first."""
    cfg = make_cfg(max_keyframes=4)
    eager = DeviceResidentMapping(cfg)
    piped = DeviceResidentMapping(cfg, pipelined=True)
    for m in (eager, piped):
        for i in range(7):                # outgrows max_keyframes=4 twice
            pose = np.eye(4)
            pose[0, 3] = 0.3 * i
            img, dep = render_plane(cfg, pose)
            feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    assert piped.config.max_keyframes == eager.config.max_keyframes == 8
    a = sorted_rows(piped.map_surfels())
    b = sorted_rows(eager.map_surfels())
    np.testing.assert_array_equal(a["position"], b["position"])


def test_random_schedule_equivalence():
    """Randomized interleaving of feeds, loop corrections, readouts,
    checkpoints, and stats against the same schedule on the eager driver:
    every flush seam must keep observable state identical no matter when
    a consumer interrupts the in-flight frame."""
    rng = np.random.default_rng(7)
    cfg = make_cfg(compact_interval=3)
    eager = DeviceResidentMapping(cfg)
    piped = DeviceResidentMapping(cfg, pipelined=True)

    # one pre-generated action schedule applied to both drivers
    actions = []
    for i in range(14):
        actions.append(("frame", i))
        r = rng.random()
        if r < 0.2:
            actions.append(("metrics",))
        elif r < 0.35:
            actions.append(("readout",))
        elif r < 0.45:
            actions.append(("stats",))
        elif r < 0.55 and i > 2:
            actions.append(("warp", i))

    def apply(m):
        outs = []
        for a in actions:
            if a[0] == "frame":
                i = a[1]
                pose = np.eye(4)
                pose[0, 3] = 0.35 * i
                img, dep = render_plane(cfg, pose)
                feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
            elif a[0] == "metrics":
                mm = m.metrics()
                outs.append(("metrics", mm["active_count"],
                             mm["inactive_count"], mm["frames_fused"]))
            elif a[0] == "readout":
                rows = m.map_surfels()
                outs.append(("readout", len(rows["position"]),
                             float(np.sort(rows["position"][:, 0]).sum())))
            elif a[0] == "stats":
                outs.append(("stats", dict(m.sync_stats())))
            elif a[0] == "warp":
                # loop correction arriving WITH a frame (so the stale-pose
                # sync rule doesn't park the buffers): warps mid-schedule,
                # potentially with a pipelined frame still in flight
                shift = np.eye(4)
                shift[1, 3] = 0.1
                loop_path = [shift @ kf.loop_pose
                             for kf in m.graph.keyframes]
                pose = shift @ np.eye(4)
                pose[0, 3] = 0.35 * a[1]
                img, dep = render_plane(cfg, pose)
                feed_frame(m, a[1] + 0.5, pose, img, dep,
                           is_keyframe=True, loop_path=loop_path)
        return outs

    out_e = apply(eager)
    out_p = apply(piped)
    assert out_e == out_p
    a = sorted_rows(piped.map_surfels())
    b = sorted_rows(eager.map_surfels())
    for k in a:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)

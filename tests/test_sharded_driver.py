"""End-to-end equivalence: ShardedSurfelMapping (8-way virtual mesh) ==
SurfelMapping (single device) across keyframe migration and loop closure."""

import numpy as np
import jax
import pytest

from densesurfelmapping_tpu.parallel import sharding
from densesurfelmapping_tpu.pipeline.driver import SurfelMapping
from densesurfelmapping_tpu.pipeline.sharded_driver import ShardedSurfelMapping

from test_driver import tiny_config, render_plane, feed_frame


needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def run_scenario(m):
    """Keyframe chain with migration, a loop edge, and a pose correction."""
    for i in range(6):
        pose = np.eye(4)
        pose[0, 3] = 0.4 * i
        img, dep = render_plane(m.config, pose)
        feed_frame(m, float(i), pose, img, dep, is_keyframe=True)
    # loop edge back to keyframe 0 reactivates its surfels
    pose = np.eye(4)
    img, dep = render_plane(m.config, pose)
    feed_frame(m, 6.0, pose, img, dep, is_keyframe=True,
               loop_edges=[(6, 0)])
    # pose-graph correction: +0.5 m in y for every keyframe
    shift = np.eye(4)
    shift[1, 3] = 0.5
    loop_path = [shift @ kf.cam_pose for kf in m.graph.keyframes]
    m.feed_pose(7.0, shift @ pose, is_keyframe=False, loop_path=loop_path)
    return m


def sorted_rows(d):
    pos = d["position"]
    order = np.lexsort((pos[:, 2], pos[:, 1], pos[:, 0]))
    return {k: v[order] for k, v in d.items()}


@needs_mesh
def test_sharded_driver_matches_dense():
    cfg = tiny_config(drift_free_poses=2, surfel_capacity=8192,
                      migration_buffer=1024, stats_interval=2,
                      compact_upload=False)
    mesh = sharding.make_mesh(8, data=1)

    dense = run_scenario(SurfelMapping(cfg))
    shard = run_scenario(ShardedSurfelMapping(cfg, mesh))

    assert shard.frames_fused == dense.frames_fused == 7
    assert shard.local_indices == dense.local_indices
    assert set(shard.pool.slabs) == set(dense.pool.slabs)
    for k in shard.pool.slabs:
        a = sorted_rows(shard.pool.slabs[k])
        b = sorted_rows(dense.pool.slabs[k])
        np.testing.assert_allclose(a["position"], b["position"], atol=1e-4)

    sa = sorted_rows(shard.active_surfels(min_updates=1))
    da = sorted_rows(dense.active_surfels(min_updates=1))
    assert len(sa["position"]) == len(da["position"])
    np.testing.assert_allclose(sa["position"], da["position"], atol=1e-4)
    np.testing.assert_allclose(sa["normal"], da["normal"], atol=1e-4)
    np.testing.assert_array_equal(sa["update_times"], da["update_times"])

    # exports work on the sharded driver
    total = shard.map_surfels()
    assert np.isfinite(total["position"]).all()
    assert shard.memory_usage_kb() > 0


@needs_mesh
def test_sharded_device_resident_matches_dense():
    """ShardedDeviceResidentMapping (mesh + window-mask lifecycle) ==
    DeviceResidentMapping across migration + loop closure."""
    from densesurfelmapping_tpu.pipeline.device_driver import (
        DeviceResidentMapping, ShardedDeviceResidentMapping)

    cfg = tiny_config(drift_free_poses=2, surfel_capacity=8192,
                      stats_interval=2, compact_interval=4)
    mesh = sharding.make_mesh(8, data=1)

    dense = run_scenario(DeviceResidentMapping(cfg))
    shard = run_scenario(ShardedDeviceResidentMapping(cfg, mesh))

    assert shard.frames_fused == dense.frames_fused == 7
    assert shard.local_indices == dense.local_indices

    sa = sorted_rows(shard.map_surfels())
    da = sorted_rows(dense.map_surfels())
    assert len(sa["position"]) == len(da["position"])
    np.testing.assert_allclose(sa["position"], da["position"], atol=1e-4)
    np.testing.assert_allclose(sa["normal"], da["normal"], atol=1e-4)

    for getter in ("active_surfels", "inactive_surfels"):
        a = sorted_rows(getattr(shard, getter)())
        b = sorted_rows(getattr(dense, getter)())
        assert len(a["position"]) == len(b["position"]), getter

    m = shard.metrics()
    assert m["active_count"] > 0 and m["inactive_count"] > 0


@needs_mesh
def test_sharded_device_resident_checkpoint_roundtrip(tmp_path):
    from densesurfelmapping_tpu.pipeline.device_driver import (
        ShardedDeviceResidentMapping)

    cfg = tiny_config(drift_free_poses=2, surfel_capacity=8192,
                      compact_interval=1000)
    mesh = sharding.make_mesh(8, data=1)
    m = run_scenario(ShardedDeviceResidentMapping(cfg, mesh))
    path = str(tmp_path / "shard.npz")
    m.save_checkpoint(path)

    m2 = ShardedDeviceResidentMapping(cfg, mesh)
    m2.load_checkpoint(path)
    assert m2.local_indices == m.local_indices
    a = sorted_rows(m2.map_surfels())
    b = sorted_rows(m.map_surfels())
    assert len(a["position"]) == len(b["position"])
    np.testing.assert_allclose(a["position"], b["position"], atol=1e-5)

    # resumed mapper keeps fusing on the mesh
    pose = np.eye(4)
    pose[0, 3] = 2.8
    img, dep = render_plane(cfg, pose)
    feed_frame(m2, 8.0, pose, img, dep, is_keyframe=True)
    assert m2.frames_fused == m.frames_fused + 1


@needs_mesh
def test_sharded_host_pool_checkpoint_roundtrip(tmp_path):
    cfg = tiny_config(drift_free_poses=2, surfel_capacity=8192,
                      migration_buffer=1024, stats_interval=2,
                      compact_upload=False)
    mesh = sharding.make_mesh(8, data=1)
    m = run_scenario(ShardedSurfelMapping(cfg, mesh))
    path = str(tmp_path / "hp_shard.npz")
    m.save_checkpoint(path)

    m2 = ShardedSurfelMapping(cfg, mesh)
    m2.load_checkpoint(path)
    assert m2.local_indices == m.local_indices
    assert set(m2.pool.slabs) == set(m.pool.slabs)
    a = sorted_rows(m2.active_surfels(min_updates=1))
    b = sorted_rows(m.active_surfels(min_updates=1))
    assert len(a["position"]) == len(b["position"])
    np.testing.assert_allclose(a["position"], b["position"], atol=1e-5)

    # resumed mapper keeps working on the mesh
    pose = np.eye(4)
    pose[0, 3] = 2.8
    img, dep = render_plane(cfg, pose)
    feed_frame(m2, 8.0, pose, img, dep, is_keyframe=True)
    assert m2.frames_fused == m.frames_fused + 1


@needs_mesh
def test_sharded_stereo_matches_dense_stereo():
    """Both sharded drivers support the stereo-resident path and agree
    with the dense stereo driver on the final map."""
    from densesurfelmapping_tpu.config import SurfelMapConfig, \
        CameraIntrinsics
    from densesurfelmapping_tpu.io import synthetic
    from densesurfelmapping_tpu.models.stereo import StereoConfig
    from densesurfelmapping_tpu.pipeline.device_driver import (
        DeviceResidentMapping, ShardedDeviceResidentMapping)

    cam = CameraIntrinsics(width=120, height=56, fx=80.0, fy=80.0,
                           cx=59.5, cy=27.5)
    cfg = SurfelMapConfig(camera=cam, surfel_capacity=8192, lane_align=8,
                          drift_free_poses=3)
    scene = synthetic.Scene(ground_y=1.5, wall_z=18.0,
                            boxes=synthetic.default_scene().boxes,
                            max_depth=25.0, texture="multisine")
    scfg = StereoConfig(max_disparity=64, min_disparity=1, radius=3)
    bf = cam.fx * 0.5

    mesh = sharding.make_mesh(len(jax.devices()), data=1)
    drivers = {
        "dense": DeviceResidentMapping(cfg),
        "sharded_dev": ShardedDeviceResidentMapping(cfg, mesh),
        "sharded_pool": ShardedSurfelMapping(cfg, mesh),
    }
    for m in drivers.values():
        m.enable_stereo(bf=bf, stereo_config=scfg)
        for i in range(4):
            pose = np.eye(4)
            pose[0, 3] = 0.2 * i
            rp = pose.copy()
            rp[:3, 3] += rp[:3, 0] * 0.5
            li, _ = scene.render(cfg, pose)
            ri, _ = scene.render(cfg, rp)
            m.feed_pose(float(i), pose, is_keyframe=True)
            m.feed_stereo(float(i), li, ri)
        assert m.frames_fused == 4

    a = sorted_rows({k: np.asarray(v) for k, v in
                     drivers["dense"].map_surfels().items()})
    for name in ("sharded_dev", "sharded_pool"):
        b = sorted_rows({k: np.asarray(v) for k, v in
                         drivers[name].map_surfels().items()})
        assert len(b["position"]) == len(a["position"]), name
        np.testing.assert_allclose(a["position"], b["position"],
                                   atol=1e-4, err_msg=name)


@needs_mesh
def test_frame_sharded_device_resident_matches_dense():
    """ShardedDeviceResidentMapping(frame_sharded=True): the column-slab
    frame stage integrated into the windowed driver must reproduce the
    dense driver across migration + loop closure (the slab SLIC is pinned
    bit-identical by test_frame_sharding; this covers the driver wiring
    incl. pose_mask gating through the precomputed segmentation)."""
    from densesurfelmapping_tpu.pipeline.device_driver import (
        DeviceResidentMapping, ShardedDeviceResidentMapping)

    cfg = tiny_config(drift_free_poses=2, surfel_capacity=8192,
                      stats_interval=2, compact_interval=4)
    mesh = sharding.make_mesh(8, data=1)

    dense = run_scenario(DeviceResidentMapping(cfg))
    shard = run_scenario(ShardedDeviceResidentMapping(cfg, mesh,
                                                      frame_sharded=True))

    assert shard.frames_fused == dense.frames_fused == 7
    assert shard.local_indices == dense.local_indices

    sa = sorted_rows(shard.map_surfels())
    da = sorted_rows(dense.map_surfels())
    assert len(sa["position"]) == len(da["position"])
    np.testing.assert_allclose(sa["position"], da["position"], atol=1e-4)
    np.testing.assert_allclose(sa["normal"], da["normal"], atol=1e-4)
    np.testing.assert_array_equal(sa["update_times"], da["update_times"])

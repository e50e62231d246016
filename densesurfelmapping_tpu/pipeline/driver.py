"""SurfelMapping: the host orchestrator around the jitted fuse step.

The TPU-native equivalent of the `SurfelMap` class (`surfel_map.h:48-148`):
frame/pose buffering and timestamp sync (`synchronize_msgs`,
`surfel_map.cpp:103-203`), pose/loop ingestion (`orb_results_input`,
:205-365), active-window migration (`move_add_surfels`, :1456-1595),
loop-closure warping (`warp_surfels`, :791-824), map export and — new in
this framework — full checkpoint/resume.

Division of labor: the pose graph and buffers are tiny and live on host;
every per-surfel / per-pixel operation is a jitted device call with static
shapes (fixed-size migration buffers, padded append slabs).
"""

from __future__ import annotations

import collections
from typing import Dict, List, Optional, Sequence, Set, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SurfelMapConfig
from ..core import geometry
from ..core.state import (FrameInput, SurfelBank, pad_frame,
                          pack_stereo_pair)
from ..ops import migration, warp as warp_ops
from ..utils.timing import StageTimer
from .fuse_step import jitted_fuse_frame, jitted_compact
from .inactive_pool import InactivePool, FIELDS
from .pose_graph import PoseGraph

import functools


class _StereoPair:
    """Depth-buffer marker: a packed u8 left/right pair whose depth is
    computed on device inside the fuse program (enable_stereo)."""
    __slots__ = ("buf",)

    def __init__(self, buf: np.ndarray):
        self.buf = buf


@functools.lru_cache(maxsize=4)
def _jitted_append(buffer_size: int):
    """Append up to buffer_size host surfels into the bank (static shapes,
    tail-append — no full-bank repack)."""
    from ..ops.fusion import append_new

    @functools.partial(jax.jit, donate_argnums=(0,))
    def append(bank, fields, n):
        mask = jnp.arange(buffer_size, dtype=jnp.int32) < n
        return append_new(bank, fields, mask)

    return append


class SurfelMapping:
    """End-to-end mapping system: feed images/depths/poses, read out maps.

    Input schema matches the reference's topic contract (SURVEY.md §1):
    intensity image + metric depth (0 = invalid) + per-frame pose with
    keyframe flag, reference-keyframe index, the full loop-corrected
    keyframe path, and loop-edge index pairs.
    """

    def __init__(self, config: SurfelMapConfig, kitti_alignment: bool = False):
        self.config = config
        self.graph = PoseGraph()
        self.pool = InactivePool()
        self.bank: SurfelBank = SurfelBank.empty(config.surfel_capacity)
        self.local_indices: Set[int] = set()
        self.timer = StageTimer()

        self._kitti_alignment = kitti_alignment
        self._alignment: Optional[np.ndarray] = None

        from .fuse_step import jitted_fuse_frame_compact
        self._fuse = jitted_fuse_frame(config)
        self._fuse_compact = jitted_fuse_frame_compact(config)
        self._compact = jitted_compact(config)
        self._append = _jitted_append(config.migration_buffer)
        self._warp_active = warp_ops.warp_active
        self._warp_pool = warp_ops.warp_pool

        # (stamp, image) / (stamp, depth) / (stamp, rel_pose, ref_index)
        self.image_buffer = collections.deque()
        self.depth_buffer = collections.deque()
        self.pose_buffer = collections.deque()
        self.stamp_tolerance = 1e-6

        self.frames_fused = 0
        self.last_stats: Dict[str, int] = {}   # refreshed every stats sync
        self._stats_dev: Dict[str, jnp.ndarray] = {}
        self.max_buffered = 5000   # reference queue depth (ros_node.cpp:24)
        self.dropped = collections.Counter()

        # on-device stereo front-end (enable_stereo/feed_stereo)
        self._stereo_cfg = None
        self._stereo_bf: Optional[float] = None
        self._stereo_filter = True
        self._stereo_fuse = None

    # ------------------------------------------------------------------
    # inputs (reference: image_input/depth_input/orb_results_input)
    # ------------------------------------------------------------------
    def _check_frame(self, kind: str, arr: np.ndarray) -> None:
        """Failure detection the reference lacks (SURVEY.md §5): shape
        validation up front; NaN/Inf depth is sanitized, not fused."""
        expect = (self.config.height, self.config.width)
        if np.shape(arr) != expect:
            raise ValueError(
                f"{kind} shape {np.shape(arr)} != camera {expect}")

    def feed_image(self, stamp: float, image: np.ndarray) -> None:
        self._check_frame("image", image)
        self.image_buffer.append((float(stamp), image))
        self._trim_buffers()
        self._synchronize()

    def enable_stereo(self, bf: float, stereo_config=None,
                      filter_depth: bool = True) -> None:
        """Switch the depth source to the on-device stereo front-end:
        `feed_stereo(stamp, left, right)` replaces feed_image+feed_depth.
        bf = fx * baseline (the `depth = bf / disparity` contract of
        kitti_publisher's publisher.py:40).  Depth is computed INSIDE the
        fuse program — no per-frame readback, and the upload shrinks to
        two u8 planes."""
        from ..models.stereo import StereoConfig

        self._stereo_cfg = stereo_config or StereoConfig()
        self._stereo_bf = float(bf)
        self._stereo_filter = bool(filter_depth)
        self._build_stereo_jit()

    def _build_stereo_jit(self) -> None:
        from .fuse_step import jitted_fuse_frame_stereo_packed
        self._stereo_fuse = jitted_fuse_frame_stereo_packed(
            self.config, self._stereo_cfg, self._stereo_filter)

    def feed_stereo(self, stamp: float, left: np.ndarray,
                    right: np.ndarray) -> None:
        """Rectified stereo pair at `stamp`; pairs with feed_pose exactly
        like feed_image+feed_depth (the left image is the fuse intensity).
        Requires enable_stereo()."""
        if self._stereo_fuse is None:
            raise RuntimeError("feed_stereo before enable_stereo(bf=...)")
        self._check_frame("left", left)
        self._check_frame("right", right)
        buf = pack_stereo_pair(self.config, left, right)
        self.image_buffer.append((float(stamp), np.asarray(left)))
        self.depth_buffer.append((float(stamp), _StereoPair(buf)))
        self._trim_buffers()
        self._synchronize()

    def feed_depth(self, stamp: float, depth: np.ndarray) -> None:
        self._check_frame("depth", depth)
        depth = np.asarray(depth)
        finite = np.isfinite(depth)
        if not finite.all():
            depth = np.where(finite, depth, 0.0)
            self.dropped["nonfinite_depth_px"] += int((~finite).sum())
        self.depth_buffer.append((float(stamp), depth))
        self._trim_buffers()
        self._synchronize()

    def _trim_buffers(self) -> None:
        """Bound buffer growth (the reference used 5000-deep ROS queues,
        `ros_node.cpp:24-31`); oldest entries drop first."""
        for name, buf in (("images", self.image_buffer),
                          ("depths", self.depth_buffer),
                          ("poses", self.pose_buffer)):
            while len(buf) > self.max_buffered:
                buf.popleft()
                self.dropped[name] += 1

    def feed_pose(self, stamp: float, pose: np.ndarray,
                  loop_path: Optional[Sequence[np.ndarray]] = None,
                  loop_edges: Sequence[Tuple[int, int]] = (),
                  is_keyframe: bool = False,
                  reference_index: Optional[int] = None) -> None:
        """Pose/loop ingestion (`orb_results_input`, surfel_map.cpp:205-365).

        pose: 4x4 Twc of the CURRENT frame. loop_path: loop-corrected poses
        of ALL keyframes so far (same raw frame as pose). loop_edges:
        keyframe index pairs. reference_index: this frame's reference
        keyframe (defaults to the newest; a new keyframe references itself).
        """
        pose = np.array(pose, np.float64)
        # failure detection the reference lacks (SURVEY.md §5): a NaN/Inf
        # or non-rigid pose would silently poison the whole pose graph
        # (every relative pose and warp derives from it) — drop it instead
        if pose.shape != (4, 4) or not np.isfinite(pose).all():
            self.dropped["invalid_pose"] += 1
            return
        det = np.linalg.det(pose[:3, :3])
        if abs(det - 1.0) > 0.1:
            self.dropped["invalid_pose"] += 1
            return
        if self._kitti_alignment:
            if self._alignment is None:
                self._alignment = geometry.kitti_alignment(pose)
            pose = self._alignment @ pose
            if loop_path is not None:
                loop_path = [self._alignment @ np.asarray(p, np.float64)
                             for p in loop_path]

        loop_changed = False
        if loop_path is not None and len(self.graph) > 0:
            loop_changed = self.graph.update_loop_path(list(loop_path))
        if loop_changed:
            with self.timer.stage("warp"):
                self._warp_surfels()

        if is_keyframe or len(self.graph) == 0:
            # link the new keyframe to its reference (covariance[1] in the
            # reference schema); default to the newest existing keyframe
            link_to = None
            if len(self.graph) > 0:
                link_to = (reference_index if reference_index is not None
                           else len(self.graph) - 1)
            new_index = self.graph.add_keyframe(pose, stamp, link_to)
            self.local_indices.add(new_index)
            if reference_index is None:
                reference_index = new_index
        if reference_index is None:
            reference_index = len(self.graph) - 1

        # divergence from the reference: edges are recorded AFTER keyframe
        # insertion, so same-message edges naming the new keyframe register
        # immediately (the C++ drops them until they re-arrive next frame,
        # surfel_map.cpp:289-316 running before :318-353)
        self.graph.add_loop_edges(loop_edges)

        ref_pose = self.graph.keyframes[int(reference_index)].cam_pose
        rel = geometry.invert_se3(ref_pose) @ pose
        self.pose_buffer.append((float(stamp), rel, int(reference_index)))
        self._synchronize()

    # ------------------------------------------------------------------
    # sync + fuse (reference: synchronize_msgs, surfel_map.cpp:103-203)
    # ------------------------------------------------------------------
    def _match_front(self, buffer, stamp, name):
        while buffer:
            t = buffer[0][0]
            if t < stamp - self.stamp_tolerance:
                buffer.popleft()
                self.dropped[name] += 1   # pre-pose data, never fused
            elif abs(t - stamp) <= self.stamp_tolerance:
                return buffer[0]
            else:
                return None
        return None

    def _synchronize(self) -> None:
        while self.pose_buffer:
            stamp, rel, ref = self.pose_buffer[0]
            img = self._match_front(self.image_buffer, stamp, "images")
            dep = self._match_front(self.depth_buffer, stamp, "depths")
            if img is None or dep is None:
                return
            fuse_pose = self.graph.keyframes[ref].cam_pose @ rel
            with self.timer.stage("migrate"):
                self._move_add_surfels(ref)
            with self.timer.stage("fuse"):
                self._fuse_frame(img[1], dep[1], fuse_pose, ref)
            self.pose_buffer.popleft()
            self.image_buffer.popleft()
            self.depth_buffer.popleft()

    def _fuse_frame(self, image, depth, pose, ref_index: int) -> None:
        pose_dev = jnp.asarray(np.asarray(pose, np.float32).reshape(4, 4))
        if isinstance(depth, _StereoPair):
            self.bank, stats = self._stereo_fuse(
                self.bank, jnp.asarray(depth.buf), pose_dev,
                jnp.int32(ref_index), jnp.float32(self._stereo_bf))
            self._fuse_epilogue(stats)
            return
        if self.config.compact_upload:
            from ..core.state import compact_frame
            ci, cd = compact_frame(self.config, image, depth)
            self.bank, stats = self._fuse_compact(
                self.bank, jnp.asarray(ci), jnp.asarray(cd), pose_dev,
                jnp.int32(ref_index))
        else:
            pi, pd = pad_frame(self.config, np.asarray(image, np.float32),
                               np.asarray(depth, np.float32))
            frame = FrameInput(
                image=jnp.asarray(pi), depth=jnp.asarray(pd),
                pose=pose_dev, frame_index=jnp.int32(ref_index))
            self.bank, stats = self._fuse(self.bank, frame)
        self._fuse_epilogue(stats)

    def _fuse_epilogue(self, stats) -> None:
        self._stats_dev = stats   # device values; synced on stats frames
        self.frames_fused += 1
        if self.frames_fused % self.config.stats_interval == 0:
            self.sync_stats()
            self._maybe_compact()

    def sync_stats(self) -> Dict[str, int]:
        """Blocking device->host fetch of the latest fuse-step stats."""
        if self._stats_dev:
            self.last_stats = {k: int(v) for k, v in self._stats_dev.items()}
        return self.last_stats

    def _maybe_compact(self) -> None:
        """Repack the bank when dead holes exceed the slack or the tail
        lacks headroom for the frames until the next stats sync."""
        st = self.last_stats
        count = self._bank_count()
        live = st.get("n_live", 0) + st.get("n_new", 0)
        slab = self.config.new_capacity
        margin = (self.config.stats_interval + 1) * slab \
            + self.config.migration_buffer
        need_room = count > self._bank_capacity() - margin
        if (count - live > self.config.compaction_slack) or need_room \
                or st.get("n_dropped", 0) > 0:
            self._do_compact()

    # ------------------------------------------------------------------
    # device-bank seams (overridden by the sharded driver)
    # ------------------------------------------------------------------
    def _bank_count(self) -> int:
        return int(self.bank.count)

    def _bank_capacity(self) -> int:
        return self.bank.capacity

    def _do_compact(self) -> None:
        self.bank = self._compact(self.bank)

    def _extract_chunk(self, ids: np.ndarray):
        """One removed-pose extraction pass; returns (host fields, n)."""
        self.bank, buf, n = migration.extract_by_pose(
            self.bank, jnp.asarray(ids), self.config.migration_buffer)
        n = int(n)
        if n == 0:
            return {}, 0
        # transfer the full static-shape buffer and slice on host: a
        # device-side v[:n] would compile a fresh slice executable per n
        return {k: np.asarray(v)[:n] for k, v in buf.items()}, n

    def _append_hostslab(self, padded: dict, n: int) -> None:
        self.bank, _ = self._append(self.bank, padded, jnp.int32(n))

    def _apply_active_warp(self, warp: np.ndarray) -> None:
        self.bank = self._warp_active(self.bank,
                                      jnp.asarray(warp, jnp.float32))

    # ------------------------------------------------------------------
    # active window migration (reference: move_add_surfels)
    # ------------------------------------------------------------------
    def _move_add_surfels(self, ref_index: int) -> None:
        to_add, to_remove = self.graph.add_remove_sets(
            ref_index, self.config.drift_free_poses, self.local_indices)

        if to_remove:
            buf_size = self.config.migration_buffer
            remaining = list(to_remove)
            while remaining:
                chunk = remaining[:migration.MAX_REMOVE_POSES]
                ids = np.full(migration.MAX_REMOVE_POSES, -1, np.int32)
                ids[:len(chunk)] = chunk
                while True:
                    host, n = self._extract_chunk(ids)
                    if n == 0:
                        break
                    for pose_id in chunk:
                        sel = host["last_update"] == pose_id
                        if sel.any():
                            self.pool.attach(
                                pose_id, {k: v[sel] for k, v in host.items()},
                                int(sel.sum()))
                    if n < buf_size:
                        break
                remaining = remaining[migration.MAX_REMOVE_POSES:]
            self.local_indices -= set(to_remove)

        if to_add:
            self.local_indices |= set(to_add)
            slab = self.pool.detach(to_add)
            m = len(slab["color"])
            buf_size = self.config.migration_buffer
            if self._bank_count() > self._bank_capacity() - buf_size:
                self._do_compact()
            for off in range(0, max(m, 1), buf_size):
                part = {k: v[off:off + buf_size] for k, v in slab.items()}
                n = len(part["color"])
                if n == 0:
                    break
                padded = {}
                for k in FIELDS:
                    arr = np.zeros((buf_size,) + part[k].shape[1:],
                                   part[k].dtype)
                    arr[:n] = part[k]
                    padded[k] = arr
                self._append_hostslab(padded, n)

    # ------------------------------------------------------------------
    # loop-closure warp (reference: warp_surfels)
    # ------------------------------------------------------------------
    def _warp_surfels(self) -> None:
        warps, moved = self.graph.pose_warps()
        # active surfels: single warp from the FIRST local pose
        # (surfel_map.cpp:808-813)
        if self.local_indices:
            first = min(self.local_indices)
            if first < len(moved) and moved[first]:
                self._apply_active_warp(warps[first])
        self.pool.warp(warps, moved, self._warp_pool)
        self.graph.commit_loop_poses()

    # ------------------------------------------------------------------
    # map readout (reference: publish_* / save_*)
    # ------------------------------------------------------------------
    def active_surfels(self, min_updates: Optional[int] = None) -> dict:
        """Host copy of live active surfels (update_times >= min_updates,
        default the config's stable threshold — matches
        publish_active_pointcloud / save_cloud gating)."""
        if min_updates is None:
            min_updates = self.config.stable_update_times
        n = int(self.bank.count)
        out = {}
        ut = np.asarray(self.bank.update_times)[:n]
        sel = ut >= min_updates
        for name, arr in self.bank.field_arrays():
            out[name] = np.asarray(arr)[:n][sel]
        return out

    def inactive_surfels(self) -> dict:
        return self.pool.all_surfels()

    def map_surfels(self) -> dict:
        """Stable active + all inactive surfels (save_cloud semantics,
        `surfel_map.cpp:1153-1174`)."""
        act = self.active_surfels()
        ina = self.inactive_surfels()
        return {k: np.concatenate([act[k], ina[k]]) for k in FIELDS}

    def mesh_surfels(self) -> dict:
        """Surfels eligible for mesh export: every inactive (attached)
        surfel + stable active ones (save_mesh, `surfel_map.cpp:1219-1240`)."""
        return self.map_surfels()

    def save_cloud(self, path: str, binary: bool = True) -> int:
        """PCD export of the stable map (`save_cloud`, surfel_map.cpp:1153)."""
        from ..io import export
        return export.save_cloud_pcd(path, self.map_surfels(), binary=binary)

    def save_mesh(self, path: str, binary: bool = False) -> int:
        """Hexagon-tessellated PLY export (`save_mesh`, surfel_map.cpp:1219)."""
        from ..io import export
        return export.save_mesh_ply(path, self.mesh_surfels(), binary=binary)

    def save_trajectory(self, path: str, fmt: str = "kitti") -> int:
        """Loop-corrected keyframe trajectory ("kitti" 3x4 rows or "tum"
        stamped quaternions) for external eval tooling — the file form of
        the reference's continuously published /loop_path
        (`ros_stereo.cc:214-257`)."""
        from ..io import export
        poses = [k.loop_pose for k in self.graph.keyframes]
        stamps = [k.stamp for k in self.graph.keyframes]
        if fmt == "kitti":
            return export.save_trajectory_kitti(path, poses, stamps)
        if fmt == "tum":
            return export.save_trajectory_tum(path, poses, stamps)
        raise ValueError(f"unknown trajectory format {fmt!r}")

    def raw_pointcloud(self, depth: np.ndarray, pose: np.ndarray,
                       image: Optional[np.ndarray] = None) -> dict:
        """Back-projected world-frame cloud of one raw depth frame — the
        reference's `raw_pointcloud` debug topic (`surfel_map.cpp:56-63`,
        publish of the unfused input).  Host numpy; not on the hot path."""
        cam = self.config.camera
        depth = np.asarray(depth, np.float32)
        h, w = depth.shape
        vs, us = np.mgrid[0:h, 0:w]
        valid = depth > 0.01
        z = depth[valid]
        x = (us[valid] - cam.cx) / cam.fx * z
        y = (vs[valid] - cam.cy) / cam.fy * z
        pts = np.stack([x, y, z], axis=1)
        T = np.asarray(pose, np.float64)
        world = pts @ T[:3, :3].T + T[:3, 3]
        out = {"position": world.astype(np.float32)}
        if image is not None:
            out["color"] = np.asarray(image, np.float32)[valid]
        return out

    def fusion_path(self) -> List[np.ndarray]:
        """Loop-corrected poses of every keyframe (`fusion_loop_path`)."""
        return [kf.loop_pose.copy() for kf in self.graph.keyframes]

    def driftfree_path(self) -> List[np.ndarray]:
        """Poses of the current active (drift-free) window
        (`driftfree_loop_path`)."""
        return [self.graph.keyframes[i].loop_pose.copy()
                for i in sorted(self.local_indices)
                if i < len(self.graph.keyframes)]

    def loop_edges(self) -> List[Tuple[int, int]]:
        """Deduplicated loop/covisibility edges (`loop_marker` content)."""
        return [(i, j) for i, kf in enumerate(self.graph.keyframes)
                for j in kf.linked if j > i]

    def metrics(self) -> Dict[str, float]:
        """Observability snapshot: throughput counters, drop counters,
        buffer depths, stage means (ms), memory (the reference's printf
        telemetry, `surfel_map.cpp:895-904` + timing prints, as data)."""
        out: Dict[str, float] = {
            "frames_fused": self.frames_fused,
            "keyframes": len(self.graph),
            "active_count": self._bank_count(),
            "inactive_count": len(self.pool),
            "buffered_images": len(self.image_buffer),
            "buffered_depths": len(self.depth_buffer),
            "buffered_poses": len(self.pose_buffer),
            "memory_kb": self.memory_usage_kb(),
        }
        for k, v in self.dropped.items():
            out[f"dropped_{k}"] = v
        for k, v in self.timer.means_ms().items():
            out[f"stage_ms_{k}"] = v
        return out

    def memory_usage_kb(self) -> float:
        """`calculate_memory_usage` (surfel_map.cpp:895-904) equivalent."""
        bank_bytes = sum(np.asarray(a).nbytes
                         for _, a in self.bank.field_arrays())
        return (bank_bytes + self.pool.memory_bytes()) / 1024.0

    # ------------------------------------------------------------------
    # checkpoint/resume (new capability; the reference has none — SURVEY §5)
    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        n = int(self.bank.count)
        data = {f"bank_{k}": np.asarray(v)[:n]
                for k, v in self.bank.field_arrays()}
        data["bank_count"] = np.int64(n)
        g = self.graph
        data["kf_cam"] = np.stack([k.cam_pose for k in g.keyframes]) \
            if len(g) else np.zeros((0, 4, 4))
        data["kf_loop"] = np.stack([k.loop_pose for k in g.keyframes]) \
            if len(g) else np.zeros((0, 4, 4))
        data["kf_stamp"] = np.array([k.stamp for k in g.keyframes])
        edges = [(i, j) for i, k in enumerate(g.keyframes) for j in k.linked]
        data["kf_edges"] = np.array(edges, np.int64).reshape(-1, 2)
        data["local_indices"] = np.array(sorted(self.local_indices), np.int64)
        data["pool_keys"] = np.array(sorted(self.pool.slabs), np.int64)
        for k in FIELDS:
            slabs = [self.pool.slabs[i][k] for i in sorted(self.pool.slabs)]
            data[f"pool_{k}"] = (np.concatenate(slabs) if slabs else
                                 np.zeros((0, 3) if k in ("position", "normal")
                                          else (0,), np.float32))
        data["pool_counts"] = np.array(
            [len(self.pool.slabs[i]["color"])
             for i in sorted(self.pool.slabs)], np.int64)
        data["frames_fused"] = np.int64(self.frames_fused)
        if self._alignment is not None:
            data["alignment"] = self._alignment
        np.savez_compressed(path, **data)

    def load_checkpoint(self, path: str) -> None:
        z = np.load(path, allow_pickle=False)
        n = int(z["bank_count"])
        bank = SurfelBank.empty(self.config.surfel_capacity)
        upd = {}
        for k, arr in bank.field_arrays():
            host = np.array(arr)  # writable host copy
            host[:n] = z[f"bank_{k}"]
            upd[k] = jnp.asarray(host)
        self.bank = bank.replace(count=jnp.int32(n), **upd)
        self.graph = PoseGraph()
        for cam, loop, stamp in zip(z["kf_cam"], z["kf_loop"], z["kf_stamp"]):
            idx = self.graph.add_keyframe(cam, float(stamp))
            self.graph.keyframes[idx].loop_pose = np.array(loop)
        for i, j in z["kf_edges"]:
            kf = self.graph.keyframes[int(i)]
            if int(j) not in kf.linked:
                kf.linked.append(int(j))
        self.local_indices = set(int(i) for i in z["local_indices"])
        self.pool = InactivePool()
        off = 0
        for key, cnt in zip(z["pool_keys"], z["pool_counts"]):
            slab = {k: z[f"pool_{k}"][off:off + int(cnt)].copy()
                    for k in FIELDS}
            self.pool.slabs[int(key)] = slab
            off += int(cnt)
        self.frames_fused = int(z["frames_fused"])
        if "alignment" in z:
            self._alignment = np.array(z["alignment"])

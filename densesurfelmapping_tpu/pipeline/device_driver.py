"""DeviceResidentMapping: the mapping driver with ZERO steady-state
device->host traffic.

The base `SurfelMapping` reproduces the reference's architecture: inactive
surfels migrate to a host pool (`move_add_surfels`,
`surfel_map.cpp:1456-1595`) — a CPU-ism that forces blocking device->host
reads every migration event.  On the TPU that design is strictly worse:
HBM comfortably holds every surfel a long sequence produces (10^6 surfels
= 36 MB), and a single readback permanently drops the accelerator client
out of its async fast path (measured 1.25 -> 29 ms/frame; CLAUDE.md).

This driver therefore keeps ALL surfels in the device bank and realizes
the active/inactive lifecycle as a (max_keyframes,) boolean window mask
shipped host->device per frame (4 KB, asynchronous):

* fuse gating — rows owned by out-of-window keyframes are frozen: never
  fused, never staleness/occlusion-killed (`ops/fusion.py` pose_mask);
* "migration" — updating the mask; reactivation on loop revisit is free;
* loop warp — one whole-bank pass: active rows take the first local
  pose's warp, frozen rows their own keyframe's warp
  (`ops/warp.warp_bank_by_pose`);
* compaction — fixed schedule (config.compact_interval), no reads;
* stats — never fetched in-loop; `sync_stats()` on demand only.

Semantics match `SurfelMapping` exactly (equivalence-tested); readouts
(export/eval/checkpoint) transfer the bank once, off the hot path.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import SurfelMapConfig
from ..ops import warp as warp_ops
from .driver import SurfelMapping
from .inactive_pool import FIELDS
from .pose_graph import PoseGraph


class DeviceResidentMapping(SurfelMapping):
    def __init__(self, config: SurfelMapConfig,
                 kitti_alignment: bool = False,
                 pipelined: bool = False):
        super().__init__(config, kitti_alignment)
        self._build_window_jits()
        self._window_np = np.zeros(config.max_keyframes, bool)
        self._first_local = 0
        self._host_rows: Optional[dict] = None   # readout cache
        # pipelined feed: frame i's host pack (native encoder, GIL-free
        # ctypes call) runs on a worker thread WHILE the main thread is
        # blocked in frame i-1's dispatch/H2D relay round-trips — real
        # parallelism even on a 1-core host, because the dispatch wait is
        # network I/O, not CPU.  Dispatch lags the feed by one frame;
        # every bank consumer flushes first (see _flush_pending callers),
        # so observable semantics are identical (equivalence-tested).
        # BUFFER CONTRACT: the driver BORROWS the fed image/depth arrays
        # until the next driver call (the worker packs them after feed
        # returns) — callers must allocate fresh frames, never mutate a
        # fed buffer in place.  This extends the repo-wide no-mutation
        # rule (compact_frame's zero-copy upload aliasing, CLAUDE.md)
        # from upload-lifetime to next-call-lifetime; every io/ loader
        # already complies.
        self._pipelined = bool(pipelined)
        self._pack_pool = (ThreadPoolExecutor(max_workers=1)
                           if pipelined else None)
        self._pending = None   # future of the packed one-buffer payload

    def _build_window_jits(self) -> None:
        """(Re)build the jitted programs whose signatures depend on
        config.max_keyframes; called again on keyframe-capacity growth."""
        from .fuse_step import jitted_fuse_frame_onebuf
        self._fuse_onebuf = jitted_fuse_frame_onebuf(self.config)
        if self._stereo_cfg is not None:
            self._build_stereo_jit()

    def _build_stereo_jit(self) -> None:
        from .fuse_step import jitted_fuse_frame_stereo_onebuf
        self._stereo_fuse = jitted_fuse_frame_stereo_onebuf(
            self.config, self._stereo_cfg, self._stereo_filter)

    def _ensure_keyframe_capacity(self) -> None:
        """Grow max_keyframes to the next power of two when the pose graph
        outgrows the window-mask length, instead of crashing.

        The mask is the ONLY device-side object shaped by max_keyframes
        (the bank stores per-row keyframe indices, unbounded), so growth is
        a config replace + re-jit — a rare, persistent-cache-amortized
        event.  Mirrors the unbounded pose DB of surfel_map.h:36-46."""
        import dataclasses

        if len(self.graph) <= self.config.max_keyframes:
            return
        # a pending pipelined frame holds an aux packed at the OLD
        # max_keyframes; it must dispatch through the old jit before the
        # capacity (and jit signatures) change
        self._flush_pending()
        new_p = self.config.max_keyframes
        while new_p < len(self.graph):
            new_p *= 2
        self.config = dataclasses.replace(self.config, max_keyframes=new_p)
        # grow the live mask too: a loop warp can arrive before the next
        # _move_add_surfels rebuilds it at the new length
        w = np.zeros(new_p, bool)
        w[:len(self._window_np)] = self._window_np
        self._window_np = w
        self._build_window_jits()

    # ------------------------------------------------------------------
    # migration == window-mask update (no device work at all)
    # ------------------------------------------------------------------
    def _move_add_surfels(self, ref_index: int) -> None:
        with self.timer.stage("bfs"):
            window = self.graph.driftfree_window(
                ref_index, self.config.drift_free_poses)
        self._ensure_keyframe_capacity()
        self.local_indices = set(window)
        # fresh allocation every frame: the previous mask may still be
        # aliased by an in-flight async dispatch (jnp.asarray of host
        # numpy can be zero-copy); in-place mutation would race it
        mask = np.zeros(self.config.max_keyframes, bool)
        mask[list(window)] = True
        self._window_np = mask
        self._first_local = min(window) if window else 0

    # ------------------------------------------------------------------
    # fuse with window gating; fixed-schedule compaction; no stat reads
    # ------------------------------------------------------------------
    def _fuse_frame(self, image, depth, pose, ref_index: int) -> None:
        from ..core.state import (pack_aux, pack_frame_with_aux,
                                  pack_stereo_with_aux)
        from .driver import _StereoPair
        # the WHOLE per-frame payload (frame bytes + pose/index/bf/window
        # aux) rides in ONE buffer = ONE H2D put — each put is a relay
        # round in dispatch-bound regimes
        aux = pack_aux(pose, ref_index, self._window_np,
                       bf=self._stereo_bf or 0.0)
        if isinstance(depth, _StereoPair):
            self._flush_pending()   # dispatch order = feed order
            with self.timer.stage("pack"):
                buf = pack_stereo_with_aux(self.config, depth.buf, aux)
            with self.timer.stage("dispatch"):
                self.bank, stats = self._stereo_fuse(self.bank,
                                                     jnp.asarray(buf))
            self._dispatched(stats)
            return
        if self._pipelined:
            # submit THIS frame's pack to the worker, then dispatch the
            # PREVIOUS frame: the pack overlaps the dispatch's relay waits
            fut = self._pack_pool.submit(pack_frame_with_aux, self.config,
                                         image, depth, aux)
            self._flush_pending()
            self._pending = fut
            return
        # sub-stages of "fuse" so the host slice of the frame budget is
        # attributable (pack = native encoder; dispatch = async enqueue
        # incl. the h2d of the packed buffer)
        with self.timer.stage("pack"):
            buf = pack_frame_with_aux(self.config, image, depth, aux)
        with self.timer.stage("dispatch"):
            self.bank, stats = self._fuse_onebuf(self.bank,
                                                 jnp.asarray(buf))
        self._dispatched(stats)

    def _dispatched(self, stats) -> None:
        self._stats_dev = stats
        self._host_rows = None
        self.frames_fused += 1
        if self.frames_fused % self.config.compact_interval == 0:
            self._do_compact()

    def _flush_pending(self) -> None:
        """Dispatch the one in-flight pipelined frame, if any.  Called by
        every consumer of `self.bank` (warp, readouts, checkpoint, stats)
        and before any event that must be ordered after the frame."""
        if self._pending is None:
            return
        fut = self._pending
        self._pending = None
        with self.timer.stage("pack"):
            buf = fut.result()
        with self.timer.stage("dispatch"):
            self.bank, stats = self._fuse_onebuf(self.bank,
                                                 jnp.asarray(buf))
        self._dispatched(stats)

    def flush(self) -> None:
        """Public barrier: complete any pipelined in-flight frame."""
        self._flush_pending()

    def sync_stats(self):
        self._flush_pending()
        return super().sync_stats()

    # ------------------------------------------------------------------
    # loop warp: one whole-bank device pass
    # ------------------------------------------------------------------
    def _warp_surfels(self) -> None:
        self._flush_pending()   # warp must see every fed frame fused
        # poses can run ahead of fused frames (the reference publishes
        # loop_path every frame), so capacity may need to grow HERE, not
        # just on the fuse path
        self._ensure_keyframe_capacity()
        warps, moved = self.graph.pose_warps()
        P = self.config.max_keyframes
        wstack = np.tile(np.eye(4, dtype=np.float32), (P, 1, 1))
        mstack = np.zeros(P, bool)
        n = len(warps)
        wstack[:n] = warps.astype(np.float32)
        mstack[:n] = moved
        self.bank = warp_ops.warp_bank_by_pose(
            self.bank, jnp.asarray(wstack), jnp.asarray(mstack),
            jnp.asarray(self._window_np), jnp.int32(self._first_local))
        self._host_rows = None
        self.graph.commit_loop_poses()

    # ------------------------------------------------------------------
    # readouts: one bank transfer, split by the window mask
    # ------------------------------------------------------------------
    def _rows_host(self) -> dict:
        self._flush_pending()
        if self._host_rows is None:
            arrs = {k: np.asarray(getattr(self.bank, k)) for k in FIELDS}
            n = int(np.asarray(self.bank.count))
            self._host_rows = {k: v[:n] for k, v in arrs.items()}
        return self._host_rows

    def _is_active_row(self, rows: dict) -> np.ndarray:
        lu = rows["last_update"]
        ok = (lu >= 0) & (lu < self.config.max_keyframes)
        return ok & self._window_np[np.clip(lu, 0,
                                            self.config.max_keyframes - 1)]

    def active_surfels(self, min_updates=None) -> dict:
        if min_updates is None:
            min_updates = self.config.stable_update_times
        rows = self._rows_host()
        sel = (rows["update_times"] >= min_updates) \
            & self._is_active_row(rows)
        return {k: v[sel] for k, v in rows.items()}

    def inactive_surfels(self) -> dict:
        rows = self._rows_host()
        sel = (rows["update_times"] > 0) & ~self._is_active_row(rows)
        return {k: v[sel] for k, v in rows.items()}

    def map_surfels(self) -> dict:
        act = self.active_surfels()
        ina = self.inactive_surfels()
        return {k: np.concatenate([act[k], ina[k]]) for k in FIELDS}

    def memory_usage_kb(self) -> float:
        return sum(np.asarray(getattr(self.bank, k)).nbytes
                   for k in FIELDS) / 1024.0

    def metrics(self) -> Dict[str, float]:
        self._flush_pending()
        out = super().metrics()
        rows = self._rows_host()
        live = rows["update_times"] > 0
        active = self._is_active_row(rows) & live
        out["active_count"] = int(active.sum())
        out["inactive_count"] = int((live & ~active).sum())
        return out

    # ------------------------------------------------------------------
    # checkpoint/resume: bank + graph (no pool state)
    # ------------------------------------------------------------------
    def save_checkpoint(self, path: str) -> None:
        rows = self._rows_host()
        data = {f"bank_{k}": v for k, v in rows.items()}
        data["bank_count"] = np.int64(len(rows["color"]))
        g = self.graph
        data["kf_cam"] = np.stack([k.cam_pose for k in g.keyframes]) \
            if len(g) else np.zeros((0, 4, 4))
        data["kf_loop"] = np.stack([k.loop_pose for k in g.keyframes]) \
            if len(g) else np.zeros((0, 4, 4))
        data["kf_stamp"] = np.array([k.stamp for k in g.keyframes])
        edges = [(i, j) for i, k in enumerate(g.keyframes) for j in k.linked]
        data["kf_edges"] = np.array(edges, np.int64).reshape(-1, 2)
        data["local_indices"] = np.array(sorted(self.local_indices), np.int64)
        data["frames_fused"] = np.int64(self.frames_fused)
        if self._alignment is not None:
            data["alignment"] = self._alignment
        np.savez_compressed(path, **data)

    def load_checkpoint(self, path: str) -> None:
        from ..core.state import SurfelBank
        self._pending = None   # restored state supersedes in-flight work
        z = np.load(path, allow_pickle=False)
        n = int(z["bank_count"])
        bank = SurfelBank.empty(self.config.surfel_capacity)
        upd = {}
        for k, arr in bank.field_arrays():
            host = np.array(arr)
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
        self._ensure_keyframe_capacity()
        mask = np.zeros(self.config.max_keyframes, bool)
        mask[sorted(self.local_indices)] = True
        self._window_np = mask
        self._first_local = min(self.local_indices) \
            if self.local_indices else 0
        self.frames_fused = int(z["frames_fused"])
        self._host_rows = None
        if "alignment" in z:
            self._alignment = np.array(z["alignment"])


class ShardedDeviceResidentMapping(DeviceResidentMapping):
    """DeviceResidentMapping over a device mesh: the window-mask lifecycle
    (zero steady-state readbacks) with the bank row-sharded across the
    mesh's "surfel" axis — the best-practice driver at pod scale.

    Frames and masks replicate over "surfel"; fuse, loop warp, and
    compaction run as shard_map programs (`parallel/sharding.py`).
    frame_sharded=True additionally column-shards the superpixel/plane-fit
    stage over "surfel" (`parallel/frame_sharding.py` redundant-halo
    slabs) so multi-chip scales single-stream frame rate too, not just
    bank capacity — outputs are pinned identical either way."""

    def __init__(self, config: SurfelMapConfig, mesh,
                 kitti_alignment: bool = False,
                 frame_sharded: bool = False):
        from ..parallel import sharding
        assert mesh.shape["data"] == 1, "one session per data group"
        self.mesh = mesh
        self.n_shards = mesh.shape["surfel"]
        self.frame_sharded = bool(frame_sharded)
        super().__init__(config, kitti_alignment)
        self.bank = sharding.replicate_banks(mesh, config, n_streams=1)
        self._shard_frames = sharding.shard_frames

    def _build_window_jits(self) -> None:
        super()._build_window_jits()
        from ..parallel import sharding
        if self.frame_sharded:
            from ..parallel import frame_sharding
            self._sfuse_wp = \
                frame_sharding.sharded_fuse_frame_framestage_windowed_packed(
                    self.config, self.mesh)
        else:
            self._sfuse_wp = sharding.sharded_fuse_frame_windowed_packed(
                self.config, self.mesh)
        self._scompact = sharding.sharded_compact(self.config, self.mesh)
        self._swarp = sharding.sharded_warp_by_pose(self.config, self.mesh)

    def _build_stereo_jit(self) -> None:
        from ..parallel import sharding
        self._stereo_fuse = \
            sharding.sharded_fuse_frame_stereo_windowed_packed(
                self.config, self._stereo_cfg, self._stereo_filter,
                self.mesh)

    def _fuse_frame(self, image, depth, pose, ref_index: int) -> None:
        # same compact single-buffer encoding as the dense driver: sharded
        # and single-device runs see bit-identical frames, and each frame
        # rides to the mesh as one u8 buffer (2.7x less H2D than 2x f32)
        from ..core.state import pack_frame
        from .driver import _StereoPair
        pose_dev = jnp.asarray(np.asarray(pose, np.float32).reshape(1, 4, 4))
        refs = jnp.full((1,), ref_index, jnp.int32)
        masks = jnp.asarray(self._window_np[None])
        if isinstance(depth, _StereoPair):
            self.bank, stats = self._stereo_fuse(
                self.bank, jnp.asarray(depth.buf[None]), pose_dev, refs,
                jnp.full((1,), self._stereo_bf, jnp.float32), masks)
        else:
            buf = pack_frame(self.config, image, depth)
            self.bank, stats = self._sfuse_wp(
                self.bank, jnp.asarray(buf[None]), pose_dev, refs, masks)
        self._stats_dev = stats
        self._host_rows = None
        self.frames_fused += 1
        if self.frames_fused % self.config.compact_interval == 0:
            self._do_compact()

    def _do_compact(self) -> None:
        self.bank = self._scompact(self.bank)

    def _bank_count(self) -> int:
        return int(np.asarray(self.bank.count).sum())

    def _bank_capacity(self) -> int:
        return self.bank.position.shape[1]

    def _warp_surfels(self) -> None:
        self._ensure_keyframe_capacity()
        warps, moved = self.graph.pose_warps()
        P = self.config.max_keyframes
        wstack = np.tile(np.eye(4, dtype=np.float32), (1, P, 1, 1))
        mstack = np.zeros((1, P), bool)
        n = len(warps)
        wstack[0, :n] = warps.astype(np.float32)
        mstack[0, :n] = moved
        self.bank = self._swarp(
            self.bank, jnp.asarray(wstack), jnp.asarray(mstack),
            jnp.asarray(self._window_np[None]),
            jnp.full((1,), self._first_local, jnp.int32))
        self._host_rows = None
        self.graph.commit_loop_poses()

    def _rows_host(self) -> dict:
        if self._host_rows is None:
            from .sharded_driver import gather_sharded_bank
            self._host_rows = gather_sharded_bank(self.bank, self.n_shards)
        return self._host_rows

    def memory_usage_kb(self) -> float:
        return sum(np.asarray(getattr(self.bank, k)).nbytes
                   for k in FIELDS) / 1024.0

    # save_checkpoint is inherited: it reads rows via _rows_host (gathered
    # from the mesh). load_checkpoint re-distributes them round-robin.
    def load_checkpoint(self, path: str) -> None:
        from .sharded_driver import scatter_rows_to_sharded
        super().load_checkpoint(path)      # restores a dense bank + graph
        n = int(np.asarray(self.bank.count))
        rows = {k: np.asarray(getattr(self.bank, k))[:n] for k in FIELDS}
        self.bank = scatter_rows_to_sharded(self.config, self.mesh, rows)
        self._host_rows = None

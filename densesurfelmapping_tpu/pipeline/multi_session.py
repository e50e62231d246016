"""MultiSessionMapping: B concurrent mapping sessions on one chip.

Serving mode the reference cannot express (one ROS process = one session,
`ros_node.cpp:13-53`): B independent camera streams share one device
dispatch per round — banks carry a leading stream axis, the windowed fuse
step is vmapped, and every session keeps its own host-side pose graph, sync
buffers, and active-window mask.  Uses the zero-readback window-mask
lifecycle of `DeviceResidentMapping` (see pipeline/device_driver.py).

Serving lifecycle:

* dispatch — frames queue per session; a batched step fires when every
  session has a synchronized frame (`step_ready`), on `flush()` (absent
  sessions get a zero-depth no-op pad), or via `pump()`, which applies the
  flush-timeout policy: a ready frame older than `flush_timeout` seconds
  forces a padded step so one stalled stream cannot starve the fleet.
* capacity — banks compact on the fixed `config.compact_interval` schedule
  (batched jit(vmap(compact_bank)), no readbacks), and surfels dropped on a
  full tail are accumulated on device and surfaced via `session_metrics()`
  together with a saturation ratio, so operators can detect overflow.
* elasticity — `add_session()` / `remove_session(k)` re-batch the banks at
  runtime (shape change = one cached re-jit); removal returns the final
  map rows.
* persistence — per-session `save_cloud` / `save_mesh` / `save_checkpoint`
  / `load_checkpoint` match the solo drivers' export semantics
  (`save_cloud`/`save_mesh`, surfel_map.cpp:1153-1280).
* stereo serving — `enable_stereo(bf)` switches the WHOLE fleet to raw
  stereo-pair input: the batched step runs the on-device front-end of
  `fuse_step.fuse_frame_stereo_onebuf` per stream (padded sessions ride
  an all-zero pair, which the textureless gate makes a no-op).
* uploads — a round's entire payload (B frames + B pose/ref/window aux
  blocks) is ONE (B, frame_bytes + aux_bytes) u8 put per round; each
  extra put is a relay round in dispatch-bound regimes.

Measured: 4 sessions aggregate 802 frames/s on one v5e vs 624 fps for one.
"""

from __future__ import annotations

import collections
import dataclasses
import functools
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SurfelMapConfig
from ..core import geometry
from ..core.state import pack_frame
from ..ops import warp as warp_ops
from ..ops.fusion import compact_bank
from ..parallel import multistream


def _pack_batch(cfg, to_pack, rows) -> None:
    """Encode every ready stream's frame straight into its row view of the
    batched upload buffer (`dsm_pack_frames_ptrs`: zero stacking copies;
    one C++ thread per frame, which also overlaps on multi-core hosts —
    the serialized per-stream pack was the dominant host slice of the
    multi-session round on this 1-core container).  Falls back to
    per-frame packing when native support or f32 dtypes are missing."""
    from ..native import loader as native
    imgs = [np.asarray(i) for _, i, _ in to_pack]
    deps = [np.asarray(d) for _, _, d in to_pack]
    if (all(i.dtype == np.float32 for i in imgs)
            and all(d.dtype == np.float32 for d in deps)
            and native.available()
            and native.pack_frames_into(imgs, deps, rows)):
        return
    for (_, i, d), r in zip(to_pack, rows):
        r[:] = pack_frame(cfg, i, d)
from .fuse_step import fuse_frame_onebuf, fuse_frame_stereo_onebuf
from .inactive_pool import FIELDS
from .pose_graph import PoseGraph


@functools.lru_cache(maxsize=4)
def _batched_onebuf_step(config: SurfelMapConfig):
    """vmap of the one-payload fuse step: a whole round (B frames + B aux
    blocks) is ONE H2D put + one dispatch — was four puts/round."""
    return jax.jit(
        jax.vmap(functools.partial(fuse_frame_onebuf, config)),
        donate_argnums=(0,))


@functools.lru_cache(maxsize=4)
def _batched_stereo_onebuf_step(config: SurfelMapConfig, stereo_config,
                                filter_depth: bool):
    return jax.jit(
        jax.vmap(functools.partial(fuse_frame_stereo_onebuf,
                                   config, stereo_config, filter_depth)),
        donate_argnums=(0,))


@functools.lru_cache(maxsize=4)
def _batched_warp(config: SurfelMapConfig):
    del config
    return jax.jit(jax.vmap(warp_ops.warp_bank_by_pose),
                   donate_argnums=(0,))


@functools.lru_cache(maxsize=1)
def _batched_compact():
    return jax.jit(jax.vmap(compact_bank), donate_argnums=(0,))


@functools.lru_cache(maxsize=1)
def _accumulate():
    return jax.jit(lambda acc, x: acc + x.astype(acc.dtype))


class _Session:
    """Host state of one stream (pose graph, sync buffers, window mask)."""

    def __init__(self, config: SurfelMapConfig):
        self.graph = PoseGraph()
        self.image_buffer = collections.deque()
        self.depth_buffer = collections.deque()
        self.pose_buffer = collections.deque()
        self.window = np.zeros(config.max_keyframes, bool)
        self.first_local = 0
        self.last_ref = 0
        self.frames_fused = 0
        self.dropped = collections.Counter()
        self.pending_warp: Optional[Tuple[np.ndarray, np.ndarray]] = None

    def grow_window(self, new_p: int) -> None:
        w = np.zeros(new_p, bool)
        w[:len(self.window)] = self.window
        self.window = w


class MultiSessionMapping:
    def __init__(self, config: SurfelMapConfig, n_streams: int,
                 flush_timeout: float = 0.1, pipelined: bool = False):
        self.config = config
        self.n_streams = n_streams
        self.flush_timeout = float(flush_timeout)
        self.sessions = [_Session(config) for _ in range(n_streams)]
        self.banks = multistream.make_banks(config, n_streams)
        self._step = _batched_onebuf_step(config)
        self._warp = _batched_warp(config)
        self._drop_accum = jnp.zeros((n_streams,), jnp.int32)
        self.stamp_tolerance = 1e-6
        self.rounds = 0
        from ..utils.timing import StageTimer
        self.timer = StageTimer()   # prep / upload / dispatch per round
        # pipelined rounds: the upload+dispatch of round r runs on a worker
        # thread while the main thread preps round r+1 (feeds, pose graphs,
        # windows, batched pack) — the B-stream serialized host prep was
        # the measured multi-session bottleneck on 1-core hosts (BASELINE).
        # One-round lag; every bank consumer calls _flush_round first, so
        # observable state is identical (tests pin equivalence).  Only the
        # worker touches the device during a round's flight: the main
        # thread waits on the future before any other device call.
        self._pipelined = bool(pipelined)
        self._dispatch_pool = (ThreadPoolExecutor(max_workers=1)
                               if pipelined else None)
        self._banks_fut = None

        # fleet-wide on-device stereo front-end (enable_stereo/feed_stereo)
        self._stereo_cfg = None
        self._stereo_filter = True
        self._stereo_bf: Optional[float] = None
        self._stereo_step = None

    # ------------------------------------------------------------------
    # per-session feeds (same schema as SurfelMapping)
    # ------------------------------------------------------------------
    def feed_image(self, stream: int, stamp: float, image) -> None:
        self.sessions[stream].image_buffer.append(
            (float(stamp), image, time.monotonic()))

    def feed_depth(self, stream: int, stamp: float, depth) -> None:
        if self._stereo_cfg is not None:
            raise RuntimeError("fleet is in stereo mode; use feed_stereo")
        self.sessions[stream].depth_buffer.append(
            (float(stamp), depth, time.monotonic()))

    def enable_stereo(self, bf: float, stereo_config=None,
                      filter_depth: bool = True) -> None:
        """Switch the WHOLE fleet's depth source to the on-device stereo
        front-end (one batched program per round covers every stream; mixed
        fleets would need two dispatches, defeating the batching).  bf =
        fx * baseline, shared — streams already share the camera config."""
        from ..models.stereo import StereoConfig

        self._stereo_cfg = stereo_config or StereoConfig()
        self._stereo_bf = float(bf)
        self._stereo_filter = bool(filter_depth)
        self._stereo_step = _batched_stereo_onebuf_step(
            self.config, self._stereo_cfg, self._stereo_filter)

    def feed_stereo(self, stream: int, stamp: float, left, right) -> None:
        """Rectified pair for one stream; the left image is the fuse
        intensity.  Requires enable_stereo()."""
        if self._stereo_step is None:
            raise RuntimeError("feed_stereo before enable_stereo(bf=...)")
        from ..core.state import pack_stereo_pair

        buf = pack_stereo_pair(self.config, left, right)
        s = self.sessions[stream]
        now = time.monotonic()
        s.image_buffer.append((float(stamp), np.asarray(left), now))
        s.depth_buffer.append((float(stamp), buf, now))

    def feed_pose(self, stream: int, stamp: float, pose,
                  loop_path=None, loop_edges: Sequence = (),
                  is_keyframe: bool = False,
                  reference_index: Optional[int] = None) -> None:
        s = self.sessions[stream]
        pose = np.array(pose, np.float64)
        # same pose failure-detection as the solo driver (driver.py)
        if pose.shape != (4, 4) or not np.isfinite(pose).all() \
                or abs(np.linalg.det(pose[:3, :3]) - 1.0) > 0.1:
            s.dropped["invalid_pose"] += 1
            return
        if loop_path is not None and len(s.graph) > 0:
            if s.graph.update_loop_path(list(loop_path)):
                warps, moved = s.graph.pose_warps()
                s.pending_warp = (warps, moved)
                self._flush_warps()
                s.graph.commit_loop_poses()
        if is_keyframe or len(s.graph) == 0:
            link = None
            if len(s.graph) > 0:
                link = (reference_index if reference_index is not None
                        else len(s.graph) - 1)
            new_index = s.graph.add_keyframe(pose, stamp, link)
            if reference_index is None:
                reference_index = new_index
        if reference_index is None:
            reference_index = len(s.graph) - 1
        s.graph.add_loop_edges(loop_edges)
        ref_pose = s.graph.keyframes[int(reference_index)].cam_pose
        rel = geometry.invert_se3(ref_pose) @ pose
        s.pose_buffer.append(
            (float(stamp), rel, int(reference_index), time.monotonic()))

    # ------------------------------------------------------------------
    # batched stepping
    # ------------------------------------------------------------------
    def _session_ready_frame(self, s: _Session):
        while s.pose_buffer:
            stamp, rel, ref, t_arr = s.pose_buffer[0]
            img = self._front(s, s.image_buffer, stamp, "images")
            dep = self._front(s, s.depth_buffer, stamp, "depths")
            if img is None or dep is None:
                return None
            ready_at = max(t_arr, img[2], dep[2])
            return stamp, rel, ref, img[1], dep[1], ready_at
        return None

    def _front(self, s: _Session, buf, stamp, kind: str):
        while buf:
            t = buf[0][0]
            if t < stamp - self.stamp_tolerance:
                buf.popleft()
                s.dropped[kind] += 1      # stale frame, counted like driver.py
            elif abs(t - stamp) <= self.stamp_tolerance:
                return buf[0]
            else:
                return None
        return None

    def step_ready(self) -> bool:
        return all(self._session_ready_frame(s) is not None
                   for s in self.sessions)

    def pump(self, now: Optional[float] = None) -> int:
        """Serving dispatch policy: step while every session is ready; then,
        if any ready frame has been waiting longer than flush_timeout for
        the other streams, fire one padded step.  Returns frames fused."""
        fused = 0
        while self.step_ready():
            fused += self.step()
        if now is None:
            now = time.monotonic()
        oldest = None
        for s in self.sessions:
            r = self._session_ready_frame(s)
            if r is not None:
                oldest = r[5] if oldest is None else min(oldest, r[5])
        if oldest is not None and now - oldest > self.flush_timeout:
            fused += self.step(flush=True)
        return fused

    def _ensure_keyframe_capacity(self) -> None:
        """Grow the shared window-mask length when any session's pose graph
        outgrows it (same policy as DeviceResidentMapping)."""
        need = max(len(s.graph) for s in self.sessions)
        if need <= self.config.max_keyframes:
            return
        new_p = self.config.max_keyframes
        while new_p < need:
            new_p *= 2
        self.config = dataclasses.replace(self.config, max_keyframes=new_p)
        self._step = _batched_onebuf_step(self.config)
        self._warp = _batched_warp(self.config)
        if self._stereo_cfg is not None:
            self._stereo_step = _batched_stereo_onebuf_step(
                self.config, self._stereo_cfg, self._stereo_filter)
        for s in self.sessions:
            s.grow_window(new_p)

    def step(self, flush: bool = False) -> int:
        """Fuse one frame per session in a single batched dispatch.

        Returns the number of real (non-padded) frames fused.  With
        flush=True, sessions without a synchronized frame get a zero-depth
        pad; otherwise requires step_ready()."""
        if not flush and not self.step_ready():
            raise RuntimeError("step() before step_ready(); "
                               "use flush=True to pad")
        self._ensure_keyframe_capacity()
        from ..core.state import AUX_HEAD_BYTES, pack_aux
        cfg = self.config
        h, w = cfg.height, cfg.width
        stereo = self._stereo_cfg is not None
        bf = self._stereo_bf or 0.0
        # the whole round rides as ONE (B, frame_bytes + aux_bytes) u8
        # payload = one H2D put (was four: bufs/poses/refs/masks).
        # stereo frame pads stay all-zero: constant images produce no valid
        # disparities, so a padded session's step is a no-op by the same
        # textureless-rejection gate the matcher always applies
        fb = (2 if stereo else 3) * h * w
        payload = np.zeros(
            (self.n_streams, fb + AUX_HEAD_BYTES + cfg.max_keyframes),
            np.uint8)
        eye = np.eye(4, dtype=np.float32)
        fused_real = 0
        to_pack = []          # (slot, image, depth) for one batched encode
        with self.timer.stage("prep"):
            for k, s in enumerate(self.sessions):
                ready = self._session_ready_frame(s)
                if ready is None:
                    payload[k, fb:] = pack_aux(eye, s.last_ref, s.window, bf)
                    continue
                stamp, rel, ref, img, dep, _ = ready
                window = s.graph.driftfree_window(ref, cfg.drift_free_poses)
                s.window[:] = False
                s.window[list(window)] = True
                s.first_local = min(window) if window else 0
                fuse_pose = s.graph.keyframes[ref].cam_pose @ rel
                if stereo:
                    payload[k, :fb] = dep
                else:
                    to_pack.append((k, img, dep))
                payload[k, fb:] = pack_aux(
                    np.asarray(fuse_pose, np.float32), ref, s.window, bf)
                s.last_ref = ref
                s.pose_buffer.popleft()
                s.image_buffer.popleft()
                s.depth_buffer.popleft()
                s.frames_fused += 1
                fused_real += 1
            if to_pack:
                _pack_batch(cfg, to_pack,
                            [payload[k, :fb] for k, _, _ in to_pack])

        step_fn = self._stereo_step if stereo else self._step
        if self._pipelined:
            # land the previous round, then hand this one to the worker:
            # its upload/dispatch relay waits overlap the caller's next
            # feeds and the next round's prep on the main thread
            self._flush_round()
            banks_in = self.banks
            self.banks = None     # consumers must go through _flush_round

            def job(banks_in=banks_in, payload=payload, step_fn=step_fn):
                with self.timer.stage("upload"):
                    payload_d = jnp.asarray(payload)
                with self.timer.stage("dispatch"):
                    return step_fn(banks_in, payload_d)

            self._banks_fut = self._dispatch_pool.submit(job)
            return fused_real
        with self.timer.stage("upload"):
            payload_d = jnp.asarray(payload)
        with self.timer.stage("dispatch"):
            self.banks, stats = step_fn(self.banks, payload_d)
        self._post_dispatch(stats)
        return fused_real

    def _post_dispatch(self, stats) -> None:
        if "n_dropped" in stats:
            # device-side accumulation (one tiny fused add, no readback)
            self._drop_accum = _accumulate()(self._drop_accum,
                                             stats["n_dropped"])
        self.rounds += 1
        if self.rounds % self.config.compact_interval == 0:
            self.compact()

    def _flush_round(self) -> None:
        """Complete the one in-flight pipelined round, if any.  Every bank
        consumer (compact, warps, session management, readouts, checkpoint)
        calls this first — observable state matches the eager mode."""
        if self._banks_fut is None:
            return
        fut = self._banks_fut
        self._banks_fut = None
        self.banks, stats = fut.result()
        self._post_dispatch(stats)

    def flush_rounds(self) -> None:
        """Public barrier: complete any pipelined in-flight round."""
        self._flush_round()

    def compact(self) -> None:
        """Batched hole-elimination repack of every session's bank
        (fixed-interval, zero-readback — the serving equivalent of
        DeviceResidentMapping's compaction schedule)."""
        self._flush_round()
        self.banks = _batched_compact()(self.banks)

    def _flush_warps(self) -> None:
        """Apply pending loop-closure warps for every session in one
        batched device pass (identity for sessions without one)."""
        self._flush_round()                 # warp orders after every fuse
        self._ensure_keyframe_capacity()    # warps can outrun fuses
        P = self.config.max_keyframes
        wstack = np.tile(np.eye(4, dtype=np.float32),
                         (self.n_streams, P, 1, 1))
        mstack = np.zeros((self.n_streams, P), bool)
        masks = np.zeros((self.n_streams, P), bool)
        firsts = np.zeros(self.n_streams, np.int32)
        any_pending = False
        for k, s in enumerate(self.sessions):
            masks[k] = s.window
            firsts[k] = s.first_local
            if s.pending_warp is not None:
                warps, moved = s.pending_warp
                n = len(warps)
                wstack[k, :n] = warps.astype(np.float32)
                mstack[k, :n] = moved
                s.pending_warp = None
                any_pending = True
        if not any_pending:
            return
        self.banks = self._warp(self.banks, jnp.asarray(wstack),
                                jnp.asarray(mstack), jnp.asarray(masks),
                                jnp.asarray(firsts))

    # ------------------------------------------------------------------
    # elastic session management (shape change = one cached re-jit)
    # ------------------------------------------------------------------
    def add_session(self) -> int:
        """Attach a fresh session at runtime; returns its stream index."""
        self._flush_round()
        new = multistream.make_banks(self.config, 1)
        self.banks = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), self.banks, new)
        self._drop_accum = jnp.concatenate(
            [self._drop_accum, jnp.zeros((1,), jnp.int32)])
        self.sessions.append(_Session(self.config))
        self.n_streams += 1
        return self.n_streams - 1

    def remove_session(self, stream: int) -> dict:
        """Detach a session at runtime; returns its final map rows (the
        same selection `session_map_surfels` exports)."""
        rows = self.session_map_surfels(stream)   # flushes via _session_rows
        keep = [i for i in range(self.n_streams) if i != stream]
        self.banks = jax.tree.map(lambda a: a[np.asarray(keep)], self.banks)
        self._drop_accum = self._drop_accum[np.asarray(keep)]
        del self.sessions[stream]
        self.n_streams -= 1
        return rows

    # ------------------------------------------------------------------
    # readout / observability (one transfer each; never on the hot path)
    # ------------------------------------------------------------------
    def _session_rows(self, stream: int) -> dict:
        self._flush_round()
        n = int(np.asarray(self.banks.count[stream]))
        return {k: np.asarray(getattr(self.banks, k)[stream])[:n]
                for k in FIELDS}

    def session_surfels(self, stream: int, min_updates: int = 1) -> dict:
        rows = self._session_rows(stream)
        sel = rows["update_times"] >= min_updates
        return {k: v[sel] for k, v in rows.items()}

    def _is_active_row(self, s: _Session, rows: dict) -> np.ndarray:
        lu = rows["last_update"]
        p = len(s.window)
        ok = (lu >= 0) & (lu < p)
        return ok & s.window[np.clip(lu, 0, p - 1)]

    def session_map_surfels(self, stream: int) -> dict:
        """Stable actives + live inactives — the save_cloud selection of the
        solo drivers (surfel_map.cpp:1153-1174)."""
        s = self.sessions[stream]
        rows = self._session_rows(stream)
        active = self._is_active_row(s, rows)
        live = rows["update_times"] > 0
        sel = (rows["update_times"] >= self.config.stable_update_times) \
            & active | (live & ~active)
        return {k: v[sel] for k, v in rows.items()}

    def save_cloud(self, stream: int, path: str, binary: bool = True) -> int:
        from ..io import export
        return export.save_cloud_pcd(path, self.session_map_surfels(stream),
                                     binary=binary)

    def save_mesh(self, stream: int, path: str, binary: bool = False) -> int:
        from ..io import export
        return export.save_mesh_ply(path, self.session_map_surfels(stream),
                                    binary=binary)

    def save_trajectory(self, stream: int, path: str,
                        fmt: str = "kitti") -> int:
        """Per-session loop-corrected keyframe trajectory (same formats as
        the solo drivers' save_trajectory)."""
        from ..io import export
        g = self.sessions[stream].graph
        poses = [k.loop_pose for k in g.keyframes]
        stamps = [k.stamp for k in g.keyframes]
        if fmt == "kitti":
            return export.save_trajectory_kitti(path, poses, stamps)
        if fmt == "tum":
            return export.save_trajectory_tum(path, poses, stamps)
        raise ValueError(f"unknown trajectory format {fmt!r}")

    def session_metrics(self) -> List[Dict[str, float]]:
        """Per-session observability: throughput, drop counters, bank
        saturation (count/capacity), and surfels dropped on a full tail
        since start (device-accumulated, exact)."""
        self._flush_round()
        counts = np.asarray(self.banks.count)
        drops = np.asarray(self._drop_accum)
        cap = self.config.surfel_capacity
        out = []
        for k, s in enumerate(self.sessions):
            out.append({
                "frames_fused": s.frames_fused,
                "surfel_count": int(counts[k]),
                "capacity": cap,
                "saturation": float(counts[k]) / cap,
                "surfels_dropped": int(drops[k]),
                **{f"dropped_{kk}": v for kk, v in s.dropped.items()},
            })
        return out

    # ------------------------------------------------------------------
    # per-session persistence (schema-compatible with DeviceResidentMapping)
    # ------------------------------------------------------------------
    def save_checkpoint(self, stream: int, path: str) -> None:
        s = self.sessions[stream]
        rows = self._session_rows(stream)
        data = {f"bank_{k}": v for k, v in rows.items()}
        data["bank_count"] = np.int64(len(rows["color"]))
        g = s.graph
        data["kf_cam"] = np.stack([k.cam_pose for k in g.keyframes]) \
            if len(g) else np.zeros((0, 4, 4))
        data["kf_loop"] = np.stack([k.loop_pose for k in g.keyframes]) \
            if len(g) else np.zeros((0, 4, 4))
        data["kf_stamp"] = np.array([k.stamp for k in g.keyframes])
        edges = [(i, j) for i, k in enumerate(g.keyframes) for j in k.linked]
        data["kf_edges"] = np.array(edges, np.int64).reshape(-1, 2)
        data["local_indices"] = np.flatnonzero(s.window).astype(np.int64)
        data["frames_fused"] = np.int64(s.frames_fused)
        np.savez_compressed(path, **data)

    def load_checkpoint(self, stream: int, path: str) -> None:
        self._flush_round()
        s = _Session(self.config)
        z = np.load(path, allow_pickle=False)
        n = int(z["bank_count"])
        for cam, loop, stamp in zip(z["kf_cam"], z["kf_loop"], z["kf_stamp"]):
            idx = s.graph.add_keyframe(cam, float(stamp))
            s.graph.keyframes[idx].loop_pose = np.array(loop)
        for i, j in z["kf_edges"]:
            kf = s.graph.keyframes[int(i)]
            if int(j) not in kf.linked:
                kf.linked.append(int(j))
        s.frames_fused = int(z["frames_fused"])
        self.sessions[stream] = s
        self._ensure_keyframe_capacity()
        s.window[np.asarray(z["local_indices"], np.int64)] = True
        s.first_local = int(z["local_indices"].min()) \
            if len(z["local_indices"]) else 0
        s.last_ref = len(s.graph) - 1 if len(s.graph) else 0
        # place the rows into this stream's bank slot
        cap = self.config.surfel_capacity

        def put(a, key, fill):
            host = np.full((cap,) + a.shape[2:], fill, np.asarray(a).dtype)
            host[:n] = z[f"bank_{key}"]
            return a.at[stream].set(jnp.asarray(host))

        # dead rows must match SurfelBank.empty (last_update = -1, not 0:
        # 0 means "owned by keyframe 0" to the window-mask gating)
        fills = {"last_update": -1}
        upd = {k: put(getattr(self.banks, k), k, fills.get(k, 0))
               for k in FIELDS}
        upd["count"] = self.banks.count.at[stream].set(n)
        self.banks = self.banks.replace(**upd)

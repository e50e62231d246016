"""ShardedSurfelMapping: the full mapping pipeline over a device mesh.

Same host orchestration as `SurfelMapping` (pose graph, sync buffers,
inactive pool, export, checkpoint) with the active surfel bank row-sharded
across the mesh's "surfel" axis: the fuse step, compaction, migration
extraction, re-activation appends, and loop-closure warps all execute as
shard_map programs (`parallel/sharding.py`), one session per "data" group.

Scale intent: one v5e maps one KITTI stream at >600 fps already; the
sharded driver exists for maps whose ACTIVE window exceeds one chip's HBM
(capacity scales with the mesh) and as the substrate for pod-scale
multi-session serving.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SurfelMapConfig
from ..core.state import FrameInput, pad_frame
from ..ops import migration
from ..parallel import sharding
from .driver import SurfelMapping
from .inactive_pool import FIELDS


def scatter_rows_to_sharded(config, mesh, rows: dict):
    """Host rows -> a (1, N) mesh-sharded bank: rows distributed
    round-robin across shards, per-shard counts set accordingly."""
    from ..parallel import sharding
    import jax
    from jax.sharding import NamedSharding

    n_shards = mesh.shape["surfel"]
    banks = sharding.replicate_banks(mesh, config, n_streams=1)
    cap = banks.position.shape[1]
    shard_rows = cap // n_shards
    n = len(rows["color"])
    owner = np.arange(n) % n_shards
    counts = np.zeros((1, n_shards), np.int32)
    host = {k: np.array(np.asarray(getattr(banks, k))) for k in FIELDS}
    for s in range(n_shards):
        part_idx = np.nonzero(owner == s)[0]
        c = len(part_idx)
        if c > shard_rows:
            raise ValueError("checkpoint exceeds per-shard capacity")
        lo = s * shard_rows
        for k in FIELDS:
            host[k][0, lo:lo + c] = rows[k][part_idx]
        counts[0, s] = c
    from ..parallel.sharding import _bank_pspec
    spec = _bank_pspec()
    upd = {k: jax.device_put(host[k], NamedSharding(mesh, getattr(spec, k)))
           for k in FIELDS}
    return banks.replace(
        count=jax.device_put(counts, NamedSharding(mesh, spec.count)), **upd)


def gather_sharded_bank(banks, n_shards: int, stream: int = 0) -> dict:
    """Host dict of a sharded bank's live per-shard prefixes, concatenated
    (slab layout via the canonical `sharding.live_rows` helper)."""
    from ..parallel.sharding import live_rows

    counts = np.asarray(banks.count)[stream]         # (n_shards,)
    return {k: live_rows(np.asarray(getattr(banks, k))[stream], counts)
            for k in FIELDS}


class ShardedSurfelMapping(SurfelMapping):
    """Single-session mapping with the bank sharded over mesh axis "surfel".

    The mesh must have data=1 (multi-session sharding composes via the
    stream axis of `parallel.sharding` / `parallel.multistream`)."""

    def __init__(self, config: SurfelMapConfig, mesh,
                 kitti_alignment: bool = False):
        assert mesh.shape["data"] == 1, "one session per data group"
        self.mesh = mesh
        self.n_shards = mesh.shape["surfel"]
        super().__init__(config, kitti_alignment)

        self.bank = sharding.replicate_banks(mesh, config, n_streams=1)
        self._sfuse = sharding.sharded_fuse_frame(config, mesh)
        self._scompact = sharding.sharded_compact(config, mesh)
        # ceil: a full migration_buffer slab distributed round-robin puts
        # up to ceil(buf / n_shards) rows on shard 0
        per_chunk = max(-(-config.migration_buffer // self.n_shards), 1)
        self._per_chunk = per_chunk
        self._sextract = sharding.sharded_extract_by_pose(
            config, mesh, per_chunk)
        self._sappend = sharding.sharded_append(config, mesh, per_chunk)
        self._swarp = sharding.sharded_warp_active(config, mesh)

    # ------------------------------------------------------------------
    # device seams
    # ------------------------------------------------------------------
    def _build_stereo_jit(self) -> None:
        self._stereo_fuse = sharding.sharded_fuse_frame_stereo(
            self.config, self._stereo_cfg, self._stereo_filter, self.mesh)

    def _fuse_frame(self, image, depth, pose, ref_index: int) -> None:
        from .driver import _StereoPair
        if isinstance(depth, _StereoPair):
            self.bank, stats = self._stereo_fuse(
                self.bank, jnp.asarray(depth.buf[None]),
                jnp.asarray(np.asarray(pose, np.float32)[None]),
                jnp.full((1,), ref_index, jnp.int32),
                jnp.full((1,), self._stereo_bf, jnp.float32))
            self._fuse_epilogue(stats)
            return
        pi, pd = pad_frame(self.config, np.asarray(image, np.float32),
                           np.asarray(depth, np.float32))
        frames = FrameInput(
            image=jnp.asarray(pi[None]), depth=jnp.asarray(pd[None]),
            pose=jnp.asarray(np.asarray(pose, np.float32)[None]),
            frame_index=jnp.full((1,), ref_index, jnp.int32))
        frames = sharding.shard_frames(self.mesh, frames)
        self.bank, stats = self._sfuse(self.bank, frames)
        self._fuse_epilogue(stats)

    def sync_stats(self) -> Dict[str, int]:
        if self._stats_dev:
            self.last_stats = {k: int(np.asarray(v).sum())
                               for k, v in self._stats_dev.items()}
        return self.last_stats

    def _bank_count(self) -> int:
        return int(np.asarray(self.bank.count).sum())

    def _bank_capacity(self) -> int:
        # conservative: shards fill evenly (round-robin new-surfel
        # ownership); headroom margins in the callers already overshoot
        return self.bank.position.shape[1]

    def _do_compact(self) -> None:
        self.bank = self._scompact(self.bank)

    def _extract_chunk(self, ids: np.ndarray):
        self.bank, bufs, ns = self._sextract(self.bank, jnp.asarray(ids))
        ns = np.asarray(ns)[0]                      # (n_shards,)
        n = int(ns.sum())
        if n == 0:
            return {}, 0
        host = {}
        for k, v in bufs.items():
            arr = np.asarray(v)[0]                  # (n_shards*per_buf, ...)
            arr = arr.reshape((self.n_shards, self._per_chunk)
                              + arr.shape[1:])
            host[k] = np.concatenate(
                [arr[s, :ns[s]] for s in range(self.n_shards)])
        # base-class loop contract: n == migration_buffer means "maybe more"
        if (ns == self._per_chunk).any():
            return host, self.config.migration_buffer
        return host, min(n, self.config.migration_buffer - 1)

    def _append_hostslab(self, padded: dict, n: int) -> None:
        fields = {}
        ns = np.zeros((1, self.n_shards), np.int32)
        owner = np.arange(n) % self.n_shards
        for k in FIELDS:
            rows = padded[k][:n]
            out = np.zeros((1, self.n_shards, self._per_chunk)
                           + rows.shape[1:], rows.dtype)
            for s in range(self.n_shards):
                part = rows[owner == s]
                out[0, s, :len(part)] = part
                ns[0, s] = len(part)
            fields[k] = jnp.asarray(
                out.reshape((1, self.n_shards * self._per_chunk)
                            + rows.shape[1:]))
        self.bank = self._sappend(self.bank, fields, jnp.asarray(ns))

    def _apply_active_warp(self, warp: np.ndarray) -> None:
        self.bank = self._swarp(
            self.bank, jnp.asarray(np.asarray(warp, np.float32)[None]))

    # ------------------------------------------------------------------
    # host readout of the sharded bank
    # ------------------------------------------------------------------
    def _gather_bank_host(self) -> dict:
        """Live per-shard prefixes concatenated into one host dict."""
        return gather_sharded_bank(self.bank, self.n_shards)

    def active_surfels(self, min_updates=None) -> dict:
        if min_updates is None:
            min_updates = self.config.stable_update_times
        rows = self._gather_bank_host()
        sel = rows["update_times"] >= min_updates
        return {k: v[sel] for k, v in rows.items()}

    def memory_usage_kb(self) -> float:
        bank_bytes = sum(np.asarray(getattr(self.bank, k)).nbytes
                         for k in FIELDS)
        return (bank_bytes + self.pool.memory_bytes()) / 1024.0

    def save_checkpoint(self, path: str) -> None:
        """Base checkpoint format, with the bank gathered from the mesh."""
        rows = self._gather_bank_host()
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
        """Restore graph/pool on host; re-distribute bank rows round-robin
        across the mesh shards."""
        from .inactive_pool import InactivePool
        from .pose_graph import PoseGraph

        z = np.load(path, allow_pickle=False)
        n = int(z["bank_count"])
        rows = {k: z[f"bank_{k}"][:n] for k in FIELDS}
        self.bank = scatter_rows_to_sharded(self.config, self.mesh, rows)
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

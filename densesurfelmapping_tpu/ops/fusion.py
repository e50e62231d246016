"""Fusion/association engine: surfel <- superpixel weighted fusion, new-surfel
initialization, and masked compaction of the fixed-capacity surfel bank.

TPU-native re-design of `fuse_surfels_kernel` (`fusion_functions.cpp:190-313`),
`initialize_surfels` (:315-361) and the swap-pop slot reuse of
`SurfelMap::fuse_map` (`surfel_map.cpp:1077-1112`).  Every surfel row is
processed in parallel with mask algebra replacing the reference's per-surfel
`continue` chains; the racy `superpixel_seeds[i].fused = true` write becomes
a scatter-OR; push_back becomes prefix-sum compaction.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SurfelMapConfig
from ..core.state import SuperpixelState, SurfelBank
from ..core import geometry


def get_weight(depth: jnp.ndarray) -> jnp.ndarray:
    """Fusion weight min(1/z^2, 1) (`fusion_functions.cpp:99-102`)."""
    return jnp.minimum(1.0 / jnp.maximum(depth, 1e-20) ** 2, 1.0)


def fuse_surfels(config: SurfelMapConfig, bank: SurfelBank,
                 seeds: SuperpixelState, assignment: jnp.ndarray,
                 depth: jnp.ndarray, pose: jnp.ndarray,
                 frame_index: jnp.ndarray, blocked: bool = True,
                 pose_mask: jnp.ndarray | None = None
                 ) -> Tuple[SurfelBank, jnp.ndarray]:
    """One projective-association + weighted-fusion pass over the whole bank.

    Returns (bank', fused (R,C) bool of seeds claimed by >=1 surfel).
    Gate order mirrors `fuse_surfels_kernel` (`fusion_functions.cpp:190-313`):
    staleness kill -> dead skip -> depth range -> image bounds -> occlusion
    kill -> seed normal/view gates -> tolerate_diff band -> normal-agreement
    kill -> weighted update.

    pose_mask (optional, (max_keyframes,) bool): device-resident
    active-window gating — rows whose last_update keyframe is outside the
    mask are frozen (no update, no kill), the in-HBM equivalent of the
    reference's physical active/inactive migration (`move_add_surfels`,
    `surfel_map.cpp:1456-1595`).
    """
    rows, cols = config.sp_rows, config.sp_cols

    inv_pose = jnp.linalg.inv(pose)
    assign_f32 = jax.lax.bitcast_convert_type(assignment.reshape(-1),
                                              jnp.float32)
    seed_packed = _pack_seeds(seeds)                       # (S, 10)

    if not blocked:
        # single full-capacity pass (used under vmap/shard_map where a
        # data-dependent loop trip count cannot batch)
        in_prefix = jnp.arange(bank.capacity, dtype=jnp.int32) < bank.count
        out = _fuse_rows(config, bank.position, bank.normal, bank.color,
                         bank.size, bank.weight, bank.update_times,
                         bank.last_update, in_prefix,
                         _pack_seeds(seeds),
                         jax.lax.bitcast_convert_type(
                             assignment.reshape(-1), jnp.float32),
                         depth, pose, inv_pose, frame_index,
                         pose_mask=pose_mask)
        pos, nrm, col, siz, wgt, ut, lu, fused_flat = out
        new_bank = bank.replace(position=pos, normal=nrm, color=col,
                                size=siz, weight=wgt, update_times=ut,
                                last_update=lu)
        fused = seeds.fused | (fused_flat.reshape(rows, cols) > 0)
        return new_bank, fused

    # block the bank so per-frame cost scales with the live prefix length
    # (count), not the static capacity: only ceil(count / B) blocks execute
    cap = bank.capacity
    B = min(_FUSE_BLOCK, cap)
    n_blocks = (bank.count + B - 1) // B

    def body(i, carry):
        pos, nrm, col, siz, wgt, ut, lu, fused_acc = carry
        start = i * B
        blk = lambda a: jax.lax.dynamic_slice_in_dim(a, start, B, axis=0)
        in_prefix = start + jnp.arange(B, dtype=jnp.int32) < bank.count
        out = _fuse_rows(
            config, blk(pos), blk(nrm), blk(col), blk(siz), blk(wgt),
            blk(ut), blk(lu), in_prefix, seed_packed, assign_f32,
            depth, pose, inv_pose, frame_index, pose_mask=pose_mask)
        (b_pos, b_nrm, b_col, b_siz, b_wgt, b_ut, b_lu, fused_part) = out
        put = lambda a, b: jax.lax.dynamic_update_slice_in_dim(
            a, b, start, axis=0)
        return (put(pos, b_pos), put(nrm, b_nrm), put(col, b_col),
                put(siz, b_siz), put(wgt, b_wgt), put(ut, b_ut),
                put(lu, b_lu), jnp.maximum(fused_acc, fused_part))

    init = (bank.position, bank.normal, bank.color, bank.size, bank.weight,
            bank.update_times, bank.last_update,
            jnp.zeros((rows * cols,), jnp.int32))
    pos, nrm, col, siz, wgt, ut, lu, fused_flat = jax.lax.fori_loop(
        0, n_blocks, body, init)

    new_bank = bank.replace(position=pos, normal=nrm, color=col, size=siz,
                            weight=wgt, update_times=ut, last_update=lu)
    fused = seeds.fused | (fused_flat.reshape(rows, cols) > 0)
    return new_bank, fused


_FUSE_BLOCK = 1 << 16


def _pack_seeds(seeds: SuperpixelState) -> jnp.ndarray:
    """All ten per-seed fusion fields as one (S, 10) gather payload."""
    return jnp.concatenate([
        seeds.norm.reshape(-1, 3), seeds.pos.reshape(-1, 3),
        seeds.mean_depth.reshape(-1, 1), seeds.view_cos.reshape(-1, 1),
        seeds.mean_intensity.reshape(-1, 1), seeds.size.reshape(-1, 1),
    ], axis=-1)


def _fuse_rows(config: SurfelMapConfig, position, normal, color, size,
               weight, update_times, last_update, in_prefix,
               seed_packed, assign_f32, depth, pose, inv_pose, frame_index,
               pose_mask=None):
    """Gate chain + weighted fusion over one block of bank rows."""
    cam = config.camera
    prof = config.profile
    rows, cols = config.sp_rows, config.sp_cols
    h, w = depth.shape

    alive = in_prefix & (update_times > 0)
    if pose_mask is not None:
        # frozen rows (owner keyframe outside the active window) are
        # untouchable: no fusion, no staleness/occlusion/normal kills
        P = pose_mask.shape[0]
        owner_ok = pose_mask[jnp.clip(last_update, 0, P - 1)] \
            & (last_update >= 0)
        alive = alive & owner_ok

    # staleness kill: idle > stale_frames and weakly observed
    stale = ((frame_index - last_update > config.stale_frames)
             & (update_times < config.stable_update_times) & alive)
    alive = alive & ~stale

    p_c = geometry.transform_points(inv_pose, position)          # (B, 3)
    n_c = geometry.rotate_vectors(inv_pose, normal)
    z = p_c[:, 2]
    in_range = (z >= config.fuse_near) & (z <= config.fuse_far)

    uv = geometry.project(p_c, cam.fx, cam.fy, cam.cx, cam.cy)
    pu = (uv[..., 0] + 0.5).astype(jnp.int32)
    pv = (uv[..., 1] + 0.5).astype(jnp.int32)
    in_img = ((pu >= 1) & (pu <= config.width - 2)
              & (pv >= 1) & (pv <= config.height - 2))
    consider = alive & in_range & in_img
    pu_s = jnp.clip(pu, 0, w - 1)
    pv_s = jnp.clip(pv, 0, h - 1)
    flat_px = pv_s * w + pu_s

    # occlusion: surfel more than 1m in front of the measured surface => kill
    d_px = depth.reshape(-1)[flat_px]
    occluded = consider & (z < d_px - 1.0)
    alive = alive & ~occluded
    consider = consider & ~occluded

    # gather the superpixel this surfel projects into.  TPU gathers are the
    # cost center here, so pixel data (assignment bitcast to f32) and all ten
    # seed fields ride in ONE packed gather each instead of eight.
    raw_sp = jax.lax.bitcast_convert_type(assign_f32[flat_px], jnp.int32)
    sp_idx = jnp.clip(raw_sp, 0)
    has_sp = raw_sp >= 0
    sg = seed_packed[sp_idx]                               # (B, 10)
    s_norm, s_pos = sg[:, 0:3], sg[:, 3:6]
    s_depth, s_vcos, s_int, s_size = (sg[:, 6], sg[:, 7], sg[:, 8], sg[:, 9])

    norm_set = jnp.any(s_norm != 0.0, axis=-1)
    consider = consider & has_sp & norm_set & (s_vcos >= config.max_angle_cos)

    cam_f = jnp.float32(cam.mean_focal)
    tol = z * z / (prof.baseline * cam_f) * prof.disparity_error
    tol = jnp.maximum(tol, prof.min_tolerate_diff)
    in_band = (z >= s_depth - tol) & (z <= s_depth + tol)
    consider = consider & in_band

    ncos = jnp.sum(n_c * s_norm, axis=-1)
    bad_norm = consider & (ncos < config.max_angle_cos)
    alive = alive & ~bad_norm
    commit = consider & ~bad_norm

    # weighted fusion (`fusion_functions.cpp:273-311`)
    w_old = weight
    w_new = get_weight(s_depth)
    w_sum = w_old + w_new
    sp_w = geometry.transform_points(pose, s_pos)
    fused_p = (position * w_old[:, None] + w_new[:, None] * sp_w) \
        / w_sum[:, None]
    fused_n_c = n_c * w_old[:, None] + w_new[:, None] * s_norm
    fused_n_c = fused_n_c / jnp.maximum(
        jnp.linalg.norm(fused_n_c, axis=-1, keepdims=True), 1e-20)
    fused_n_w = geometry.rotate_vectors(pose, fused_n_c)
    new_size = s_size * jnp.abs(s_depth / (cam_f * jnp.where(
        s_vcos != 0, s_vcos, 1.0)))

    cm = commit[:, None]
    killed = stale | occluded | bad_norm

    # seed.fused |= any committing surfel hit it (scatter-OR replaces the
    # reference's racy boolean write at fusion_functions.cpp:311)
    fused_part = jnp.zeros((rows * cols,), jnp.int32).at[sp_idx].max(
        commit.astype(jnp.int32), mode="drop")

    return (jnp.where(cm, fused_p, position),
            jnp.where(cm, fused_n_w, normal),
            jnp.where(commit, s_int, color),
            jnp.where(commit & (new_size < size), new_size, size),
            jnp.where(commit, w_sum, weight),
            jnp.where(killed, 0,
                      jnp.where(commit, update_times + 1, update_times)),
            jnp.where(commit, frame_index, last_update),
            fused_part)


def extract_new_surfels(config: SurfelMapConfig, seeds: SuperpixelState,
                        fused: jnp.ndarray, pose: jnp.ndarray,
                        frame_index: jnp.ndarray):
    """Candidate new surfels from unfused seeds (`initialize_surfels`,
    `fusion_functions.cpp:315-361`).  Returns a dict of (S,) field arrays
    plus a (S,) validity mask — compaction happens in `compact_and_append`."""
    from .superpixel import _static_geometry
    g = _static_geometry(config)
    cam = config.camera
    rows, cols = config.sp_rows, config.sp_cols
    S = rows * cols

    norm_set = jnp.any(seeds.norm != 0.0, axis=-1)
    ok = (jnp.asarray(g["seed_valid"])
          & (seeds.mean_depth != 0.0)
          & ~fused
          & (seeds.view_cos >= config.max_angle_cos)
          & norm_set)

    pos_w = geometry.transform_points(pose, seeds.pos.reshape(S, 3))
    norm_w = geometry.rotate_vectors(pose, seeds.norm.reshape(S, 3))
    cam_f = jnp.float32(cam.mean_focal)
    vcos = seeds.view_cos.reshape(S)
    size = seeds.size.reshape(S) * jnp.abs(
        seeds.mean_depth.reshape(S) / (cam_f * jnp.where(vcos != 0, vcos, 1.0)))

    fields = dict(
        position=pos_w,
        normal=norm_w,
        color=seeds.mean_intensity.reshape(S),
        size=size,
        weight=get_weight(seeds.mean_depth.reshape(S)),
        update_times=jnp.ones((S,), jnp.int32),
        last_update=jnp.broadcast_to(frame_index, (S,)).astype(jnp.int32),
    )
    return fields, ok.reshape(S)


def append_new(bank: SurfelBank, new_fields: dict, new_mask: jnp.ndarray
               ) -> Tuple[SurfelBank, dict]:
    """Append valid new surfels at the bank tail WITHOUT repacking.

    The per-frame fast path: compact the (small) candidate slab with one
    cheap scatter, then one dynamic_update_slice writes it at `count`.  Dead
    rows killed this frame stay as holes — `compact_bank` repacks them out
    when fragmentation warrants (driver policy).  If the tail lacks headroom
    for a full slab the append is skipped and reported in n_dropped.
    """
    cap = bank.capacity
    S = new_mask.shape[0]
    n_want = jnp.sum(new_mask.astype(jnp.int32))

    dest = jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest = jnp.where(new_mask, dest, S)

    can = bank.count <= cap - S
    start = jnp.where(can, bank.count, cap - S)
    n_new = jnp.where(can, n_want, 0)

    def place(old, new):
        slab = jnp.zeros((S,) + new.shape[1:], new.dtype)
        slab = slab.at[dest].set(new, mode="drop")
        current = jax.lax.dynamic_slice_in_dim(old, start, S, axis=0)
        slab = jnp.where(
            (can & (jnp.arange(S) < n_want)).reshape(
                (S,) + (1,) * (new.ndim - 1)),
            slab, current)
        return jax.lax.dynamic_update_slice_in_dim(old, slab, start, axis=0)

    new_bank = bank.replace(
        position=place(bank.position, new_fields["position"]),
        normal=place(bank.normal, new_fields["normal"]),
        color=place(bank.color, new_fields["color"]),
        size=place(bank.size, new_fields["size"]),
        weight=place(bank.weight, new_fields["weight"]),
        update_times=place(bank.update_times, new_fields["update_times"]),
        last_update=place(bank.last_update, new_fields["last_update"]),
        count=bank.count + n_new,
    )
    n_live = jnp.sum(new_bank.live_mask.astype(jnp.int32))
    stats = dict(n_live=n_live - n_new, n_new=n_new,
                 n_dropped=n_want - n_new)
    return new_bank, stats


def compact_bank(bank: SurfelBank) -> SurfelBank:
    """Repack live rows to the front (hole elimination).

    Implemented as a stable argsort on liveness + one packed gather: an
    order-preserving partition that is ~10x faster than variable-destination
    scatters on TPU.  Called by the driver when count - n_live exceeds the
    fragmentation threshold."""
    live = bank.live_mask
    n_live = jnp.sum(live.astype(jnp.int32))
    perm = jnp.argsort(~live, stable=True)

    f32_packed = jnp.concatenate([
        bank.position, bank.normal, bank.color[:, None],
        bank.size[:, None], bank.weight[:, None]], axis=-1)      # (N, 9)
    i32_packed = jnp.stack([bank.update_times, bank.last_update], axis=-1)
    f32_out = f32_packed[perm]
    i32_out = i32_packed[perm]
    keep = (jnp.arange(bank.capacity, dtype=jnp.int32) < n_live)
    f32_out = jnp.where(keep[:, None], f32_out, 0.0)
    i32_out = jnp.where(keep[:, None], i32_out, 0)

    return bank.replace(
        position=f32_out[:, 0:3], normal=f32_out[:, 3:6],
        color=f32_out[:, 6], size=f32_out[:, 7], weight=f32_out[:, 8],
        update_times=i32_out[:, 0], last_update=i32_out[:, 1],
        count=n_live)


def compact_and_append(bank: SurfelBank, new_fields: dict,
                       new_mask: jnp.ndarray) -> Tuple[SurfelBank, dict]:
    """Pack live surfels to the front and append valid new surfels.

    Replaces the reference's deleted-slot reuse + swap-pop
    (`surfel_map.cpp:1077-1112`) with two order-preserving prefix-sum
    scatters — the TPU idiom for dynamic sets on static shapes.  New surfels
    that would overflow capacity are dropped (counted in stats)."""
    cap = bank.capacity
    live = bank.live_mask
    n_live = jnp.sum(live.astype(jnp.int32))

    dest_live = jnp.cumsum(live.astype(jnp.int32)) - 1
    dest_live = jnp.where(live, dest_live, cap)          # drop dead rows

    n_new_want = jnp.sum(new_mask.astype(jnp.int32))
    dest_new = n_live + jnp.cumsum(new_mask.astype(jnp.int32)) - 1
    dest_new = jnp.where(new_mask & (dest_new < cap), dest_new, cap)
    n_new = jnp.minimum(n_new_want, cap - n_live)

    def scatter(old, new):
        # rows with dest index == cap fall off the end (mode="drop")
        out = jnp.zeros_like(old)
        out = out.at[dest_live].set(old, mode="drop")
        out = out.at[dest_new].set(new, mode="drop")
        return out

    compacted = bank.replace(
        position=scatter(bank.position, new_fields["position"]),
        normal=scatter(bank.normal, new_fields["normal"]),
        color=scatter(bank.color, new_fields["color"]),
        size=scatter(bank.size, new_fields["size"]),
        weight=scatter(bank.weight, new_fields["weight"]),
        update_times=scatter(bank.update_times, new_fields["update_times"]),
        last_update=scatter(bank.last_update, new_fields["last_update"]),
        count=n_live + n_new,
    )
    stats = dict(n_live=n_live, n_new=n_new,
                 n_dropped=n_new_want - n_new)
    return compacted, stats

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
                 frame_index: jnp.ndarray
                 ) -> Tuple[SurfelBank, jnp.ndarray]:
    """One projective-association + weighted-fusion pass over the whole bank.

    Returns (bank', fused (R,C) bool of seeds claimed by >=1 surfel).
    Gate order mirrors `fuse_surfels_kernel` (`fusion_functions.cpp:190-313`):
    staleness kill -> dead skip -> depth range -> image bounds -> occlusion
    kill -> seed normal/view gates -> tolerate_diff band -> normal-agreement
    kill -> weighted update.
    """
    cam = config.camera
    prof = config.profile
    rows, cols = config.sp_rows, config.sp_cols
    h, w = depth.shape

    inv_pose = jnp.linalg.inv(pose)
    alive = bank.live_mask

    # staleness kill: idle > stale_frames and weakly observed
    stale = ((frame_index - bank.last_update > config.stale_frames)
             & (bank.update_times < config.stable_update_times) & alive)
    alive = alive & ~stale

    p_c = geometry.transform_points(inv_pose, bank.position)     # (N, 3)
    n_c = geometry.rotate_vectors(inv_pose, bank.normal)
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

    # gather the superpixel this surfel projects into
    sp_idx = jnp.clip(assignment.reshape(-1)[flat_px], 0)
    has_sp = assignment.reshape(-1)[flat_px] >= 0
    g = lambda f: f.reshape(-1)[sp_idx]
    s_norm = seeds.norm.reshape(-1, 3)[sp_idx]
    s_pos = seeds.pos.reshape(-1, 3)[sp_idx]
    s_depth = g(seeds.mean_depth)
    s_vcos = g(seeds.view_cos)
    s_int = g(seeds.mean_intensity)
    s_size = g(seeds.size)

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
    w_old = bank.weight
    w_new = get_weight(s_depth)
    w_sum = w_old + w_new
    sp_w = geometry.transform_points(pose, s_pos)
    fused_p = (bank.position * w_old[:, None] + w_new[:, None] * sp_w) \
        / w_sum[:, None]
    fused_n_c = n_c * w_old[:, None] + w_new[:, None] * s_norm
    fused_n_c = fused_n_c / jnp.maximum(
        jnp.linalg.norm(fused_n_c, axis=-1, keepdims=True), 1e-20)
    fused_n_w = geometry.rotate_vectors(pose, fused_n_c)
    new_size = s_size * jnp.abs(s_depth / (cam_f * jnp.where(
        s_vcos != 0, s_vcos, 1.0)))

    cm = commit[:, None]
    killed = stale | occluded | bad_norm
    new_bank = bank.replace(
        position=jnp.where(cm, fused_p, bank.position),
        normal=jnp.where(cm, fused_n_w, bank.normal),
        color=jnp.where(commit, s_int, bank.color),
        size=jnp.where(commit & (new_size < bank.size), new_size, bank.size),
        weight=jnp.where(commit, w_sum, bank.weight),
        update_times=jnp.where(killed, 0,
                               jnp.where(commit, bank.update_times + 1,
                                         bank.update_times)),
        last_update=jnp.where(commit, frame_index, bank.last_update),
    )

    # seed.fused |= any committing surfel hit it (scatter-OR replaces the
    # reference's racy boolean write at fusion_functions.cpp:311)
    fused_flat = jnp.zeros((rows * cols,), jnp.int32).at[sp_idx].max(
        commit.astype(jnp.int32), mode="drop")
    fused = seeds.fused | (fused_flat.reshape(rows, cols) > 0)
    return new_bank, fused


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

"""Image-axis (column-slab) sharding of the frame stage.

`parallel/sharding.py` replicates the superpixel/plane-fit stage per surfel
shard: multi-chip scales bank capacity and stream count, but not
single-stream frame rate.  This module shards the frame stage itself over
the SAME "surfel" mesh axis — the TPU-native analogue of the reference's
10-thread row-chunk fan-out (`fusion_functions.cpp:455-466`), except over
image COLUMNS (a KITTI frame is 155 superpixel columns vs 47 rows, so the
halo-to-owned ratio is ~3x better on the width axis).

Design: redundant-halo SPMD, zero per-iteration communication.

  * Each shard owns `own` superpixel columns and computes them PLUS a
    HALO_SP-column fringe on each side.  SLIC information propagates at
    most ~2 seed columns per assign/update iteration (pixel assignment
    reads a 3x3 seed stencil; seed update reads a 2*SP-pixel window), so
    with seed init (1) + 3 iterations (2 each) + plane fit (1) an 8-column
    halo strictly covers the dependency cone of the owned region: owned
    outputs are *identical* to the replicated computation, not
    approximately so (pinned by tests/test_frame_sharding.py).
  * All static geometry (validity masks, window coordinates, neighbor ids)
    is precomputed on an EXTENDED global grid with HALO_SP invalid columns
    on each side and sliced per shard with `dynamic_slice` at a traced
    offset — one SPMD program, shard-dependent geometry as data
    (`ops/superpixel.py` / `ops/normals.py` accept it via `geom=`).
  * Seed coordinates stay GLOBAL throughout (pixel-coordinate planes ride
    in the geometry), so back-projection and the downstream fusion gates
    need no coordinate fix-ups.
  * After segmentation, each shard's owned seed columns + pixel assignment
    are `all_gather`ed (tiled) over "surfel" — ~1.9 MB for the KITTI
    assignment, a few hundred KB of seed planes, riding ICI — and the
    existing surfel-sharded fusion consumes the full-frame result.

Cost model: each of n shards computes (own + 2*HALO_SP)/C of the frame
stage; at KITTI size with 8 shards that is (20+16)/156 ≈ 23% per shard —
a ~4.3x frame-stage speedup ceiling before the gather.

Scope note — the STEREO front-end stays replicated per shard (the policy
of `sharding.sharded_fuse_frame_stereo_windowed_packed`).  SGM does not
column-shard the way SLIC does: the semi-global DP scans carry
unbounded dependencies along their scan axis (L(x) needs L(x-1) for the
whole row), so a redundant halo cannot cover them.  The TPU-native
mapping would be per-direction axis sharding — x± scans are
row-independent (shard H), y± column-independent (shard W), diagonals
independent along the perpendicular diagonal — with a ~237 MB cost-
volume reshard collective between direction families (~2-3 ms on ICI),
or a ppermute ring propagating slab-boundary DP carries (n_shards
sequential steps).  Both are future work; at 22 ms the single-chip SGM
already beats the offline PSMNet front-end it replaces, and multi-chip
serving scales by streams (`MultiSessionMapping`) rather than by
splitting one matcher.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SurfelMapConfig
from ..core.state import FrameInput, SurfelBank
from ..ops import superpixel, normals, fusion
from .sharding import _bank_pspec

HALO_SP = 8  # seed columns of redundant fringe per side (see module doc)


@functools.lru_cache(maxsize=8)
def _extended_geometry(config: SurfelMapConfig, n_slabs: int,
                       halo: int = HALO_SP):
    """Global static geometry on the halo-extended column grid.

    Mirrors `superpixel._static_geometry` exactly, except arrays carry
    `halo` invalid seed columns on each side (plus right-padding to make
    the owned region divisible by n_slabs) and x coordinates are GLOBAL
    (negative in the left extension).  Sliced per shard as traced data.
    """
    sp = config.sp_size
    R, C = config.sp_rows, config.sp_cols
    h = config.padded_height
    oh, ow = config.height, config.width
    own = -(-C // n_slabs)
    c_round = own * n_slabs
    c_ext = c_round + 2 * halo
    w_ext = c_ext * sp

    cglob = np.arange(c_ext) - halo                 # global seed col
    xglob = np.arange(w_ext) - halo * sp            # global pixel x
    ry = np.arange(h) % sp
    rx = np.arange(w_ext) % sp

    def axis_gate(r, off):
        return np.abs(off * sp + sp // 2 - r) < sp

    gate_y = {off: axis_gate(ry, off)[:, None] for off in (-1, 0, 1)}
    gate_x = {off: axis_gate(rx, off)[None, :] for off in (-1, 0, 1)}

    pixel_valid = np.zeros((h, w_ext), bool)
    pixel_valid[:oh, :] = (xglob >= 0) & (xglob < ow)

    seed_valid = np.zeros((R, c_ext), bool)
    seed_valid[:oh // sp, :] = (cglob >= 0) & (cglob < ow // sp)

    in_c = (cglob >= 0) & (cglob < C)
    flat_id = np.where(in_c[None, :],
                       np.arange(R)[:, None] * C + cglob[None, :],
                       -1).astype(np.int32)

    # window coordinates: y rows are global already; x from global cols
    k = 4 * sp * sp
    wy = np.arange(2 * sp)
    wx = np.arange(2 * sp)
    oy = (np.arange(R) * sp - sp // 2)[:, None, None, None]
    ox = (cglob * sp - sp // 2)[None, :, None, None]
    win_y = np.broadcast_to(oy + wy[None, None, :, None],
                            (R, c_ext, 2 * sp, 2 * sp)
                            ).reshape(R, c_ext, k).astype(np.int32)
    win_x = np.broadcast_to(ox + wx[None, None, None, :],
                            (R, c_ext, 2 * sp, 2 * sp)
                            ).reshape(R, c_ext, k).astype(np.int32)
    interior = ((win_y >= 0) & (win_y < oh - 1)
                & (win_x >= 0) & (win_x < ow - 1))
    in_image = ((win_y >= 0) & (win_y < oh)
                & (win_x >= 0) & (win_x < ow))

    offsets = superpixel._OFFSETS
    in_range, nb_flat = {}, {}
    for di, dj in offsets:
        pad_v = np.pad(seed_valid, 1, constant_values=False)
        nb_valid = pad_v[1 + dj:1 + dj + R, 1 + di:1 + di + c_ext]
        nb_valid_px = np.repeat(np.repeat(nb_valid, sp, 0), sp, 1)
        in_range[(di, dj)] = (gate_y[dj] & gate_x[di]
                              & nb_valid_px & pixel_valid)
        pad_f = np.pad(flat_id, 1, constant_values=-1)
        nb = pad_f[1 + dj:1 + dj + R, 1 + di:1 + di + c_ext]
        nb_flat[(di, dj)] = np.repeat(np.repeat(nb, sp, 0), sp, 1)

    px_y = np.broadcast_to(
        np.arange(h, dtype=np.float32)[:, None], (h, w_ext))
    px_x = np.broadcast_to(xglob.astype(np.float32)[None, :], (h, w_ext))
    center_y = np.broadcast_to(
        (np.arange(R, dtype=np.float32) * sp + sp // 2)[:, None],
        (R, c_ext))
    center_x = np.broadcast_to(
        (cglob * sp + sp // 2).astype(np.float32)[None, :], (R, c_ext))

    return dict(
        pixel_valid=pixel_valid, seed_valid=seed_valid, flat_id=flat_id,
        interior=interior, in_image=in_image, win_y=win_y, win_x=win_x,
        in_range=in_range, nb_flat=nb_flat,
        px_y=px_y, px_x=px_x, center_y=center_y, center_x=center_x,
        own=own, c_round=c_round, grid_cols=C, halo=halo,
    )


def _slab_geom(ext, shard, sp):
    """Per-shard slice of the extended geometry (traced offsets)."""
    own, halo = ext["own"], ext["halo"]
    slab_c = own + 2 * halo

    def sl(a, unit):
        a = jnp.asarray(a)
        start = [jnp.int32(0)] * a.ndim
        start[1] = (shard * own * unit).astype(jnp.int32)
        size = list(a.shape)
        size[1] = slab_c * unit
        return jax.lax.dynamic_slice(a, start, size)

    return dict(
        pixel_valid=sl(ext["pixel_valid"], sp),
        seed_valid=sl(ext["seed_valid"], 1),
        flat_id=sl(ext["flat_id"], 1),
        interior=sl(ext["interior"], 1),
        in_image=sl(ext["in_image"], 1),
        win_y=sl(ext["win_y"], 1), win_x=sl(ext["win_x"], 1),
        in_range={k: sl(v, sp) for k, v in ext["in_range"].items()},
        nb_flat={k: sl(v, sp) for k, v in ext["nb_flat"].items()},
        px_y=sl(ext["px_y"], sp), px_x=sl(ext["px_x"], sp),
        center_y=sl(ext["center_y"], 1), center_x=sl(ext["center_x"], 1),
        grid_cols=ext["grid_cols"],
        col0=shard * own - halo,
    )


def slab_segmentation(config: SurfelMapConfig, ext, n_slabs: int,
                      image: jnp.ndarray, depth: jnp.ndarray):
    """Column-slab SPMD segmentation body (call under shard_map with a
    "surfel" axis).  Each shard segments its slab; owned columns are
    all-gathered into the full-frame (seeds, assignment) every shard needs
    for the surfel-sharded fusion."""
    sp = config.sp_size
    own, halo = ext["own"], ext["halo"]
    C = config.sp_cols
    shard = jax.lax.axis_index("surfel")

    pad_l = halo * sp
    pad_r = (ext["c_round"] - C) * sp + halo * sp
    img_e = jnp.pad(image, ((0, 0), (pad_l, pad_r)))
    dep_e = jnp.pad(depth, ((0, 0), (pad_l, pad_r)))
    slab_w = (own + 2 * halo) * sp
    start = (jnp.int32(0), (shard * own * sp).astype(jnp.int32))
    img_s = jax.lax.dynamic_slice(img_e, start, (img_e.shape[0], slab_w))
    dep_s = jax.lax.dynamic_slice(dep_e, start, (dep_e.shape[0], slab_w))

    g = _slab_geom(ext, shard, sp)
    seeds, assignment = superpixel.run_slic(config, img_s, dep_s,
                                            use_pallas=False, geom=g)
    seeds, _ = normals.compute_seed_planes(config, seeds, assignment,
                                           dep_s, geom=g)

    own_seeds = jax.tree.map(
        lambda a: jax.lax.slice_in_dim(a, halo, halo + own, axis=1), seeds)
    own_assign = jax.lax.slice_in_dim(assignment, halo * sp,
                                      (halo + own) * sp, axis=1)

    full_seeds = jax.tree.map(
        lambda a: jax.lax.all_gather(a, "surfel", axis=1, tiled=True),
        own_seeds)
    full_assign = jax.lax.all_gather(own_assign, "surfel", axis=1,
                                     tiled=True)
    # crop the divisibility padding back to the config grid
    full_seeds = jax.tree.map(
        lambda a: jax.lax.slice_in_dim(a, 0, C, axis=1), full_seeds)
    full_assign = jax.lax.slice_in_dim(full_assign, 0,
                                       config.padded_width, axis=1)
    return full_seeds, full_assign


@functools.lru_cache(maxsize=4)
def sharded_fuse_frame_framestage(config: SurfelMapConfig, mesh: Mesh):
    """`sharding.sharded_fuse_frame` with the frame stage column-sharded
    instead of replicated: same call signature, same outputs (pinned equal
    by tests/test_frame_sharding.py), but the segmentation work per chip
    drops to (own + 2*HALO_SP)/sp_cols of the frame."""
    from .sharding import _fuse_shard
    n_surfel = mesh.shape["surfel"]
    ext = _extended_geometry(config, n_surfel)

    def per_stream(bank, frame):
        seg = slab_segmentation(config, ext, n_surfel,
                                frame.image, frame.depth)
        return _fuse_shard(config, bank, frame, n_surfel, segmented=seg)

    def stepper(banks, frames):
        banks = banks.replace(count=banks.count[:, 0])
        banks, stats = jax.vmap(per_stream)(banks, frames)
        banks = banks.replace(count=banks.count[:, None])
        return banks, stats

    bank_spec = _bank_pspec()
    frame_spec = FrameInput(image=P("data"), depth=P("data"),
                            pose=P("data"), frame_index=P("data"))
    stats_spec = {k: P("data") for k in
                  ("n_live", "n_new", "n_dropped", "n_fused_seeds")}
    mapped = jax.shard_map(
        stepper, mesh=mesh,
        in_specs=(bank_spec, frame_spec),
        out_specs=(bank_spec, stats_spec))
    return jax.jit(mapped, donate_argnums=(0,))


@functools.lru_cache(maxsize=4)
def sharded_fuse_frame_framestage_windowed_packed(config: SurfelMapConfig,
                                                 mesh: Mesh):
    """Driver-integrated form: the windowed packed step
    (`sharding.sharded_fuse_frame_windowed_packed` — same call signature,
    same outputs) with the frame stage column-sharded instead of
    replicated.  `ShardedDeviceResidentMapping(frame_sharded=True)`
    selects it, closing the "multi-chip scales capacity but not
    single-stream frame rate" caveat: segmentation work per chip drops to
    (own + 2*HALO_SP)/sp_cols of the frame.

    Call: (banks, bufs (B, 3HW) u8, poses (B,4,4) f32, refs (B,) i32,
    masks (B, max_keyframes) bool) -> (banks, stats)."""
    from ..pipeline.fuse_step import unpack_frame, ingest_frame
    from .sharding import _fuse_shard
    n_surfel = mesh.shape["surfel"]
    ext = _extended_geometry(config, n_surfel)

    def per_stream(bank, buf, pose, ref, mask):
        img_u8, dep_f16 = unpack_frame(config, buf)
        img, dep = ingest_frame(config, img_u8, dep_f16)
        seg = slab_segmentation(config, ext, n_surfel, img, dep)
        frame = FrameInput(image=img, depth=dep, pose=pose, frame_index=ref)
        return _fuse_shard(config, bank, frame, n_surfel, pose_mask=mask,
                           segmented=seg)

    def stepper(banks, bufs, poses, refs, masks):
        banks = banks.replace(count=banks.count[:, 0])
        banks, stats = jax.vmap(per_stream)(banks, bufs, poses, refs, masks)
        banks = banks.replace(count=banks.count[:, None])
        return banks, stats

    bank_spec = _bank_pspec()
    stats_spec = {k: P("data") for k in
                  ("n_live", "n_new", "n_dropped", "n_fused_seeds")}
    mapped = jax.shard_map(
        stepper, mesh=mesh,
        in_specs=(bank_spec, P("data"), P("data"), P("data"), P("data")),
        out_specs=(bank_spec, stats_spec))
    return jax.jit(mapped, donate_argnums=(0,))

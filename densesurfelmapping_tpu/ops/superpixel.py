"""SLIC-style superpixel segmentation over intensity + inverse depth.

TPU-native re-design of the reference superpixel engine
(`fusion_functions.cpp:363-642`):

* `initialize_seeds_kernel` -> strided slicing + one windowed first-valid scan
* `update_pixels_kernel`    -> a 9-candidate masked argmin over upsampled seed
                               planes (the 3x3-seed stencil becomes 9 shifted
                               block-broadcasts; all gates are *static* masks)
* `update_seeds_kernel`     -> masked window reductions + a vectorized Huber
                               Newton refinement of per-seed mean depth

Everything is pure, statically shaped, and runs under one jit.  Thread-count
artifacts of the reference (10-way chunking, the `return`-kills-chunk bug at
`fusion_functions.cpp:516-517`, racy stable-flag writes at `:445,450`) are
deliberately replaced by per-seed semantics; output parity is enforced by
golden tests at tolerance instead of bit-exactness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SurfelMapConfig
from ..core.state import SuperpixelState
from . import windows as W

BIG_COST = jnp.float32(1e10)

# candidate scan order of the reference: check_i (x offset) outer, check_j
# (y offset) inner (`fusion_functions.cpp:413-414`); first strict minimum wins.
_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]


@functools.lru_cache(maxsize=8)
def _static_geometry(config: SurfelMapConfig):
    """Host-side constant masks/planes for the given config."""
    sp = config.sp_size
    h, w = config.padded_height, config.padded_width
    rows, cols = config.sp_rows, config.sp_cols
    oh, ow = config.height, config.width

    ry = np.arange(h) % sp
    rx = np.arange(w) % sp
    # |off*sp + sp/2 - r| < sp  gate of `update_pixels_kernel`
    # (`fusion_functions.cpp:416-420`), reduced to a function of r = pix % sp.
    def axis_gate(r, off):
        return np.abs(off * sp + sp // 2 - r) < sp

    gate_y = {off: axis_gate(ry, off)[:, None] for off in (-1, 0, 1)}
    gate_x = {off: axis_gate(rx, off)[None, :] for off in (-1, 0, 1)}

    pixel_valid = np.zeros((h, w), bool)
    pixel_valid[:oh, :ow] = True

    seed_valid = np.zeros((rows, cols), bool)
    seed_valid[:oh // sp, :ow // sp] = True

    flat_id = (np.arange(rows)[:, None] * cols + np.arange(cols)[None, :]
               ).astype(np.int32)

    interior = W.window_interior_mask(rows, cols, sp, oh, ow)
    in_image = W.window_image_mask(rows, cols, sp, oh, ow)
    win_y, win_x = W.window_pixel_coords(rows, cols, sp)

    in_range = {}
    for di, dj in _OFFSETS:
        pad_v = np.pad(seed_valid, 1, constant_values=False)
        nb_valid = pad_v[1 + dj:1 + dj + rows, 1 + di:1 + di + cols]
        nb_valid_px = np.repeat(np.repeat(nb_valid, sp, 0), sp, 1)
        in_range[(di, dj)] = gate_y[dj] & gate_x[di] & nb_valid_px & pixel_valid

    nb_flat = {}
    for di, dj in _OFFSETS:
        pad_f = np.pad(flat_id, 1, constant_values=-1)
        nb = pad_f[1 + dj:1 + dj + rows, 1 + di:1 + di + cols]
        nb_flat[(di, dj)] = np.repeat(np.repeat(nb, sp, 0), sp, 1)

    px_y = np.broadcast_to(np.arange(h, dtype=np.float32)[:, None], (h, w))
    px_x = np.broadcast_to(np.arange(w, dtype=np.float32)[None, :], (h, w))
    center_y = np.broadcast_to(
        (np.arange(rows, dtype=np.float32) * sp + sp // 2)[:, None],
        (rows, cols))
    center_x = np.broadcast_to(
        (np.arange(cols, dtype=np.float32) * sp + sp // 2)[None, :],
        (rows, cols))

    return dict(
        pixel_valid=pixel_valid, seed_valid=seed_valid, flat_id=flat_id,
        interior=interior, in_image=in_image, win_y=win_y, win_x=win_x,
        in_range=in_range, nb_flat=nb_flat,
        px_y=px_y, px_x=px_x, center_y=center_y, center_x=center_x,
        # id layout of `flat_id` values: id = r * grid_cols + (col0 + c_local)
        # — the identity layout here; the column-slab SPMD path
        # (parallel/frame_sharding.py) overrides these to map global ids
        # back into its local seed grid
        grid_cols=cols, col0=0,
    )


def _neighbor_plane(field: jnp.ndarray, di: int, dj: int, sp: int,
                    fill=0.0) -> jnp.ndarray:
    """Seed plane (R, C) -> pixel plane (H, W) of each pixel's (di, dj)
    neighbor-seed value."""
    rows, cols = field.shape
    p = jnp.pad(field, 1, constant_values=fill)
    nb = jax.lax.slice(p, (1 + dj, 1 + di), (1 + dj + rows, 1 + di + cols))
    return W.upsample_to_pixels(nb, sp)


def initialize_seeds(config: SurfelMapConfig, image: jnp.ndarray,
                     depth: jnp.ndarray, geom=None) -> SuperpixelState:
    """Seed grid init (`fusion_functions.cpp:577-629`): centers on the SP
    grid; if the center has no depth, steal the first valid depth in the
    seed's window (row-major scan order).

    geom: optional override of the static geometry dict — used by the
    column-slab SPMD path (parallel/frame_sharding.py) to pass per-shard
    sliced masks/coordinates as traced data instead of config constants.
    """
    sp = config.sp_size
    g = geom or _static_geometry(config)
    rows, cols = image.shape[0] // sp, image.shape[1] // sp

    half = sp // 2
    center_i = image.reshape(rows, sp, cols, sp)[:, half, :, half]
    center_d = depth.reshape(rows, sp, cols, sp)[:, half, :, half]

    depth_win = W.extract_windows(depth, sp)
    steal_ok = (depth_win > 0.01) & jnp.asarray(g["interior"])
    stolen, found = W.first_valid(depth_win, steal_ok)

    mean_depth = jnp.where((center_d < 0.01) & found, stolen, center_d)

    seed_valid = jnp.asarray(g["seed_valid"])
    cy = jnp.asarray(g["center_y"], jnp.float32)
    cx = jnp.asarray(g["center_x"], jnp.float32)

    zeros = jnp.zeros((rows, cols), jnp.float32)
    return SuperpixelState(
        x=jnp.broadcast_to(cx, (rows, cols)),
        y=jnp.broadcast_to(cy, (rows, cols)),
        mean_intensity=jnp.where(seed_valid, center_i, 0.0),
        mean_depth=jnp.where(seed_valid, mean_depth, 0.0),
        size=zeros, norm=jnp.zeros((rows, cols, 3), jnp.float32),
        pos=jnp.zeros((rows, cols, 3), jnp.float32),
        view_cos=zeros,
        stable=~seed_valid,   # padded seeds are permanently "stable" (inert)
        fused=jnp.zeros((rows, cols), bool),
    )


def assign_pixels(config: SurfelMapConfig, seeds: SuperpixelState,
                  image: jnp.ndarray, inv_depth: jnp.ndarray,
                  assignment: jnp.ndarray, geom=None):
    """One pixel-assignment sweep (`update_pixels_kernel`,
    `fusion_functions.cpp:389-453`).

    Returns (new_assignment, new_stable, updated_mask).  Pixels whose current
    seed is stable keep their assignment; every freshly claimed seed loses its
    stable flag (computed as a windowed OR instead of the reference's racy
    scatter)."""
    sp = config.sp_size
    g = geom or _static_geometry(config)
    rows, cols = seeds.x.shape
    n_seeds = rows * cols

    px_y = jnp.asarray(g["px_y"], jnp.float32)
    px_x = jnp.asarray(g["px_x"], jnp.float32)

    half_sq = jnp.float32((sp // 2) * (sp // 2))

    # running strict-< minimum in the reference's candidate scan order:
    # first minimum wins, no (9, H, W) stacks materialized
    best_d = jnp.full(image.shape, BIG_COST)
    best_d_idx = jnp.full(image.shape, -1, jnp.int32)
    best_nd = jnp.full(image.shape, BIG_COST)
    best_nd_idx = jnp.full(image.shape, -1, jnp.int32)
    all_has_depth = inv_depth > 0
    for di, dj in _OFFSETS:
        sx = _neighbor_plane(seeds.x, di, dj, sp)
        sy = _neighbor_plane(seeds.y, di, dj, sp)
        si = _neighbor_plane(seeds.mean_intensity, di, dj, sp)
        sd = _neighbor_plane(seeds.mean_depth, di, dj, sp)
        in_range = jnp.asarray(g["in_range"][(di, dj)])
        flat = jnp.asarray(g["nb_flat"][(di, dj)])

        dist = (sx - px_x) ** 2 + (sy - px_y) ** 2
        idiff = si - image
        nodepth = dist / half_sq + idiff * idiff / 100.0
        ddiff = jnp.where(sd > 0, 1.0 / jnp.maximum(sd, 1e-20), 0.0) - inv_depth
        with_depth = nodepth + ddiff * ddiff * 400.0
        has_d = (sd > 0) & (inv_depth > 0)

        cost_nd = jnp.where(in_range, nodepth, BIG_COST)
        cost_d = jnp.where(in_range & has_d, with_depth, cost_nd)

        take_d = cost_d < best_d
        best_d = jnp.where(take_d, cost_d, best_d)
        best_d_idx = jnp.where(take_d, flat, best_d_idx)
        take_nd = cost_nd < best_nd
        best_nd = jnp.where(take_nd, cost_nd, best_nd)
        best_nd_idx = jnp.where(take_nd, flat, best_nd_idx)
        # all_has_depth &= calculate_cost(...) over in-range candidates only
        all_has_depth = all_has_depth & (has_d | ~in_range)

    chosen = jnp.where(all_has_depth, best_d_idx, best_nd_idx)
    best_cost = jnp.where(all_has_depth, best_d, best_nd)
    chosen = jnp.where(best_cost >= BIG_COST, -1, chosen)

    stable_flat = seeds.stable.reshape(n_seeds)
    # assignment holds GLOBAL flat ids (id = r * grid_cols + global col);
    # map into this seed grid's local layout (identity in the full-frame
    # case; a column-slab under frame sharding sees only its own columns)
    ids = jnp.clip(assignment, 0)
    id_r = ids // g["grid_cols"]
    id_c = ids % g["grid_cols"] - g["col0"]
    in_grid = (assignment >= 0) & (id_c >= 0) & (id_c < cols)
    lidx = jnp.clip(id_r * cols + id_c, 0, n_seeds - 1)
    cur_stable = stable_flat[lidx] & in_grid
    updated = jnp.asarray(g["pixel_valid"]) & ~cur_stable

    new_assignment = jnp.where(updated, chosen, assignment)

    # stable := stable & not freshly claimed (windowed OR over claimants)
    claim_src = jnp.where(updated, new_assignment, -1)
    claim_win = W.extract_windows(claim_src, sp)
    claimed = jnp.any(claim_win == jnp.asarray(g["flat_id"])[..., None], axis=-1)
    new_stable = seeds.stable & ~claimed

    return new_assignment, seeds.replace(stable=new_stable), updated


def update_seeds(config: SurfelMapConfig, seeds: SuperpixelState,
                 assignment: jnp.ndarray, image_win: jnp.ndarray,
                 depth_win: jnp.ndarray, geom=None) -> SuperpixelState:
    """One seed-update sweep (`update_seeds_kernel`,
    `fusion_functions.cpp:468-561`): recompute centroid / mean intensity of
    every unstable seed, latch stability on small updates, and Huber-Newton
    the per-seed mean depth (5 iterations, early-break latch)."""
    sp = config.sp_size
    g = geom or _static_geometry(config)
    hr = jnp.float32(config.profile.huber_range)

    assign_win = W.extract_windows(assignment, sp)
    # padded window elements read 0 == a real flat id; mask them off via
    # the interior mask (identical geometry to the full-frame constants)
    member = (assign_win == jnp.asarray(g["flat_id"])[..., None]) \
        & jnp.asarray(g["interior"])

    n = jnp.sum(member, axis=-1).astype(jnp.float32)
    safe_n = jnp.maximum(n, 1.0)
    sum_x = W.masked_sum(jnp.broadcast_to(
        jnp.asarray(g["win_x"], jnp.float32), member.shape), member)
    sum_y = W.masked_sum(jnp.broadcast_to(
        jnp.asarray(g["win_y"], jnp.float32), member.shape), member)
    sum_i = W.masked_sum(image_win, member)

    new_x = sum_x / safe_n
    new_y = sum_y / safe_n
    new_i = sum_i / safe_n

    # per-seed semantics: a seed with zero members keeps its state (the
    # reference instead `return`s, killing the remaining seeds of the worker
    # thread's chunk — a bug we do not reproduce; fusion_functions.cpp:516-517)
    upd = ~seeds.stable & (n > 0)

    diff = (jnp.abs(seeds.mean_intensity - new_i)
            + jnp.abs(seeds.x - new_x) + jnp.abs(seeds.y - new_y))
    new_stable = seeds.stable | (upd & (diff < 0.2))

    # Huber-Newton mean depth over members with depth > 0.1
    dmem = member & (depth_win > 0.1)
    nd = jnp.sum(dmem, axis=-1).astype(jnp.float32)
    mean = W.masked_sum(depth_win, dmem) / jnp.maximum(nd, 1.0)
    converged = nd <= 0
    for _ in range(5):
        r = mean[..., None] - depth_win
        inl = (r < hr) & (r > -hr)
        sum_a = W.masked_sum(jnp.where(inl, 2.0 * r,
                                       jnp.where(r > 0, hr, -hr)), dmem)
        sum_b = 2.0 * jnp.sum(dmem & inl, axis=-1).astype(jnp.float32)
        delta = -sum_a / (sum_b + 10.0)
        mean = jnp.where(converged, mean, mean + delta)
        converged = converged | (jnp.abs(delta) < 0.01)
    new_depth = jnp.where(nd > 0, mean, 0.0)

    return seeds.replace(
        x=jnp.where(upd, new_x, seeds.x),
        y=jnp.where(upd, new_y, seeds.y),
        mean_intensity=jnp.where(upd, new_i, seeds.mean_intensity),
        mean_depth=jnp.where(upd, new_depth, seeds.mean_depth),
        stable=new_stable,
    )


def run_slic(config: SurfelMapConfig, image: jnp.ndarray,
             depth: jnp.ndarray, use_pallas: bool | None = None,
             geom=None):
    """Full superpixel extraction (`generate_super_pixels`,
    `fusion_functions.cpp:960-975`): seed init + ITERATION_NUM x
    (assign, update).  Returns (seeds, assignment (H,W) i32 flat ids).

    use_pallas: None = auto (Pallas kernels on TPU, pure-XLA elsewhere).
    Both paths compute the same function; tests cross-check them.
    geom: per-shard geometry override (column-slab SPMD path) — forces the
    pure-XLA path.
    """
    sp = config.sp_size
    if use_pallas is None:
        use_pallas = geom is None and jax.default_backend() == "tpu"
    inv_depth = jnp.where(depth > 0.01, 1.0 / jnp.maximum(depth, 1e-20), 0.0)

    seeds = initialize_seeds(config, image, depth, geom=geom)
    # raw pixels start at seed 0 like the reference's zero-fill
    # (fusion_functions.cpp:964); padded pixels are pinned to -1 (no seed)
    g = geom or _static_geometry(config)
    assignment = jnp.where(jnp.asarray(g["pixel_valid"]), 0, -1).astype(jnp.int32)

    if use_pallas:
        from .pallas import slic as P
        for _ in range(config.sp_iters):
            assignment, seeds = P.assign_pixels_pallas(
                config, seeds, image, inv_depth, assignment)
            seeds = P.update_seeds_pallas(config, seeds, assignment,
                                          image, depth)
        return seeds, assignment

    image_win = W.extract_windows(image, sp)
    depth_win = W.extract_windows(depth, sp)
    for _ in range(config.sp_iters):
        assignment, seeds, _ = assign_pixels(
            config, seeds, image, inv_depth, assignment, geom=geom)
        seeds = update_seeds(config, seeds, assignment, image_win,
                             depth_win, geom=geom)
    return seeds, assignment

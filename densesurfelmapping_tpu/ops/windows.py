"""Per-seed window extraction — the TPU replacement for gathered pixel scans.

Every per-superpixel stage of the reference scans the seed's 2*SP x 2*SP
pixel window testing `superpixel_index[p] == seed` (`fusion_functions.cpp:
497-515, 738-760, 811-839`).  Serial gathers like that are poison on TPU, so
we restructure: extract, for every seed simultaneously, its full window as a
dense (R, C, 4*SP*SP) tensor via pure reshape/concat (no gather, no scatter),
then express all reductions as masked sums over the last axis.  Windows
overlap by SP pixels, so the expansion factor is exactly 4x — a few tens of
MB in HBM for KITTI-sized frames, trivially fused by XLA.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def extract_windows(field: jnp.ndarray, sp: int) -> jnp.ndarray:
    """(H, W) -> (R, C, 4*sp*sp) where window (r, c) is the row-major
    flattening of field[r*sp - sp/2 : r*sp + 3sp/2, c*sp - sp/2 : c*sp + 3sp/2]
    zero-padded outside the array.

    Matches the reference window geometry `check_{x,y}_begin = sp*SP + SP/2 -
    SP`, extent 2*SP (`fusion_functions.cpp:482-485`).  Row-major order is
    preserved so "first valid element" semantics survive flattening.
    """
    h, w = field.shape
    assert h % sp == 0 and w % sp == 0, (h, w, sp)
    r, c = h // sp, w // sp
    half = sp // 2
    padded = jnp.pad(field, ((half, sp - half), (half, sp - half)))
    # non-overlapping sp x sp tiles of the padded image
    tiles = padded.reshape(r + 1, sp, c + 1, sp).transpose(0, 2, 1, 3)
    top = jnp.concatenate([tiles[:-1, :-1], tiles[:-1, 1:]], axis=-1)
    bot = jnp.concatenate([tiles[1:, :-1], tiles[1:, 1:]], axis=-1)
    win = jnp.concatenate([top, bot], axis=-2)       # (r, c, 2sp, 2sp)
    return win.reshape(r, c, 4 * sp * sp)


@functools.lru_cache(maxsize=8)
def window_pixel_coords(rows: int, cols: int, sp: int):
    """Static (R, C, 4*sp*sp) int32 arrays of each window element's absolute
    pixel (y, x) coordinate.  Host-computed numpy constants."""
    wy = np.arange(2 * sp)
    wx = np.arange(2 * sp)
    oy = (np.arange(rows) * sp - sp // 2)[:, None, None, None]
    ox = (np.arange(cols) * sp - sp // 2)[None, :, None, None]
    y = np.broadcast_to(oy + wy[None, None, :, None], (rows, cols, 2 * sp, 2 * sp))
    x = np.broadcast_to(ox + wx[None, None, None, :], (rows, cols, 2 * sp, 2 * sp))
    k = 4 * sp * sp
    return (y.reshape(rows, cols, k).astype(np.int32),
            x.reshape(rows, cols, k).astype(np.int32))


@functools.lru_cache(maxsize=8)
def window_interior_mask(rows: int, cols: int, sp: int,
                         orig_h: int, orig_w: int) -> np.ndarray:
    """Static mask of window elements the reference's *clamped* scans visit:
    0 <= y < orig_h - 1 and 0 <= x < orig_w - 1.

    `update_seeds_kernel` and the seed-init depth steal clamp `check_end` to
    image dim - 1 with a strict-< loop (`fusion_functions.cpp:486-489,
    606-609`), so the last row/column of the raw image is never visited by
    those passes."""
    y, x = window_pixel_coords(rows, cols, sp)
    return (y >= 0) & (y < orig_h - 1) & (x >= 0) & (x < orig_w - 1)


@functools.lru_cache(maxsize=8)
def window_image_mask(rows: int, cols: int, sp: int,
                      orig_h: int, orig_w: int) -> np.ndarray:
    """Static mask of window elements inside the full raw image (incl. the
    last row/column).

    `calculate_sp_depth_norms_kernel` bounds its scan only by a *flat* index
    check (`fusion_functions.cpp:815-817`), which admits the last row/column;
    its out-of-row wrap-around reads can never match the seed id, so the
    effective visit set is exactly the in-image window."""
    y, x = window_pixel_coords(rows, cols, sp)
    return (y >= 0) & (y < orig_h) & (x >= 0) & (x < orig_w)


def first_valid(values: jnp.ndarray, valid: jnp.ndarray):
    """Along the last axis: (first valid value or 0, any valid).

    Replaces the reference's early-break row-major scan for stealing a
    nearby depth (`fusion_functions.cpp:610-625`): argmax of a bool mask
    returns the first True index."""
    idx = jnp.argmax(valid, axis=-1)
    found = jnp.any(valid, axis=-1)
    picked = jnp.take_along_axis(values, idx[..., None], axis=-1)[..., 0]
    return jnp.where(found, picked, 0.0), found


def masked_sum(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.where(mask, values, 0.0), axis=-1)


def upsample_to_pixels(seed_field: jnp.ndarray, sp: int) -> jnp.ndarray:
    """(R, C) seed plane -> (H, W) pixel plane by sp x sp block replication."""
    r, c = seed_field.shape
    return jnp.broadcast_to(seed_field[:, None, :, None],
                            (r, sp, c, sp)).reshape(r * sp, c * sp)

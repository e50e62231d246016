"""TPU-native stereo depth: block-matching disparity with sub-pixel refine.

The reference pipeline cannot run without externally precomputed PSMNet
disparity maps (`kitti_publisher/scripts/publisher.py:36-41` loads .npy and
converts depth = bf / disparity).  This module removes that offline
dependency: a batched block-matching stereo matcher that runs on the TPU
and feeds the same `depth = bf / disparity` contract.

Design (TPU-first, no gathers on the hot path):
* cost volume: per candidate disparity d, SAD of intensity over a
  (2r+1)^2 window — the shift is a static pad/slice, the box filter two
  separable cumsum-diffs, all fused elementwise work on (H, W) planes;
* winner + sub-pixel: running argmin across the static disparity loop with
  neighbor costs tracked for the equiangular parabola refinement;
* validity: left-right consistency via the volume identity
  costR(y, x, d) = costL(y, x + d, d) (a static shift, no resampling),
  plus a matching-cost ceiling.

~D x 6 full-frame planes of VPU work; D=128 at KITTI size is ~15 ms-class
on a v5e, used once per frame *outside* the fusion hot loop, and only when
no precomputed depth is supplied.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np


class StereoConfig(NamedTuple):
    max_disparity: int = 128      # candidate range [min_disparity, max)
    min_disparity: int = 1        # d=0 (infinity) excluded by default
    radius: int = 4               # SAD window radius (9x9)
    lr_threshold: float = 1.0     # max |dL - dR| in px
    cost_ceiling: float = 12.0    # mean abs diff ceiling per px (0..255)
    texture_threshold: float = 1.5  # min mean |horizontal gradient| in window
    subpixel: bool = True


def _box_filter(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(H, W) mean filter over (2r+1)^2 windows via separable cumsum-diff
    (edge-padded so border windows average over the clipped support)."""
    k = 2 * r + 1

    def along(a, axis):
        pad = [(0, 0), (0, 0)]
        pad[axis] = (r + 1, r)
        ap = jnp.pad(a, pad, mode="edge")
        c = jnp.cumsum(ap, axis=axis)
        hi = jax.lax.slice_in_dim(c, k, c.shape[axis], axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, c.shape[axis] - k, axis=axis)
        return hi - lo

    return along(along(x, 0), 1) / float(k * k)


def _shift_right(img: jnp.ndarray, d: int) -> jnp.ndarray:
    """R_d(y, x) = img(y, x - d): content moves right, left edge replicated."""
    if d == 0:
        return img
    return jnp.pad(img, ((0, 0), (d, 0)), mode="edge")[:, :img.shape[1]]


def _shift_left(img: jnp.ndarray, d: int, fill: float) -> jnp.ndarray:
    if d == 0:
        return img
    return jnp.pad(img, ((0, 0), (0, d)),
                   constant_values=fill)[:, d:]


def disparity(left: jnp.ndarray, right: jnp.ndarray,
              config: StereoConfig = StereoConfig()) -> jnp.ndarray:
    """(H, W) f32 left disparity map; 0 = invalid.

    Jit-friendly: the disparity loop is static (unrolled by trace), every
    step is full-frame elementwise + two cumsums.
    """
    cfg = config
    h, w = left.shape
    big = jnp.float32(1e10)

    best = jnp.full((h, w), big)
    best_d = jnp.zeros((h, w), jnp.int32)
    prev_of_best = jnp.full((h, w), big)     # cost at best_d - 1
    next_of_best = jnp.full((h, w), big)     # cost at best_d + 1
    prev_c = jnp.full((h, w), big)
    bestR = jnp.full((h, w), big)
    bestR_d = jnp.zeros((h, w), jnp.int32)
    xcoord = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)

    for d in range(cfg.min_disparity, cfg.max_disparity):
        ad = jnp.abs(left - _shift_right(right, d))
        c = _box_filter(ad, cfg.radius)
        # pixels whose window reaches past the right image's left edge
        c = jnp.where(xcoord >= d, c, big)

        take = c < best
        # neighbor costs for the sub-pixel parabola: the winner's left
        # neighbor is prev_c at take time; its right neighbor is the cost
        # of the step just after the winning one
        next_of_best = jnp.where(take, big,
                                 jnp.where(best_d == d - 1, c, next_of_best))
        prev_of_best = jnp.where(take, prev_c, prev_of_best)
        best = jnp.where(take, c, best)
        best_d = jnp.where(take, d, best_d)
        prev_c = c

        # right-image volume: costR(y, x, d) = costL(y, x + d, d)
        cR = _shift_left(c, d, 1e10)
        takeR = cR < bestR
        bestR = jnp.where(takeR, cR, bestR)
        bestR_d = jnp.where(takeR, d, bestR_d)

    disp = best_d.astype(jnp.float32)
    if cfg.subpixel:
        c0, cm, cp = best, prev_of_best, next_of_best
        denom = cm + cp - 2.0 * c0
        interior = (cm < big) & (cp < big) & (denom > 1e-9)
        delta = jnp.where(interior, 0.5 * (cm - cp) / jnp.maximum(denom, 1e-9),
                          0.0)
        disp = disp + jnp.clip(delta, -0.5, 0.5)

    # left-right consistency: dR at (x - dL) should match dL.  dL is
    # bounded by max_disparity, so resolve the lookup with a static
    # select over candidate d (gather-free).
    dR_at = jnp.zeros((h, w), jnp.float32)
    for d in range(cfg.min_disparity, cfg.max_disparity):
        dR_shift = _shift_right(bestR_d.astype(jnp.float32), d)
        dR_at = jnp.where(best_d == d, dR_shift, dR_at)
    consistent = jnp.abs(dR_at - best_d.astype(jnp.float32)) \
        <= cfg.lr_threshold

    # texture gate: windows without horizontal gradient match everywhere
    grad = jnp.abs(left - _shift_right(left, 1))
    textured = _box_filter(grad, cfg.radius) >= cfg.texture_threshold

    valid = consistent & textured & (best <= cfg.cost_ceiling) & (best < big)
    return jnp.where(valid, disp, 0.0)


@functools.lru_cache(maxsize=4)
def jitted_disparity(config: StereoConfig = StereoConfig()):
    return jax.jit(functools.partial(disparity, config=config))


def depth_from_stereo(left: jnp.ndarray, right: jnp.ndarray, bf: float,
                      config: StereoConfig = StereoConfig(),
                      max_depth: Optional[float] = None) -> jnp.ndarray:
    """Metric depth = bf / disparity (publisher.py:40 contract); 0 invalid."""
    disp = jitted_disparity(config)(left, right)
    depth = jnp.where(disp > 0, bf / jnp.maximum(disp, 1e-6), 0.0)
    if max_depth is not None:
        depth = jnp.where(depth <= max_depth, depth, 0.0)
    return depth

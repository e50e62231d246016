"""Depth map post-filters: median denoise + flying-pixel suppression.

The reference pipeline assumes clean learned depth (PSMNet); raw block-
matching depth (models/stereo.py) carries speckle noise and boundary
flying pixels that would seed spurious surfels.  Two TPU-friendly,
gather-free filters:

* `median3x3` — 9-element separable-free median via a sorting network on
  shifted planes (invalid-aware: zeros never vote, pixels with too few
  valid neighbors stay invalid);
* `suppress_flyers` — invalidates pixels whose depth differs from more
  than half of their valid neighbors by a relative threshold (the classic
  flying-pixel test at occlusion boundaries).

Both are pure elementwise/shift pipelines (no gathers, static shapes) and
compose under jit with the stereo matcher.
"""

from __future__ import annotations

import jax.numpy as jnp


def _shifts3x3(x: jnp.ndarray):
    """The 9 aligned 3x3-neighborhood planes of x (edge-replicated)."""
    p = jnp.pad(x, 1, mode="edge")
    h, w = x.shape
    return [p[dy:dy + h, dx:dx + w] for dy in range(3) for dx in range(3)]


def median3x3(depth: jnp.ndarray, min_valid: int = 5,
              fill_invalid: bool = False) -> jnp.ndarray:
    """Invalid-aware 3x3 median of a depth map (0 = invalid).

    Invalid neighbors are replaced by +inf so they sort to the top and
    never win; the median index is chosen from the VALID count, and
    pixels with fewer than `min_valid` valid neighbors become invalid.

    By default a pixel whose own (center) depth is invalid STAYS invalid —
    filling it from a one-sided neighbor median would resurrect exactly the
    occlusion-boundary pixels suppress_flyers just removed.  Pass
    `fill_invalid=True` for hole-filling behavior when the input has not
    been gated upstream.
    """
    planes = _shifts3x3(depth)
    valid = [jnp.where(p > 0, p, jnp.inf) for p in planes]
    stack = jnp.stack(valid)                     # (9, H, W)
    n_valid = jnp.sum(jnp.stack([p > 0 for p in planes]), axis=0)

    s = jnp.sort(stack, axis=0)
    # median of the first n_valid sorted entries: index (n_valid-1)//2
    idx = jnp.clip((n_valid - 1) // 2, 0, 8)
    med = jnp.take_along_axis(s, idx[None], axis=0)[0]
    ok = n_valid >= min_valid
    if not fill_invalid:
        ok = ok & (depth > 0)
    return jnp.where(ok & jnp.isfinite(med), med, 0.0)


def suppress_flyers(depth: jnp.ndarray, rel_threshold: float = 0.03,
                    min_agree: int = 3) -> jnp.ndarray:
    """Invalidate flying pixels: a valid pixel survives only if at least
    `min_agree` valid neighbors agree with it within `rel_threshold`
    relative depth."""
    planes = _shifts3x3(depth)
    center = depth
    agree = jnp.zeros(depth.shape, jnp.int32)
    for i, p in enumerate(planes):
        if i == 4:
            continue
        close = (p > 0) & (jnp.abs(p - center)
                           <= rel_threshold * jnp.maximum(center, 1e-6))
        agree = agree + close.astype(jnp.int32)
    return jnp.where((center > 0) & (agree >= min_agree), center, 0.0)


def clean_depth(depth: jnp.ndarray, rel_threshold: float = 0.03,
                min_agree: int = 3, min_valid: int = 5) -> jnp.ndarray:
    """Standard post-filter chain for matcher output: flyer suppression
    then median denoise."""
    return median3x3(suppress_flyers(depth, rel_threshold, min_agree),
                     min_valid)

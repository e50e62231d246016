"""Hot-path map->camera depth render: the temporal prior for stereo.

The reference consumes *externally* precomputed PSMNet disparity
(`kitti_publisher/scripts/publisher.py:36-41`) and has no feedback from the
map into depth estimation.  Our stereo-resident mode computes depth on
device inside the fuse program — which means the surfel bank (the fused
result of every previous frame) is ALREADY in HBM when the matcher runs.
This op exposes it as a per-frame depth prior: a z-buffered point render of
the live bank into the current camera at superpixel granularity.

The prior is consumed by the matcher's rescue gate
(`models/stereo._wta_and_gates`, cfg.prior_rescue): a WTA winner that the
LR-consistency or uniqueness gate rejected, but that agrees with the map
within cfg.prior_tol px of disparity, is accepted.  That is cross-frame
evidence — the exact lever the round-4 subpixel study concluded was left
(BASELINE.md round-4 subpixel row): at occlusion bands the right image
cannot confirm a (correct) background match but the map can; on periodic
texture the uniqueness gate cannot disambiguate self-similar matches but
the map can.  The matcher itself still has to FIND the disparity — the
prior never injects map depth directly, so the map cannot confirm itself.

TPU design: one pass over the bank (transform + project, fused elementwise)
and ONE scatter-min onto a stride-decimated grid (default 8 px = the
reference's SP_SIZE superpixel pitch, `fusion_functions.h:10`) — the only
data-dependent op.  Scatter cost scales with bank capacity, not grid size;
the coarse grid then upsamples by repeat (nearest), giving every pixel the
nearest-surface depth of its superpixel-sized cell.  Under the sharded
drivers each shard renders its bank slab and a `lax.pmin` over the surfel
mesh axis merges the z-buffers exactly (min is associative), keeping the
sharded == dense bank invariant (`parallel/sharding.py`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import SurfelMapConfig
from ..core import geometry
from ..core.state import SurfelBank


def render_prior_depth(config: SurfelMapConfig, bank: SurfelBank,
                       pose: jnp.ndarray, stride: int = 8,
                       min_updates: int = 5,
                       axis_name: str | None = None) -> jnp.ndarray:
    """(H, W) f32 nearest-surface map depth at `pose` (Twc); 0 = no surfel.

    Only rows with update_times >= min_updates contribute (default 5 — the
    reference's stability threshold, `surfel_map.cpp:1159` update_times >= 5
    for export): young surfels born from a single noisy frame must not
    vouch for the next frame's matches.  `axis_name`: mesh axis to pmin
    shard-local z-buffers over (inside shard_map only)."""
    cam = config.camera
    h, w = config.height, config.width
    hs, ws = -(-h // stride), -(-w // stride)

    inv_pose = jnp.linalg.inv(pose)
    p_c = geometry.transform_points(inv_pose, bank.position)
    z = p_c[:, 2]
    uv = geometry.project(p_c, cam.fx, cam.fy, cam.cx, cam.cy)
    # pixel = round(uv) (the fusion convention, ops/fusion.py); cell = //stride
    pu = (uv[:, 0] + 0.5).astype(jnp.int32)
    pv = (uv[:, 1] + 0.5).astype(jnp.int32)

    ok = (bank.live_mask & (bank.update_times >= min_updates)
          & (z >= config.fuse_near) & (z <= config.fuse_far)
          & (pu >= 0) & (pu < w) & (pv >= 0) & (pv < h))
    cell = (pv // stride) * ws + (pu // stride)
    idx = jnp.where(ok, cell, hs * ws)

    buf = jnp.full((hs * ws,), jnp.inf, jnp.float32)
    buf = buf.at[idx].min(jnp.where(ok, z, jnp.inf), mode="drop")
    coarse = buf.reshape(hs, ws)
    if axis_name is not None:
        coarse = jax.lax.pmin(coarse, axis_name)
    coarse = jnp.where(jnp.isfinite(coarse), coarse, 0.0)
    return jnp.repeat(jnp.repeat(coarse, stride, axis=0),
                      stride, axis=1)[:h, :w]

"""The per-frame fuse step: one pure jitted function over device state.

Composite of the whole hot path (`FusionFunctions::fuse_initialize_map`,
`fusion_functions.cpp:30-83`, plus the slot-recycling epilogue of
`SurfelMap::fuse_map`, `surfel_map.cpp:1060-1113`):

    superpixels -> normals/plane fit -> fuse -> new surfels -> compaction

Everything is traced once per config; the bank is donated so the update is
in-place in HBM.  Stage outputs needed by the host (counts, seeds for debug)
come back as a small stats dict.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..config import SurfelMapConfig
from ..core.state import FrameInput, SurfelBank
from ..ops import superpixel, normals, fusion


def fuse_frame(config: SurfelMapConfig, bank: SurfelBank,
               frame: FrameInput) -> Tuple[SurfelBank, dict]:
    """(bank, frame) -> (bank', stats). Pure; config is static."""
    seeds, assignment = superpixel.run_slic(config, frame.image, frame.depth)
    seeds, _space = normals.compute_seed_planes(
        config, seeds, assignment, frame.depth)

    bank, fused = fusion.fuse_surfels(
        config, bank, seeds, assignment, frame.depth, frame.pose,
        frame.frame_index)

    new_fields, new_mask = fusion.extract_new_surfels(
        config, seeds, fused, frame.pose, frame.frame_index)
    # fast path: tail-append (no full-bank repack; holes are reclaimed by
    # compact_bank under the driver's fragmentation policy)
    bank, stats = fusion.append_new(bank, new_fields, new_mask)

    stats["n_fused_seeds"] = jnp.sum(fused.astype(jnp.int32))
    return bank, stats


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame(config: SurfelMapConfig):
    """jit of fuse_frame with the bank donated (in-place HBM update)."""
    return jax.jit(functools.partial(fuse_frame, config), donate_argnums=(0,))


@functools.lru_cache(maxsize=4)
def jitted_compact(config: SurfelMapConfig):
    del config  # signature symmetry; compact_bank is shape-generic
    return jax.jit(fusion.compact_bank, donate_argnums=(0,))


def segmentation_only(config: SurfelMapConfig, image: jnp.ndarray,
                      depth: jnp.ndarray):
    """Superpixel + plane-fit stage alone (for tests/debug visualisation,
    the analogue of the reference's `debug_show`)."""
    seeds, assignment = superpixel.run_slic(config, image, depth)
    seeds, _ = normals.compute_seed_planes(config, seeds, assignment, depth)
    return seeds, assignment


@functools.lru_cache(maxsize=4)
def jitted_segmentation(config: SurfelMapConfig):
    return jax.jit(functools.partial(segmentation_only, config))

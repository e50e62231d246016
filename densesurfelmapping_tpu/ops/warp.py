"""Loop-closure warp engine: batched rigid re-alignments of surfel tensors.

TPU-native re-design of `warp_surfels` (`surfel_map.cpp:791-824`): instead of
2x10 CPU threads looping over poses/surfels, the whole inactive pool is warped
by one gather + batched matmul (each surfel indexes its pose's warp matrix)
and the active bank by a single 4x4 transform — both trivially jit-fused.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import geometry
from ..core.state import SurfelBank


@jax.jit
def warp_active(bank: SurfelBank, warp: jnp.ndarray) -> SurfelBank:
    """Apply one warp matrix to every active surfel
    (`warp_active_surfels_cpu_kernel`, `surfel_map.cpp:750-789` — the
    reference uses the warp of the first local pose for all local surfels)."""
    return bank.replace(
        position=geometry.transform_points(warp, bank.position),
        normal=geometry.rotate_vectors(warp, bank.normal),
    )


@jax.jit
def warp_bank_by_pose(bank: SurfelBank, warps: jnp.ndarray,
                      moved: jnp.ndarray, pose_mask: jnp.ndarray,
                      first_local: jnp.ndarray) -> SurfelBank:
    """Loop-closure warp of a device-resident bank holding BOTH active and
    frozen surfels (no host pool).

    Reference semantics in one pass (`warp_surfels`, surfel_map.cpp:791-824):
    rows owned by an in-window (active) keyframe all use the FIRST local
    pose's warp (:808-813); frozen rows use their own keyframe's warp
    (:681-748); rows whose selected keyframe did not move stay put.

    warps: (P, 4, 4) loop_pose @ cam_pose^-1 per keyframe; moved: (P,) bool;
    pose_mask: (P,) bool active window; first_local: () i32."""
    P = warps.shape[0]
    lu = jnp.clip(bank.last_update, 0, P - 1)
    active = pose_mask[lu] & (bank.last_update >= 0)
    idx = jnp.where(active, first_local, lu)
    do = moved[idx] & (bank.update_times > 0) & (bank.last_update >= 0)
    new_p = geometry.transform_points_batched(warps, bank.position, idx)
    new_n = geometry.rotate_vectors_batched(warps, bank.normal, idx)
    return bank.replace(
        position=jnp.where(do[:, None], new_p, bank.position),
        normal=jnp.where(do[:, None], new_n, bank.normal),
    )


@jax.jit
def warp_pool(positions: jnp.ndarray, normals: jnp.ndarray,
              pose_index: jnp.ndarray, warps: jnp.ndarray):
    """Warp an inactive-pool slab: positions/normals (M, 3), pose_index (M,)
    selecting each surfel's warp from warps (P, 4, 4)
    (`warp_inactive_surfels_cpu_kernel`, `surfel_map.cpp:681-748`)."""
    new_p = geometry.transform_points_batched(warps, positions, pose_index)
    new_n = geometry.rotate_vectors_batched(warps, normals, pose_index)
    return new_p, new_n

"""Active<->inactive migration kernels (device side).

TPU-native re-design of `SurfelMap::move_add_surfels`
(`surfel_map.cpp:1456-1595`): the reference scans local_surfels per removed
pose on the CPU; here one jitted pass matches every removed pose at once,
compacts matches into a fixed-size migration buffer (device->host transfer of
exactly one slab), and kills them in the bank.  Re-activation reuses
`fusion.compact_and_append` (append through the same prefix-sum compaction).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..core.state import SurfelBank

# number of pose ids matchable per extraction call (padded, static)
MAX_REMOVE_POSES = 32


@functools.partial(jax.jit, static_argnums=(2,), donate_argnums=(0,))
def extract_by_pose(bank: SurfelBank, pose_ids: jnp.ndarray,
                    buffer_size: int) -> Tuple[SurfelBank, dict, jnp.ndarray]:
    """Remove live surfels whose last_update is in pose_ids (padded with -1,
    shape (MAX_REMOVE_POSES,)).

    Matches the reference's removal criterion `update_times > 0 &&
    last_update == inactive_index` (`surfel_map.cpp:1479-1497`).  Returns
    (bank without matches — compacted, buffer dict of extracted fields sized
    `buffer_size`, match count).  Overflow beyond buffer_size keeps surfels
    in the bank for a follow-up call (count reports only extracted rows).
    """
    live = bank.live_mask
    match = live & jnp.any(
        bank.last_update[:, None] == pose_ids[None, :], axis=-1)

    dest = jnp.cumsum(match.astype(jnp.int32)) - 1
    extracted = match & (dest < buffer_size)
    dest = jnp.where(extracted, dest, buffer_size)
    n = jnp.sum(extracted.astype(jnp.int32))

    def grab(arr):
        shape = (buffer_size,) + arr.shape[1:]
        return jnp.zeros(shape, arr.dtype).at[dest].set(arr, mode="drop")

    buf = dict(position=grab(bank.position), normal=grab(bank.normal),
               color=grab(bank.color), size=grab(bank.size),
               weight=grab(bank.weight),
               update_times=grab(bank.update_times),
               last_update=grab(bank.last_update))

    # kill extracted rows in place; holes are reclaimed by compact_bank
    # under the driver's fragmentation policy (no full-bank scatter here)
    new_bank = bank.replace(
        update_times=jnp.where(extracted, 0, bank.update_times))
    return new_bank, buf, n

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
               frame: FrameInput, pose_mask: jnp.ndarray | None = None
               ) -> Tuple[SurfelBank, dict]:
    """(bank, frame) -> (bank', stats). Pure; config is static.

    pose_mask (optional (max_keyframes,) bool): device-resident
    active-window gating — see `fusion.fuse_surfels`.

    Stages carry the reference's timing-print names (fusion_functions.cpp
    :55,75,82) as profiler scopes so xprof traces line up with the C++
    stopwatch output."""
    with jax.named_scope("superpixel"):
        seeds, assignment = superpixel.run_slic(config, frame.image,
                                                frame.depth)
        seeds, _space = normals.compute_seed_planes(
            config, seeds, assignment, frame.depth)

    with jax.named_scope("fuse"):
        bank, fused = fusion.fuse_surfels(
            config, bank, seeds, assignment, frame.depth, frame.pose,
            frame.frame_index, pose_mask=pose_mask)

    with jax.named_scope("initialize"):
        new_fields, new_mask = fusion.extract_new_surfels(
            config, seeds, fused, frame.pose, frame.frame_index)
        # fast path: tail-append (no full-bank repack; holes are reclaimed
        # by compact_bank under the driver's fragmentation policy)
        bank, stats = fusion.append_new(bank, new_fields, new_mask)

    stats["n_fused_seeds"] = jnp.sum(fused.astype(jnp.int32))
    return bank, stats


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame(config: SurfelMapConfig):
    """jit of fuse_frame with the bank donated (in-place HBM update)."""
    return jax.jit(functools.partial(fuse_frame, config), donate_argnums=(0,))


def ingest_frame(config: SurfelMapConfig, image_u8: jnp.ndarray,
                 depth_f16: jnp.ndarray):
    """Device-side decode of a compact frame (see `core.state.compact_frame`):
    u8 intensity + f16 depth at raw camera resolution -> padded f32 planes."""
    ph, pw = config.padded_height, config.padded_width
    oh, ow = config.height, config.width
    img = jnp.pad(image_u8.astype(jnp.float32), ((0, ph - oh), (0, pw - ow)))
    dep = jnp.pad(depth_f16.astype(jnp.float32), ((0, ph - oh), (0, pw - ow)))
    return img, dep


def fuse_frame_compact(config: SurfelMapConfig, bank: SurfelBank,
                       image_u8: jnp.ndarray, depth_f16: jnp.ndarray,
                       pose: jnp.ndarray, frame_index: jnp.ndarray
                       ) -> Tuple[SurfelBank, dict]:
    """fuse_frame over a compact-encoded frame (decode fused into the step)."""
    img, dep = ingest_frame(config, image_u8, depth_f16)
    return fuse_frame(config, bank, FrameInput(
        image=img, depth=dep, pose=pose, frame_index=frame_index))


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_compact(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frame_compact, config),
                   donate_argnums=(0,))


def unpack_frame(config: SurfelMapConfig, buf: jnp.ndarray):
    """In-jit decode of `core.state.pack_frame`: (3*H*W,) u8 -> (u8 image,
    f16 depth) at raw camera resolution."""
    oh, ow = config.height, config.width
    hw = oh * ow
    img = jax.lax.slice_in_dim(buf, 0, hw).reshape(oh, ow)
    dep_bytes = jax.lax.slice_in_dim(buf, hw, 3 * hw).reshape(oh, ow, 2)
    dep = jax.lax.bitcast_convert_type(dep_bytes, jnp.float16)
    return img, dep


def fuse_frame_packed(config: SurfelMapConfig, bank: SurfelBank,
                      buf: jnp.ndarray, pose: jnp.ndarray,
                      frame_index: jnp.ndarray) -> Tuple[SurfelBank, dict]:
    """fuse_frame over a single-buffer packed frame (one H2D transfer)."""
    img, dep = unpack_frame(config, buf)
    return fuse_frame_compact(config, bank, img, dep, pose, frame_index)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_packed(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frame_packed, config),
                   donate_argnums=(0,))


def fuse_frame_windowed_packed(config: SurfelMapConfig, bank: SurfelBank,
                               buf: jnp.ndarray, pose: jnp.ndarray,
                               frame_index: jnp.ndarray,
                               pose_mask: jnp.ndarray
                               ) -> Tuple[SurfelBank, dict]:
    """Windowed fuse step over a single-buffer packed frame."""
    img, dep = unpack_frame(config, buf)
    return fuse_frame_windowed(config, bank, img, dep, pose, frame_index,
                               pose_mask)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_windowed_packed(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frame_windowed_packed, config),
                   donate_argnums=(0,))


def fuse_frame_windowed(config: SurfelMapConfig, bank: SurfelBank,
                        image_u8: jnp.ndarray, depth_f16: jnp.ndarray,
                        pose: jnp.ndarray, frame_index: jnp.ndarray,
                        pose_mask: jnp.ndarray) -> Tuple[SurfelBank, dict]:
    """Compact fuse step with device-resident active/inactive gating.

    pose_mask (max_keyframes,) bool marks the drift-free window; rows owned
    by out-of-window keyframes are frozen in place (the in-HBM replacement
    for the host migration pool — zero per-frame device->host traffic)."""
    img, dep = ingest_frame(config, image_u8, depth_f16)
    return fuse_frame(config, bank, FrameInput(
        image=img, depth=dep, pose=pose, frame_index=frame_index),
        pose_mask=pose_mask)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_windowed(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frame_windowed, config),
                   donate_argnums=(0,))


def unpack_stereo(config: SurfelMapConfig, buf: jnp.ndarray):
    """In-jit decode of `core.state.pack_stereo_pair`: (2*H*W,) u8 ->
    (left f32, right f32) at raw camera resolution (the matcher needs
    signed intensity arithmetic)."""
    oh, ow = config.height, config.width
    hw = oh * ow
    left = jax.lax.slice_in_dim(buf, 0, hw).reshape(oh, ow)
    right = jax.lax.slice_in_dim(buf, hw, 2 * hw).reshape(oh, ow)
    return left.astype(jnp.float32), right.astype(jnp.float32)


def compute_depth_stereo(config: SurfelMapConfig, stereo_config,
                         left_f32: jnp.ndarray, right_f32: jnp.ndarray,
                         bf: jnp.ndarray, filter_depth: bool = True,
                         prior_depth: jnp.ndarray | None = None
                         ) -> jnp.ndarray:
    """On-device stereo front-end: disparity -> metric depth (the
    `depth = bf / disparity` contract of kitti_publisher's publisher.py:40)
    -> optional flyer/median post-filter.  bf = fx * baseline is a traced
    scalar so one program serves every sequence.

    prior_depth (optional (H, W) f32 map render, `ops/render.py`): the
    temporal prior for the matcher's rescue gate
    (stereo_config.prior_rescue) — converted to disparity with the same
    bf contract."""
    from ..models import stereo as stereo_model
    from ..ops import depthfilter

    prior_disp = None
    n_rescued = jnp.zeros((), jnp.int32)
    if prior_depth is not None:
        prior_disp = jnp.where(prior_depth > 0,
                               bf / jnp.maximum(prior_depth, 1e-6), 0.0)
        disp, n_rescued = stereo_model.disparity(
            left_f32, right_f32, stereo_config, prior_disp=prior_disp,
            with_rescued=True)
    else:
        disp = stereo_model.disparity(left_f32, right_f32, stereo_config)
    depth = jnp.where(disp > 0, bf / jnp.maximum(disp, 1e-6), 0.0)
    depth = jnp.where(depth <= config.fuse_far, depth, 0.0)
    if filter_depth:
        depth = depthfilter.clean_depth(depth)
        # fill-after-clean (round 4, experiments/stereo_gates.py v8):
        # clean_depth's median never fills, costing ~6% coverage; one
        # disparity-domain median fill pass on the CLEANED map restores
        # it at flat error (cov 0.872 -> 0.904, 10cm-inliers 0.429 ->
        # 0.437, >3px 8.2 -> 8.5% on the radius-15 scene)
        for _ in range(getattr(stereo_config, "fill_after_clean", 0)
                       if stereo_config.post_median else 0):
            d2 = jnp.where(depth > 0, bf / jnp.maximum(depth, 1e-6), 0.0)
            d2 = stereo_model._median_postfilter(
                d2, stereo_config.speckle_tol, stereo_config.fill_support)
            depth = jnp.where(d2 > 0, bf / jnp.maximum(d2, 1e-6), 0.0)
    return depth, n_rescued


def _stereo_prior(config: SurfelMapConfig, stereo_config, bank: SurfelBank,
                  pose: jnp.ndarray, axis_name: str | None = None):
    """Map-rendered depth prior for the matcher's rescue gate, or None.

    Rendered from the PRE-UPDATE bank (the map as of the previous frame)
    inside the same device program — the bank is already in HBM, so the
    prior costs one projection pass + one coarse scatter and no transfers
    (`ops/render.py`).  Trace-time gated on stereo_config.prior_rescue;
    also off in hierarchical mode, whose matcher ignores prior_disp (its
    validity comes from the half-res solve) — without this gate the fuse
    program would pay the render every frame and discard it (ADVICE r4)."""
    if not getattr(stereo_config, "prior_rescue", False) \
            or getattr(stereo_config, "hierarchical", False):
        return None
    from ..ops.render import render_prior_depth
    return render_prior_depth(config, bank, pose,
                              stride=stereo_config.prior_stride,
                              min_updates=stereo_config.prior_min_updates,
                              axis_name=axis_name)


def fuse_frame_stereo_packed(config: SurfelMapConfig, stereo_config,
                             filter_depth: bool, bank: SurfelBank,
                             buf: jnp.ndarray, pose: jnp.ndarray,
                             frame_index: jnp.ndarray, bf: jnp.ndarray
                             ) -> Tuple[SurfelBank, dict]:
    """Stereo-resident fuse step: ONE device program from a packed u8
    left/right pair to the updated bank — no per-frame depth readback (a
    single blocking D2H drops the client out of async dispatch for good,
    CLAUDE.md) and less H2D than image+depth (2 u8 planes vs u8 + f16).

    Replaces the reference's offline-PSMNet depth source
    (`kitti_publisher/scripts/publisher.py:36-41`) with an on-TPU
    front-end fused into the mapping step."""
    ph, pw = config.padded_height, config.padded_width
    oh, ow = config.height, config.width
    left, right = unpack_stereo(config, buf)
    depth, n_rescued = compute_depth_stereo(
        config, stereo_config, left, right, bf, filter_depth,
        prior_depth=_stereo_prior(config, stereo_config, bank, pose))
    img = jnp.pad(left, ((0, ph - oh), (0, pw - ow)))
    dep = jnp.pad(depth, ((0, ph - oh), (0, pw - ow)))
    bank, stats = fuse_frame(config, bank, FrameInput(
        image=img, depth=dep, pose=pose, frame_index=frame_index))
    stats["n_rescued_px"] = n_rescued
    return bank, stats


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_stereo_packed(config: SurfelMapConfig, stereo_config,
                                    filter_depth: bool = True):
    return jax.jit(functools.partial(fuse_frame_stereo_packed, config,
                                     stereo_config, filter_depth),
                   donate_argnums=(0,))


def fuse_frame_stereo_windowed_packed(config: SurfelMapConfig,
                                      stereo_config, filter_depth: bool,
                                      bank: SurfelBank, buf: jnp.ndarray,
                                      pose: jnp.ndarray,
                                      frame_index: jnp.ndarray,
                                      bf: jnp.ndarray,
                                      pose_mask: jnp.ndarray
                                      ) -> Tuple[SurfelBank, dict]:
    """Stereo-resident fuse step with the device-resident window gating
    (see fuse_frame_windowed)."""
    ph, pw = config.padded_height, config.padded_width
    oh, ow = config.height, config.width
    left, right = unpack_stereo(config, buf)
    depth, n_rescued = compute_depth_stereo(
        config, stereo_config, left, right, bf, filter_depth,
        prior_depth=_stereo_prior(config, stereo_config, bank, pose))
    img = jnp.pad(left, ((0, ph - oh), (0, pw - ow)))
    dep = jnp.pad(depth, ((0, ph - oh), (0, pw - ow)))
    bank, stats = fuse_frame(config, bank, FrameInput(
        image=img, depth=dep, pose=pose, frame_index=frame_index),
        pose_mask=pose_mask)
    stats["n_rescued_px"] = n_rescued
    return bank, stats


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_stereo_windowed_packed(config: SurfelMapConfig,
                                             stereo_config,
                                             filter_depth: bool = True):
    return jax.jit(functools.partial(fuse_frame_stereo_windowed_packed,
                                     config, stereo_config, filter_depth),
                   donate_argnums=(0,))


def unpack_aux(aux: jnp.ndarray):
    """In-jit decode of `core.state.pack_aux`: (72 + P,) u8 ->
    (pose (4,4) f32, frame_index i32, bf f32, window mask (P,) bool)."""
    pose = jax.lax.bitcast_convert_type(
        aux[:64].reshape(16, 4), jnp.float32).reshape(4, 4)
    ref = jax.lax.bitcast_convert_type(
        aux[64:68].reshape(1, 4), jnp.int32)[0]
    bf = jax.lax.bitcast_convert_type(
        aux[68:72].reshape(1, 4), jnp.float32)[0]
    return pose, ref, bf, aux[72:].astype(bool)


def fuse_frame_windowed_aux(config: SurfelMapConfig, bank: SurfelBank,
                            buf: jnp.ndarray, aux: jnp.ndarray
                            ) -> Tuple[SurfelBank, dict]:
    """Windowed packed fuse step whose small per-frame arguments arrive in
    ONE aux buffer (two H2D puts per frame instead of five)."""
    pose, ref, _, mask = unpack_aux(aux)
    img, dep = unpack_frame(config, buf)
    return fuse_frame_windowed(config, bank, img, dep, pose, ref, mask)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_windowed_aux(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frame_windowed_aux, config),
                   donate_argnums=(0,))


def fuse_frame_stereo_windowed_aux(config: SurfelMapConfig, stereo_config,
                                   filter_depth: bool, bank: SurfelBank,
                                   buf: jnp.ndarray, aux: jnp.ndarray
                                   ) -> Tuple[SurfelBank, dict]:
    """Stereo-resident windowed fuse with the single aux upload."""
    pose, ref, bf, mask = unpack_aux(aux)
    return fuse_frame_stereo_windowed_packed(
        config, stereo_config, filter_depth, bank, buf, pose, ref, bf,
        mask)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_stereo_windowed_aux(config: SurfelMapConfig,
                                          stereo_config,
                                          filter_depth: bool = True):
    return jax.jit(functools.partial(fuse_frame_stereo_windowed_aux,
                                     config, stereo_config, filter_depth),
                   donate_argnums=(0,))


def fuse_frame_onebuf(config: SurfelMapConfig, bank: SurfelBank,
                      buf: jnp.ndarray) -> Tuple[SurfelBank, dict]:
    """Windowed fuse step whose ENTIRE per-frame payload (packed frame +
    aux) arrives as one buffer — a single H2D put per frame
    (`core.state.pack_frame_with_aux`)."""
    hw3 = 3 * config.height * config.width
    frame = jax.lax.slice_in_dim(buf, 0, hw3)
    aux = jax.lax.slice_in_dim(buf, hw3, buf.shape[0])
    return fuse_frame_windowed_aux(config, bank, frame, aux)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_onebuf(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frame_onebuf, config),
                   donate_argnums=(0,))


def fuse_frame_stereo_onebuf(config: SurfelMapConfig, stereo_config,
                             filter_depth: bool, bank: SurfelBank,
                             buf: jnp.ndarray) -> Tuple[SurfelBank, dict]:
    """Stereo-resident windowed fuse with the whole payload (packed pair +
    aux) in one upload (`core.state.pack_stereo_with_aux`)."""
    hw2 = 2 * config.height * config.width
    pair = jax.lax.slice_in_dim(buf, 0, hw2)
    aux = jax.lax.slice_in_dim(buf, hw2, buf.shape[0])
    return fuse_frame_stereo_windowed_aux(config, stereo_config,
                                          filter_depth, bank, pair, aux)


@functools.lru_cache(maxsize=4)
def jitted_fuse_frame_stereo_onebuf(config: SurfelMapConfig, stereo_config,
                                    filter_depth: bool = True):
    return jax.jit(functools.partial(fuse_frame_stereo_onebuf, config,
                                     stereo_config, filter_depth),
                   donate_argnums=(0,))


def fuse_frames_scan(config: SurfelMapConfig, bank: SurfelBank,
                     images_u8: jnp.ndarray, depths_f16: jnp.ndarray,
                     poses: jnp.ndarray, frame_indices: jnp.ndarray
                     ) -> Tuple[SurfelBank, dict]:
    """Fuse a CHUNK of compact frames sequentially in one device program.

    Offline/batch replay mode: `lax.scan` over stacked frames (leading axis
    N) amortizes per-frame dispatch + upload latency; semantics identical
    to N successive `fuse_frame_compact` calls.  Returns (bank', stats
    stacked (N,) per frame)."""
    def body(bank, frame):
        img, dep, pose, fidx = frame
        bank, stats = fuse_frame_compact(config, bank, img, dep, pose, fidx)
        return bank, stats

    return jax.lax.scan(body, bank,
                        (images_u8, depths_f16, poses, frame_indices))


@functools.lru_cache(maxsize=4)
def jitted_fuse_frames_scan(config: SurfelMapConfig):
    return jax.jit(functools.partial(fuse_frames_scan, config),
                   donate_argnums=(0,))


def fuse_frames_looped(config: SurfelMapConfig, n_loops: int,
                       bank: SurfelBank,
                       images_u8: jnp.ndarray, depths_f16: jnp.ndarray,
                       poses: jnp.ndarray) -> Tuple[SurfelBank, jnp.ndarray]:
    """Fuse K stacked compact frames `n_loops` times in ONE device program:
    a looped replay of the trajectory (`lax.scan` over n_loops*K steps,
    step t reading frame t mod K by dynamic_slice on the resident stack).

    Built for weather-independent benchmarking (bench.py `loop_fps`): one
    dispatch + one hard D2H fence amortize the relay's per-RPC latency
    over n_loops*K FULL fuse steps, so even a catastrophically degraded
    link (~seconds per RPC; CLAUDE.md) yields a tight device-throughput
    lower bound.  Every step runs the complete `fuse_frame_compact`
    pipeline; the bank evolves across laps (later laps fuse against a
    larger map — if anything MORE work per frame than lap one).  Returns
    (bank', per-step live-surfel-count trace (n_loops*K,) i32 — a
    monotone-sanity readout for the fence)."""
    k = images_u8.shape[0]

    def body(bank, t):
        i = t % k
        img = jax.lax.dynamic_index_in_dim(images_u8, i, keepdims=False)
        dep = jax.lax.dynamic_index_in_dim(depths_f16, i, keepdims=False)
        pose = jax.lax.dynamic_index_in_dim(poses, i, keepdims=False)
        bank, _ = fuse_frame_compact(config, bank, img, dep, pose, t)
        return bank, bank.count

    return jax.lax.scan(body, bank,
                        jnp.arange(n_loops * k, dtype=jnp.int32))


@functools.lru_cache(maxsize=4)
def jitted_fuse_frames_looped(config: SurfelMapConfig, n_loops: int):
    return jax.jit(functools.partial(fuse_frames_looped, config, n_loops),
                   donate_argnums=(0,))


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

"""Device-resident state pytrees (structure-of-arrays, static shapes).

The reference stores surfels in `std::vector<SurfelElement>` (AoS, dynamic
size, `elements.h:22-31`) and superpixels in `std::vector<Superpixel_seed>`
(`elements.h:5-20`).  On TPU both become fixed-capacity structure-of-arrays
pytrees: every field is a dense tensor, liveness is a mask, and growth is
masked compaction instead of push_back.  All pytrees are flax.struct
dataclasses so they flow through jit/donate/shard unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..config import SurfelMapConfig


@struct.dataclass
class SurfelBank:
    """Fixed-capacity surfel store (reference SurfelElement, `elements.h:22-31`).

    Rows [0, count) are allocated; a row is *live* iff update_times > 0.
    The fuse step may zero update_times (kill); compaction re-packs live rows
    to the front and appends new surfels.
    """

    position: jnp.ndarray       # (N, 3) f32, world frame
    normal: jnp.ndarray         # (N, 3) f32, world frame, unit
    color: jnp.ndarray          # (N,)   f32, mean intensity 0..255
    size: jnp.ndarray           # (N,)   f32, surfel radius (m)
    weight: jnp.ndarray         # (N,)   f32, accumulated fusion weight
    update_times: jnp.ndarray   # (N,)   i32, #fusions; 0 == dead slot
    last_update: jnp.ndarray    # (N,)   i32, keyframe index of last fuse
    count: jnp.ndarray          # ()     i32, allocated prefix length

    @property
    def capacity(self) -> int:
        return self.position.shape[0]

    @property
    def live_mask(self) -> jnp.ndarray:
        in_prefix = jnp.arange(self.capacity, dtype=jnp.int32) < self.count
        return in_prefix & (self.update_times > 0)

    @staticmethod
    def empty(capacity: int) -> "SurfelBank":
        return SurfelBank(
            position=jnp.zeros((capacity, 3), jnp.float32),
            normal=jnp.zeros((capacity, 3), jnp.float32),
            color=jnp.zeros((capacity,), jnp.float32),
            size=jnp.zeros((capacity,), jnp.float32),
            weight=jnp.zeros((capacity,), jnp.float32),
            update_times=jnp.zeros((capacity,), jnp.int32),
            last_update=jnp.full((capacity,), -1, jnp.int32),
            count=jnp.zeros((), jnp.int32),
        )

    def field_arrays(self):
        """(name, array) pairs of the per-surfel fields (excludes count)."""
        return [("position", self.position), ("normal", self.normal),
                ("color", self.color), ("size", self.size),
                ("weight", self.weight), ("update_times", self.update_times),
                ("last_update", self.last_update)]


@struct.dataclass
class SuperpixelState:
    """Per-frame superpixel seed grid (reference Superpixel_seed,
    `elements.h:5-20`), laid out as (sp_rows, sp_cols) field planes.

    `valid` is the static mask of seeds that exist in the reference's
    truncated width/SP_SIZE grid; padded seeds never own pixels.
    """

    x: jnp.ndarray               # (R, C) f32, centroid pixel col
    y: jnp.ndarray               # (R, C) f32, centroid pixel row
    mean_intensity: jnp.ndarray  # (R, C) f32
    mean_depth: jnp.ndarray      # (R, C) f32, 0 == no depth
    size: jnp.ndarray            # (R, C) f32, max pixel radius
    norm: jnp.ndarray            # (R, C, 3) f32, camera-frame normal (0 == unset)
    pos: jnp.ndarray             # (R, C, 3) f32, camera-frame center on plane
    view_cos: jnp.ndarray        # (R, C) f32
    stable: jnp.ndarray          # (R, C) bool, SLIC convergence latch
    fused: jnp.ndarray           # (R, C) bool, claimed by a surfel this frame

    @staticmethod
    def zeros(rows: int, cols: int) -> "SuperpixelState":
        f = lambda *s: jnp.zeros(s, jnp.float32)
        return SuperpixelState(
            x=f(rows, cols), y=f(rows, cols),
            mean_intensity=f(rows, cols), mean_depth=f(rows, cols),
            size=f(rows, cols), norm=f(rows, cols, 3), pos=f(rows, cols, 3),
            view_cos=f(rows, cols),
            stable=jnp.zeros((rows, cols), bool),
            fused=jnp.zeros((rows, cols), bool),
        )


@struct.dataclass
class FrameInput:
    """One synchronized (intensity, depth, pose) observation.

    The pose is camera-to-world (Twc) as a 4x4 f32; `frame_index` is the
    reference-keyframe index used for surfel bookkeeping (the reference's
    `reference_frame_index`)."""

    image: jnp.ndarray        # (H, W) f32, intensity 0..255 (padded)
    depth: jnp.ndarray        # (H, W) f32, metric depth, 0 == invalid (padded)
    pose: jnp.ndarray         # (4, 4) f32, Twc
    frame_index: jnp.ndarray  # ()     i32


def pad_frame(config: SurfelMapConfig, image: np.ndarray, depth: np.ndarray):
    """Pad raw (H, W) image/depth to the config's aligned device shape.

    Padding pixels get intensity 0 and depth 0 (invalid) and are additionally
    excluded from all kernels via the static valid-pixel mask."""
    ph, pw = config.padded_height, config.padded_width
    h, w = image.shape
    if (h, w) != (config.height, config.width):
        raise ValueError(f"frame shape {(h, w)} != config camera "
                         f"{(config.height, config.width)}")
    out_img = np.zeros((ph, pw), np.float32)
    out_dep = np.zeros((ph, pw), np.float32)
    out_img[:h, :w] = image
    out_dep[:h, :w] = depth
    return out_img, out_dep


def compact_frame(config: SurfelMapConfig, image: np.ndarray,
                  depth: np.ndarray):
    """Host-side compact frame encoding for cheap H2D transfer.

    Intensity is u8 (exact for camera images), depth f16 (<=0.05% relative
    quantization — far inside the association gate's noise model,
    tolerate_diff >= 0.1 m).  Use with `fuse_step.jitted_fuse_frame_compact`,
    which converts and pads on device; cuts per-frame upload from 3.8 MB
    to 1.4 MB.

    Zero-copy caveat: when the input is already u8/f16 the SAME buffer is
    returned and may be aliased by the asynchronous upload — callers must
    not mutate a fed frame buffer afterwards (allocate per frame, as every
    io/ loader does)."""
    h, w = image.shape
    if (h, w) != (config.height, config.width):
        raise ValueError(f"frame shape {(h, w)} != config camera "
                         f"{(config.height, config.width)}")
    image = np.asarray(image)
    if image.dtype != np.uint8:
        image = np.clip(image, 0, 255).astype(np.uint8)
    depth = np.asarray(depth)
    if depth.dtype != np.float16:
        # f16 overflow becomes +-inf, which every depth gate rejects
        depth = depth.astype(np.float16)
    return np.ascontiguousarray(image), np.ascontiguousarray(depth)


def pack_frame(config: SurfelMapConfig, image: np.ndarray,
               depth: np.ndarray) -> np.ndarray:
    """One-buffer frame encoding: u8 intensity bytes followed by the f16
    depth bytes, as a single (3*H*W,) u8 array.

    The per-transfer latency of the host->device link exceeds its
    per-byte cost at this frame size; one upload beats two (see
    `fuse_step.fuse_frame_packed` for the in-jit decode).

    f32 inputs take the native C++ encoder (clip/convert in one
    memory-bound pass, ~5x the numpy chain); other dtypes fall back to
    the numpy path."""
    image = np.asarray(image)
    depth = np.asarray(depth)
    if image.dtype == np.float32 and depth.dtype == np.float32:
        from ..native import loader as native
        if native.available():
            if image.shape != (config.height, config.width):
                raise ValueError(f"frame shape {image.shape} != config "
                                 f"camera {(config.height, config.width)}")
            return native.pack_frame(image, depth)
    ci, cd = compact_frame(config, image, depth)
    return np.concatenate([ci.reshape(-1),
                           cd.reshape(-1).view(np.uint8)])


def pack_stereo_pair(config: SurfelMapConfig, left: np.ndarray,
                     right: np.ndarray) -> np.ndarray:
    """One-buffer stereo-pair encoding: left u8 bytes then right u8 bytes,
    a single (2*H*W,) u8 array — 2/3 the H2D bytes of `pack_frame` (no
    depth plane travels; `fuse_step.fuse_frame_stereo_packed` computes it
    on device).  Camera feeds are u8 already (zero-copy); f32 renders are
    clipped/converted here."""
    out = []
    for name, img in (("left", left), ("right", right)):
        img = np.asarray(img)
        if img.shape != (config.height, config.width):
            raise ValueError(f"{name} shape {img.shape} != camera "
                             f"{(config.height, config.width)}")
        if img.dtype != np.uint8:
            img = np.clip(img, 0, 255).astype(np.uint8)
        out.append(img.reshape(-1))
    return np.concatenate(out)


def pack_frame_with_aux(config: SurfelMapConfig, image: np.ndarray,
                        depth: np.ndarray, aux: np.ndarray) -> np.ndarray:
    """`pack_frame` bytes followed by `pack_aux` bytes as ONE u8 buffer —
    the whole per-frame payload in a SINGLE H2D put (each put is a relay
    round in dispatch-bound regimes; this halves them vs frame+aux).
    Decoded in-jit by `fuse_step.fuse_frame_onebuf`.

    f32 frames encode straight into the output via the native batched
    entry point (no concatenate copy); other dtypes fall back to
    pack_frame + one copy."""
    n = config.height * config.width
    aux = np.asarray(aux, np.uint8)
    out = np.empty(3 * n + aux.shape[0], np.uint8)
    image = np.asarray(image)
    depth = np.asarray(depth)
    wrote = False
    if image.dtype == np.float32 and depth.dtype == np.float32:
        if image.shape != (config.height, config.width):
            raise ValueError(f"frame shape {image.shape} != config camera "
                             f"{(config.height, config.width)}")
        from ..native import loader as native
        if native.available():
            wrote = native.pack_frames_into([image], [depth], [out[:3 * n]])
    if not wrote:
        out[:3 * n] = pack_frame(config, image, depth)
    out[3 * n:] = aux
    return out


def pack_stereo_with_aux(config: SurfelMapConfig, pair_buf: np.ndarray,
                         aux: np.ndarray) -> np.ndarray:
    """`pack_stereo_pair` bytes followed by `pack_aux` bytes as ONE u8
    buffer (single H2D put).  Decoded by
    `fuse_step.fuse_frame_stereo_onebuf`."""
    aux = np.asarray(aux, np.uint8)
    out = np.empty(pair_buf.shape[0] + aux.shape[0], np.uint8)
    out[:pair_buf.shape[0]] = pair_buf
    out[pair_buf.shape[0]:] = aux
    return out


AUX_HEAD_BYTES = 72   # pose f32 (64) + frame index i32 (4) + bf f32 (4)


def pack_aux(pose: np.ndarray, frame_index: int, window_mask: np.ndarray,
             bf: float = 0.0) -> np.ndarray:
    """Per-frame small-argument buffer: pose + frame index + stereo bf +
    active-window mask as ONE (72 + max_keyframes,) u8 upload.

    Every `jnp.asarray`/`device_put` is a relay round in dispatch-bound
    regimes (CLAUDE.md); the windowed drivers previously shipped pose,
    frame index, bf and mask as four separate tiny arrays per frame —
    with this encoding a frame is exactly two H2D puts (frame buffer +
    aux).  Decoded in-jit by `fuse_step.unpack_aux` (bitcasts)."""
    mask = np.asarray(window_mask)
    out = np.empty(AUX_HEAD_BYTES + mask.shape[0], np.uint8)
    out[:64] = np.ascontiguousarray(
        pose, np.float32).reshape(16).view(np.uint8)
    out[64:68] = np.array([frame_index], np.int32).view(np.uint8)
    out[68:72] = np.array([bf], np.float32).view(np.uint8)
    out[72:] = mask.astype(np.uint8)
    return out


def valid_pixel_mask(config: SurfelMapConfig) -> np.ndarray:
    """Static (H_pad, W_pad) mask of pixels that exist in the raw image."""
    m = np.zeros((config.padded_height, config.padded_width), bool)
    m[:config.height, :config.width] = True
    return m


def valid_seed_mask(config: SurfelMapConfig) -> np.ndarray:
    """Static (R, C) mask of seeds the reference grid contains
    (sp_width = width // SP_SIZE truncation, `fusion_functions.cpp:14-15`)."""
    m = np.zeros((config.sp_rows, config.sp_cols), bool)
    m[:config.valid_sp_rows, :config.valid_sp_cols] = True
    return m

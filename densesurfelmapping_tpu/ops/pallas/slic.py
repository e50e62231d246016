"""Pallas TPU kernels for the SLIC superpixel hot loop.

The jnp implementation in `ops/superpixel.py` is semantically exact but
XLA materializes dozens of full-image planes per iteration (upsampled seed
fields, window extractions, a per-pixel gather of the stable flag) — ~22 ms
per KITTI frame on a v5e.  These kernels re-express the same math
(`update_pixels_kernel` / `update_seeds_kernel`,
`fusion_functions.cpp:389-575`) in a gather-free, VMEM-resident form:

* a pixel's candidate/assigned seed is always one of its 3x3 tile
  neighbors, so every "seed field at pixel's seed" lookup becomes a
  9-offset select against statically shifted seed planes;
* seed plane -> pixel plane upsampling (and its transpose, the per-seed
  window reduction) is a pair of tiny 0/1 matmuls riding the MXU:
  up(f)[y,x] = sum_rc U2[y,r] f[r,c] U1[c,x] with U2[y,r]=1 iff
  r == y//SP + dj, U1[c,x]=1 iff c == x//SP + di;
* all window-membership gates are closed-form in the pixel coordinate
  (iota), so no mask tensors ever touch HBM.

Three kernels per iteration — candidate assignment (writes the new
assignment + per-seed claim counts), per-seed centroid/intensity/depth
sums, and one Huber-Newton depth step (called 5x) — with the tiny
(rows, cols) seed-level algebra left to plain jnp between calls.

Kernels are gridded over column blocks of the image so VMEM holds only a
~6 MB working set regardless of frame width.  On non-TPU backends the
kernels run in interpret mode (tests compare them against the jnp path).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import SurfelMapConfig

BIG_COST = 1e10
# reference candidate scan order: x-offset outer, y-offset inner
_OFFSETS = [(di, dj) for di in (-1, 0, 1) for dj in (-1, 0, 1)]

_F32 = jnp.float32
_I32 = jnp.int32


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


@functools.lru_cache(maxsize=8)
def _up_matrices(config: SurfelMapConfig):
    """0/1 expansion matrices for shifted seed->pixel upsampling.

    up2[dj+1][y, r] = 1 iff r == y // sp + dj        (H, R) per dj
    up1[di+1][c, x] = 1 iff c == x // sp + di        (C, W) per di
    """
    sp = config.sp_size
    h, w = config.padded_height, config.padded_width
    r, c = config.sp_rows, config.sp_cols
    ys = np.arange(h) // sp
    xs = np.arange(w) // sp
    up2 = np.zeros((3, h, r), np.float32)
    up1 = np.zeros((3, c, w), np.float32)
    for k, off in enumerate((-1, 0, 1)):
        tr = ys + off
        ok = (tr >= 0) & (tr < r)
        up2[k, ok, tr[ok]] = 1.0
        tc = xs + off
        okc = (tc >= 0) & (tc < c)
        up1[k, tc[okc], np.arange(w)[okc]] = 1.0
    return up2, up1  # numpy: safe to cache across traces


def _pick_block(w: int) -> int:
    """Largest 128-multiple column block <= 256 that divides w."""
    for blk in (256, 128):
        if w % blk == 0:
            return blk
    return w


# the expansion/reduction matmuls move raw f32 field values (pixel coords up
# to ~1300, depths, intensities); the MXU's default bf16 multiply would
# quantize them, so pin full f32 precision
_HP = lax.Precision.HIGHEST

# the f32-exact matmul emulation needs more scoped VMEM than the 16M default
_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)


def _up(f, u2, u1):
    """(R, C) seed plane -> (H, WB) pixel block: u2 @ (f @ u1)."""
    a = lax.dot_general(f, u1, (((1,), (0,)), ((), ())),
                        preferred_element_type=_F32, precision=_HP)
    return lax.dot_general(u2, a, (((1,), (0,)), ((), ())),
                           preferred_element_type=_F32, precision=_HP)


def _down(m, u2, u1):
    """(H, WB) pixel block -> (R, C) per-seed sums (transpose of _up)."""
    a = lax.dot_general(m, u1, (((1,), (1,)), ((), ())),
                        preferred_element_type=_F32, precision=_HP)   # (H, R_c)
    return lax.dot_general(u2, a, (((0,), (0,)), ((), ())),
                           preferred_element_type=_F32, precision=_HP)  # (R, C)


def _coords(config: SurfelMapConfig, shape, j, w_blk):
    """Global pixel coordinate planes for column block j."""
    sp = config.sp_size
    y = lax.broadcasted_iota(_I32, shape, 0)
    x = lax.broadcasted_iota(_I32, shape, 1) + j * w_blk
    return y, x, y // sp, x // sp, y % sp, x % sp


def _assign_gate(config, ry, rx, di, dj):
    """update_pixels candidate gate |off*sp + sp/2 - r| < sp
    (`fusion_functions.cpp:416-420`), strict on both sides."""
    sp = config.sp_size
    half = sp // 2
    gy = jnp.abs(dj * sp + half - ry) < sp
    gx = jnp.abs(di * sp + half - rx) < sp
    return gy & gx


def _window_gate(config, ry, rx, di, dj):
    """2sp x 2sp window membership [off*sp - sp/2, off*sp + 3sp/2) —
    the extract_windows footprint used by the seed-update scans."""
    sp = config.sp_size
    half = sp // 2
    gy = (ry >= dj * sp - half) & (ry < dj * sp + sp + half)
    gx = (rx >= di * sp - half) & (rx < di * sp + sp + half)
    return gy & gx


# ----------------------------------------------------------------------
# kernel 1: pixel assignment sweep + per-seed claim counts
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _assign_call(config: SurfelMapConfig):
    sp = config.sp_size
    h, w = config.padded_height, config.padded_width
    rows, cols = config.sp_rows, config.sp_cols
    oh, ow = config.height, config.width
    vr, vc = oh // sp, ow // sp
    w_blk = _pick_block(w)
    half_sq = float((sp // 2) ** 2)

    def kernel(img_ref, invd_ref, asg_ref, sx_ref, sy_ref, si_ref, sd_ref,
               stab_ref, up2_ref, up1_ref, out_asg_ref, out_claim_ref):
        j = pl.program_id(0)
        img = img_ref[:]
        invd = invd_ref[:]
        asg = asg_ref[:]
        y, x, ty, tx, ry, rx = _coords(config, img.shape, j, w_blk)
        yf = y.astype(_F32)
        xf = x.astype(_F32)
        pixel_valid = (y < oh) & (x < ow)

        best_d = jnp.full(img.shape, BIG_COST, _F32)
        best_d_idx = jnp.full(img.shape, -1, _I32)
        best_nd = jnp.full(img.shape, BIG_COST, _F32)
        best_nd_idx = jnp.full(img.shape, -1, _I32)
        all_hasd = invd > 0
        cur_stable = jnp.zeros(img.shape, jnp.bool_)

        for di, dj in _OFFSETS:
            u2 = up2_ref[dj + 1]
            u1 = up1_ref[di + 1]
            nb_ty = ty + dj
            nb_tx = tx + di
            nbf = nb_ty * cols + nb_tx
            nbv = ((nb_ty >= 0) & (nb_ty < vr)
                   & (nb_tx >= 0) & (nb_tx < vc))
            gate = _assign_gate(config, ry, rx, di, dj) & nbv & pixel_valid

            sx = _up(sx_ref[:], u2, u1)
            sy = _up(sy_ref[:], u2, u1)
            si = _up(si_ref[:], u2, u1)
            sd = _up(sd_ref[:], u2, u1)
            sstab = _up(stab_ref[:], u2, u1)

            dist = (sx - xf) ** 2 + (sy - yf) ** 2
            idiff = si - img
            nodepth = dist / half_sq + idiff * idiff / 100.0
            sdinv = jnp.where(sd > 0, 1.0 / jnp.maximum(sd, 1e-20), 0.0)
            ddiff = sdinv - invd
            withd = nodepth + ddiff * ddiff * 400.0
            hasd = (sd > 0) & (invd > 0)

            cost_nd = jnp.where(gate, nodepth, BIG_COST)
            cost_d = jnp.where(gate & hasd, withd, cost_nd)

            take_d = cost_d < best_d
            best_d = jnp.where(take_d, cost_d, best_d)
            best_d_idx = jnp.where(take_d, nbf, best_d_idx)
            take_nd = cost_nd < best_nd
            best_nd = jnp.where(take_nd, cost_nd, best_nd)
            best_nd_idx = jnp.where(take_nd, nbf, best_nd_idx)
            all_hasd = all_hasd & (hasd | ~gate)
            cur_stable = cur_stable | ((asg == nbf) & (sstab > 0.5) & nbv)

        chosen = jnp.where(all_hasd, best_d_idx, best_nd_idx)
        best_cost = jnp.where(all_hasd, best_d, best_nd)
        chosen = jnp.where(best_cost >= BIG_COST, -1, chosen)

        updated = pixel_valid & ~cur_stable
        new_asg = jnp.where(updated, chosen, asg)
        out_asg_ref[:] = new_asg

        claim = jnp.zeros((rows, cols), _F32)
        for di, dj in _OFFSETS:
            nbf = (ty + dj) * cols + (tx + di)
            m = ((new_asg == nbf) & updated
                 & _window_gate(config, ry, rx, di, dj))
            claim = claim + _down(m.astype(_F32), up2_ref[dj + 1],
                                  up1_ref[di + 1])

        @pl.when(j == 0)
        def _():
            out_claim_ref[:] = claim

        @pl.when(j > 0)
        def _():
            out_claim_ref[:] = out_claim_ref[:] + claim

    grid = (w // w_blk,)
    img_spec = pl.BlockSpec((h, w_blk), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((rows, cols), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
    up2_spec = pl.BlockSpec((3, h, rows), lambda j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    up1_spec = pl.BlockSpec((3, cols, w_blk), lambda j: (0, 0, j),
                            memory_space=pltpu.VMEM)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec, img_spec, img_spec,
                  seed_spec, seed_spec, seed_spec, seed_spec, seed_spec,
                  up2_spec, up1_spec],
        out_specs=(img_spec, seed_spec),
        out_shape=(jax.ShapeDtypeStruct((h, w), _I32),
                   jax.ShapeDtypeStruct((rows, cols), _F32)),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )


def assign_pixels_pallas(config: SurfelMapConfig, seeds, image, inv_depth,
                         assignment):
    """Pallas version of `superpixel.assign_pixels`: one candidate sweep.
    Returns (new_assignment, seeds with updated stable, updated_mask is
    folded into the claim counts)."""
    up2, up1 = (jnp.asarray(m) for m in _up_matrices(config))
    call = _assign_call(config)
    new_asg, claim = call(image, inv_depth, assignment,
                          seeds.x, seeds.y, seeds.mean_intensity,
                          seeds.mean_depth,
                          seeds.stable.astype(_F32), up2, up1)
    new_stable = seeds.stable & ~(claim > 0)
    return new_asg, seeds.replace(stable=new_stable)


# ----------------------------------------------------------------------
# kernel 2: per-seed centroid / intensity / depth sums
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _centroid_call(config: SurfelMapConfig):
    sp = config.sp_size
    h, w = config.padded_height, config.padded_width
    rows, cols = config.sp_rows, config.sp_cols
    oh, ow = config.height, config.width
    w_blk = _pick_block(w)

    def kernel(img_ref, dep_ref, asg_ref, up2_ref, up1_ref,
               n_ref, sx_ref, sy_ref, si_ref, nd_ref, sd_ref):
        j = pl.program_id(0)
        img = img_ref[:]
        dep = dep_ref[:]
        asg = asg_ref[:]
        y, x, ty, tx, ry, rx = _coords(config, img.shape, j, w_blk)
        # clamped-window interior: the reference's strict-< scan bound
        # never visits the last raw row/column (fusion_functions.cpp:486-489)
        interior = (y < oh - 1) & (x < ow - 1)
        yf = y.astype(_F32)
        xf = x.astype(_F32)

        acc = [jnp.zeros((rows, cols), _F32) for _ in range(6)]
        for di, dj in _OFFSETS:
            u2 = up2_ref[dj + 1]
            u1 = up1_ref[di + 1]
            nbf = (ty + dj) * cols + (tx + di)
            m = ((asg == nbf) & interior
                 & _window_gate(config, ry, rx, di, dj)).astype(_F32)
            md = m * (dep > 0.1).astype(_F32)
            acc[0] += _down(m, u2, u1)
            acc[1] += _down(m * xf, u2, u1)
            acc[2] += _down(m * yf, u2, u1)
            acc[3] += _down(m * img, u2, u1)
            acc[4] += _down(md, u2, u1)
            acc[5] += _down(md * dep, u2, u1)

        for ref, a in zip((n_ref, sx_ref, sy_ref, si_ref, nd_ref, sd_ref),
                          acc):
            @pl.when(j == 0)
            def _(ref=ref, a=a):
                ref[:] = a

            @pl.when(j > 0)
            def _(ref=ref, a=a):
                ref[:] = ref[:] + a

    grid = (w // w_blk,)
    img_spec = pl.BlockSpec((h, w_blk), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((rows, cols), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
    up2_spec = pl.BlockSpec((3, h, rows), lambda j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    up1_spec = pl.BlockSpec((3, cols, w_blk), lambda j: (0, 0, j),
                            memory_space=pltpu.VMEM)
    seed_out = jax.ShapeDtypeStruct((rows, cols), _F32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec, img_spec, img_spec, up2_spec, up1_spec],
        out_specs=(seed_spec,) * 6,
        out_shape=(seed_out,) * 6,
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )


# ----------------------------------------------------------------------
# kernel 3: one Huber-Newton mean-depth step
# ----------------------------------------------------------------------
@functools.lru_cache(maxsize=8)
def _huber_call(config: SurfelMapConfig):
    sp = config.sp_size
    h, w = config.padded_height, config.padded_width
    rows, cols = config.sp_rows, config.sp_cols
    oh, ow = config.height, config.width
    w_blk = _pick_block(w)
    hr = float(config.profile.huber_range)

    def kernel(dep_ref, asg_ref, mean_ref, up2_ref, up1_ref,
               sa_ref, sb_ref):
        j = pl.program_id(0)
        dep = dep_ref[:]
        asg = asg_ref[:]
        y, x, ty, tx, ry, rx = _coords(config, dep.shape, j, w_blk)
        interior = (y < oh - 1) & (x < ow - 1)
        has_d = (dep > 0.1).astype(_F32)

        sum_a = jnp.zeros((rows, cols), _F32)
        sum_b = jnp.zeros((rows, cols), _F32)
        for di, dj in _OFFSETS:
            u2 = up2_ref[dj + 1]
            u1 = up1_ref[di + 1]
            nbf = (ty + dj) * cols + (tx + di)
            m = ((asg == nbf) & interior
                 & _window_gate(config, ry, rx, di, dj)).astype(_F32) * has_d
            r = _up(mean_ref[:], u2, u1) - dep
            inl = (r < hr) & (r > -hr)
            f = jnp.where(inl, 2.0 * r, jnp.where(r > 0, hr, -hr))
            sum_a += _down(f * m, u2, u1)
            sum_b += _down(2.0 * inl.astype(_F32) * m, u2, u1)

        @pl.when(j == 0)
        def _():
            sa_ref[:] = sum_a
            sb_ref[:] = sum_b

        @pl.when(j > 0)
        def _():
            sa_ref[:] = sa_ref[:] + sum_a
            sb_ref[:] = sb_ref[:] + sum_b

    grid = (w // w_blk,)
    img_spec = pl.BlockSpec((h, w_blk), lambda j: (0, j),
                            memory_space=pltpu.VMEM)
    seed_spec = pl.BlockSpec((rows, cols), lambda j: (0, 0),
                             memory_space=pltpu.VMEM)
    up2_spec = pl.BlockSpec((3, h, rows), lambda j: (0, 0, 0),
                            memory_space=pltpu.VMEM)
    up1_spec = pl.BlockSpec((3, cols, w_blk), lambda j: (0, 0, j),
                            memory_space=pltpu.VMEM)
    seed_out = jax.ShapeDtypeStruct((rows, cols), _F32)

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[img_spec, img_spec, seed_spec, up2_spec, up1_spec],
        out_specs=(seed_spec, seed_spec),
        out_shape=(seed_out, seed_out),
        compiler_params=_PARAMS,
        interpret=_interpret(),
    )


def update_seeds_pallas(config: SurfelMapConfig, seeds, assignment,
                        image, depth):
    """Pallas version of `superpixel.update_seeds`: per-seed centroid /
    intensity recompute + stability latch + 5-iteration Huber-Newton mean
    depth (`update_seeds_kernel`, `fusion_functions.cpp:468-561`)."""
    up2, up1 = (jnp.asarray(m) for m in _up_matrices(config))
    n, sum_x, sum_y, sum_i, nd, sum_d = _centroid_call(config)(
        image, depth, assignment, up2, up1)

    safe_n = jnp.maximum(n, 1.0)
    new_x = sum_x / safe_n
    new_y = sum_y / safe_n
    new_i = sum_i / safe_n
    upd = ~seeds.stable & (n > 0)
    diff = (jnp.abs(seeds.mean_intensity - new_i)
            + jnp.abs(seeds.x - new_x) + jnp.abs(seeds.y - new_y))
    new_stable = seeds.stable | (upd & (diff < 0.2))

    mean = sum_d / jnp.maximum(nd, 1.0)
    converged = nd <= 0
    huber = _huber_call(config)
    for _ in range(5):
        sum_a, sum_b = huber(depth, assignment, mean, up2, up1)
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

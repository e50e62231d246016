"""Pallas TPU kernel for SGM scanline aggregation.

The XLA path (`models/stereo._axis_scan`) expresses one scan direction as
a lax.scan whose per-step HLO dispatch overhead dominates: ~20 ms for the
four scans of an 8-path KITTI-size aggregation, despite only ~0.5 GB of
HBM traffic and tiny per-step VPU work.  This kernel runs one scan axis —
BOTH orientations and every diagonal roll sharing it — as a single
`pallas_call` whose grid walks the scan axis with the DP carries resident
in VMEM:

* grid step t reads TWO (1, R, D) cost blocks via index maps `t` (forward
  carry) and `L-1-t` (backward carry) and writes the per-orientation path
  sums to the matching output rows — one pass, no reversed copy of the
  volume anywhere (XLA:TPU miscompiles reversed scan inputs; CLAUDE.md);
* the d±1 neighbor terms are circular lane rolls: the caller pads the
  disparity axis to 128 lanes with BIG cost, so the wrap brings BIG into
  lane 0's d-1 term and the pad lane feeds BIG into the last real lane's
  d+1 term — exact open-boundary semantics with zero masking;
* diagonal paths roll the carry one row per step with the image-border
  row explicitly zeroed — exactly the L = C restart of the scalar
  recurrence (`_sgm_path_oracle` in tests/test_stereo.py pins both
  paths).

Semantics match `models/stereo._axis_scan` bitwise: f32 carries, per-step
renormalization by -Lmin, bf16 per-orientation outputs.  Mirrors the
8-path aggregation of classic SGM replacing the reference's offline
PSMNet disparity (`kitti_publisher/scripts/publisher.py:36-41`).

STATUS (round 3): DEFAULT backend, and for census cost the volume no
longer materializes at all — `census_aggregate` (end of file) computes
the Hamming cost inside the kernels from VMEM-resident census images
(bitwise-equal to the materialized path on CPU; validated end-to-end on
the real TPU by the round-3 stereo verify drive after the int32-SWAR
fix — Mosaic lacks uint32->f32 casts).  Round-2 record for the
materialized path: bitwise-equal to the
scan backend on real TPU, 21.8 ms vs 29.5 ms for the full sgm8-census
pipeline at KITTI size.  Getting there required taming the graph AROUND the kernel,
not the kernel (5.5 + 8.0 ms in isolation all along): custom calls need
materialized operands, and XLA lowered the 127-way `jnp.stack` cost
volume feeding them into a chain of growing copies — 38 GB accessed /
15.4 GB peak temp.  `models/stereo._cost_volume_scan` (a lax.scan
writing one incremental buffer) brings the pipeline to 7.4 GB / 0.9 GB,
below the scan backend's 7.6 / 1.2.  Diagnosed entirely with
`compiled.cost_analysis()` — no profiler required.

Negative result, for the record: a follow-up kernel fusing the five WTA
reductions (idx/best/cm/cp/second) into one VMEM pass was tried and
REVERTED — it forces the aggregated volume to materialize as a kernel
operand (+pads), raising pipeline traffic to 8.9 GB vs 7.4 GB and
measuring slower; XLA already fuses the agg sum directly into its
masked reductions.  Every pallas_call boundary is a forced
materialization: only cross it where the kernel saves more than the
operand costs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9          # finite stand-in for inf (SGM adds bounded penalties)
_LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _roll_c(v, shift, axis):
    """pltpu.roll that also accepts bf16 operands on REAL hardware.

    Mosaic implements `tpu.dynamic_rotate` only for 32-bit element types —
    a bf16 carry roll compiles fine in interpret mode (where all the CPU
    tests run) but fails on the actual TPU with "Rotate with non-32-bit
    data" (found by the round-4 sgm_bench run; the sgm_carry_bf16 mode had
    only ever been validated off-device).  bf16 -> f32 -> roll -> bf16 is
    exact, so semantics are unchanged."""
    if v.dtype == jnp.bfloat16:
        return pltpu.roll(v.astype(jnp.float32), shift,
                          axis=axis).astype(jnp.bfloat16)
    return pltpu.roll(v, shift, axis=axis)


def _dp_update(L_prev, cost, p1, p2, clamp=None):
    """One DP step on (R, D) blocks (f32, or bf16 with `clamp` — the
    sgm_carry_bf16 mode, where clamping at the BIG constant keeps every
    carry bf16-exact); lane rolls wrap the BIG pad lane into the d
    boundaries (see module docstring)."""
    dt = L_prev.dtype
    lmin = jnp.min(L_prev, axis=-1, keepdims=True)
    d = L_prev.shape[-1]
    dm = _roll_c(L_prev, 1, axis=1)      # from d-1 (lane 0 <- BIG pad)
    dp = _roll_c(L_prev, d - 1, axis=1)  # from d+1 (last lane <- pad)
    cand = jnp.minimum(jnp.minimum(L_prev,
                                   jnp.minimum(dm, dp) + dt.type(p1)),
                       lmin + dt.type(p2))
    # grouping matters: cand - lmin FIRST, so an all-BIG carry (the
    # scan-axis pad) contributes exactly 0 — (cost + BIG) - BIG would
    # round the cost away at f32 ulp(1e9) = 64
    out = cost + (cand - lmin)
    if clamp is not None:
        out = jnp.minimum(out, dt.type(clamp))
    return out


@functools.lru_cache(maxsize=16)
def _axis_call(L: int, R: int, D: int, n_real: int, rolls: tuple,
               p1: float, p2: float, t_blk: int, interpret: bool,
               carry_bf16: bool = False, entry=None, min_d: int = 0):
    """pallas_call for one (L, R, D) axis scan; D == lane-padded width,
    L a multiple of t_blk.  Each grid step moves ONE (t_blk, R, D) block
    per orientation and advances the DP over its columns in VMEM —
    per-step DMA latency amortizes over t_blk columns (the one-column
    variant measured DMA-latency-bound at 1617 tiny blocks/frame).

    entry / min_d: the wedge free-entry restart, mirroring
    `models/stereo._axis_scan` bitwise (see the _SGM_BIG note there).
    entry="x": restart lanes with k + min_d == x on the FORWARD
    orientation; entry="y": restart the roll == +1 channels at the static
    positions r == k + min_d in BOTH orientations.  Restarts on pad
    lanes/rows merely rewrite the BIG pad cost — harmless."""
    g = len(rolls)
    n_blk = L // t_blk
    cdt = jnp.bfloat16 if carry_bf16 else jnp.float32
    clamp = _SGM_BIG_F_BF16 if carry_bf16 else None

    def kernel(vf_ref, vb_ref, of_ref, ob_ref, cf_ref, cb_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            cf_ref[...] = jnp.zeros_like(cf_ref)
            cb_ref[...] = jnp.zeros_like(cb_ref)

        rowid2 = jax.lax.broadcasted_iota(jnp.int32, (R, D), 0)
        laneid = jax.lax.broadcasted_iota(jnp.int32, (R, D), 1)

        def advance(carry_ref, cost_ref, out_ref, col, x_fwd):
            cost = cost_ref[col].astype(cdt)             # (R, D)
            total = None
            for k, roll in enumerate(rolls):
                c = carry_ref[k]
                if roll:
                    # row-axis circular roll (shift must be non-negative:
                    # -1 == R-1) with the IMAGE-border row zeroed — the
                    # exact L = C restart of the scalar recurrence.  The
                    # real border is row 0 (roll > 0) or row n_real-1
                    # (roll < 0; also zero the pad rows above it, whose
                    # carries are garbage)
                    c = _roll_c(c, roll % R, axis=0)
                    rowid = jax.lax.broadcasted_iota(
                        jnp.int32, c.shape, 0)
                    at_border = (rowid == 0) if roll > 0 \
                        else (rowid >= n_real - 1)
                    c = jnp.where(at_border, 0.0, c)
                nxt = _dp_update(c, cost, p1, p2, clamp=clamp)
                if entry == "x" and x_fwd is not None:
                    nxt = jnp.where(laneid + min_d == x_fwd, cost, nxt)
                elif entry == "y" and roll == 1:
                    nxt = jnp.where(rowid2 == laneid + min_d, cost, nxt)
                carry_ref[k] = nxt
                total = nxt if total is None else total + nxt
            out_ref[col] = total.astype(jnp.bfloat16)

        for col in range(t_blk):
            advance(cf_ref, vf_ref, of_ref, col,
                    b * t_blk + col)                         # ascending
            advance(cb_ref, vb_ref, ob_ref, t_blk - 1 - col,
                    None)                                    # descending

    blk = (t_blk, R, D)
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(blk, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b: (n_blk - 1 - b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b: (n_blk - 1 - b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((L, R, D), jnp.bfloat16),
            jax.ShapeDtypeStruct((L, R, D), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, R, D), cdt),
            pltpu.VMEM((g, R, D), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def axis_scan_pallas(v: jnp.ndarray, rolls, p1: float, p2: float,
                     t_blk: int = 16,
                     carry_bf16: bool = False,
                     entry=None, min_d: int = 0) -> jnp.ndarray:
    """Drop-in replacement for `models/stereo._axis_scan`: sum of the
    2*len(rolls) SGM path responses along axis 0 of a (L, R, D) volume.

    Pads D to a full lane multiple with BIG cost (guaranteeing >= 1 pad
    lane for the boundary wrap), the row axis to the bf16 sublane
    granule, and the scan axis to a t_blk multiple — tail pad columns
    also carry BIG cost, which keeps the backward orientation's entry
    into the real columns an EXACT restart: an all-BIG carry has
    cand - Lmin == 0 on every lane, so L = C bitwise, same as a zero
    carry.  All pads are sliced off again."""
    length, rows, dd = v.shape
    d_pad = _round_up(dd + 1, _LANES)
    # 16-row granule for bf16 tiling; pad rows carry BIG cost and are
    # sliced off (the kernel zeroes image-border carries explicitly)
    r_pad = _round_up(rows, 16)
    l_pad = _round_up(length, t_blk)
    vp = jnp.pad(v, ((0, l_pad - length), (0, r_pad - rows),
                     (0, d_pad - dd)),
                 constant_values=np.array(_BIG, v.dtype))

    call = _axis_call(l_pad, r_pad, d_pad, rows, tuple(rolls), float(p1),
                      float(p2), int(t_blk), _interpret(),
                      carry_bf16=bool(carry_bf16), entry=entry,
                      min_d=int(min_d))
    out_f, out_b = call(vp, vp)
    out = out_f.astype(jnp.float32) + out_b.astype(jnp.float32)
    return out[:length, :rows, :dd]


# ---------------------------------------------------------------------------
# Census-fed aggregation: the cost volume never materializes (round 3).
#
# The round-2 pipeline built a 119 MB bf16 cost volume with a 127-step
# lax.scan, transposed it twice, and fed it to the axis kernels — ~1.5 GB
# of HBM traffic plus the builder's per-step dispatch overhead, just to
# move around values that are a single popcount away from the census
# images.  These kernels compute the census Hamming cost IN-KERNEL from
# the two (H, W) u32 census images (~1.9 MB each, VMEM-resident for the
# whole scan):
#
# * y axis: for scan row y the (W, D) cost block needs cR[y, x-d] — a
#   SHEAR of the census row.  Built with the binary-decomposition trick:
#   broadcast the row across lanes, then for each bit k of the lane index
#   conditionally `pltpu.roll` the sublane axis by 2^k — 7 rolls + masks,
#   pure VPU work (out[x, d] = row[x - min_d - d]).
# * x axis: for scan column x the natural (H, D) block needs cR[y, x-d]
#   — 128 different COLUMNS, so the kernel runs the DP TRANSPOSED
#   ((D, H): d on sublanes, y on lanes) where the needed block is a
#   contiguous `pl.ds` sublane slice of the transposed census image, with
#   the d axis REVERSED (sublane i holds disparity min_d + 127 - i; the
#   d±1 neighbor rolls just swap).  The caller un-reverses in the same
#   XLA copy that transposes the output back — no extra pass.
#
# Masking reproduces the materialized path bit-for-bit: in-volume
# out-of-range costs use bf16(_SGM_BIG) with the free-entry restart at
# x == d on the wedge-crossing directions (models/stereo._SGM_BIG note)
# and axis padding uses bf16(_BIG), exactly the values the materialized
# bf16 volume carries
# (pinned by tests/test_stereo.py::test_census_fused_matches_materialized).
# ---------------------------------------------------------------------------

_SGM_BIG_F = 1e4  # keep in sync with models/stereo._SGM_BIG
# its bf16 round-trip — the in-volume BIG the kernels actually see, and
# the carry clamp of sgm_carry_bf16 mode (models/stereo._SGM_BIG_BF16)
_SGM_BIG_F_BF16 = 9984.0


def _bf16_val(x: float) -> float:
    """The f32 value of x after a round-trip through bfloat16 — masked
    costs must match what the old kernel read from the bf16 volume.
    (ml_dtypes, not jnp.bfloat16: the latter builds a traced Array under
    jit and float() of it raises ConcretizationTypeError.)"""
    import ml_dtypes
    return float(np.float32(np.array(x, ml_dtypes.bfloat16)))


def _popcount32(v):
    """SWAR popcount on int32 vectors holding NON-NEGATIVE values
    (census codes use <= 24 bits, so arithmetic >> == logical >> at every
    step; int32 because Mosaic lacks uint32<->float casts).  Bitwise-
    identical to lax.population_count on the same values."""
    v = v - ((v >> jnp.int32(1)) & jnp.int32(0x55555555))
    v = (v & jnp.int32(0x33333333)) + ((v >> jnp.int32(2))
                                       & jnp.int32(0x33333333))
    v = (v + (v >> jnp.int32(4))) & jnp.int32(0x0F0F0F0F)
    return (v * jnp.int32(0x01010101)) >> jnp.int32(24)


def _shear_sublanes(B, lane, min_d):
    """out[x, d] = B[x - min_d - d, d] (circular; callers mask the wrap).
    B: (X, 128); lane: (X, 128) i32 lane iota."""
    if min_d:
        B = pltpu.roll(B, min_d, axis=0)
    for k in range(7):
        amt = 1 << k
        B = jnp.where((lane >> k) & 1 == 1, pltpu.roll(B, amt, axis=0), B)
    return B


@functools.lru_cache(maxsize=16)
def _census_call_y(Lh: int, Rw: int, n_rows: int, n_cols: int, n_d: int,
                   rolls: tuple, p1: float, p2: float, min_d: int,
                   t_blk: int, interpret: bool,
                   carry_bf16: bool = False):
    """Row-axis (vertical + diagonal) scans fed by census rows.

    Inputs: censusL, censusR as (Lh, Rw) u32 (row blocks per orientation).
    Outputs: per-orientation (Lh, Rw, 128) bf16 path sums (d on lanes),
    matching `_axis_call` on the materialized volume bitwise."""
    g = len(rolls)
    n_blk = Lh // t_blk
    bv = _bf16_val(_SGM_BIG_F)   # in-volume out-of-range cost
    bp = _bf16_val(_BIG)         # axis padding
    cdt = jnp.bfloat16 if carry_bf16 else jnp.float32
    clamp = _SGM_BIG_F_BF16 if carry_bf16 else None

    def kernel(clf_ref, crf_ref, clb_ref, crb_ref, of_ref, ob_ref,
               cf_ref, cb_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            cf_ref[...] = jnp.zeros_like(cf_ref)
            cb_ref[...] = jnp.zeros_like(cb_ref)

        lane = jax.lax.broadcasted_iota(jnp.int32, (Rw, _LANES), 1)
        xrow = jax.lax.broadcasted_iota(jnp.int32, (Rw, _LANES), 0)

        def cost_at(cl_ref, cr_ref, col, y_global):
            B = jnp.broadcast_to(cr_ref[col][:, None], (Rw, _LANES))
            B = _shear_sublanes(B, lane, min_d)
            cost = _popcount32(B ^ cl_ref[col][:, None]).astype(jnp.float32)
            dreal = lane + min_d
            cost = jnp.where(xrow >= dreal, cost, bv)       # x - d < 0
            in_img = (lane < n_d) & (xrow < n_cols) \
                & (y_global < n_rows)
            # bf16-mode cast AFTER masking: every value round-trips exactly
            return jnp.where(in_img, cost, bp).astype(cdt)  # axis pads

        def advance(carry_ref, cost, out_ref, col):
            total = None
            for k, roll in enumerate(rolls):
                c = carry_ref[k]
                if roll:
                    c = _roll_c(c, roll % Rw, axis=0)
                    rowid = jax.lax.broadcasted_iota(jnp.int32, c.shape, 0)
                    at_border = (rowid == 0) if roll > 0 \
                        else (rowid >= n_cols - 1)
                    c = jnp.where(at_border, 0.0, c)
                nxt = _dp_update(c, cost, p1, p2, clamp=clamp)
                if roll == 1:
                    # wedge free-entry restart on the +x-moving diagonals
                    # (both orientations): x == d (stereo._SGM_BIG note)
                    nxt = jnp.where(xrow == lane + min_d, cost, nxt)
                carry_ref[k] = nxt
                total = nxt if total is None else total + nxt
            out_ref[col] = total.astype(jnp.bfloat16)

        for col in range(t_blk):
            yf = b * t_blk + col
            advance(cf_ref, cost_at(clf_ref, crf_ref, col, yf),
                    of_ref, col)
            yb = (n_blk - 1 - b) * t_blk + (t_blk - 1 - col)
            advance(cb_ref, cost_at(clb_ref, crb_ref, t_blk - 1 - col, yb),
                    ob_ref, t_blk - 1 - col)

    blk = (t_blk, Rw)
    out_blk = (t_blk, Rw, _LANES)
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(blk, lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b: (n_blk - 1 - b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b: (n_blk - 1 - b, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(out_blk, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(out_blk, lambda b: (n_blk - 1 - b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lh, Rw, _LANES), jnp.bfloat16),
            jax.ShapeDtypeStruct((Lh, Rw, _LANES), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((g, Rw, _LANES), cdt),
            pltpu.VMEM((g, Rw, _LANES), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def _dp_update_t(L_prev, cost, p1, p2, clamp=None):
    """Transposed DP step on (128, R) blocks: d on SUBLANES, REVERSED
    (sublane i holds disparity min_d + 127 - i), so the d-1 neighbor is
    sublane i+1 and d+1 is sublane i-1 — same wrap-a-BIG-pad-lane trick
    as `_dp_update`, axes and roll amounts swapped."""
    dt = L_prev.dtype
    lmin = jnp.min(L_prev, axis=0, keepdims=True)
    dm = _roll_c(L_prev, _LANES - 1, axis=0)   # out[i] = in[i+1] (d-1)
    dp = _roll_c(L_prev, 1, axis=0)            # out[i] = in[i-1] (d+1)
    cand = jnp.minimum(jnp.minimum(L_prev,
                                   jnp.minimum(dm, dp) + dt.type(p1)),
                       lmin + dt.type(p2))
    out = cost + (cand - lmin)
    if clamp is not None:
        out = jnp.minimum(out, dt.type(clamp))
    return out


@functools.lru_cache(maxsize=16)
def _census_call_x(Lw: int, Rh: int, Wext: int, n_cols: int, n_rows: int,
                   n_d: int, p1: float, p2: float, min_d: int,
                   t_blk: int, interpret: bool,
                   carry_bf16: bool = False):
    """Column-axis (horizontal) scans fed by TRANSPOSED census images.

    Inputs: censusL^T blocks (t_blk, Rh) u32 per orientation, plus the
    whole zero-prefixed censusR^T (Wext, Rh) resident in VMEM — the cost
    block for column x is the contiguous sublane slice [x, x+128) with
    the d axis reversed (see module comment).  Outputs: (Lw, 128, Rh)
    bf16 per orientation, d REVERSED on sublanes."""
    n_blk = Lw // t_blk
    bv = _bf16_val(_SGM_BIG_F)   # in-volume out-of-range cost
    bp = _bf16_val(_BIG)
    cdt = jnp.bfloat16 if carry_bf16 else jnp.float32
    clamp = _SGM_BIG_F_BF16 if carry_bf16 else None

    def kernel(clf_ref, clb_ref, crt_ref, of_ref, ob_ref, cf_ref, cb_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            cf_ref[...] = jnp.zeros_like(cf_ref)
            cb_ref[...] = jnp.zeros_like(cb_ref)

        subl = jax.lax.broadcasted_iota(jnp.int32, (_LANES, Rh), 0)
        ycol = jax.lax.broadcasted_iota(jnp.int32, (_LANES, Rh), 1)
        dreal = (_LANES - 1 - subl) + min_d          # reversed d layout

        # ONE aligned (t_blk + 128, Rh) window per orientation per grid
        # step covers every column's slice [x, x+128) — Mosaic requires
        # dynamic sublane starts to be 8-aligned, and the per-block base
        # b*t_blk provably is; per-column slices below are then static
        base_f = pl.multiple_of(b * t_blk, t_blk)
        base_b = pl.multiple_of((n_blk - 1 - b) * t_blk, t_blk)
        Sf = crt_ref[pl.ds(base_f, t_blk + _LANES), :]
        Sb = crt_ref[pl.ds(base_b, t_blk + _LANES), :]

        def cost_at(cl_ref, S_all, col, x_global):
            S = S_all[col:col + _LANES]               # (128, Rh) i32
            cost = _popcount32(S ^ cl_ref[col][None, :]).astype(jnp.float32)
            cost = jnp.where(dreal <= x_global, cost, bv)   # x - d < 0
            in_img = (dreal < n_d + min_d) & (ycol < n_rows) \
                & (x_global < n_cols)
            return jnp.where(in_img, cost, bp).astype(cdt)

        def advance(carry_ref, cost, out_ref, col, x_fwd):
            nxt = _dp_update_t(carry_ref[0], cost, p1, p2, clamp=clamp)
            if x_fwd is not None:
                # wedge free-entry restart, FORWARD orientation only
                # (the backward path never crosses the wedge into range;
                # stereo._SGM_BIG note)
                nxt = jnp.where(dreal == x_fwd, cost, nxt)
            carry_ref[0] = nxt
            out_ref[col] = nxt.astype(jnp.bfloat16)

        for col in range(t_blk):
            xf = b * t_blk + col
            advance(cf_ref, cost_at(clf_ref, Sf, col, xf), of_ref, col, xf)
            xb = (n_blk - 1 - b) * t_blk + (t_blk - 1 - col)
            advance(cb_ref, cost_at(clb_ref, Sb, t_blk - 1 - col, xb),
                    ob_ref, t_blk - 1 - col, None)

    blk = (t_blk, Rh)
    out_blk = (t_blk, _LANES, Rh)
    return pl.pallas_call(
        kernel,
        grid=(n_blk,),
        in_specs=[
            pl.BlockSpec(blk, lambda b: (b, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, lambda b: (n_blk - 1 - b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wext, Rh), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(out_blk, lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(out_blk, lambda b: (n_blk - 1 - b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Lw, _LANES, Rh), jnp.bfloat16),
            jax.ShapeDtypeStruct((Lw, _LANES, Rh), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, _LANES, Rh), cdt),
            pltpu.VMEM((1, _LANES, Rh), cdt),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def census_aggregate(census_l: jnp.ndarray, census_r: jnp.ndarray,
                     v_rolls, p1: float, p2: float, min_d: int, n_d: int,
                     t_blk: int = 16,
                     carry_bf16: bool = False) -> jnp.ndarray:
    """Full 4/8-path SGM aggregation STRAIGHT from (H, W) u32 census
    images; returns the f32 (D, H, W) aggregated volume, bitwise equal to
    `_sgm_aggregate(_cost_volume(...), ...)` with the pallas backend.

    v_rolls: carry shifts of the directions sharing the row scan
    ((0,) = 4-path, (0, 1, -1) = 8-path)."""
    h, w = census_l.shape
    interp = _interpret()
    # int32 views: census codes are <= 24 bits so the reinterpretation is
    # value-preserving; Mosaic cannot cast uint32 to float32
    census_l = census_l.astype(jnp.int32)
    census_r = census_r.astype(jnp.int32)

    # --- x axis (transposed, d reversed on sublanes) ---
    lw = _round_up(w, t_blk)
    rh = _round_up(h, _LANES)
    p_top = _LANES - 1 + min_d
    wext = _round_up(lw + _LANES + p_top, 8)
    clt = jnp.pad(census_l.T, ((0, lw - w), (0, rh - h)))
    crt = jnp.pad(census_r.T, ((p_top, wext - p_top - w), (0, rh - h)))
    xcall = _census_call_x(lw, rh, wext, w, h, n_d, float(p1), float(p2),
                           int(min_d), int(t_blk), interp,
                           carry_bf16=bool(carry_bf16))
    xf, xb = xcall(clt, clt, crt)
    x_sum = xf.astype(jnp.float32) + xb.astype(jnp.float32)
    # (W, 128rev, H) -> (D, H, W): un-reverse d and transpose in one copy
    agg = jnp.transpose(x_sum[:w, ::-1, :h], (1, 2, 0))[:n_d]

    # --- y axis (vertical + diagonals) ---
    lh = _round_up(h, t_blk)
    rw = _round_up(w, _LANES)
    cl = jnp.pad(census_l, ((0, lh - h), (0, rw - w)))
    cr = jnp.pad(census_r, ((0, lh - h), (0, rw - w)))
    ycall = _census_call_y(lh, rw, h, w, n_d, tuple(v_rolls), float(p1),
                           float(p2), int(min_d), int(t_blk), interp,
                           carry_bf16=bool(carry_bf16))
    yf, yb = ycall(cl, cr, cl, cr)
    y_sum = yf.astype(jnp.float32) + yb.astype(jnp.float32)
    return agg + jnp.transpose(y_sum[:h, :w, :n_d], (2, 0, 1))

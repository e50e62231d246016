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

STATUS (round 2): DEFAULT backend.  Bitwise-equal to the scan backend
on real TPU and 21.8 ms vs 29.5 ms for the full sgm8-census pipeline at
KITTI size.  Getting there required taming the graph AROUND the kernel,
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


def _dp_update(L_prev, cost, p1, p2):
    """One DP step on (R, D) f32 blocks; lane rolls wrap the BIG pad lane
    into the d boundaries (see module docstring)."""
    lmin = jnp.min(L_prev, axis=-1, keepdims=True)
    d = L_prev.shape[-1]
    dm = pltpu.roll(L_prev, 1, axis=1)      # from d-1 (lane 0 <- BIG pad)
    dp = pltpu.roll(L_prev, d - 1, axis=1)  # from d+1 (last lane <- pad)
    cand = jnp.minimum(jnp.minimum(L_prev, jnp.minimum(dm, dp) + p1),
                       lmin + p2)
    # grouping matters: cand - lmin FIRST, so an all-BIG carry (the
    # scan-axis pad) contributes exactly 0 — (cost + BIG) - BIG would
    # round the cost away at f32 ulp(1e9) = 64
    return cost + (cand - lmin)


@functools.lru_cache(maxsize=16)
def _axis_call(L: int, R: int, D: int, n_real: int, rolls: tuple,
               p1: float, p2: float, t_blk: int, interpret: bool):
    """pallas_call for one (L, R, D) axis scan; D == lane-padded width,
    L a multiple of t_blk.  Each grid step moves ONE (t_blk, R, D) block
    per orientation and advances the DP over its columns in VMEM —
    per-step DMA latency amortizes over t_blk columns (the one-column
    variant measured DMA-latency-bound at 1617 tiny blocks/frame)."""
    g = len(rolls)
    n_blk = L // t_blk

    def kernel(vf_ref, vb_ref, of_ref, ob_ref, cf_ref, cb_ref):
        b = pl.program_id(0)

        @pl.when(b == 0)
        def _():
            cf_ref[...] = jnp.zeros_like(cf_ref)
            cb_ref[...] = jnp.zeros_like(cb_ref)

        def advance(carry_ref, cost_ref, out_ref, col):
            cost = cost_ref[col].astype(jnp.float32)     # (R, D)
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
                    c = pltpu.roll(c, roll % R, axis=0)
                    rowid = jax.lax.broadcasted_iota(
                        jnp.int32, c.shape, 0)
                    at_border = (rowid == 0) if roll > 0 \
                        else (rowid >= n_real - 1)
                    c = jnp.where(at_border, 0.0, c)
                nxt = _dp_update(c, cost, p1, p2)
                carry_ref[k] = nxt
                total = nxt if total is None else total + nxt
            out_ref[col] = total.astype(jnp.bfloat16)

        for col in range(t_blk):
            advance(cf_ref, vf_ref, of_ref, col)             # ascending
            advance(cb_ref, vb_ref, ob_ref, t_blk - 1 - col)  # descending

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
            pltpu.VMEM((g, R, D), jnp.float32),
            pltpu.VMEM((g, R, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )


def axis_scan_pallas(v: jnp.ndarray, rolls, p1: float, p2: float,
                     t_blk: int = 16) -> jnp.ndarray:
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
                      float(p2), int(t_blk), _interpret())
    out_f, out_b = call(vp, vp)
    out = out_f.astype(jnp.float32) + out_b.astype(jnp.float32)
    return out[:length, :rows, :dd]

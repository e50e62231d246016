"""On-hardware Mosaic compile-check of every Pallas SGM kernel MODE.

Interpret mode (where the CPU test suite runs) does not certify Mosaic
lowering: `pltpu.roll` on bf16 carries passed all CPU tests but failed to
COMPILE on the real TPU ("Rotate with non-32-bit data", round 4) — the
sgm_carry_bf16 mode had never actually run on hardware.  This script
compiles + executes each (kernel, carry dtype) combination once at small
shapes (the failure class is type/op-based, not shape-based) and
cross-checks bf16-carry results against the f32-carry run from the same
process.  Run it after ANY kernel change, even in a degraded relay window
(compile-correctness does not need healthy timings).

Mirrors the reference's only validation of its SGM-equivalent front-end:
the PSMNet depth files are precomputed offline
(kitti_publisher/scripts/publisher.py:36-41), so there is no reference
on-line check to match — this is our own hardening layer.
"""
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from densesurfelmapping_tpu.utils.cache import enable_compilation_cache
from densesurfelmapping_tpu.ops.pallas import sgm


def main():
    enable_compilation_cache()
    print("backend:", jax.default_backend(), jax.devices())
    rng = np.random.default_rng(0)
    failures = []

    # --- axis_scan_pallas: (L, R, D) volume, all roll families ---
    vol = jnp.asarray(rng.uniform(0, 60, (24, 20, 48)).astype(np.float32))
    ref = {}
    # entry = the round-5 wedge free-entry restart (in-kernel iota +
    # select) — the production path always passes it, so it must lower
    for rolls, entries in [((0,), (None, "x")), ((0, 1, -1), (None, "y"))]:
        for entry in entries:
            for bf16 in (False, True):
                name = f"axis_scan rolls={rolls} entry={entry} bf16={bf16}"
                try:
                    out = np.asarray(sgm.axis_scan_pallas(
                        vol, rolls, 7.0, 100.0, t_blk=8, carry_bf16=bf16,
                        entry=entry, min_d=1))
                    if not bf16:
                        ref[(rolls, entry)] = out
                    else:
                        # bf16 carries quantize: agreement is loose, but
                        # the argmin structure should survive here
                        err = np.abs(out - ref[(rolls, entry)]).max()
                        print(f"  {name}: max|bf16-f32| = {err:.2f}")
                    print(f"PASS {name}")
                except Exception as e:  # noqa: BLE001 - report every mode
                    failures.append(name)
                    print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")

    # --- census_aggregate: straight from census images, 4- and 8-path ---
    cl = jnp.asarray(rng.integers(0, 1 << 24, (24, 40)).astype(np.uint32))
    cr = jnp.asarray(rng.integers(0, 1 << 24, (24, 40)).astype(np.uint32))
    for v_rolls in [(0,), (0, 1, -1)]:
        for bf16 in (False, True):
            name = f"census_aggregate v_rolls={v_rolls} bf16={bf16}"
            try:
                out = np.asarray(sgm.census_aggregate(
                    cl, cr, v_rolls, 7.0, 100.0, min_d=0, n_d=16,
                    t_blk=8, carry_bf16=bf16))
                assert np.isfinite(out).all()
                print(f"PASS {name}")
            except Exception as e:  # noqa: BLE001
                failures.append(name)
                print(f"FAIL {name}: {type(e).__name__}: {str(e)[:200]}")

    print("compile-check:", "FAIL " + "; ".join(failures) if failures
          else "ALL MODES PASS")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())

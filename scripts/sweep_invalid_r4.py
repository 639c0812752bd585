"""Round-4 star-stage levers, A/B-isolated on hardware.

The r3 profile split the 39.4 ms star stage into base 11.7 (gather 6.3 +
cell-id 6.0 + math 2.4) + overflow 8.7 + invalid-fallback 19.0, and the r3
sweeps proved the schedule/compaction knobs optimal — so r4 attacks the
WORK:

  A. fast cell ids (bounded-error polynomial asin/atan2, margin-gated) —
     cuts the base stage's ~6 ms of transcendentals AND the fallback
     body's per-ray recompute of them;
  B. precomputed ring/col trig tables + 3-ball validity — removes the
     remaining per-group cos/sin and reclassifies part of the belt as
     valid (DESIGN r2: an exact box test reclassifies ~20 % of invalid);
  C. block-compacted fallback overflow gather (inv_ovf_block) — the r3
     body streamed a full-width 2.5 KB overflow row per fallback ray,
     sentinel-dummy for the ~80 % of belt rays whose cells don't overflow.

Each lever is toggled independently against the r3 configuration.

Run on the TPU:  python -u scripts/sweep_invalid_r4.py
"""

from __future__ import annotations

import dataclasses
import os

from _sweep_common import grouped_runner, march_setup


def main():
    import blackstar_tpu.stars.grid as gridmod
    from blackstar_tpu.stars.grid import load_star_grid

    here, static, params, vel, escaped = march_setup()
    grouped = grouped_runner(static, params, vel, escaped, width=56)

    grid = load_star_grid(os.path.join(here, "stars.grid.npz"))
    no_tables = dataclasses.replace(grid, ring_table=None, col_table=None)

    fast_gate = gridmod._FAST_CELL_MIN_MARGIN

    def set_fast(on: bool):
        gridmod._FAST_CELL_MIN_MARGIN = fast_gate if on else 1e9

    # --- r3 baseline: no fast ids, no tables, full-width fallback ovf ----
    set_fast(False)
    grouped("r3 baseline (exact ids, inline validity, ovf0)",
            no_tables, inv_ovf_block=0)

    # --- one lever at a time ---------------------------------------------
    set_fast(True)
    grouped("A: +fast cell ids", no_tables, inv_ovf_block=0)
    set_fast(False)
    grouped("B: +tables/3-ball validity", grid, inv_ovf_block=0)
    grouped("C: +compacted fallback ovf (block 8)",
            no_tables, inv_ovf_block=8)

    # --- production (all levers) and residual knob checks ------------------
    set_fast(True)
    grouped("PROD r4: fast ids + tables + ovf block 8", grid)
    grouped("prod, inv_ovf_block 16", grid, inv_ovf_block=16)
    grouped("prod, inv_ovf_block 32", grid, inv_ovf_block=32)
    grouped("prod, inv_batch 128", grid, inv_batch_blocks=128)
    grouped("prod, inv_batch 512", grid, inv_batch_blocks=512)
    grouped("prod, ray_block 8", grid, ray_block=8)
    grouped("prod, ovf_batch 128", grid, ovf_batch_blocks=128)
    grouped("prod, ovf_batch 256", grid, ovf_batch_blocks=256)

    # --- stage isolation at the production point ---------------------------
    grouped("prod, base only", grid, debug_stages=set())
    grouped("prod, +ovf", grid, debug_stages={"ovf"})
    grouped("prod, +invalid", grid, debug_stages={"invalid"})


if __name__ == "__main__":
    main()

"""Round-3 follow-up star sweep: one knob at a time from the production
point (row-pair, chunk 2^17, k0=32, single-tier overflow).

The r3 --decide set showed every CPU-predicted combo LOSING on hardware —
but each losing row also switched chunk to 2^21, confounding the
comparison. This sweep isolates each axis at the production point:
chunk alone, ovf_split alone (at 2^17), pay-as-you-go batch sizes alone,
and invalid billing granularity.

Run on the TPU:  python -u scripts/sweep_star_r3.py
"""

from __future__ import annotations

import os

from _sweep_common import grouped_runner, march_setup


def main():
    from blackstar_tpu.stars.grid import load_star_grid

    here, static, params, vel, escaped = march_setup()
    grouped = grouped_runner(static, params, vel, escaped)

    grid_path = os.path.join(here, "stars.grid.npz")
    grid = load_star_grid(grid_path)

    # --- axis 1: chunk alone at production schedule -----------------
    grouped("PROD: row-pair, chunk 2^17", grid)
    grouped("row-pair, chunk 2^18", grid, chunk=1 << 18)
    grouped("row-pair, chunk 2^19", grid, chunk=1 << 19)
    grouped("row-pair, chunk 2^16", grid, chunk=1 << 16)

    # --- axis 2: ovf_split at 2^17 ----------------------------------
    for split in (2, 4):
        gs = load_star_grid(grid_path, ovf_split=split)
        grouped(f"row-pair, 2^17, ovf_split={split}", gs)
        del gs

    # --- axis 3: pay-as-you-go batch sizes at 2^17 -------------------
    grouped("row-pair, 2^17, ovf_batch 2048", grid, ovf_batch_blocks=2048)
    grouped("row-pair, 2^17, ovf_batch 128", grid, ovf_batch_blocks=128)
    grouped("row-pair, 2^17, inv_batch 1024", grid, inv_batch_blocks=1024)
    grouped("row-pair, 2^17, both batches 4x", grid,
            ovf_batch_blocks=2048, inv_batch_blocks=1024)

    # --- axis 4: invalid billing granularity -------------------------
    grouped("row-pair, 2^17, ray_block 16", grid, ray_block=16)

    # --- axis 5: single rows (1xG) — never measured on hw ------------
    grouped("per-row (1x4), chunk 2^17", grid, row_pitch=None)


if __name__ == "__main__":
    main()

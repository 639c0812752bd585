"""k0 up-sizing experiment (r3): k0=16 lost badly (65 ms — more overflow),
but the stage profile says the overflow machinery (+8.7 ms at row-pair),
not base-gather bytes, is a dominant cost — so LARGER k0 (fewer cells
overflowing into the machinery, at 1.5-2 KB base rows) is the live
direction. Measures k0 ∈ {48, 64} at the production schedule.

Measured (r3): k0=48 pathological (64.6 ms — 1536 B rows, non-power-of-two
gather layout); k0=64 ties 32 (39.7 vs 39.6) — kept 32 on memory.

Run on the TPU:  python -u scripts/sweep_k0_up.py
"""

from __future__ import annotations

import os

from _sweep_common import grouped_runner, march_setup


def main():
    from blackstar_tpu.stars.grid import load_star_grid

    here, static, params, vel, escaped = march_setup()
    grouped = grouped_runner(static, params, vel, escaped)

    grid_path = os.path.join(here, "stars.grid.npz")
    grouped("PROD k0=32, row-pair 2^17", load_star_grid(grid_path))
    for k0 in (48, 64):
        g = load_star_grid(grid_path, k0=k0)
        print(f"k0={k0}: base {g.cell_data.shape} ovf {g.ovf_data.shape}",
              flush=True)
        grouped(f"k0={k0}, row-pair 2^17", g)
        del g


if __name__ == "__main__":
    main()

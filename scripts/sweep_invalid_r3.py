"""Invalid-fallback experiments (r3): the stage profile puts the exact
per-ray recompute at +19 ms of the 39.4 ms star stage — 4.6 % invalid
rays scattered along the lensing belt touch ~25 % of 32-ray billing
blocks, and the pay-as-you-go while_loop serializes the recompute.

Measures, against the production forward path:
  1. group-granularity billing (ray_block=8 → 1 group/block);
  2. the capacity-based single vectorized pass (the differentiable
     path's machinery, timed with and without its cond guard);
  3. bigger invalid batches at group granularity.

Measured (r3): all lose to the 39.8 ms while-batched production point
(42.3 / 67.7 / 107.8 / 48.5) — the compaction machinery is optimal; the
r4 work cut the recomputed work itself (see sweep_invalid_r4.py).

Run on the TPU:  python -u scripts/sweep_invalid_r3.py
"""

from __future__ import annotations

from _sweep_common import grouped_runner, march_setup


def main():
    import os

    from blackstar_tpu.stars.grid import load_star_grid

    here, static, params, vel, escaped = march_setup()
    grouped = grouped_runner(static, params, vel, escaped, width=56)

    grid = load_star_grid(os.path.join(here, "stars.grid.npz"))

    grouped("PROD forward (while batches, ray_block 32)", grid)
    grouped("ray_block 8 (1 group/block)", grid, ray_block=8)
    grouped("ray_block 8, inv_batch 1024", grid, ray_block=8,
            inv_batch_blocks=1024)
    # Capacity-based single pass (the diff path's machinery), no guard:
    # exact iff capacities hold; timing-only here.
    grouped("capacity path (diff machinery), no guard", grid,
            differentiable=True, debug_stages={"ovf", "ovf2", "invalid"})
    grouped("capacity path + cond guard (production diff)", grid,
            differentiable=True)
    grouped("capacity, invalid_frac 0.125, no guard", grid,
            differentiable=True, invalid_frac=0.125,
            debug_stages={"ovf", "ovf2", "invalid"})


if __name__ == "__main__":
    main()

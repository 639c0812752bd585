"""Round-4b: invalid-pass cost anatomy after the r4a sweep's surprises.

r4a measured the fallback's obvious byte/transcendental cuts FLAT or
WORSE — so this set separates the pass into machinery floor vs body work:

  1. mask-steered body (non-invalid billed rays -> one cached row +
     dropped from the octet bound) vs the r3 body, at ovf0 and ovf8;
  2. the machinery floor: debug_stages={"invalid"} minus base-only, at
     several batch sizes (trip-latency hypothesis: cost ~ trip count);
  3. trip-count scaling at constant billed rays (inv_batch x ray_block).

Run on the TPU:  python -u scripts/sweep_invalid_r4b.py
"""

from __future__ import annotations

import os

from _sweep_common import grouped_runner, march_setup


def main():
    from blackstar_tpu.stars.grid import load_star_grid

    here, static, params, vel, escaped = march_setup()
    grouped = grouped_runner(static, params, vel, escaped, width=56)

    grid = load_star_grid(os.path.join(here, "stars.grid.npz"))

    grouped("r3 body (no steer), ovf0", grid, inv_mask_steer=False)
    grouped("PROD r4b: mask-steered body, ovf0", grid)
    grouped("steered + ovf_block 8", grid, inv_ovf_block=8)
    grouped("steered, inv_batch 64", grid, inv_batch_blocks=64)
    grouped("steered, inv_batch 1024", grid, inv_batch_blocks=1024)
    grouped("steered, ray_block 16 + inv_batch 512", grid,
            ray_block=16, inv_batch_blocks=512)

    # invalid-pass isolation (subtract the base-only row to attribute)
    grouped("base only", grid, debug_stages=set())
    grouped("+invalid, steered", grid, debug_stages={"invalid"})
    grouped("+invalid, no steer", grid, debug_stages={"invalid"},
            inv_mask_steer=False)
    grouped("+invalid, steered, inv_batch 1024", grid,
            debug_stages={"invalid"}, inv_batch_blocks=1024)
    grouped("+invalid, steered, inv_batch 64", grid,
            debug_stages={"invalid"}, inv_batch_blocks=64)


if __name__ == "__main__":
    main()

"""Round-4c: the decisive invalid-pass experiments.

r4a/r4b measured every in-body lever (bytes, transcendentals, compaction,
steering, batch/trip shape) FLAT or WORSE — the pass sits at 19±3 ms
regardless. Two hypotheses remain:

  1. fixed machinery cost (buffers/flags/while forcing materialisation
     boundaries in the chunk pipeline) — measured here by timing the FULL
     production path on a doctored grid whose validity radii admit
     EVERYTHING (zero flagged blocks, results wrong, timing-only), and one
     that admits NOTHING (full billing upper bound);
  2. billing volume ∝ invalid population — attacked at the SOURCE with
     larger-halo rebuilds (the r2 rebuilds only went SMALLER): margin
     scales the belt width that fails validity, at the cost of denser
     candidate lists (base rows stay k0-sized; only overflow grows).

Run on the TPU:  python -u scripts/sweep_invalid_r4c.py
"""

from __future__ import annotations

import dataclasses
import os
import time

import numpy as np

from _sweep_common import grouped_runner, march_setup


def main():
    import jax.numpy as jnp

    from blackstar_tpu.stars.catalog import parse_ppm
    from blackstar_tpu.stars.grid import build_star_grid_compact, load_star_grid

    here, static, params, vel, escaped = march_setup()
    grouped = grouped_runner(static, params, vel, escaped, width=56)

    grid = load_star_grid(os.path.join(here, "stars.grid.npz"))
    grouped("PROD (margin 6 mrad)", grid)

    # --- hypothesis 1: machinery at zero / full billing ------------------
    rt = np.asarray(grid.ring_table)
    all_valid = dataclasses.replace(
        grid, ring_table=jnp.asarray(
            np.concatenate([rt[:, :2], np.full((len(rt), 1), 16.0),
                            rt[:, 3:7], np.full((len(rt), 1), 16.0)], axis=1)
        )
    )
    none_valid = dataclasses.replace(
        grid, ring_table=jnp.asarray(
            np.concatenate([rt[:, :2], np.zeros((len(rt), 1)),
                            rt[:, 3:7], np.zeros((len(rt), 1))], axis=1)
        )
    )
    grouped("all-valid grid (0 flagged; WRONG, timing only)", all_valid)
    grouped("none-valid grid (full billing; WRONG, timing)", none_valid)

    # --- hypothesis 2: larger build halos ---------------------------------
    cat = parse_ppm(open(os.path.join(here, "stars.ppm"), "rb").read())
    for radius, cell in ((0.0105, 0.006), (0.015, 0.006), (0.012, 0.008)):
        t0 = time.time()
        compact = build_star_grid_compact(cat, cell_size=cell, k0=32,
                                          radius=radius)
        g = compact.to_grid(dtype=jnp.float32)
        print(f"  built radius={radius} cell={cell}: "
              f"base {g.cell_data.shape} ovf {g.ovf_data.shape} "
              f"({g.nbytes()/1e6:.0f} MB, {time.time()-t0:.0f} s)",
              flush=True)
        grouped(f"margin {1e3*(radius-0.0015):.1f} mrad (cell {cell})", g)
        grouped(f"  same, base only", g, debug_stages=set())
        grouped(f"  same, +invalid", g, debug_stages={"invalid"})
        del g, compact


if __name__ == "__main__":
    main()

"""Benchmark: forward render throughput on the reference's canonical workload.

scenes/default.yaml — 1920×1080, stepSize 0.3, accretion disk on, no
supersampling (BASELINE.md "canonical workload"). Metric: Mrays/s for the
full render (ray generation + geodesic march + shading), steady-state,
excluding compilation. ``vs_baseline`` is measured / 50 Mrays/s/chip (the
BASELINE.json north-star target — the reference itself publishes no numbers).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    import jax

    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import render

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()

    star_grid = None
    grid_path = os.path.join(here, "stars.grid.npz")
    if os.path.exists(grid_path):
        from blackstar_tpu.stars.grid import load_star_grid

        star_grid = load_star_grid(grid_path, dtype=static.jdtype)

    fn = jax.jit(lambda p, g: render(p, static, g))
    # Warm-up / compile.
    img = jax.block_until_ready(fn(params, star_grid))

    n_rays = static.render_width * static.render_height
    reps = 3
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(params, star_grid))
        times.append(time.perf_counter() - t0)
    best = min(times)

    mrays = n_rays / best / 1e6
    print(
        json.dumps(
            {
                "metric": "fwd_render_throughput_default_1080p",
                "value": round(mrays, 3),
                "unit": "Mrays/s",
                "vs_baseline": round(mrays / 50.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()

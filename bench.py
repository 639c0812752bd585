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
    import jax.numpy as jnp

    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import render

    here = os.path.dirname(os.path.abspath(__file__))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()

    star_grid = None
    grid_path = os.path.join(here, "stars.grid.npz")
    if os.path.exists(grid_path):
        try:
            from blackstar_tpu.stars.grid import load_star_grid

            star_grid = load_star_grid(grid_path, dtype=static.jdtype)
        except Exception:
            star_grid = None  # stale/incompatible grid: bench without stars

    # Reduce on device so timing forces execution with a scalar fetch (on
    # tunneled platforms block_until_ready alone may not block).
    fn = jax.jit(lambda p, g: jnp.sum(render(p, static, g)))
    # Warm-up / compile.
    float(fn(params, star_grid))

    n_rays = static.render_width * static.render_height
    # Keep several dispatches in flight before fetching, so per-call host
    # round-trip overhead is amortised out of the steady-state number.
    reps = 8
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(params, star_grid) for _ in range(reps)]
        for o in outs:
            float(o)
        times.append((time.perf_counter() - t0) / reps)
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

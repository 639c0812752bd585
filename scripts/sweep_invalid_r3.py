"""Invalid-fallback experiments (r3): the stage profile puts the exact
per-ray recompute at +19 ms of the 39.4 ms star stage — 4.6 % invalid
rays scattered along the lensing belt touch ~25 % of 32-ray billing
blocks, and the pay-as-you-go while_loop serializes the recompute.

Measures, against the production forward path:
  1. group-granularity billing (ray_block=8 → 1 group/block);
  2. the capacity-based single vectorized pass (the differentiable
     path's machinery, timed with and without its cond guard);
  3. bigger invalid batches at group granularity.

Run on the TPU:  python -u scripts/sweep_invalid_r3.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

K = 8


def timeit(name, fn, *args):
    fn(*args).block_until_ready()
    float(jnp.sum(fn(*args)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        times.append((time.perf_counter() - t0) / K)
    t = min(times)
    print(f"{name:<56} {t * 1e3:8.2f} ms/frame", flush=True)
    return t


def main():
    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import run_march
    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.geodesic import ESCAPED
    from blackstar_tpu.stars.grid import load_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()

    rw, rh = static.render_width, static.render_height
    pos0, vel0 = generate_ray_components(params.camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static))(params)
    vel = res.vel
    escaped = res.status == ESCAPED

    ii, ss = params.stars.intensity, params.stars.saturation

    def k_loop(body):
        def f(*a):
            def it(i, acc):
                return acc + body(i, *a)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    def grouped(name, grid, **kw):
        kw.setdefault("row_pitch", rw)
        return timeit(
            name,
            k_loop(lambda i, v, a, g: jnp.sum(g.lookup_grouped(
                v, intensity=ii + 1e-6 * i, saturation=ss, active=a, **kw))),
            vel, escaped, grid,
        )

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

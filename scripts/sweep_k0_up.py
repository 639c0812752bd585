"""k0 up-sizing experiment (r3): k0=16 lost badly (65 ms — more overflow),
but the stage profile says the overflow machinery (+8.7 ms at row-pair),
not base-gather bytes, is a dominant cost — so LARGER k0 (fewer cells
overflowing into the machinery, at 1.5-2 KB base rows) is the live
direction. Measures k0 ∈ {48, 64} at the production schedule.

Run on the TPU:  python -u scripts/sweep_k0_up.py
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
    print(f"{name:<52} {t * 1e3:8.2f} ms/frame", flush=True)
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

    def grouped(name, grid):
        return timeit(
            name,
            k_loop(lambda i, v, a, g: jnp.sum(g.lookup_grouped(
                v, intensity=ii + 1e-6 * i, saturation=ss, active=a,
                row_pitch=rw))),
            vel, escaped, grid,
        )

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

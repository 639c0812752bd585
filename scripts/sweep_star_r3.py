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

    def grouped(name, grid, **kw):
        kw.setdefault("row_pitch", rw)
        return timeit(
            name,
            k_loop(lambda i, v, a, g: jnp.sum(g.lookup_grouped(
                v, intensity=ii + 1e-6 * i, saturation=ss, active=a, **kw))),
            vel, escaped, grid,
        )

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

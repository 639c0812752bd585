"""Sweep the star-lookup configuration on the TPU with the full catalogue.

Times the production render of scenes/default.yaml @1080p with and without
star shading for several (cell_size, k0, chunk) combinations, reporting the
star-shading cost per frame. Uses the committed stars.ppm catalogue.

Run on the TPU:  python scripts/sweep_starperf.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def time_frames(fn, *args, frames_per_call=4, reps=3):
    float(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append((time.perf_counter() - t0) / frames_per_call)
    return min(times)


def main():
    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import render
    from blackstar_tpu.stars.catalog import read_catalog
    from blackstar_tpu.stars.grid import build_star_grid_compact
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()
    cat = read_catalog(os.path.join(here, "stars.ppm"))
    print(f"{cat.n_stars} stars; backend {jax.default_backend()}")

    k_frames = 4

    def make_fn(grid, chunk, cap):
        def f(p, g):
            def body(i, acc):
                p2 = dataclasses.replace(p, mass=p.mass + 1e-7 * i)
                img = render(p2, static, g)
                return acc + jnp.sum(img)

            return jax.lax.fori_loop(0, k_frames, body, jnp.float32(0.0))

        if grid is not None and (chunk or cap):
            import blackstar_tpu.stars.grid as G

            orig = G.StarGrid.lookup

            def f2(p, g):
                def patched(self, vel, intensity, saturation, active=None, **kw):
                    return orig(self, vel, intensity, saturation, active,
                                chunk=chunk or (1 << 17),
                                ovf_capacity=cap or 0.25)

                G.StarGrid.lookup = patched
                try:
                    return f(p, g)
                finally:
                    G.StarGrid.lookup = orig

            return jax.jit(f2)
        return jax.jit(f)

    base_t = time_frames(make_fn(None, None, None), params, None,
                         frames_per_call=k_frames)
    print(f"no stars: {base_t * 1e3:7.2f} ms/frame")

    import itertools

    cells = [float(c) for c in (sys.argv[1:] or ["0.004"])]
    compacts = {cell: build_star_grid_compact(cat, cell_size=cell)
                for cell in cells}

    for cell, comp in compacts.items():
        for k0 in (4, 8, 16):
            grid = comp.to_grid(jnp.float32, k0=k0)
            for chunk in (1 << 17, 1 << 19):
                t = time_frames(
                    make_fn(grid, chunk, 0.25), params, grid,
                    frames_per_call=k_frames,
                )
                print(
                    f"cell={cell} k0={k0:>2} k1={grid.ovf_data.shape[1]:>3} "
                    f"chunk={chunk >> 10}k tbl={grid.nbytes() / 1e6:6.0f}MB "
                    f"total={t * 1e3:7.2f} ms/frame stars={1e3 * (t - base_t):6.2f} ms"
                )


if __name__ == "__main__":
    main()

"""Hardware validation: render every reference scene on the TPU with both
march paths (Pallas kernel vs XLA while_loop) at moderate resolution and
report agreement. Run on a machine with a TPU attached.

The per-scene ms figures are single-dispatch host-side timings — on a
tunneled TPU they are dominated by the ~27 ms dispatch floor (see
CLAUDE.md); agreement is the point here, bench.py is the timing tool."""

import glob
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import dataclasses

    from blackstar_tpu.config import Config, load_config
    from blackstar_tpu.render import render
    from blackstar_tpu.stars.catalog import Catalog
    from blackstar_tpu.stars.grid import build_star_grid

    # A populated sky so the no-disk (pure lensing) scenes exercise the full
    # path instead of rendering black: the committed full-scale grid when
    # present, else a quick synthetic one.
    from blackstar_tpu.stars.artifact import default_star_grid

    grid = default_star_grid(dtype=jnp.float32)
    if grid is None:
        rng = np.random.default_rng(9)
        spos = rng.normal(size=(100000, 3))
        spos /= np.linalg.norm(spos, axis=-1, keepdims=True)
        grid = build_star_grid(
            Catalog(
                pos=spos,
                mag=rng.integers(500, 1300, len(spos)).astype(np.int32),
                hue=np.full(len(spos), 0.094),
                sat=np.full(len(spos), 0.29),
            ),
            dtype=jnp.float32,
        )

    scenes = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "scenes", "*.yaml")))
    for path in scenes:
        cfg = load_config(path)
        w, h = cfg.scene.resolution
        scene = dataclasses.replace(
            cfg.scene, resolution=(384, max(8, 384 * h // w)), dtype="float32",
            bloom_strength=0.0,
        )
        cfg = Config(scene=scene, camera=cfg.camera)
        params, static = cfg.params(), cfg.static()

        # The grid rides as a jit ARGUMENT (a closed-over grid is baked
        # into the program as a constant — blows compile limits at scale).
        fx = jax.jit(lambda p, g: render(p, static, g, use_pallas=False))
        fp = jax.jit(lambda p, g: render(p, static, g, use_pallas=True))
        a = np.asarray(fx(params, grid))
        b = np.asarray(fp(params, grid))  # compile
        t0 = time.perf_counter()
        b = np.asarray(fp(params, grid))
        dt = time.perf_counter() - t0
        diff = np.abs(a - b)
        name = os.path.basename(path)
        print(
            f"{name:22s} {static.render_width}x{static.render_height}"
            f"{' ss' if static.supersampling else '   '}  "
            f"max|Δ|={diff.max():.2e} mean={diff.mean():.2e} "
            f"(pallas {dt*1e3:.0f} ms)"
        )


if __name__ == "__main__":
    main()

"""The flagship *differentiable* workload, measured (VERDICT r3 weak #3).

Times, device-side (K frames per dispatch, see CLAUDE.md on the tunnel's
~27 ms dispatch floor), at 1080p on scenes/default.yaml with the full
470k-star sky:

  1. forward render, production schedule (reference point);
  2. forward render through the differentiable path (custom-vjp star
     stage, stars/diff.py + Pallas custom-vjp march) — what the training
     loss evaluates; since r4 this equals the production schedule;
  3. render + backward: jax.grad of the L2 image loss w.r.t. ALL scene
     params (camera pose/fov, disk, stars, bloom, mass).

Measured r4 (see BASELINE.md): 65.6 / 65.8 / 194.5 ms (10.7 Mrays/s
fwd+bwd; the pre-VJP autodiff star path measured 106.1 / 492).

Run on the TPU:  python -u scripts/bench_diff_pipeline.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

K = 4


def main():
    from blackstar_tpu.config import load_config
    from blackstar_tpu.fit import image_loss
    from blackstar_tpu.render import render
    from blackstar_tpu.stars.artifact import default_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()
    grid = default_star_grid()
    assert grid is not None, "star grid unavailable (ensure_star_grid)"
    n_rays = static.render_width * static.render_height

    target = jax.jit(lambda p, g: render(p, static, g))(params, grid)
    target = jax.block_until_ready(target)

    def timeit(name, fn, *args):
        fn(*args).block_until_ready()
        float(jnp.sum(fn(*args)))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(jnp.sum(fn(*args)))
            times.append((time.perf_counter() - t0) / K)
        t = min(times)
        print(f"{name:<44} {t * 1e3:8.1f} ms/frame "
              f"({n_rays / t / 1e6:6.1f} Mrays/s)", flush=True)
        return t

    def k_loop(body):
        def f(*a):
            def it(i, acc):
                return acc + body(i, *a)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    timeit(
        "forward (production schedule)",
        k_loop(lambda i, p, g, t: jnp.sum(render(
            dataclasses.replace(p, mass=p.mass + 1e-7 * i), static, g))),
        params, grid, target,
    )
    timeit(
        "forward, differentiable star schedule",
        k_loop(lambda i, p, g, t: jnp.sum(render(
            dataclasses.replace(p, mass=p.mass + 1e-7 * i), static, g,
            differentiable=True))),
        params, grid, target,
    )

    def gsum(i, p, g, t):
        p2 = dataclasses.replace(p, mass=p.mass + 1e-7 * i)
        grads = jax.grad(
            lambda q: image_loss(q, static, t, g)
        )(p2)
        return sum(jnp.sum(v) for v in jax.tree.leaves(grads))

    timeit("render + backward (full param grads)", k_loop(gsum),
           params, grid, target)

    # march-only fwd+bwd for attribution (no star grid)
    def gsum_nostars(i, p, t):
        p2 = dataclasses.replace(p, mass=p.mass + 1e-7 * i)
        grads = jax.grad(
            lambda q: image_loss(q, static, t, None)
        )(p2)
        return sum(jnp.sum(v) for v in jax.tree.leaves(grads))

    timeit("render + backward, empty sky", k_loop(gsum_nostars),
           params, target)


if __name__ == "__main__":
    main()

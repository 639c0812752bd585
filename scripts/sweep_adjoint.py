"""Device-side fwd+bwd timing of the Pallas march adjoint at 1080p, with a
(block_rows, seg_len) sweep. Resolves the round-1 93-vs-120 ms discrepancy
with one methodology: K iterations inside one dispatch, scalar fetch.

Run on the TPU:  python -u scripts/sweep_adjoint.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    import dataclasses

    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import render
    from blackstar_tpu.util import enable_compilation_cache
    import blackstar_tpu.ops.march_adjoint_pallas as adj

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static, params = cfg.static(), cfg.params()
    n_rays = static.render_width * static.render_height
    print(f"{static.render_width}x{static.render_height}, cap {static.max_steps}")

    K = 4

    def timed(fn, *args, reps=3):
        float(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(fn(*args))
            ts.append((time.perf_counter() - t0) / K)
        return min(ts)

    def make(loss_only=False):
        def loss(p):
            img = render(p, static, differentiable=True)
            return jnp.mean(img * img)

        def k_iter(p):
            def body(i, acc):
                p2 = dataclasses.replace(p, mass=p.mass + 1e-7 * i)
                if loss_only:
                    return acc + loss(p2)
                l, g = jax.value_and_grad(loss)(p2)
                return acc + l + g.mass
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        return jax.jit(k_iter)

    t_f = timed(make(loss_only=True), params)
    print(f"fwd only (diff path): {t_f * 1e3:7.2f} ms "
          f"({n_rays / t_f / 1e6:.1f} Mrays/s)")

    import functools

    import blackstar_tpu.ops.march_diff as md

    orig = adj.march_adjoint_pallas
    # store_stages (r3): the VJP sweep skips ALL primal RK4 recompute by
    # storing post-states (free) + stage positions (+9 sb planes of VMEM).
    # Stage-storage candidates first at the flagship tiling, then the tile
    # sweep at whichever wins.
    combos = [(16, 16, True), (16, 16, False),
              (8, 16, True), (32, 16, True), (16, 32, True), (16, 8, True),
              (8, 16, False), (32, 16, False), (16, 32, False),
              (16, 8, False), (8, 32, False)]
    for rows, seg, stages in combos:
        md.march_adjoint_pallas = functools.partial(
            orig, block_rows=rows, seg_len=seg, store_stages=stages
        )
        md._make_march_diff.cache_clear()
        try:
            t = timed(make(), params)
            print(f"rows={rows:2d} seg={seg:2d} stages={int(stages)}: "
                  f"fwd+bwd {t * 1e3:7.2f} ms "
                  f"({n_rays / t / 1e6:5.1f} Mrays/s fwd+bwd, "
                  f"bwd ≈ {(t - t_f) * 1e3:6.2f} ms)")
        except Exception as e:
            print(f"rows={rows} seg={seg} stages={int(stages)}: "
                  f"FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()

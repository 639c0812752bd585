"""Full-pipeline throughput on the heavy workloads (r3).

Re-measures BASELINE.md's default-aa (4× supersampled 1080p = 8.3M rays)
and 8K rows under the round-2+ workload definition — march + full
470k-star sky + bloom (+ supersample downsample for default-aa) — so the
table no longer mixes r1 march-only numbers with full-pipeline rows.

Run on the TPU:  python -u scripts/bench_heavy.py
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

K = 4


def main():
    from blackstar_tpu.config import load_config
    from blackstar_tpu.ops.filters import bloom
    from blackstar_tpu.render import render
    from blackstar_tpu.stars.artifact import default_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    grid = default_star_grid()
    # A missing catalogue/cache would silently shade an EMPTY sky and report
    # "full pipeline" numbers that exclude the star stage entirely.
    assert grid is not None, (
        "star grid unavailable — run blackstar_tpu.stars.artifact."
        "ensure_star_grid() (needs stars.ppm / stars.grid.npz in the repo)"
    )

    def measure(name, cfg_path, resolution=None):
        cfg = load_config(cfg_path)
        if resolution is not None:
            cfg = dataclasses.replace(
                cfg, scene=dataclasses.replace(cfg.scene, resolution=resolution)
            )
        static = cfg.static()
        params = cfg.params()
        n_rays = static.render_width * static.render_height

        def k_frames(p, g):
            def body(i, acc):
                p2 = dataclasses.replace(p, mass=p.mass + 1e-7 * i)
                # render() applies the supersample downsample itself when
                # static.supersampling (a second one here would also shrink
                # the bloom to quarter resolution — the r3 default-aa row
                # was measured with that bug, see BASELINE.md).
                img = render(p2, static, g)
                img = bloom(img, p2.bloom_strength.astype(img.dtype),
                            static.bloom_divider)
                return acc + jnp.sum(img)
            return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

        fn = jax.jit(k_frames)
        float(fn(params, grid))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, grid))
            times.append((time.perf_counter() - t0) / K)
        t = min(times)
        print(f"{name:<38} {n_rays / t / 1e6:7.1f} Mrays/s "
              f"({t * 1e3:7.1f} ms/frame, {n_rays / 1e6:.1f} Mrays)",
              flush=True)

    measure("default-aa (4x supersampled 1080p)",
            os.path.join(here, "scenes", "default-aa.yaml"))
    measure("8K (7680x4320)",
            os.path.join(here, "scenes", "default.yaml"),
            resolution=(7680, 4320))


if __name__ == "__main__":
    main()

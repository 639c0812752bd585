"""Re-sweep the star-stage knobs under the r5 production 4x4 schedule.

The r4 star-stage changes (fast cell ids, 3-ball validity, compacted
fallback overflow) shifted the row-band optimum from the r3 winner 2x4 to
4x4 (measured on the full-pipeline bench, render.py ROW_BANDS comment).
The other knobs' r3 sweeps were all taken AT the old 2x4 point — this
re-opens the one-knob-at-a-time question around the NEW production point
(row_bands=4, chunk 2^17, ovf_batch 512, inv_batch 256, ray_block 32):
chunk size, overflow/invalid batch shapes, ray_block billing granularity.

Same harness as profile_star_stages.py: production 1080p escape
directions, K iterations inside one dispatch, min of 3 timings.

Run on the TPU:  python scripts/sweep_star_r5.py
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
    print(f"{name:<46} {t * 1e3:8.2f} ms/frame", flush=True)
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
    grid = load_star_grid(os.path.join(here, "stars.grid.npz"))
    rw, rh = static.render_width, static.render_height
    print(f"{grid.n_stars} stars, backend {jax.default_backend()}", flush=True)

    pos0, vel0 = generate_ray_components(cfg.params().camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static))(params)
    vel = jnp.stack([res.vel[0], res.vel[1], res.vel[2]]
                    if isinstance(res.vel, tuple) else
                    [res.vel[:, 0], res.vel[:, 1], res.vel[:, 2]], axis=-1)
    escaped = res.status == ESCAPED

    def k_loop(body):
        def f(*args):
            def it(i, acc):
                return acc + body(i, *args)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    def stars_fn(**kw):
        def body(i, v, a, g):
            inten = params.stars.intensity + 1e-6 * i
            return jnp.sum(g.lookup_grouped(
                v, intensity=inten, saturation=params.stars.saturation,
                active=a, row_pitch=rw, row_bands=4, **kw,
            ))
        return k_loop(body)

    base = timeit("4x4 gb4 production (chunk 2^17, 512/256, rb32)",
                  stars_fn(), vel, escaped, grid)
    for name, kw in [
        ("chunk 2^18 (gb4)", dict(chunk=1 << 18)),
        ("ovf_frac 0.25", dict(ovf_frac=0.25)),
        ("invalid_frac 0.125", dict(invalid_frac=0.125)),
        ("inv_ovf_block 8", dict(inv_ovf_block=8)),
        ("rb32->16 (gb4)", dict(ray_block=16)),
    ]:
        timeit(f"4x4 + {name}", stars_fn(**kw), vel, escaped, grid)
    # deeper row bands (x4 groups) — first measurement at any gb
    def stars_rb(p):
        def body(i, v, a, g):
            inten = params.stars.intensity + 1e-6 * i
            return jnp.sum(g.lookup_grouped(
                v, intensity=inten, saturation=params.stars.saturation,
                active=a, row_pitch=rw, row_bands=p,
            ))
        return k_loop(body)
    for p_ in (6, 8):
        timeit(f"{p_}x4 row-bands (gb4)", stars_rb(p_), vel, escaped, grid)
    for name, kw in []:
        timeit(f"4x4 + {name}", stars_fn(**kw), vel, escaped, grid)
    print(f"baseline {base * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()

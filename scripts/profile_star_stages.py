"""Stage breakdown of the full-pipeline frame on the TPU.

Times (device-side, K iterations inside one jit) each stage of the
production 1080p default-scene frame: march, star shading broken into
gather / base math / overflow / invalid-fallback via the
``debug_stages`` hook of ``StarGrid.lookup_grouped``, and bloom.

Run on the TPU:  python scripts/profile_star_stages.py
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
    float(jnp.sum(fn(*args)))  # force a real fetch through the tunnel
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        times.append((time.perf_counter() - t0) / K)
    t = min(times)
    print(f"{name:<42} {t * 1e3:8.2f} ms/frame")
    return t


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ovf-split", type=int, default=None,
                    help="tier-1 octets for the two-tier overflow layout")
    ap.add_argument("--k0", type=int, default=None)
    args = ap.parse_args()

    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import render, run_march
    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.geodesic import ESCAPED
    from blackstar_tpu.ops.filters import bloom
    from blackstar_tpu.stars.grid import load_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()
    grid = load_star_grid(os.path.join(here, "stars.grid.npz"),
                          k0=args.k0, ovf_split=args.ovf_split)
    print(f"{grid.n_stars} stars, K0={grid.pad_k}, ovf rows {grid.ovf_data.shape}"
          + (f", ovf2 rows {grid.ovf2_data.shape}" if grid.has_ovf2 else "")
          + f", backend {jax.default_backend()}")

    rw, rh = static.render_width, static.render_height
    n = rw * rh

    # One march to get production escape directions (device-resident).
    pos0, vel0 = generate_ray_components(cfg.params().camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static))(params)
    vel = jnp.stack(list(res.vel) if isinstance(res.vel, tuple) else
                    [res.vel[:, 0], res.vel[:, 1], res.vel[:, 2]], axis=-1)
    escaped = res.status == ESCAPED
    print(f"escaped: {float(jnp.mean(escaped.astype(jnp.float32))):.3f}")

    def k_loop(body):
        def f(*args):
            def it(i, acc):
                return acc + body(i, *args)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    # Full render (march + stars + composite), no bloom.
    t_render = timeit(
        "render (march+stars)",
        k_loop(lambda i, p, g: jnp.sum(
            render(
                __import__("dataclasses").replace(p, mass=p.mass + 1e-7 * i),
                static, g))),
        params, grid,
    )
    t_march = timeit(
        "march only",
        k_loop(lambda i, p: jnp.sum(
            render(
                __import__("dataclasses").replace(p, mass=p.mass + 1e-7 * i),
                static, None))),
        params,
    )

    # Star lookup stage isolation on fixed production directions.
    def stars_fn(stages, **kw):
        def body(i, v, a, g):
            inten = params.stars.intensity + 1e-6 * i
            out = g.lookup_grouped(
                v, intensity=inten, saturation=params.stars.saturation,
                active=a, debug_stages=stages, **kw,
            )
            return jnp.sum(out)
        return k_loop(body)

    t_full = timeit("stars: full (production)", stars_fn(None), vel, escaped, grid)
    t_base = timeit("stars: gather+base math only", stars_fn(set()),
                    vel, escaped, grid)
    t_ovf = timeit("stars: +ovf", stars_fn({"ovf"}), vel, escaped, grid)
    if grid.has_ovf2:
        timeit("stars: +ovf+ovf2", stars_fn({"ovf", "ovf2"}),
               vel, escaped, grid)
    t_inv = timeit("stars: +invalid", stars_fn({"invalid"}), vel, escaped, grid)

    # Row-band schedules (p adjacent rows share each group's gather).
    for p in (2, 4):
        timeit(f"stars: full, {p}-row bands", stars_fn(None, row_pitch=rw,
                                                       row_bands=p),
               vel, escaped, grid)
        timeit(f"stars: base only, {p}-row bands",
               stars_fn(set(), row_pitch=rw, row_bands=p),
               vel, escaped, grid)
        timeit(f"stars: +ovf, {p}-row bands",
               stars_fn({"ovf"}, row_pitch=rw, row_bands=p),
               vel, escaped, grid)
    # 4×8 blocks (group=8, the largest the artifact margin covers at 1080p).
    for stages, tag in ((None, "full"), (set(), "base only"),
                        ({"invalid"}, "+invalid")):
        timeit(f"stars: {tag}, 4x8 blocks",
               stars_fn(stages, row_pitch=rw, row_bands=4, group=8,
                        chunk=1 << 21),
               vel, escaped, grid)

    # Raw gather cost: one row per group, production cell ids.
    from blackstar_tpu.stars.grid import GROUP
    n_groups = n // GROUP
    v4 = vel.reshape(n_groups, GROUP, 3)
    rep = v4.mean(axis=1)
    rep = rep / jnp.linalg.norm(rep, axis=-1, keepdims=True)
    cells = grid.cell_ids(rep)

    t_gather = timeit(
        "raw row gather (1/group)",
        k_loop(lambda i, c, g: jnp.sum(g.cell_data[(c + i) % g.cell_data.shape[0]]
                                       [:, :4])),
        cells, grid,
    )

    # Cell-id / representative arithmetic.
    t_cellid = timeit(
        "rep + cell ids only",
        k_loop(lambda i, v: jnp.sum(
            grid.cell_ids(
                (lambda m: m / jnp.linalg.norm(m, axis=-1, keepdims=True))(
                    (v + 1e-7 * i).reshape(n_groups, GROUP, 3).mean(axis=1))
            ).astype(jnp.float32))),
        vel,
    )

    img = render(params, static, grid)
    t_bloom = timeit(
        "bloom",
        k_loop(lambda i, im: jnp.sum(
            bloom(im + 1e-7 * i, params.bloom_strength, static.bloom_divider))),
        img,
    )

    print()
    print(f"march {t_march*1e3:.1f}  stars(full) {t_full*1e3:.1f}  "
          f"bloom {t_bloom*1e3:.1f}   sum {(t_march+t_full+t_bloom)*1e3:.1f}")
    print(f"stars breakdown: base {t_base*1e3:.1f}  "
          f"ovf +{(t_ovf-t_base)*1e3:.1f}  inv +{(t_inv-t_base)*1e3:.1f}  "
          f"both-overlap {(t_full-t_ovf-t_inv+t_base)*1e3:.1f}")
    print(f"  base = gather ~{t_gather*1e3:.1f} + cellid ~{t_cellid*1e3:.1f} "
          f"+ math ~{(t_base-t_gather-t_cellid)*1e3:.1f}")


if __name__ == "__main__":
    main()

"""Diagnose where the star-lookup time goes on the TPU.

Stage A: raw gather cost vs source-table size (is a 316 MB table gathered
slower than the 32 MB one sweep_gather.py measured?).
Stage B: the production lookup broken into stages on real ray directions.

Run on the TPU:  python -u scripts/diag_stars.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)


def stage_a():
    key = jax.random.PRNGKey(0)
    rows = 1 << 21
    for n_src in (1 << 15, 1 << 18, 1 << 20, 1 << 21):
        for row_f32 in (64, 128):
            src = jax.random.normal(key, (n_src, row_f32), jnp.float32)
            idx = jax.random.randint(key, (rows,), 0, n_src, jnp.int32)
            iters = max(1, int(3e9 / (rows * row_f32 * 4)))

            def run(src, idx, iters=iters):
                def body(i, acc):
                    g = src[(idx + i) % n_src]
                    return acc + jnp.sum(g)

                return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

            t = timed(jax.jit(run), src, idx, iters=iters)
            print(
                f"A: src={n_src * row_f32 * 4 / 1e6:7.0f}MB row={row_f32 * 4:4d}B "
                f"t={t * 1e3:8.3f} ms {t / rows * 1e9:6.2f} ns/row "
                f"{rows * row_f32 * 4 / t / 1e9:6.1f} GB/s"
            )


def stage_b():
    import dataclasses

    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import render, run_march
    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.stars.grid import load_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static, params = cfg.static(), cfg.params()
    grid = load_star_grid(os.path.join(here, "stars.grid.npz"), jnp.float32)

    # Real escape directions from one march.
    pos0, vel0 = generate_ray_components(
        params.camera, static.render_width, static.render_height,
        dtype=jnp.float32,
    )
    res = jax.jit(lambda: run_march(pos0, vel0, params, static))()
    vel = np.asarray(res.vel)
    escaped = np.asarray(res.status == 1)
    print(f"escaped: {escaped.mean():.3f}")
    nvel = vel / np.linalg.norm(vel, axis=-1, keepdims=True)
    nvel_d = jnp.asarray(nvel)
    act_d = jnp.asarray(escaped)

    iters = 4

    def loop(body0):
        def f(*args):
            def body(i, acc):
                return acc + body0(i, *args)

            return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

        return jax.jit(f)

    # B1: cell ids only.
    def b1(i, nv):
        cell = grid.cell_ids(nv + 1e-9 * i)
        return jnp.sum(cell.astype(jnp.float32))

    print(f"B1 cell ids        : {timed(loop(b1), nvel_d, iters=iters) * 1e3:7.2f} ms")

    # NOTE: big tables must ride as ARGUMENTS — a closure-captured table is
    # baked into the program as a constant (and blows the tunnel's compile
    # request limit).
    flat = grid.cell_data.reshape(grid.cell_data.shape[0], -1)

    # B2: + base gather, raw sum.
    def b2(i, nv, fl):
        cell = grid.cell_ids(nv + 1e-9 * i)
        return jnp.sum(fl[cell])

    print(f"B2 + base gather   : {timed(loop(b2), nvel_d, flat, iters=iters) * 1e3:7.2f} ms")

    # B2s: gather with SORTED cell ids (locality probe).
    cell0 = np.asarray(jax.jit(grid.cell_ids)(nvel_d))
    cell_sorted = jnp.asarray(np.sort(cell0))

    def b2s(i, cs, fl):
        return jnp.sum(fl[cs + i])

    print(f"B2s sorted gather  : {timed(loop(b2s), cell_sorted, flat, iters=iters) * 1e3:7.2f} ms")

    # B3: full lookup block math, no overflow (k0 table only).
    grid_noovf = dataclasses.replace(
        grid, ovf_data=jnp.zeros((1, 1, 8), jnp.float32)
    )

    def b3(i, nv, act, g):
        out = g.lookup(nv + 1e-9 * i, jnp.float32(0.4), jnp.float32(1.5), act)
        return jnp.sum(out)

    print(f"B3 lookup no-ovf   : {timed(loop(b3), nvel_d, act_d, grid_noovf, iters=iters) * 1e3:7.2f} ms")

    # B4: full lookup with overflow.
    print(f"B4 lookup full     : {timed(loop(b3), nvel_d, act_d, grid, iters=iters) * 1e3:7.2f} ms")

    # Overflow fraction of this scene's escaped rays (host-side).
    counts = None
    base_np = np.asarray(grid.cell_data[:, 0, 7])
    has_ovf = base_np[cell0] > 0
    print(f"overflow-ray fraction: {(has_ovf & escaped).mean():.4f} "
          f"(chunk capacity is 0.25)")

    # B5: compaction machinery alone (nonzero + scatter-add), 2M rays.
    n = int(act_d.shape[0])
    m = n // 4

    def b5(i, act):
        has = act & (jnp.arange(n) % 7 > i)
        idx = jnp.nonzero(has, size=m, fill_value=n)[0]
        sub = jnp.ones((m, 3), jnp.float32) * i
        return jnp.sum(
            jnp.zeros((n, 3), jnp.float32).at[idx].add(sub, mode="drop")
        )

    print(f"B5 nonzero+scatter : {timed(loop(b5), act_d, iters=iters) * 1e3:7.2f} ms")

    # B6: nonzero alone.
    def b6(i, act):
        has = act & (jnp.arange(n) % 7 > i)
        idx = jnp.nonzero(has, size=m, fill_value=n)[0]
        return jnp.sum(idx.astype(jnp.float32))

    print(f"B6 nonzero only    : {timed(loop(b6), act_d, iters=iters) * 1e3:7.2f} ms")

    # B7: columnized candidate math (no gather): is (n, 64)-row math the
    # (n, k, 8) layout tax?
    data64 = jax.random.normal(jax.random.PRNGKey(1), (n, 64), jnp.float32)

    def b7(i, nv, d):
        vx, vy, vz = nv[:, 0] + 1e-9 * i, nv[:, 1], nv[:, 2]
        w = jnp.float32(grid.psf_width)
        r2lim = (3.0 * w) ** 2
        a = jnp.log(jnp.float32(2.0)) / 50.0
        inv2w2 = 1.0 / (2.0 * w * w)
        ar = ag = ab = jnp.zeros((n,), jnp.float32)
        for k in range(8):
            dx = d[:, k * 8 + 0] - vx
            dy = d[:, k * 8 + 1] - vy
            dz = d[:, k * 8 + 2] - vz
            d2 = dx * dx + dy * dy + dz * dz
            within = d2 <= r2lim
            logb = a * (950.0 - d[:, k * 8 + 3]) - d2 * inv2w2
            val = jnp.minimum(1.0, jnp.exp(jnp.where(within, logb, -jnp.inf)))
            val = jnp.where(within, val * 0.4, 0.0)
            ar = ar + val * (1.0 + 1.5 * d[:, k * 8 + 4])
            ag = ag + val * (1.0 + 1.5 * d[:, k * 8 + 5])
            ab = ab + val * (1.0 + 1.5 * d[:, k * 8 + 6])
        return jnp.sum(ar) + jnp.sum(ag) + jnp.sum(ab)

    print(f"B7 columnized math : {timed(loop(b7), nvel_d, data64, iters=iters) * 1e3:7.2f} ms")


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    if "b" not in sys.argv[1:]:
        stage_a()
    stage_b()

"""Stage-level isolation of the grouped star lookup on the TPU.

Run:  python -u scripts/diag_grouped.py
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 4


def timed(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append((time.perf_counter() - t0) / ITERS)
    return min(ts)


def main():
    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import run_march
    from blackstar_tpu.stars.artifact import default_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static, params = cfg.static(), cfg.params()
    grid = default_star_grid(dtype=jnp.float32)
    print(f"k0={grid.pad_k} k1={grid.ovf_data.shape[1]} "
          f"base={grid.cell_data.nbytes / 1e6:.0f}MB")

    pos0, vel0 = generate_ray_components(
        params.camera, static.render_width, static.render_height,
        dtype=jnp.float32,
    )
    res = jax.jit(lambda: run_march(pos0, vel0, params, static))()
    vel = np.asarray(res.vel)
    esc = np.asarray(res.status == 1)
    n = 1 << 17
    vel = vel[: (vel.shape[0] // n) * n]
    esc = esc[: vel.shape[0]]
    vx = jnp.asarray(vel[:, 0])
    vy = jnp.asarray(vel[:, 1])
    vz = jnp.asarray(vel[:, 2])
    act = jnp.asarray(esc)
    n_chunks = vel.shape[0] // n
    print(f"{vel.shape[0]} rays, {n_chunks} chunks of {n}")

    i_ = jnp.float32(0.4)
    s_ = jnp.float32(1.5)
    g = 8

    def frame_loop(stage_fn):
        # ITERS perturbed frames inside one dispatch; chunked inner loop.
        def f(vx, vy, vz, act, grid):
            def frame(it, accum):
                def body(c, a):
                    sl = lambda x: jax.lax.dynamic_slice_in_dim(x, c * n, n)
                    return a + stage_fn(
                        sl(vx) + 1e-9 * it, sl(vy), sl(vz), sl(act), grid
                    )

                return jax.lax.fori_loop(0, n_chunks, body, accum)

            return jax.lax.fori_loop(0, ITERS, frame, jnp.float32(0.0))

        return jax.jit(f)

    def stage(kind, cvx, cvy, cvz, cact, grid):
        dt = cvx.dtype
        G = n // g
        one = jnp.ones((), dt)
        cvx = jnp.where(cact, cvx, one)
        cvy = jnp.where(cact, cvy, one)
        cvz = jnp.where(cact, cvz, one)
        inv = jax.lax.rsqrt(cvx * cvx + cvy * cvy + cvz * cvz)
        nx0, ny0, nz0 = cvx * inv, cvy * inv, cvz * inv
        if kind == "norm":
            return jnp.sum(nx0)
        rx = nx0.reshape(G, g).T
        ry = ny0.reshape(G, g).T
        rz = nz0.reshape(G, g).T
        if kind == "transpose":
            return jnp.sum(rx) + jnp.sum(ry) + jnp.sum(rz)
        repcell = grid._cell_ids_comp(rx[g // 2], ry[g // 2], rz[g // 2])
        if kind == "ids":
            return jnp.sum(repcell.astype(jnp.float32))
        bflat = grid.cell_data.reshape(grid.cell_data.shape[0], -1)
        base = bflat[repcell]
        if kind == "gather":
            return jnp.sum(base)
        zg = jnp.zeros((g, G), dt)
        ar, ag, ab = grid._slot_math(base, 0, grid.pad_k, rx, ry, rz,
                                     i_, s_, (zg, zg, zg))
        if kind == "math":
            return jnp.sum(ar) + jnp.sum(ag) + jnp.sum(ab)
        if kind == "untranspose":
            return jnp.sum(ar.T.reshape(n)) + jnp.sum(ag) + jnp.sum(ab)
        if kind == "full":
            velc = jnp.stack([cvx, cvy, cvz], axis=-1)
            out = grid.lookup_grouped(velc, i_, s_, cact, chunk=n)
            return jnp.sum(out)
        raise ValueError(kind)

    stages = sys.argv[1:] or ["norm", "transpose", "ids", "gather", "math",
                              "untranspose", "full"]
    for kind in stages:
        t = timed(frame_loop(functools.partial(stage, kind)),
                  vx, vy, vz, act, grid)
        print(f"{kind:12s}: {t * 1e3:8.2f} ms/frame")

    # Flag counts per chunk (host-side math, device flags).
    def flags(cvx, cvy, cvz, cact, grid):
        dt = cvx.dtype
        G = n // g
        inv = jax.lax.rsqrt(cvx * cvx + cvy * cvy + cvz * cvz)
        nx0, ny0, nz0 = cvx * inv, cvy * inv, cvz * inv
        rx = nx0.reshape(G, g).T
        ry = ny0.reshape(G, g).T
        rz = nz0.reshape(G, g).T
        repcell = grid._cell_ids_comp(rx[g // 2], ry[g // 2], rz[g // 2])
        bflat = grid.cell_data.reshape(grid.cell_data.shape[0], -1)
        optr = bflat[repcell][:, 7].astype(jnp.int32)
        obf = (optr > 0).reshape(G // 4, 4).any(axis=1)
        return jnp.sum(obf)

    f = jax.jit(flags)
    caps = (n // g // 4) // 2
    for c in range(0, n_chunks, 5):
        o = f(vx[c * n:(c + 1) * n], vy[c * n:(c + 1) * n],
              vz[c * n:(c + 1) * n], act[c * n:(c + 1) * n], grid)
        print(f"chunk {c}: ovf blocks {int(o)} cap {caps}")


if __name__ == "__main__":
    main()

"""Shared boilerplate for the TPU star-stage sweep scripts.

Every sweep measures device-side steady state the same way (CLAUDE.md: the
axon tunnel floors host-side dispatch at ~27 ms, so the op loops K× inside
ONE jit with a per-iteration input perturbation and the wall time divides by
K), and every star sweep needs the same setup — the production 1080p
default-scene march to obtain real escape directions. Extracted here so a
timing-protocol fix lands once (ADVICE r3).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

K = 8  # frames per dispatch


def timeit(name, fn, *args, k=None, width=52):
    """Steady-state ms/frame of ``fn`` (a jitted K-frame loop): warm twice
    (compile + cache), then best of 3 timed scalar fetches / K."""
    k = K if k is None else k
    fn(*args).block_until_ready()
    float(jnp.sum(fn(*args)))  # force a real fetch through the tunnel
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        times.append((time.perf_counter() - t0) / k)
    t = min(times)
    print(f"{name:<{width}} {t * 1e3:8.2f} ms/frame", flush=True)
    return t


def k_loop(body, k=None):
    """jit(λ *args: Σ_{i<K} body(i, *args)) — the K-in-one-dispatch loop."""
    k = K if k is None else k

    def f(*a):
        def it(i, acc):
            return acc + body(i, *a)

        return jax.lax.fori_loop(0, k, it, jnp.float32(0.0))

    return jax.jit(f)


def march_setup(scene="default.yaml"):
    """Production escape directions for star-stage sweeps.

    Returns ``(here, static, params, vel, escaped)``: the repo root, the
    scene's static config and params, the device-resident post-march
    velocity (component planes or (N, 3), per the active march backend) and
    escape mask of the full-resolution frame.
    """
    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import run_march
    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.geodesic import ESCAPED
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", scene))
    static = cfg.static()
    params = cfg.params()
    rw, rh = static.render_width, static.render_height
    pos0, vel0 = generate_ray_components(params.camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static))(params)
    return here, static, params, res.vel, res.status == ESCAPED


def grouped_runner(static, params, vel, escaped, width=52):
    """A ``run(name, grid, **lookup_kw)`` closure timing the grouped star
    lookup on the production directions (row_pitch defaults to the frame
    width — pass row_pitch=None for the 1×G schedule)."""
    ii, ss = params.stars.intensity, params.stars.saturation
    rw = static.render_width
    vel3 = vel if not isinstance(vel, tuple) else jnp.stack(list(vel), -1)

    def run(name, grid, **kw):
        kw.setdefault("row_pitch", rw)
        return timeit(
            name,
            k_loop(lambda i, v, a, g: jnp.sum(g.lookup_grouped(
                v, intensity=ii + 1e-6 * i, saturation=ss, active=a, **kw))),
            vel3, escaped, grid, width=width,
        )

    return run

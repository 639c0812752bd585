"""Tile/unroll sweep for the Pallas march kernel on real TPU hardware.

Times the bare march (no star shading / filters) on the scenes/default.yaml
workload. Also measures with several dispatches in flight to separate kernel
time from the host-tunnel round-trip overhead.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from blackstar_tpu.camera import generate_ray_components
from blackstar_tpu.color import hsi_to_rgb
from blackstar_tpu.config import load_config
from blackstar_tpu.ops.march_pallas import march_pallas
from blackstar_tpu.render import safe_distance


def main():
    cfg = load_config("scenes/default.yaml")
    params, static = cfg.params(), cfg.static()
    pos0, vel0 = generate_ray_components(
        params.camera, static.render_width, static.render_height, dtype=jnp.float32
    )
    n = static.n_rays
    print(f"n_rays={n} max_steps={static.max_steps}")

    # Device-side steady state: K marches back-to-back inside ONE dispatch
    # (mass perturbed per iteration so XLA can't hoist the loop-invariant
    # march). Host-side per-dispatch timing on this box is floored at ~27 ms
    # by the axon tunnel even when pipelined — see CLAUDE.md.
    frames_per_call = 8

    def make(block_rows, unroll, shading):
        def one(mass):
            return march_pallas(
                pos0,
                vel0,
                step_size=static.step_size,
                max_steps=static.max_steps,
                mass=mass,
                safe_distance=safe_distance(params, jnp.float32),
                disk_on=static.disk_on,
                disk_inner=params.disk.inner,
                disk_outer=params.disk.outer,
                disk_opacity=params.disk.opacity,
                disk_rgb=hsi_to_rgb(params.disk.color_hsi.astype(jnp.float32)),
                block_rows=block_rows,
                unroll=unroll,
                disk_cond=shading == "cond",
                disk_defer=shading == "defer",
            )

        def f(mass):
            def body(i, acc):
                res = one(mass + 1e-7 * i)
                return acc + jnp.sum(res.acc_rgba) + jnp.sum(res.vel)

            return jax.lax.fori_loop(0, frames_per_call, body, jnp.float32(0.0))

        return jax.jit(f)

    import itertools
    for block_rows, unroll, shading in itertools.product(
        (16, 24, 32, 64), (8, 16, 32), ("defer", "inline")
    ):
            f = make(block_rows, unroll, shading)
            try:
                s = float(f(params.mass))
            except Exception as e:
                print(f"rows={block_rows:4d} unroll={unroll}  FAILED: {str(e)[:80]}")
                continue
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                outs = [f(params.mass) for _ in range(2)]
                for o in outs:
                    float(o)
                ts.append((time.perf_counter() - t0) / (2 * frames_per_call))
            best = min(ts)
            print(
                f"rows={block_rows:4d} unroll={unroll} {shading:6s}  "
                f"{best*1e3:7.1f} ms  {n/best/1e6:6.2f} Mrays/s  (checksum {s:.1f})"
            )


if __name__ == "__main__":
    main()

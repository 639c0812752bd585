"""Measure the actual work distribution of the march on the default scene:
per-ray termination steps (XLA march with a step-recording carry) vs the
per-tile maxima the Pallas schedule pays. Prints the headroom compaction or
smarter tiling could still recover."""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from blackstar_tpu.camera import generate_rays
from blackstar_tpu.config import load_config
from blackstar_tpu.geodesic import ACTIVE, rk4_step, _rowdot
from blackstar_tpu.render import safe_distance


def main():
    cfg = load_config("scenes/default.yaml")
    params, static = cfg.params(), cfg.static()
    pos0, vel0 = generate_rays(
        params.camera, static.render_width, static.render_height, dtype=jnp.float32
    )
    n = static.n_rays
    safe = safe_distance(params, jnp.float32)
    h = jnp.float32(static.step_size)
    mass = params.mass.astype(jnp.float32)

    @jax.jit
    def term_steps(pos0, vel0):
        pos = jnp.broadcast_to(pos0, vel0.shape)
        cr = jnp.cross(pos, vel0)
        h2 = _rowdot(cr, cr)

        def body(carry):
            i, pos, vel, status, steps = carry
            np_, nv = rk4_step(pos, vel, h, h2, mass)
            r2 = _rowdot(pos, pos)
            active = status == ACTIVE
            hit_h = active & (r2 < mass * mass)
            hit_e = active & ~(r2 < mass * mass) & (r2 > safe)
            cont = active & ~hit_h & ~hit_e
            status = jnp.where(hit_h, 2, jnp.where(hit_e, 1, status))
            steps = jnp.where(hit_h | hit_e, i, steps)
            pos = jnp.where(cont[:, None], np_, pos)
            vel = jnp.where(cont[:, None], nv, vel)
            return i + 1, pos, vel, status, steps

        def cond(c):
            return (c[0] < static.max_steps) & jnp.any(c[3] == ACTIVE)

        i, _, _, status, steps = jax.lax.while_loop(
            cond,
            body,
            (
                jnp.int32(0),
                pos,
                vel0,
                jnp.zeros((n,), jnp.int32),
                jnp.full((n,), static.max_steps, jnp.int32),
            ),
        )
        return status, steps

    status, steps = term_steps(pos0, vel0)
    steps = np.asarray(steps)
    status = np.asarray(status)
    print(f"n={n} cap={static.max_steps}")
    print(f"status: escaped={np.mean(status==1):.3f} horizon={np.mean(status==2):.3f} "
          f"truncated={np.mean(status==0):.4f}")
    print(f"per-ray steps: mean={steps.mean():.0f} p50={np.percentile(steps,50):.0f} "
          f"p90={np.percentile(steps,90):.0f} p99={np.percentile(steps,99):.0f} max={steps.max()}")
    ideal = steps.sum()
    print(f"ideal ray-steps (perfect per-ray exit): {ideal/1e6:.0f} M")

    for tile in (4096, 8192, 16384, 32768):
        pad = -(-n // tile) * tile
        s = np.pad(steps, (0, pad - n))
        tile_max = s.reshape(-1, tile).max(axis=1)
        total = (tile_max * tile).sum()
        print(f"row-band tiles of {tile:6d}: {total/1e6:7.0f} M ray-steps "
              f"({total/ideal:.2f}x ideal)")


if __name__ == "__main__":
    main()

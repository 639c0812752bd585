"""Mesh-sharded rendering: ray-tile data parallelism via ``shard_map``.

TPU-native replacement for the reference's multicore pixel fan-out
(``makeArrayR U Par``, Raytracer.hs:66). Each device synthesises its own rays
from the replicated camera parameters (no scatter), marches them to
termination with an *independent* early-exit ``while_loop`` (no per-step
collective), shades stars from the replicated star grid, and the image shards
are gathered only at the end.

Load balance: rays near the photon ring integrate for thousands of steps
while sky rays escape in tens, and difficulty is spatially clustered. Pixels
are therefore dealt **round-robin** (device d takes flat pixels d, d+D,
d+2D, …), interleaving hard and easy rays across the mesh — the moral
equivalent of massiv's per-pixel work stealing, chosen statically.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from blackstar_tpu.camera import generate_rays_at
from blackstar_tpu.config import SceneParams, StaticConfig
from blackstar_tpu.ops.filters import supersample
from blackstar_tpu.parallel.mesh import RAY_AXIS, make_mesh
from blackstar_tpu.render import run_march, shade


def render_sharded(
    params: SceneParams,
    static: StaticConfig,
    star_grid=None,
    *,
    mesh: Optional[Mesh] = None,
    axis_name: str = RAY_AXIS,
    differentiable: bool = False,
    use_pallas="auto",
):
    """Render the linear-RGB image (H, W, 3) sharded over ``mesh``.

    Bit-compatible with :func:`blackstar_tpu.render.render` (same math per
    ray; only the schedule differs). Differentiable w.r.t. ``params`` — the
    backward pass psums the parameter gradients across the mesh
    automatically (shard_map transpose of the replicated-input broadcast).
    """
    if mesh is None:
        mesh = make_mesh(axis_name=axis_name)
    n_dev = mesh.shape[axis_name]

    dt = static.jdtype
    rw, rh = static.render_width, static.render_height
    n_rays = rw * rh
    # Deal round-robin at the star lookup's group granularity (STAR_GROUP
    # consecutive pixels): device d owns groups d, d+D, d+2D, … — the same
    # static hard/easy interleave as a per-pixel deal, but each shard keeps
    # whole pixel-adjacent groups so the grouped celestial-sphere lookup
    # stays effective inside every shard.
    from blackstar_tpu.render import STAR_GROUP as GROUP

    n_groups = -(-n_rays // GROUP)
    per_g = -(-n_groups // n_dev)  # groups per device (ceil)
    per = per_g * GROUP

    def shard_fn(params, star_grid):
        d = jax.lax.axis_index(axis_name)
        gid = d + n_dev * jnp.arange(per_g, dtype=jnp.int32)
        pix = (gid[:, None] * GROUP + jnp.arange(GROUP, dtype=jnp.int32)
               ).reshape(-1)
        # Ragged tail: out-of-range lanes re-march the last pixel
        # (clamped; their results are discarded below).
        pix_c = jnp.minimum(pix, n_rays - 1)
        pos0, vel0 = generate_rays_at(params.camera, pix_c, rw, rh, dtype=dt)
        res = run_march(
            pos0,
            vel0,
            params,
            static,
            differentiable=differentiable,
            use_pallas=use_pallas,
        )
        return shade(res, params, star_grid, dt, static,
                     differentiable=differentiable)  # (per, 3)

    out = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(axis_name),
        check_vma=False,
    )(params, star_grid)

    # out[(d, k)] = group d + k·D; transpose the deal back to row-major.
    rgb = (
        out.reshape(n_dev, per_g, GROUP, 3)
        .transpose(1, 0, 2, 3)
        .reshape(n_dev * per, 3)
    )
    img = rgb[:n_rays].reshape(rh, rw, 3)

    if static.supersampling:
        img = supersample(img)
    return img

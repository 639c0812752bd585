"""Vectorized pinhole camera / sight-ray generation.

Reference semantics: ``generateRay`` (Raytracer.hs:40-51) builds the 3×3
rotation of `linear`'s ``lookAt`` view matrix, transposes it, and applies it
to the direction ``(fov·(x/w − 0.5), fov·(0.5 − y/h)·h/w, −1)``, normalised.
Pixel coordinates are the raw integer indices (no half-pixel centring), which
we reproduce exactly.

TPU-first shape: one fused batched computation for the whole pixel grid — a
(H·W, 3) direction tensor from two broadcasted iotas and a single 3×3
rotation, instead of a per-pixel camera matrix like the reference.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from blackstar_tpu.config import CameraParams


def _normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / jnp.linalg.norm(v, axis=axis, keepdims=True)


def _film_coords(fov, xs, ys, width, height, dt):
    """Film-plane offsets for pixel coordinates (Raytracer.hs:48-50):
    cx = fov·(x/w − 0.5), cy = fov·(0.5 − y/h)·h/w. Shared by every ray
    generator so the pixel-coordinate convention lives in one place."""
    w = jnp.asarray(width, dt)
    h = jnp.asarray(height, dt)
    cx = fov * (xs / w - 0.5)
    cy = fov * (0.5 - ys / h) * h / w
    return cx, cy


def look_at_rotation(position: jnp.ndarray, look_at: jnp.ndarray, up: jnp.ndarray) -> jnp.ndarray:
    """Rows (xa, ya, −za) of the `linear` ``lookAt`` matrix (Raytracer.hs:46).

    za = normalize(center − eye); xa = normalize(za × up); ya = xa × za.
    Returns the 3×3 rotation whose rows are (xa, ya, −za).
    """
    za = _normalize(look_at - position)
    xa = _normalize(jnp.cross(za, up))
    ya = jnp.cross(xa, za)
    return jnp.stack([xa, ya, -za], axis=0)


def generate_rays(
    cam: CameraParams, width: int, height: int, dtype=jnp.float32
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Initial photon states for every pixel.

    Returns ``(pos, vel)`` with shapes ((3,), (H·W, 3)): the shared camera
    position and unit ray directions in row-major (y, x) pixel order —
    matching the reference's per-pixel ``generateRay`` (Raytracer.hs:40-51)
    evaluated at integer pixel coordinates.
    """
    dt = jnp.dtype(dtype)
    pos = cam.position.astype(dt)
    fov = cam.fov.astype(dt)
    rot = look_at_rotation(cam.position, cam.look_at, cam.up).astype(dt)

    xs = jnp.arange(width, dtype=dt)
    ys = jnp.arange(height, dtype=dt)
    cx, cy = _film_coords(fov, xs, ys, width, height, dt)  # (W,), (H,)

    # vel = normalize(transpose(rot) @ (cx, cy, -1)) = cx·xa + cy·ya + za
    xa, ya, nza = rot[0], rot[1], rot[2]  # nza = -za
    dirs = (
        cx[None, :, None] * xa[None, None, :]
        + cy[:, None, None] * ya[None, None, :]
        - nza[None, None, :]
    )  # (H, W, 3)
    vel = _normalize(dirs).reshape(height * width, 3)
    return pos, vel


def generate_ray_components(
    cam: CameraParams, width: int, height: int, dtype=jnp.float32
):
    """Like :func:`generate_rays` but returns ``(pos, (vx, vy, vz))`` with
    flat (H·W,) per-component direction arrays.

    The Pallas march keeps ray state as separate component planes; producing
    them directly avoids materialising an (N, 3) array and the three strided
    column extracts when feeding the kernel.
    """
    dt = jnp.dtype(dtype)
    pos = cam.position.astype(dt)
    fov = cam.fov.astype(dt)
    rot = look_at_rotation(cam.position, cam.look_at, cam.up).astype(dt)

    xs = jnp.arange(width, dtype=dt)
    ys = jnp.arange(height, dtype=dt)
    cx, cy = _film_coords(fov, xs, ys, width, height, dt)
    cx = cx[None, :]  # (1, W)
    cy = cy[:, None]  # (H, 1)

    xa, ya, nza = rot[0], rot[1], rot[2]
    dx = cx * xa[0] + cy * ya[0] - nza[0]
    dy = cx * xa[1] + cy * ya[1] - nza[1]
    dz = cx * xa[2] + cy * ya[2] - nza[2]
    inv = jax.lax.rsqrt(dx * dx + dy * dy + dz * dz)
    n = height * width
    return pos, ((dx * inv).reshape(n), (dy * inv).reshape(n), (dz * inv).reshape(n))


def generate_rays_at(
    cam: CameraParams,
    pixel_ids: jnp.ndarray,
    width: int,
    height: int,
    dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Ray directions for an arbitrary subset of flat row-major pixel ids.

    Same per-pixel math as :func:`generate_rays`; used by the sharded
    renderer so each mesh shard synthesises exactly its own rays from the
    (replicated) camera parameters with no cross-device data movement.
    """
    dt = jnp.dtype(dtype)
    pos = cam.position.astype(dt)
    fov = cam.fov.astype(dt)
    rot = look_at_rotation(cam.position, cam.look_at, cam.up).astype(dt)

    ys = (pixel_ids // width).astype(dt)
    xs = (pixel_ids % width).astype(dt)
    cx, cy = _film_coords(fov, xs, ys, width, height, dt)

    xa, ya, nza = rot[0], rot[1], rot[2]
    dirs = cx[:, None] * xa[None, :] + cy[:, None] * ya[None, :] - nza[None, :]
    return pos, _normalize(dirs)

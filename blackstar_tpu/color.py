"""Colour-space conversions and compositing primitives.

Matches the reference's ``Graphics.ColorSpace`` semantics (the hip/massiv-io
HSI model used by ``toPixelRGB`` in StarMap.hs:114 and Raytracer.hs:64) and
the front-to-back "over" blend of Raytracer.hs:34-37. Everything is written
for batched JAX arrays with a trailing channel axis so it vectorises on the
VPU and stays differentiable.
"""

from __future__ import annotations

import jax.numpy as jnp

_TWO_PI = 2.0 * jnp.pi


def hsi_to_rgb(hsi: jnp.ndarray) -> jnp.ndarray:
    """HSI -> RGB, hue in [0,1) mapping to [0, 2π).

    Sector formula (hue thirds), with per-sector components::

        is_   = i*s
        second = i - is_
        first(a) = i + is_ * cos(a) / cos(π/3 - a)   for a = hue angle within sector
        third  = 2i + is_ - first

    which preserves r+g+b = 3i. Mirrors the reference colour library's
    ``toPixelRGB`` for HSI pixels (used at StarMap.hs:114, Raytracer.hs:64).
    Saturation/intensity outside [0,1] are passed through un-clamped, like the
    reference (e.g. scenes/default.yaml uses intensity 1.05).
    """
    hsi = jnp.asarray(hsi)
    h = hsi[..., 0]
    s = hsi[..., 1]
    i = hsi[..., 2]

    hp = h * _TWO_PI
    sector = jnp.clip(jnp.floor(hp / (_TWO_PI / 3.0)), 0, 2).astype(jnp.int32)
    a = hp - sector.astype(hp.dtype) * (_TWO_PI / 3.0)

    is_ = i * s
    second = i - is_
    # cos(π/3 - a) is bounded away from 0 for a in [0, 2π/3): min cos(π/3)=0.5
    first = i + is_ * jnp.cos(a) / jnp.cos(jnp.pi / 3.0 - a)
    third = 2.0 * i + is_ - first

    r = jnp.where(sector == 0, first, jnp.where(sector == 1, second, third))
    g = jnp.where(sector == 0, third, jnp.where(sector == 1, first, second))
    b = jnp.where(sector == 0, second, jnp.where(sector == 1, third, first))
    return jnp.stack([r, g, b], axis=-1)


def blend_over(top: jnp.ndarray, bottom: jnp.ndarray) -> jnp.ndarray:
    """Front-to-back "over" compositing of RGBA pixels.

    ``out = top + bottom * (1 - top.alpha)`` per channel *including alpha*
    (Raytracer.hs:34-37, where the accumulated colour is the top layer).
    """
    ta = top[..., 3:4]
    return top + bottom * (1.0 - ta)


def add_alpha(rgb: jnp.ndarray, alpha) -> jnp.ndarray:
    """RGB -> RGBA with the given alpha (broadcastable scalar or array)."""
    alpha = jnp.broadcast_to(jnp.asarray(alpha, dtype=rgb.dtype), rgb.shape[:-1])
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)

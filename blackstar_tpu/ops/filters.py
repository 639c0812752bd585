"""Image post-processing: separable box blur, bloom, supersampling.

Reference semantics (``/root/reference/src/ImageFilters.hs``):

* ``boxBlur r passes``: per pass, a horizontal then a vertical sliding-window
  box filter of width ``2r+1`` normalised by ``1/(2r+1)``, with out-of-bounds
  pixels reading as black (zero padding) — ImageFilters.hs:28-78.
* ``bloom strength divider``: 3-pass box blur with ``r = width // divider``,
  then ``out = img + strength·blurred`` — ImageFilters.hs:80-86.
* ``supersample``: 2×2 box average from a double-resolution render —
  ImageFilters.hs:88-97.

TPU-first: the reference's O(1)-per-pixel mutable running sum becomes an
exclusive prefix sum (``cumsum``) + two *static* shifted slices per axis —
identical output, fully fused by XLA, no serial dependence across rows, and
no gathers (a TPU gather costs ~20 ns/row regardless of width).  All ops are
differentiable (bloom strength is a scene parameter in the param pytree).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _box_blur_axis(img: jnp.ndarray, r: int, axis: int) -> jnp.ndarray:
    """Zero-padded 1-D box filter of width ``2r+1`` along ``axis``."""
    n = img.shape[axis]
    dt = img.dtype
    # Exclusive cumsum: c[k] = sum(img[:k]); windowed sum over
    # [x-r, x+r] ∩ [0,n) = c[clip(x+r+1)] - c[clip(x-r)].
    c = jnp.cumsum(img, axis=axis, dtype=dt)
    zero_shape = list(img.shape)
    zero_shape[axis] = 1
    c = jnp.concatenate([jnp.zeros(zero_shape, dt), c], axis=axis)
    # The clipped windowed difference as *static* pad+slice instead of two
    # jnp.take gathers (TPU gathers pay a per-row cost regardless of width;
    # 4.8 -> 3.6 ms for the 3-pass 1080p blur). With
    # cp[i] = c[clip(i-r, 0, n)] (edge padding), the window ends land at
    # static offsets: hi[k] = cp[k+2r+1], lo[k] = cp[k].
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    cp = jnp.pad(c, pad, mode="edge")
    hi = jax.lax.slice_in_dim(cp, 2 * r + 1, 2 * r + 1 + n, axis=axis)
    lo = jax.lax.slice_in_dim(cp, 0, n, axis=axis)
    win = hi - lo
    return win * (1.0 / (2 * r + 1))


def box_blur(img: jnp.ndarray, r: int, passes: int = 3) -> jnp.ndarray:
    """Separable multi-pass box blur of an (H, W, C) image.

    Each pass blurs horizontally then vertically (ImageFilters.hs:70-75);
    3 passes approximate a Gaussian.
    """
    if r <= 0:
        return img
    for _ in range(passes):
        img = _box_blur_axis(img, r, axis=1)  # horizontal
        img = _box_blur_axis(img, r, axis=0)  # vertical
    return img


def bloom(img: jnp.ndarray, strength, divider: int) -> jnp.ndarray:
    """``img + strength · boxBlur(width//divider, 3 passes)`` (ImageFilters.hs:80-86)."""
    w = img.shape[1]
    blurred = box_blur(img, w // divider, passes=3)
    return img + jnp.asarray(strength, img.dtype) * blurred


def supersample(img: jnp.ndarray) -> jnp.ndarray:
    """2×2 box-average downsample of an (2H, 2W, C) image (ImageFilters.hs:88-97).

    ``reduce_window`` instead of reshape+mean: ~8× less device time on TPU
    (the reshape forces a sublane-splitting relayout of the whole frame).
    """
    s = jax.lax.reduce_window(img, 0.0, jax.lax.add, (2, 2, 1), (2, 2, 1), "VALID")
    return 0.25 * s

"""sRGB encoding and PNG output.

Reference semantics: per-channel sRGB gamma
``x < 0.0031308 ? 12.92·x : 1.055·x^(1/2.4) − 0.055`` followed by a clamp to
[0,1] and round-half-even quantisation to uint8 (Raytracer.hs:23-32 and the
colour library's ``toWord8``).
"""

from __future__ import annotations

import zlib
import struct

import jax.numpy as jnp
import numpy as np


def srgb_encode(linear: jnp.ndarray) -> jnp.ndarray:
    """Linear -> sRGB gamma (Raytracer.hs:23-27). Input may exceed [0,1]."""
    x = jnp.asarray(linear)
    lo = 12.92 * x
    # Guard pow against negatives (only the low branch is selected there).
    hi = 1.055 * jnp.power(jnp.maximum(x, 0.0031308), 1.0 / 2.4) - 0.055
    return jnp.where(x < 0.0031308, lo, hi)


def srgb_decode(srgb: jnp.ndarray) -> jnp.ndarray:
    """sRGB gamma -> linear; the exact inverse of :func:`srgb_encode`
    (the encode switch at linear 0.0031308 maps to sRGB 0.04045)."""
    x = jnp.asarray(srgb)
    return jnp.where(x <= 0.04045, x / 12.92, jnp.power((x + 0.055) / 1.055, 2.4))


def to_uint8(img: np.ndarray) -> np.ndarray:
    """Clamp to [0,1] and quantise with round-half-even (`toWord8`)."""
    arr = np.asarray(img, dtype=np.float64)
    return np.rint(np.clip(arr, 0.0, 1.0) * 255.0).astype(np.uint8)


def encode_rgb8(linear: jnp.ndarray) -> jnp.ndarray:
    """Linear RGB -> sRGB uint8, jittable (runs on device).

    Device-side encoding quarters the bytes that cross the host boundary —
    on a tunneled TPU the frame fetch otherwise dominates animation
    throughput. Same gamma + round-half-even (``jnp.rint``) semantics as the
    host encoders; paths agree to 1 uint8 ulp (f32 vs f64 pow rounding).
    """
    srgb = srgb_encode(linear)
    return jnp.rint(jnp.clip(srgb, 0.0, 1.0) * 255.0).astype(jnp.uint8)


def _png_bytes(rgb8: np.ndarray) -> bytes:
    """Minimal dependency-free PNG encoder (8-bit RGB, filter 0)."""
    h, w, _ = rgb8.shape

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), rgb8.reshape(h, w * 3)], axis=1
    ).tobytes()
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def write_png(img, path: str, *, gamma: bool = True, prefer_native: bool = True) -> None:
    """Write a linear (H, W, 3) float image as an sRGB PNG (Raytracer.hs:29-32).

    Uses the native runtime (zlib + multithreaded sRGB encode, ~30× faster)
    when built; falls back to PIL / pure-python. The paths agree to within
    1 ulp of uint8 quantisation (f32 vs f64 pow rounding).
    """
    arr = np.asarray(img)
    if arr.dtype == np.uint8:
        # Already sRGB-encoded (e.g. on device via encode_rgb8).
        if prefer_native and arr.ndim == 3 and arr.shape[2] == 3:
            from blackstar_tpu import native

            if native.available() and native.write_png_rgb8(arr, path):
                return
        rgb8 = arr
        try:
            from PIL import Image

            Image.fromarray(rgb8, mode="RGB").save(path, format="PNG")
        except ImportError:
            with open(path, "wb") as f:
                f.write(_png_bytes(rgb8))
        return
    if gamma and prefer_native and arr.ndim == 3 and arr.shape[2] == 3:
        from blackstar_tpu import native

        if native.available() and native.write_png_linear(arr, path):
            return
    if gamma:
        # numpy implementation: float64 regardless of jax_enable_x64
        arr = np.where(
            arr < 0.0031308,
            12.92 * arr,
            1.055 * np.power(np.maximum(arr, 0.0031308), 1.0 / 2.4) - 0.055,
        )
    rgb8 = to_uint8(arr)
    try:
        from PIL import Image

        Image.fromarray(rgb8, mode="RGB").save(path, format="PNG")
    except ImportError:
        with open(path, "wb") as f:
            f.write(_png_bytes(rgb8))


def read_png(path: str) -> np.ndarray:
    """Read a PNG into a uint8 (H, W, 3) array (for tests/tools)."""
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"))

"""ctypes bindings for the native runtime (``native/blackstar_native.cpp``).

The native library provides the production IO path: multithreaded sRGB
encoding, zlib PNG writing, and an asynchronous frame-writer pool that keeps
the TPU busy during batch/animation renders. Everything degrades gracefully —
if the shared library hasn't been built (``make -C native``), callers fall
back to the pure-Python implementations in :mod:`blackstar_tpu.imageio`.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import numpy as np

_LIB_NAME = "libblackstar_native.so"
_lib = None
_lib_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")


def build(quiet: bool = True) -> bool:
    """Try to build the native library. Returns True on success."""
    try:
        res = subprocess.run(
            ["make", "-C", _native_dir()],
            capture_output=quiet,
            timeout=120,
        )
        return res.returncode == 0
    except Exception:
        return False


def load(auto_build: bool = True):
    """Load (building if necessary) the native library, or None."""
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    path = os.path.join(_native_dir(), _LIB_NAME)
    if not os.path.exists(path) and auto_build:
        build()
    if not os.path.exists(path):
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    lib.bs_srgb_encode.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    lib.bs_write_png_rgb8.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.bs_write_png_rgb8.restype = ctypes.c_int
    lib.bs_write_png_linear.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.bs_write_png_linear.restype = ctypes.c_int
    lib.bs_writer_create.argtypes = [ctypes.c_int]
    lib.bs_writer_create.restype = ctypes.c_void_p
    lib.bs_writer_submit.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.bs_writer_submit_rgb8.argtypes = [
        ctypes.c_void_p,
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
    ]
    lib.bs_writer_wait.argtypes = [ctypes.c_void_p]
    lib.bs_writer_wait.restype = ctypes.c_int
    lib.bs_writer_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def available() -> bool:
    return load() is not None


def _as_f32_c(img: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(img, dtype=np.float32)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) image, got {arr.shape}")
    return arr


def write_png_rgb8(rgb8: np.ndarray, path: str, *, level: int = 6) -> bool:
    """Native sRGB-uint8 -> PNG write. Returns False if unavailable."""
    lib = load()
    if lib is None:
        return False
    arr = np.ascontiguousarray(rgb8, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (H, W, 3) uint8 image, got {arr.shape}")
    h, w, _ = arr.shape
    rc = lib.bs_write_png_rgb8(
        path.encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        w,
        h,
        level,
    )
    if rc != 0:
        raise IOError(f"native PNG write failed (rc={rc}) for {path}")
    return True


def write_png_linear(img: np.ndarray, path: str, *, level: int = 6, n_threads: int = 4) -> bool:
    """Native linear-RGB -> sRGB PNG write. Returns False if unavailable."""
    lib = load()
    if lib is None:
        return False
    arr = _as_f32_c(img)
    h, w, _ = arr.shape
    rc = lib.bs_write_png_linear(
        path.encode(),
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        w,
        h,
        level,
        n_threads,
    )
    if rc != 0:
        raise IOError(f"native PNG write failed (rc={rc}) for {path}")
    return True


class AsyncFrameWriter:
    """Asynchronous PNG writer pool (the batch/animation IO path).

    Frames are deep-copied at submit, so the caller may immediately reuse or
    free the buffer; ``wait()`` blocks until everything is on disk.
    """

    def __init__(self, n_threads: int = 4):
        lib = load()
        if lib is None:
            raise RuntimeError(
                "native library unavailable — build it with `make -C native`"
            )
        self._lib = lib
        self._handle = lib.bs_writer_create(n_threads)
        if self._handle is None:
            # Fail fast: a NULL handle would otherwise surface on first
            # submit() as a misleading "writer closed".
            raise RuntimeError("bs_writer_create failed (allocation or "
                               "thread start)")

    def _check_open(self) -> None:
        # A None handle would null-deref inside the C ABI — fail in Python.
        if self._handle is None:
            raise RuntimeError("writer closed")

    def submit(self, path: str, img: np.ndarray, *, level: int = 6) -> None:
        self._check_open()
        if np.asarray(img).dtype == np.uint8:
            return self.submit_rgb8(path, img, level=level)
        arr = _as_f32_c(img)
        h, w, _ = arr.shape
        self._lib.bs_writer_submit(
            self._handle,
            path.encode(),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            w,
            h,
            level,
        )

    def submit_rgb8(self, path: str, rgb8: np.ndarray, *, level: int = 6) -> None:
        """Submit a frame already quantised to sRGB uint8 (device-encoded)."""
        self._check_open()
        arr = np.ascontiguousarray(rgb8, dtype=np.uint8)
        if arr.ndim != 3 or arr.shape[2] != 3:
            raise ValueError(f"expected (H, W, 3) uint8 image, got {arr.shape}")
        h, w, _ = arr.shape
        self._lib.bs_writer_submit_rgb8(
            self._handle,
            path.encode(),
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            w,
            h,
            level,
        )

    def wait(self) -> int:
        """Block until all frames are written; returns the error count."""
        self._check_open()
        return self._lib.bs_writer_wait(self._handle)

    def close(self) -> None:
        if self._handle:
            self._lib.bs_writer_wait(self._handle)
            self._lib.bs_writer_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

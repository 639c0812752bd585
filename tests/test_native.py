"""Native runtime (C++ PNG writer / async frame pool) vs the Python path."""

import os

import numpy as np
import pytest

from blackstar_tpu import native
from blackstar_tpu.imageio import read_png, write_png

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no g++/zlib?)"
)


@pytest.fixture
def img():
    rng = np.random.default_rng(7)
    base = rng.random((37, 53, 3), dtype=np.float32)
    # Cover both gamma branches and out-of-range values.
    base[:5] *= 0.002
    base[5:8] += 0.5
    return base


def test_native_matches_python_png(img, tmp_path):
    a, b = tmp_path / "native.png", tmp_path / "python.png"
    assert native.write_png_linear(img, str(a))
    write_png(img, str(b), prefer_native=False)
    pa, pb = read_png(str(a)).astype(int), read_png(str(b)).astype(int)
    # f32 (native) vs f64 (numpy) pow rounding may flip the odd quantised
    # value by 1; anything more is a bug.
    assert np.abs(pa - pb).max() <= 1
    assert (pa != pb).mean() < 1e-3


def test_write_png_prefers_native(img, tmp_path):
    p = tmp_path / "out.png"
    write_png(img, str(p))
    assert read_png(str(p)).shape == (37, 53, 3)


def test_async_writer_round_trip(img, tmp_path):
    paths = [str(tmp_path / f"f{i}.png") for i in range(6)]
    with native.AsyncFrameWriter(3) as w:
        for p in paths:
            w.submit(p, img)
        assert w.wait() == 0
    ref = tmp_path / "ref.png"
    assert native.write_png_linear(img, str(ref))
    want = read_png(str(ref))
    for p in paths:
        assert os.path.exists(p)
        np.testing.assert_array_equal(read_png(p), want)


def test_async_writer_reports_errors(img, tmp_path):
    with native.AsyncFrameWriter(1) as w:
        w.submit(str(tmp_path / "no_such_dir" / "x.png"), img)
        assert w.wait() == 1


def test_srgb_encode_matches_numpy(img):
    import ctypes

    lib = native.load()
    arr = np.ascontiguousarray(img, dtype=np.float32)
    out = np.empty(arr.size, np.uint8)
    lib.bs_srgb_encode(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        arr.size,
        2,
    )
    flat = arr.reshape(-1)
    want = np.where(
        flat < 0.0031308,
        12.92 * flat,
        1.055 * np.power(np.maximum(flat, 0.0031308), 1 / 2.4) - 0.055,
    )
    want = np.rint(np.clip(want, 0, 1) * 255).astype(np.uint8)
    diff = np.abs(out.astype(int) - want.astype(int))
    assert diff.max() <= 1 and (diff > 0).mean() < 1e-3

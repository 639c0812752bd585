"""sRGB encode / quantisation / PNG writer tests."""

import numpy as np
import jax.numpy as jnp

from blackstar_tpu.imageio import read_png, srgb_encode, to_uint8, write_png
from tests import oracle


def test_srgb_matches_oracle():
    x = np.linspace(0.0, 1.4, 300)
    got = np.asarray(srgb_encode(jnp.asarray(x)))
    want = oracle.srgb(x)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_srgb_linear_segment():
    np.testing.assert_allclose(np.asarray(srgb_encode(jnp.asarray(0.001))), 0.01292, atol=1e-12)


def test_to_uint8_round_half_even():
    # 0.5/255 boundary uses banker's rounding like Haskell `round`.
    assert to_uint8(np.array(0.5 / 255))[()] == 0
    assert to_uint8(np.array(1.5 / 255))[()] == 2
    assert to_uint8(np.array(-3.0))[()] == 0
    assert to_uint8(np.array(7.0))[()] == 255


def test_png_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (12, 17, 3))
    path = str(tmp_path / "out.png")
    write_png(img, path)
    back = read_png(path)
    expected = to_uint8(oracle.srgb(img))
    np.testing.assert_array_equal(back, expected)


def test_pure_python_png_encoder(tmp_path):
    from blackstar_tpu.imageio import _png_bytes

    rng = np.random.default_rng(1)
    rgb8 = rng.integers(0, 256, (9, 5, 3), dtype=np.uint8)
    path = str(tmp_path / "pure.png")
    with open(path, "wb") as f:
        f.write(_png_bytes(rgb8))
    np.testing.assert_array_equal(read_png(path), rgb8)

"""Colour conversion and compositing tests vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp

from blackstar_tpu.color import add_alpha, blend_over, hsi_to_rgb
from tests import oracle


def test_hsi_to_rgb_matches_oracle():
    rng = np.random.default_rng(0)
    h = rng.uniform(0, 1, 200)
    s = rng.uniform(0, 1.6, 200)
    i = rng.uniform(0, 1.2, 200)
    got = np.asarray(hsi_to_rgb(jnp.stack([h, s, i], axis=-1)))
    want = np.stack([oracle.hsi_to_rgb(*t) for t in zip(h, s, i)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_hsi_preserves_intensity_sum():
    """r+g+b == 3i for the HSI model."""
    rng = np.random.default_rng(1)
    hsi = rng.uniform(0, 1, (100, 3))
    rgb = np.asarray(hsi_to_rgb(jnp.asarray(hsi)))
    np.testing.assert_allclose(rgb.sum(-1), 3 * hsi[:, 2], atol=1e-12)


def test_hsi_zero_saturation_is_gray():
    rgb = np.asarray(hsi_to_rgb(jnp.array([0.37, 0.0, 0.6])))
    np.testing.assert_allclose(rgb, 0.6, atol=1e-12)


def test_hsi_reference_star_colors():
    """The seven Morgan-Keenan (hue, sat) pairs stay finite/sane at val=1."""
    from blackstar_tpu.stars.catalog import SPECTRAL_COLORS

    for ch, (h, s) in SPECTRAL_COLORS.items():
        rgb = np.asarray(hsi_to_rgb(jnp.array([h, s, 1.0])))
        assert np.all(np.isfinite(rgb)), ch
        np.testing.assert_allclose(rgb.sum(), 3.0, atol=1e-12)


def test_blend_over_matches_oracle():
    rng = np.random.default_rng(2)
    top = rng.uniform(0, 1, (50, 4))
    bottom = rng.uniform(0, 1, (50, 4))
    got = np.asarray(blend_over(jnp.asarray(top), jnp.asarray(bottom)))
    want = np.stack([oracle.blend(t, b) for t, b in zip(top, bottom)])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_blend_opaque_top_hides_bottom():
    top = jnp.array([[0.2, 0.3, 0.4, 1.0]])
    bottom = jnp.array([[9.0, 9.0, 9.0, 1.0]])
    np.testing.assert_allclose(np.asarray(blend_over(top, bottom)), np.asarray(top))


def test_add_alpha():
    rgb = jnp.array([[0.1, 0.2, 0.3]])
    rgba = np.asarray(add_alpha(rgb, 0.5))
    np.testing.assert_allclose(rgba, [[0.1, 0.2, 0.3, 0.5]])

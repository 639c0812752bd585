"""The precomputed star colour basis must reproduce hsi_to_rgb exactly:
rgb(h, s, i) == i * (1 + H) with H = rgb_basis(h, s)."""

import numpy as np

from blackstar_tpu.color import hsi_to_rgb
from blackstar_tpu.stars.grid import rgb_basis


def test_basis_matches_hsi_to_rgb():
    rng = np.random.default_rng(3)
    h = rng.random(500)
    s = rng.random(500) * 1.5  # saturation beyond 1 is passed through
    i = rng.random(500) * 1.2
    want = np.asarray(hsi_to_rgb(np.stack([h, s, i], axis=-1).astype(np.float64)))
    got = i[:, None] * (1.0 + rgb_basis(h, s))
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_basis_spectral_classes():
    """All seven Morgan-Keenan classes and the default (0,0) grey."""
    from blackstar_tpu.stars.catalog import SPECTRAL_COLORS

    hs = np.array([v[0] for v in SPECTRAL_COLORS.values()] + [0.0])
    ss = np.array([v[1] for v in SPECTRAL_COLORS.values()] + [0.0])
    want = np.asarray(
        hsi_to_rgb(np.stack([hs, ss, np.ones_like(hs)], axis=-1).astype(np.float64))
    )
    got = 1.0 + rgb_basis(hs, ss)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)
    # Grey default: basis is zero.
    np.testing.assert_allclose(rgb_basis(np.zeros(1), np.zeros(1)), 0.0)

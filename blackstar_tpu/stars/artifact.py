"""The repo's default full-scale star-grid artifact.

The reference *requires* a star map (it exits when ``stars.kdt`` is missing,
app/Main.hs:46-50). The analogue here is ``stars.grid.npz`` at the repo
root, built deterministically from the committed ``stars.ppm`` catalogue
(470k synthetic stars, scripts/make_starfield.py). The grid is built lazily
on first use and cached on disk — the dense device tables are too large to
commit, the build is ~15 s, and the compact cache loads in ~5 s.

Build parameters are chosen for the grouped production lookup
(``StarGrid.lookup_grouped``): a group margin covering 8-consecutive-pixel
groups at the canonical 1080p/fov≈1.5 workload, cell size and k0 balancing
gather row bytes vs overflow traffic (see DESIGN.md §3).
"""

from __future__ import annotations

import os
from typing import Optional

import jax.numpy as jnp

# Grouped-lookup build: margin = radius − 3w = 6 mrad covers 7-pixel group
# spreads up to fov/width ≈ 0.86 mrad/px (1080p at fov ≤ 1.65; wider fovs
# fall back per-ray, exactly).
CELL_SIZE = 0.006
RADIUS = 0.0075
K0 = 32
# Production two-tier overflow split (octets kept in the tier-1 rows; see
# StarGrid.ovf2_data). None = single-tier — the measured v5e winner (r3
# hardware sweep, scripts/sweep_star_r3.py): split 2/4 cost 74/49 ms/frame
# vs 42 single-tier at the production schedule. Cutting gathered overflow
# bytes 2× does not pay on this hardware because the overflow cost is the
# block-compaction machinery, not the gather bytes; the second tier adds a
# second such pass. The split stays a load-time choice for other
# catalogues/hardware; the on-disk artifact is unchanged.
OVF_SPLIT: Optional[int] = None


def repo_root() -> str:
    return os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )


def default_grid_path() -> str:
    return os.path.join(repo_root(), "stars.grid.npz")


def default_catalog_path() -> str:
    return os.path.join(repo_root(), "stars.ppm")


def ensure_star_grid(path: Optional[str] = None, *, build: bool = True) -> Optional[str]:
    """Return the path of the default grid artifact, building and caching
    it from ``stars.ppm`` if needed. None if unavailable."""
    path = path or default_grid_path()
    if os.path.exists(path):
        return path
    if not build:
        return None
    ppm = default_catalog_path()
    if not os.path.exists(ppm):
        return None
    from blackstar_tpu.stars.catalog import read_catalog
    from blackstar_tpu.stars.grid import build_star_grid_compact, save_star_grid

    compact = build_star_grid_compact(
        read_catalog(ppm), cell_size=CELL_SIZE, radius=RADIUS, k0=K0
    )
    return save_star_grid(compact, path)


def default_star_grid(dtype=jnp.float32, *, build: bool = True,
                      k0: Optional[int] = None,
                      ovf_split: Optional[int] = "default"):
    """Load (building if necessary) the default full-scale star grid.
    Returns None when neither the cache nor the catalogue exists."""
    path = ensure_star_grid(build=build)
    if path is None:
        return None
    from blackstar_tpu.stars.grid import load_star_grid

    if ovf_split == "default":
        ovf_split = OVF_SPLIT
    return load_star_grid(path, dtype=dtype, k0=k0, ovf_split=ovf_split)

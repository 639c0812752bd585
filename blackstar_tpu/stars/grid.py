"""Bucketed spherical star grid — the TPU-native replacement for the
reference's k-d tree (StarMap.hs:90-91, ``inRadius`` query at :104).

The reference answers a tiny fixed-radius range query (3·w = 0.0015 rad) per
escaped ray with a per-ray k-d traversal — branchy, pointer-chasing, and
unvectorisable. Here the unit sphere is cut into declination rings of angular
height ``cell_size`` with per-ring azimuthal columns of at most the same arc
width. At *build* time (offline, like ``generate-tree``) every star is
inserted into each cell whose region, expanded by the query radius, contains
it — so a *lookup* is a single cell-id computation plus one fixed-size padded
gather of at most K candidate stars, followed by the Gaussian PSF sum
(StarMap.hs:93-115). All per-ray work is dense vector math on the VPU.

Shading semantics match ``starLookup`` exactly: candidates within squared
chordal distance (3w)² contribute
``min(1, exp(ln2/50·(950 − mag) − d²/(2w²))) · starIntensity`` as HSI value
with hue/saturation from the spectral class (saturation scaled by
``starSaturation``), converted to RGB, summed, and clamped to ≤ 1 per channel.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blackstar_tpu.color import hsi_to_rgb
from blackstar_tpu.stars.catalog import Catalog

# Constants from StarMap.hs:97-100.
MAX_BRIGHTNESS = 950.0  # magnitude of "maximum brightness"
DYNAMIC = 50.0  # magnitude change that doubles intensity
PSF_WIDTH = 0.0005  # Gaussian width parameter w
QUERY_RADIUS = 3.0 * PSF_WIDTH  # inRadius search radius (StarMap.hs:104)

_FORMAT_VERSION = 1


@jax.tree_util.register_dataclass
@dataclass
class StarGrid:
    """Device-resident bucketed star table. A JAX pytree (array leaves),
    so it can be passed straight into jitted render functions."""

    # Star data (S+1 rows; the last row is an inert sentinel).
    pos: jax.Array  # (S+1, 3)
    mag: jax.Array  # (S+1,)
    hue: jax.Array  # (S+1,)
    sat: jax.Array  # (S+1,)
    # Bucket structure.
    cell_idx: jax.Array  # (C, K) int32, sentinel = S
    n_cols: jax.Array  # (R,) int32 columns per declination ring
    row_start: jax.Array  # (R,) int32 first cell id of each ring
    # Static metadata.
    n_rings: int = dataclasses.field(metadata=dict(static=True))
    psf_width: float = dataclasses.field(metadata=dict(static=True))
    radius: float = dataclasses.field(metadata=dict(static=True))

    @property
    def n_stars(self) -> int:
        return self.pos.shape[0] - 1

    @property
    def pad_k(self) -> int:
        return self.cell_idx.shape[1]

    def astype(self, dtype) -> "StarGrid":
        dt = jnp.dtype(dtype)
        return dataclasses.replace(
            self,
            pos=self.pos.astype(dt),
            mag=self.mag.astype(dt),
            hue=self.hue.astype(dt),
            sat=self.sat.astype(dt),
        )

    def lookup(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Celestial-sphere colour for ray directions ``vel`` (N, 3).

        Vectorised ``starLookup`` (StarMap.hs:93-115): directions are
        normalised, candidates gathered from the ray's bucket, and the
        Gaussian point-spread sum evaluated with the reference's constants.
        """
        dt = vel.dtype
        n = vel.shape[0]
        if self.n_stars == 0:
            return jnp.zeros((n, 3), dt)

        if active is not None:
            # Dead lanes get a harmless probe direction.
            vel = jnp.where(active[:, None], vel, jnp.ones((), dt))
        nvel = vel / jnp.linalg.norm(vel, axis=-1, keepdims=True)

        # Bucket id: declination ring, then azimuthal column.
        two_pi = 2.0 * jnp.pi
        delta = jnp.asarray(jnp.pi / self.n_rings, dt)
        dec = jnp.arcsin(jnp.clip(nvel[:, 2], -1.0, 1.0))
        ra = jnp.arctan2(nvel[:, 1], nvel[:, 0]) % two_pi
        ring = jnp.clip(
            jnp.floor((dec + jnp.pi / 2) / delta).astype(jnp.int32), 0, self.n_rings - 1
        )
        ncol = self.n_cols[ring]
        col = jnp.clip(
            jnp.floor(ra / two_pi * ncol.astype(dt)).astype(jnp.int32), 0, ncol - 1
        )
        cell = self.row_start[ring] + col

        idx = self.cell_idx[cell]  # (N, K) — sentinel rows gather inert star
        spos = self.pos[idx].astype(dt)  # (N, K, 3)
        smag = self.mag[idx].astype(dt)
        shue = self.hue[idx].astype(dt)
        ssat = self.sat[idx].astype(dt)

        diff = spos - nvel[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)  # squared chordal distance (qd)

        w = jnp.asarray(self.psf_width, dt)
        within = (idx != self.n_stars) & (d2 <= (3.0 * w) ** 2)
        a = jnp.log(jnp.asarray(2.0, dt)) / DYNAMIC
        log_b = a * (MAX_BRIGHTNESS - smag) - d2 / (2.0 * w * w)
        val = jnp.minimum(1.0, jnp.exp(jnp.where(within, log_b, -jnp.inf)))
        val = val * intensity

        hsi = jnp.stack([shue, saturation * ssat, val], axis=-1)
        rgb = hsi_to_rgb(hsi)  # (N, K, 3); val==0 -> exact black
        out = jnp.sum(jnp.where(within[..., None], rgb, jnp.zeros((), dt)), axis=1)
        out = jnp.minimum(out, 1.0)  # per-channel clamp (StarMap.hs:115)
        if active is not None:
            out = jnp.where(active[:, None], out, jnp.zeros((), dt))
        return out


def _ring_layout(n_rings: int):
    """Per-ring column counts: azimuthal arc width <= ring height."""
    delta = np.pi / n_rings
    edges = -np.pi / 2 + delta * np.arange(n_rings + 1)
    # Widest circumference inside the ring (dec closest to the equator).
    lo, hi = edges[:-1], edges[1:]
    closest = np.where((lo < 0) & (hi > 0), 0.0, np.minimum(np.abs(lo), np.abs(hi)))
    max_cos = np.cos(closest)
    n_cols = np.maximum(1, np.ceil(2 * np.pi * max_cos / delta)).astype(np.int64)
    row_start = np.concatenate([[0], np.cumsum(n_cols)[:-1]]).astype(np.int64)
    return n_cols, row_start, int(n_cols.sum())


def build_star_grid(
    catalog: Catalog,
    *,
    cell_size: float = 0.02,
    psf_width: float = PSF_WIDTH,
    radius: Optional[float] = None,
    dtype=jnp.float32,
) -> StarGrid:
    """Offline bucket build (the ``generate-tree`` analogue, StarMap.hs:90-91).

    Each star is inserted into every cell whose (radius-expanded) region it
    falls in, so queries touch exactly one cell. ``cell_size`` is the ring
    height in radians; it must exceed ``radius`` (default 3·psf_width).
    """
    r = QUERY_RADIUS if radius is None else float(radius)
    r = float(max(r, 3.0 * psf_width))
    if cell_size <= 2 * r:
        raise ValueError(f"cell_size {cell_size} must exceed 2×query radius {r}")

    n_rings = max(1, int(np.ceil(np.pi / cell_size)))
    n_cols, row_start, n_cells = _ring_layout(n_rings)
    delta = np.pi / n_rings

    pos = np.asarray(catalog.pos, np.float64)
    s = pos.shape[0]
    if s == 0:
        cell_idx = np.zeros((n_cells, 1), np.int32)
        return _grid_from_arrays(
            catalog, cell_idx, n_cols, row_start, n_rings, psf_width, r, dtype
        )

    z = np.clip(pos[:, 2], -1.0, 1.0)
    dec = np.arcsin(z)
    ra = np.mod(np.arctan2(pos[:, 1], pos[:, 0]), 2 * np.pi)

    # Insertion halo: the query radius is *chordal*; converting to angular
    # distance and cell overlap needs a small safety margin.
    rh = 1.01 * r

    # Rings whose dec-range expanded by rh contains the star.
    ring_lo = np.clip(np.floor((dec - rh + np.pi / 2) / delta).astype(np.int64), 0, n_rings - 1)
    ring_hi = np.clip(np.floor((dec + rh + np.pi / 2) / delta).astype(np.int64), 0, n_rings - 1)

    pairs_cell = []
    pairs_star = []
    star_ids = np.arange(s, dtype=np.int64)
    for off in range(int((ring_hi - ring_lo).max()) + 1):
        ring = ring_lo + off
        valid = ring <= ring_hi
        if not valid.any():
            continue
        rsel = ring[valid]
        ids = star_ids[valid]
        ra_sel = ra[valid]
        ncol = n_cols[rsel]
        # Azimuthal halo: chordal radius r subtends RA width r / cos(dec)
        # at the ring's extreme declination (cos smallest there).
        edge_lo = -np.pi / 2 + delta * rsel
        edge_hi = edge_lo + delta
        min_cos = np.minimum(np.cos(edge_lo), np.cos(edge_hi))
        # Rings touching the poles: halo covers the full circle.
        safe_cos = np.maximum(min_cos, 1e-12)
        dra = np.where(min_cos < rh, np.pi, 1.05 * rh / safe_cos)
        col_center = ra_sel / (2 * np.pi) * ncol
        col_halo = np.ceil(dra / (2 * np.pi) * ncol).astype(np.int64)
        col0 = np.floor(col_center).astype(np.int64)
        max_halo = int(col_halo.max()) if len(col_halo) else 0
        for c_off in range(-max_halo, max_halo + 1):
            use = np.abs(c_off) <= col_halo
            if not use.any():
                continue
            cols = np.mod(col0[use] + c_off, ncol[use])
            pairs_cell.append(row_start[rsel[use]] + cols)
            pairs_star.append(ids[use])

    cells = np.concatenate(pairs_cell)
    stars = np.concatenate(pairs_star)
    # Deduplicate (a star can enter the same wrapped column twice).
    uniq = np.unique(cells * np.int64(s) + stars)
    cells, stars = uniq // s, uniq % s

    order = np.argsort(cells, kind="stable")
    cells, stars = cells[order], stars[order]
    counts = np.bincount(cells, minlength=n_cells)
    k = max(1, int(counts.max()))
    cell_idx = np.full((n_cells, k), s, np.int64)
    slot = np.arange(len(cells)) - np.concatenate([[0], np.cumsum(counts)[:-1]])[cells]
    cell_idx[cells, slot] = stars

    return _grid_from_arrays(
        catalog, cell_idx, n_cols, row_start, n_rings, psf_width, r, dtype
    )


def _grid_from_arrays(catalog, cell_idx, n_cols, row_start, n_rings, psf_width, radius, dtype):
    dt = jnp.dtype(dtype)
    s = catalog.pos.shape[0]
    # Sentinel star: far away, infinitely dim.
    pos = np.concatenate([np.asarray(catalog.pos, np.float64), [[9.0, 9.0, 9.0]]])
    mag = np.concatenate([np.asarray(catalog.mag, np.float64), [1e9]])
    hue = np.concatenate([np.asarray(catalog.hue, np.float64), [0.0]])
    sat = np.concatenate([np.asarray(catalog.sat, np.float64), [0.0]])
    return StarGrid(
        pos=jnp.asarray(pos, dt),
        mag=jnp.asarray(mag, dt),
        hue=jnp.asarray(hue, dt),
        sat=jnp.asarray(sat, dt),
        cell_idx=jnp.asarray(cell_idx, jnp.int32),
        n_cols=jnp.asarray(n_cols, jnp.int32),
        row_start=jnp.asarray(row_start, jnp.int32),
        n_rings=int(n_rings),
        psf_width=float(psf_width),
        radius=float(radius),
    )


def save_star_grid(grid: StarGrid, path: str) -> None:
    """Serialise to ``.npz`` (the ``stars.kdt`` analogue)."""
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        pos=np.asarray(grid.pos, np.float64),
        mag=np.asarray(grid.mag, np.float64),
        hue=np.asarray(grid.hue, np.float64),
        sat=np.asarray(grid.sat, np.float64),
        cell_idx=np.asarray(grid.cell_idx, np.int32),
        n_cols=np.asarray(grid.n_cols, np.int32),
        row_start=np.asarray(grid.row_start, np.int32),
        n_rings=grid.n_rings,
        psf_width=grid.psf_width,
        radius=grid.radius,
    )


def load_star_grid(path: str, dtype=jnp.float32) -> StarGrid:
    z = np.load(path)
    if int(z["version"]) != _FORMAT_VERSION:
        raise ValueError(f"unsupported star-grid format version {int(z['version'])}")
    dt = jnp.dtype(dtype)
    return StarGrid(
        pos=jnp.asarray(z["pos"], dt),
        mag=jnp.asarray(z["mag"], dt),
        hue=jnp.asarray(z["hue"], dt),
        sat=jnp.asarray(z["sat"], dt),
        cell_idx=jnp.asarray(z["cell_idx"], jnp.int32),
        n_cols=jnp.asarray(z["n_cols"], jnp.int32),
        row_start=jnp.asarray(z["row_start"], jnp.int32),
        n_rings=int(z["n_rings"]),
        psf_width=float(z["psf_width"]),
        radius=float(z["radius"]),
    )

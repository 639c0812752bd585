"""Bucketed spherical star grid — the TPU-native replacement for the
reference's k-d tree (StarMap.hs:90-91, ``inRadius`` query at :104).

The reference answers a tiny fixed-radius range query (3·w = 0.0015 rad) per
escaped ray with a per-ray k-d traversal — branchy, pointer-chasing, and
unvectorisable. Here the unit sphere is cut into declination rings of angular
height ``cell_size`` with per-ring azimuthal columns of at most the same arc
width. At *build* time (offline, like ``generate-tree``) every star is
inserted into each cell whose region, expanded by the query radius, contains
it — so a *lookup* touches exactly one cell.

Storage is a **dense per-cell table** ``cell_data`` of shape (C, K, 8):
``[x, y, z, mag, H_r, H_g, H_b, valid]`` per candidate slot, sentinel-padded.
A lookup is then ONE gather of N contiguous 32·K-byte rows followed by dense
vector math — measured far faster on TPU than gathering K scattered star
rows per ray.

``H`` is the precomputed **HSI colour basis**: the HSI→RGB conversion is
linear in intensity, ``rgb(h, s, i) = i·(1 + s·G(h))`` with ``G`` a
hue-dependent 3-vector (per sector: a permutation of
``(cr, 1−cr, −1)`` where ``cr = cos(a)/cos(π/3−a)``). Storing
``H = s_star·G(h_star)`` per star removes *all* per-candidate
transcendentals at lookup time — runtime shading is
``rgb = val·(1 + starSaturation·H)``, algebraically identical to the
reference's ``toPixelRGB (HSI h (sat·s) val)`` (StarMap.hs:114) and still
differentiable in the saturation parameter.

Shading semantics match ``starLookup`` exactly (StarMap.hs:93-115):
candidates within squared chordal distance (3w)² contribute
``min(1, exp(ln2/50·(950 − mag) − d²/(2w²))) · starIntensity`` as HSI value
with hue/saturation from the spectral class (saturation scaled by
``starSaturation``), converted to RGB, summed, and clamped to ≤ 1 per channel.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from blackstar_tpu.stars.catalog import Catalog

# Constants from StarMap.hs:97-100.
MAX_BRIGHTNESS = 950.0  # magnitude of "maximum brightness"
DYNAMIC = 50.0  # magnitude change that doubles intensity
PSF_WIDTH = 0.0005  # Gaussian width parameter w
QUERY_RADIUS = 3.0 * PSF_WIDTH  # inRadius search radius (StarMap.hs:104)

_FORMAT_VERSION = 4
_ROW = 8  # floats per candidate slot: x y z mag H_r H_g H_b valid


def rgb_basis(hue: np.ndarray, sat: np.ndarray) -> np.ndarray:
    """Per-star colour basis H = s·G(h): HSI→RGB is rgb = i·(1 + H).

    Mirrors :func:`blackstar_tpu.color.hsi_to_rgb` algebraically (float64,
    build-time): sector cr = cos(a)/cos(π/3−a); G permutes (cr, 1−cr, −1).
    """
    hue = np.asarray(hue, np.float64)
    sat = np.asarray(sat, np.float64)
    hp = hue * 2.0 * np.pi
    sector = np.clip(np.floor(hp / (2.0 * np.pi / 3.0)), 0, 2).astype(np.int64)
    a = hp - sector * (2.0 * np.pi / 3.0)
    cr = np.cos(a) / np.cos(np.pi / 3.0 - a)
    first, third, second = cr, 1.0 - cr, np.full_like(cr, -1.0)
    g = np.empty(hue.shape + (3,), np.float64)
    for s_idx, perm in enumerate(((first, third, second),
                                  (second, first, third),
                                  (third, second, first))):
        m = sector == s_idx
        for c in range(3):
            g[m, c] = perm[c][m]
    return sat[..., None] * g


@jax.tree_util.register_dataclass
@dataclass
class StarGrid:
    """Device-resident bucketed star table. A JAX pytree (array leaves),
    so it can be passed straight into jitted render functions.

    The grid is equirectangular — every declination ring has the same
    ``n_cols`` azimuth columns — so a ray's cell id is pure arithmetic
    (ring·n_cols + col) with **no index-table gathers**. An area-balanced
    layout (fewer columns near the poles) was tried first: its per-ring
    ``n_cols[ring]``/``row_start[ring]`` lookups cost two extra 2M-row
    gathers per frame, far more than the ~50% extra sentinel padding the
    fixed layout spends near the poles.
    """

    cell_data: jax.Array  # (R·n_cols, K, 8) dense candidate slots, padded
    # Static metadata.
    n_rings: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    n_stars: int = dataclasses.field(metadata=dict(static=True))
    psf_width: float = dataclasses.field(metadata=dict(static=True))
    radius: float = dataclasses.field(metadata=dict(static=True))

    @property
    def pad_k(self) -> int:
        return self.cell_data.shape[1]

    @property
    def dtype(self):
        return self.cell_data.dtype

    def astype(self, dtype) -> "StarGrid":
        dt = jnp.dtype(dtype)
        return dataclasses.replace(self, cell_data=self.cell_data.astype(dt))

    def lookup(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
        chunk: int = 1 << 17,
    ) -> jnp.ndarray:
        """Celestial-sphere colour for ray directions ``vel`` (N, 3).

        Vectorised ``starLookup`` (StarMap.hs:93-115). Large batches are
        processed in ``chunk``-ray blocks via ``lax.map`` — the candidate
        gather materialises (rays, K, 8) intermediates, which at full-frame
        ray counts would exceed HBM if unchunked.
        """
        n = vel.shape[0]
        if n > chunk:
            dt = vel.dtype
            n_pad = -(-n // chunk) * chunk
            velp = jnp.concatenate(
                [vel, jnp.ones((n_pad - n, 3), dt)], axis=0
            ).reshape(-1, chunk, 3)
            if active is None:
                act = jnp.ones((n_pad,), bool).at[n:].set(False)
            else:
                act = jnp.concatenate(
                    [active, jnp.zeros((n_pad - n,), bool)], axis=0
                )
            act = act.reshape(-1, chunk)
            out = jax.lax.map(
                lambda args: self._lookup_block(
                    args[0], intensity, saturation, args[1]
                ),
                (velp, act),
            )
            return out.reshape(n_pad, 3)[:n]
        return self._lookup_block(vel, intensity, saturation, active)

    def _lookup_block(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        dt = vel.dtype
        n = vel.shape[0]
        if self.n_stars == 0:
            return jnp.zeros((n, 3), dt)

        if active is not None:
            # Dead lanes get a harmless probe direction.
            vel = jnp.where(active[:, None], vel, jnp.ones((), dt))
        nvel = vel / jnp.linalg.norm(vel, axis=-1, keepdims=True)

        # Bucket id: declination ring, then azimuthal column — pure
        # arithmetic on the equirect layout, no table gathers.
        two_pi = 2.0 * jnp.pi
        delta = jnp.asarray(jnp.pi / self.n_rings, dt)
        dec = jnp.arcsin(jnp.clip(nvel[:, 2], -1.0, 1.0))
        ra = jnp.arctan2(nvel[:, 1], nvel[:, 0]) % two_pi
        ring = jnp.clip(
            jnp.floor((dec + jnp.pi / 2) / delta).astype(jnp.int32), 0, self.n_rings - 1
        )
        col = jnp.clip(
            jnp.floor(ra / two_pi * self.n_cols).astype(jnp.int32), 0, self.n_cols - 1
        )
        cell = ring * self.n_cols + col

        # ONE contiguous-row gather per ray: (N, K, 8). Gather from the 2-D
        # (C, K·8) view — XLA lowers a 3-D row gather ~3.5× slower on TPU
        # (162 vs 46 ms for 2M rays) than the identical-bytes 2-D one.
        flat = self.cell_data.reshape(self.cell_data.shape[0], -1)
        data = flat[cell].reshape(n, self.pad_k, _ROW).astype(dt)
        spos = data[..., 0:3]
        smag = data[..., 3]
        sbasis = data[..., 4:7]  # H = s_star·G(h_star), see module docstring
        svalid = data[..., 7] > 0.5

        diff = spos - nvel[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)  # squared chordal distance (qd)

        w = jnp.asarray(self.psf_width, dt)
        within = svalid & (d2 <= (3.0 * w) ** 2)
        a = jnp.log(jnp.asarray(2.0, dt)) / DYNAMIC
        log_b = a * (MAX_BRIGHTNESS - smag) - d2 / (2.0 * w * w)
        val = jnp.minimum(1.0, jnp.exp(jnp.where(within, log_b, -jnp.inf)))
        val = val * intensity

        # rgb = val·(1 + saturation·H): the HSI→RGB of the reference, with
        # the hue transcendentals folded into the build-time basis H.
        rgb = val[..., None] * (1.0 + saturation * sbasis)
        out = jnp.sum(jnp.where(within[..., None], rgb, jnp.zeros((), dt)), axis=1)
        out = jnp.minimum(out, 1.0)  # per-channel clamp (StarMap.hs:115)
        if active is not None:
            out = jnp.where(active[:, None], out, jnp.zeros((), dt))
        return out




def _pack_cells(catalog: Catalog, cells, stars, n_cells, k) -> np.ndarray:
    """Dense (C, K, 8) candidate table from (cell, star) insertion pairs."""
    data = np.zeros((n_cells, k, _ROW), np.float64)
    # Sentinel slots: far away, infinitely dim, invalid.
    data[..., 0:3] = 9.0
    data[..., 3] = 1e9
    if len(cells):
        counts = np.bincount(cells, minlength=n_cells)
        slot = np.arange(len(cells)) - np.concatenate([[0], np.cumsum(counts)[:-1]])[cells]
        data[cells, slot, 0:3] = catalog.pos[stars]
        data[cells, slot, 3] = catalog.mag[stars]
        data[cells, slot, 4:7] = rgb_basis(catalog.hue, catalog.sat)[stars]
        data[cells, slot, 7] = 1.0
    return data


def build_star_grid(
    catalog: Catalog,
    *,
    cell_size: float = 0.008,
    psf_width: float = PSF_WIDTH,
    radius: Optional[float] = None,
    dtype=jnp.float32,
    device: bool = True,
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
    ncol = max(1, int(np.ceil(2 * np.pi / cell_size)))  # fixed per ring
    n_cells = n_rings * ncol
    delta = np.pi / n_rings

    pos = np.asarray(catalog.pos, np.float64)
    s = pos.shape[0]
    if s == 0:
        data = _pack_cells(catalog, np.zeros(0, np.int64), np.zeros(0, np.int64), n_cells, 1)
        return _grid_from_arrays(data, n_rings, ncol, 0, psf_width, r, dtype, device)

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
        col_halo = np.minimum(col_halo, ncol // 2)  # full circle at most
        col0 = np.floor(col_center).astype(np.int64)
        max_halo = int(col_halo.max()) if len(col_halo) else 0
        for c_off in range(-max_halo, max_halo + 1):
            use = np.abs(c_off) <= col_halo
            if not use.any():
                continue
            cols = np.mod(col0[use] + c_off, ncol)
            pairs_cell.append(rsel[use] * ncol + cols)
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
    data = _pack_cells(catalog, cells, stars, n_cells, k)
    return _grid_from_arrays(data, n_rings, ncol, s, psf_width, r, dtype, device)


def _grid_from_arrays(data, n_rings, n_cols, n_stars, psf_width, radius, dtype,
                      device=True):
    # device=False keeps the table as a host numpy array (full float64 even
    # without jax_enable_x64) — the offline build/serialise path needs no
    # device transfer, and jnp.asarray would silently downcast f64 to f32.
    cd = (jnp.asarray(data, jnp.dtype(dtype)) if device
          else np.asarray(data, np.dtype(dtype)))
    return StarGrid(
        cell_data=cd,
        n_rings=int(n_rings),
        n_cols=int(n_cols),
        n_stars=int(n_stars),
        psf_width=float(psf_width),
        radius=float(radius),
    )


def save_star_grid(grid: StarGrid, path: str) -> str:
    """Serialise to ``.npz`` (the ``stars.kdt`` analogue); returns the path
    actually written (np.savez appends the suffix but np.load would not, so
    the name is normalised here). Build the grid with ``dtype=float64`` if
    the file should serve float64 golden renders — the stored values are
    whatever precision the grid was built at."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        cell_data=np.asarray(grid.cell_data, np.float64),
        n_rings=grid.n_rings,
        n_cols=grid.n_cols,
        n_stars=grid.n_stars,
        psf_width=grid.psf_width,
        radius=grid.radius,
    )
    return path


def load_star_grid(path: str, dtype=jnp.float32) -> StarGrid:
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    z = np.load(path)
    if int(z["version"]) != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported star-grid format version {int(z['version'])} "
            f"(expected {_FORMAT_VERSION}; rebuild with generate-grid)"
        )
    return StarGrid(
        cell_data=jnp.asarray(z["cell_data"], jnp.dtype(dtype)),
        n_rings=int(z["n_rings"]),
        n_cols=int(z["n_cols"]),
        n_stars=int(z["n_stars"]),
        psf_width=float(z["psf_width"]),
        radius=float(z["radius"]),
    )

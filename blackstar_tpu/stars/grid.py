"""Bucketed spherical star grid — the TPU-native replacement for the
reference's k-d tree (StarMap.hs:90-91, ``inRadius`` query at :104).

The reference answers a tiny fixed-radius range query (3·w = 0.0015 rad) per
escaped ray with a per-ray k-d traversal — branchy, pointer-chasing, and
unvectorisable. Here the unit sphere is cut into declination rings of angular
height ``cell_size`` with per-ring azimuthal columns of at most the same arc
width. At *build* time (offline, like ``generate-tree``) every star is
inserted into each cell whose region, expanded by the query radius, contains
it — so a *lookup* touches exactly one cell.

Storage is **two-level** (the TPU gather cost model measured in
``scripts/sweep_gather.py``: ~55 GB/s effective stream with a ~4.5 ns/row
floor, so total gathered *bytes* are everything and a global max-occupancy
pad is ruinous once a realistic catalogue's galactic-plane density sets the
max):

* ``cell_data`` (C, K0, 8): the first K0 candidate slots of every cell —
  small fixed rows (K0=8 → 256 B) sized for the *typical* cell, gathered
  once per ray;
* ``ovf_data`` (R, K1, 8): the excess slots of the few dense cells
  (galactic band, clusters); row 0 is an all-sentinel dummy. A cell's
  overflow row index is packed into ``cell_data[c, 0, 7]`` (an otherwise
  unused field), so discovering it costs no extra gather. Rays in overflow
  cells are *compacted* (``jnp.nonzero`` with a static capacity) and only
  they pay the second gather; a ``lax.cond`` falls back to a full-width
  second gather in the rare case the compaction capacity overflows, so
  results are exact for every input.

Each candidate slot is 8 floats ``[x, y, z, mag, H_r, H_g, H_b, aux]``;
``aux`` holds the overflow pointer in slot 0 and is unused elsewhere.
Sentinel slots have ``pos = 9.0`` (chordal d² ≈ 190 ≫ (3w)², so the radius
test alone excludes them) and ``mag = 1e9``.

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
``starSaturation``), converted to RGB, summed over *all* candidates (base +
overflow), and clamped to ≤ 1 per channel at the very end.

Serialisation (``save_star_grid``/``load_star_grid``) stores the compact
CSR form — per-cell counts + the concatenated candidate slots — and the
dense two-level tables are materialised at load, so the on-disk artifact
stays ~30× smaller than the padded device tables.
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

_FORMAT_VERSION = 5
_ROW = 8  # floats per candidate slot: x y z mag H_r H_g H_b aux
_SENTINEL_POS = 9.0
_SENTINEL_MAG = 1e9
DEFAULT_K0 = 8  # base slots/cell: 256 B rows (the gather sweet spot)
DEFAULT_CELL_SIZE = 0.008


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
    """Device-resident two-level bucketed star table. A JAX pytree (array
    leaves), so it can be passed straight into jitted render functions.

    The grid is equirectangular — every declination ring has the same
    ``n_cols`` azimuth columns — so a ray's cell id is pure arithmetic
    (ring·n_cols + col) with **no index-table gathers**. An area-balanced
    layout (fewer columns near the poles) was tried first: its per-ring
    ``n_cols[ring]``/``row_start[ring]`` lookups cost two extra 2M-row
    gathers per frame, far more than the ~50% extra sentinel padding the
    fixed layout spends near the poles.
    """

    cell_data: jax.Array  # (C, K0, 8) base candidate slots, sentinel-padded
    ovf_data: jax.Array  # (R, K1, 8) overflow slots; row 0 = dummy
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
    def has_overflow(self) -> bool:
        return self.ovf_data.shape[0] > 1

    @property
    def dtype(self):
        return self.cell_data.dtype

    def astype(self, dtype) -> "StarGrid":
        dt = jnp.dtype(dtype)
        return dataclasses.replace(
            self,
            cell_data=self.cell_data.astype(dt),
            ovf_data=self.ovf_data.astype(dt),
        )

    def nbytes(self) -> int:
        return self.cell_data.nbytes + self.ovf_data.nbytes

    def cell_ids(self, nvel: jnp.ndarray) -> jnp.ndarray:
        """Bucket id for unit directions (N, 3): declination ring, then
        azimuthal column — pure arithmetic on the equirect layout."""
        dt = nvel.dtype
        two_pi = 2.0 * jnp.pi
        delta = jnp.asarray(jnp.pi / self.n_rings, dt)
        dec = jnp.arcsin(jnp.clip(nvel[..., 2], -1.0, 1.0))
        ra = jnp.arctan2(nvel[..., 1], nvel[..., 0]) % two_pi
        ring = jnp.clip(
            jnp.floor((dec + jnp.pi / 2) / delta).astype(jnp.int32),
            0,
            self.n_rings - 1,
        )
        col = jnp.clip(
            jnp.floor(ra / two_pi * self.n_cols).astype(jnp.int32),
            0,
            self.n_cols - 1,
        )
        return ring * self.n_cols + col

    def _candidate_rgb(self, data, nvel, intensity, saturation):
        """Unclamped RGB sum over one gathered slot block.

        ``data``: (N, S, 8) candidate slots; ``nvel``: (N, 3) unit dirs.
        Exact ``starLookup`` per-star math (StarMap.hs:93-114); sentinels
        fail the radius test (pos 9.0 → d² ≈ 190), so no validity flag is
        needed.
        """
        dt = nvel.dtype
        spos = data[..., 0:3]
        smag = data[..., 3]
        sbasis = data[..., 4:7]  # H = s_star·G(h_star), see module docstring

        diff = spos - nvel[:, None, :]
        d2 = jnp.sum(diff * diff, axis=-1)  # squared chordal distance (qd)

        w = jnp.asarray(self.psf_width, dt)
        within = d2 <= (3.0 * w) ** 2
        a = jnp.log(jnp.asarray(2.0, dt)) / DYNAMIC
        log_b = a * (MAX_BRIGHTNESS - smag) - d2 / (2.0 * w * w)
        val = jnp.minimum(1.0, jnp.exp(jnp.where(within, log_b, -jnp.inf)))
        val = val * intensity

        # rgb = val·(1 + saturation·H): the HSI→RGB of the reference, with
        # the hue transcendentals folded into the build-time basis H.
        rgb = val[..., None] * (1.0 + saturation * sbasis)
        return jnp.sum(
            jnp.where(within[..., None], rgb, jnp.zeros((), dt)), axis=1
        )

    def lookup(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
        chunk: int = 1 << 17,
        ovf_capacity: float = 0.25,
    ) -> jnp.ndarray:
        """Celestial-sphere colour for ray directions ``vel`` (N, 3).

        Vectorised ``starLookup`` (StarMap.hs:93-115). Large batches are
        processed in ``chunk``-ray blocks via ``lax.map`` — the candidate
        gather materialises (rays, K0, 8) intermediates, which at full-frame
        ray counts would exceed HBM if unchunked. ``ovf_capacity`` is the
        static fraction of a block expected (at most) to land in overflow
        cells; exceeding it triggers the exact full-width fallback.
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
                    args[0], intensity, saturation, args[1],
                    ovf_capacity=ovf_capacity,
                ),
                (velp, act),
            )
            return out.reshape(n_pad, 3)[:n]
        return self._lookup_block(
            vel, intensity, saturation, active, ovf_capacity=ovf_capacity
        )

    def _lookup_block(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
        ovf_capacity: float = 0.25,
    ) -> jnp.ndarray:
        dt = vel.dtype
        n = vel.shape[0]
        if self.n_stars == 0:
            return jnp.zeros((n, 3), dt)

        if active is not None:
            # Dead lanes get a harmless probe direction.
            vel = jnp.where(active[:, None], vel, jnp.ones((), dt))
        nvel = vel / jnp.linalg.norm(vel, axis=-1, keepdims=True)
        cell = self.cell_ids(nvel)

        # ONE contiguous-row gather per ray: (N, K0, 8). Gather from the 2-D
        # (C, K0·8) view — XLA lowers a 3-D row gather far slower on TPU
        # than the identical-bytes 2-D one.
        flat = self.cell_data.reshape(self.cell_data.shape[0], -1)
        data = flat[cell].reshape(n, self.pad_k, _ROW).astype(dt)
        intensity = intensity.astype(dt)
        saturation = saturation.astype(dt)
        acc = self._candidate_rgb(data, nvel, intensity, saturation)

        if self.has_overflow:
            k1 = self.ovf_data.shape[1]
            oflat = self.ovf_data.reshape(self.ovf_data.shape[0], -1)
            rowid = data[:, 0, 7].astype(jnp.int32)  # 0 = no overflow
            has = rowid > 0
            if active is not None:
                has = has & active
            m = int(n * ovf_capacity)
            if m >= n or m < 512:
                # Small blocks: compaction saves nothing — gather a second
                # row for every ray (row 0 is the all-sentinel dummy).
                od = oflat[rowid].reshape(n, k1, _ROW).astype(dt)
                acc = acc + self._candidate_rgb(od, nvel, intensity, saturation)
            else:
                def fast(_):
                    # Only the (few) rays in overflow cells pay the second
                    # gather: compact them into m static slots.
                    idx = jnp.nonzero(has, size=m, fill_value=n)[0]
                    idxc = jnp.minimum(idx, n - 1)
                    od = oflat[rowid[idxc]].reshape(m, k1, _ROW).astype(dt)
                    sub = self._candidate_rgb(
                        od, nvel[idxc], intensity, saturation
                    )
                    # fill_value=n lands out of range and is dropped.
                    return jnp.zeros((n, 3), dt).at[idx].add(sub, mode="drop")

                def slow(_):
                    # Exact fallback: more than m rays overflowed (dense
                    # galactic-band framing) — gather for all of them.
                    od = oflat[rowid].reshape(n, k1, _ROW).astype(dt)
                    return self._candidate_rgb(od, nvel, intensity, saturation)

                acc = acc + jax.lax.cond(jnp.sum(has) <= m, fast, slow, None)

        out = jnp.minimum(acc, 1.0)  # per-channel clamp (StarMap.hs:115)
        if active is not None:
            out = jnp.where(active[:, None], out, jnp.zeros((), dt))
        return out


@dataclass
class CompactStarGrid:
    """Host-side CSR form of the grid: per-cell candidate counts plus the
    concatenated 8-float candidate slots (float64). This is what gets
    serialised (~30× smaller than the padded device tables) and what
    ``to_grid`` densifies into a :class:`StarGrid` at any ``k0``."""

    counts: np.ndarray  # (C,) int32 candidates per cell
    slots: np.ndarray  # (P, 8) float64 candidate slots, CSR order
    n_rings: int
    n_cols: int
    n_stars: int
    psf_width: float
    radius: float
    k0: int = DEFAULT_K0

    @property
    def n_cells(self) -> int:
        return self.counts.shape[0]

    def to_grid(self, dtype=jnp.float32, device: bool = True,
                k0: Optional[int] = None) -> StarGrid:
        """Materialise the dense two-level device tables."""
        k0 = self.k0 if k0 is None else int(k0)
        counts = self.counts.astype(np.int64)
        c = self.n_cells
        k_max = int(counts.max()) if c and counts.size else 0
        k0e = max(1, min(k0, max(k_max, 1)))

        base = np.zeros((c, k0e, _ROW), np.float64)
        base[..., 0:3] = _SENTINEL_POS
        base[..., 3] = _SENTINEL_MAG
        base[..., 4:7] = 0.0
        base[..., 7] = 0.0

        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        p = int(counts.sum())
        cells = np.repeat(np.arange(c, dtype=np.int64), counts)
        slot = np.arange(p, dtype=np.int64) - starts[cells]

        bm = slot < k0e
        base[cells[bm], slot[bm], :] = self.slots[bm]
        base[cells[bm], slot[bm], 7] = 0.0  # aux field is not star data

        k1 = max(0, k_max - k0e)
        if k1 == 0:
            ovf = np.zeros((1, 1, _ROW), np.float64)
            ovf[..., 0:3] = _SENTINEL_POS
            ovf[..., 3] = _SENTINEL_MAG
        else:
            ovf_cells = np.flatnonzero(counts > k0e)
            n_ovf = len(ovf_cells)
            if n_ovf + 1 >= (1 << 24):
                raise ValueError(
                    f"{n_ovf} overflow cells cannot be pointer-encoded in "
                    f"float32 — raise k0 or cell_size"
                )
            ovf = np.zeros((n_ovf + 1, k1, _ROW), np.float64)
            ovf[..., 0:3] = _SENTINEL_POS
            ovf[..., 3] = _SENTINEL_MAG
            row_of_cell = np.zeros(c, np.int64)
            row_of_cell[ovf_cells] = 1 + np.arange(n_ovf)
            om = ~bm
            ovf[row_of_cell[cells[om]], slot[om] - k0e, :] = self.slots[om]
            # Overflow pointer lives in the base row's aux field: row+0 is
            # the dummy, so 0 means "none". Exact in f32 up to 2^24.
            base[:, 0, 7] = row_of_cell

        if device:
            dt = jnp.dtype(dtype)
            cd, od = jnp.asarray(base, dt), jnp.asarray(ovf, dt)
        else:
            dt = np.dtype(dtype)
            cd, od = base.astype(dt), ovf.astype(dt)
        return StarGrid(
            cell_data=cd,
            ovf_data=od,
            n_rings=int(self.n_rings),
            n_cols=int(self.n_cols),
            n_stars=int(self.n_stars),
            psf_width=float(self.psf_width),
            radius=float(self.radius),
        )


def _insertion_pairs(catalog: Catalog, cell_size: float, r: float):
    """(cells, stars) insertion pairs: each star enters every cell whose
    radius-expanded region contains it, so queries touch exactly one cell.
    Fully vectorised (the variable azimuthal halo is expanded with a
    repeat/offset trick rather than a loop over offsets)."""
    n_rings = max(1, int(np.ceil(np.pi / cell_size)))
    ncol = max(1, int(np.ceil(2 * np.pi / cell_size)))  # fixed per ring
    delta = np.pi / n_rings

    pos = np.asarray(catalog.pos, np.float64)
    s = pos.shape[0]
    if s == 0:
        z = np.zeros(0, np.int64)
        return z, z, n_rings, ncol

    z = np.clip(pos[:, 2], -1.0, 1.0)
    dec = np.arcsin(z)
    ra = np.mod(np.arctan2(pos[:, 1], pos[:, 0]), 2 * np.pi)

    # Insertion halo: the query radius is *chordal*; converting to angular
    # distance and cell overlap needs a small safety margin.
    rh = 1.01 * r

    # Rings whose dec-range expanded by rh contains the star.
    ring_lo = np.clip(
        np.floor((dec - rh + np.pi / 2) / delta).astype(np.int64), 0, n_rings - 1
    )
    ring_hi = np.clip(
        np.floor((dec + rh + np.pi / 2) / delta).astype(np.int64), 0, n_rings - 1
    )

    # Expand (star, ring) pairs.
    n_ring = ring_hi - ring_lo + 1
    sr_star = np.repeat(np.arange(s, dtype=np.int64), n_ring)
    sr_first = np.repeat(np.cumsum(n_ring) - n_ring, n_ring)
    sr_ring = ring_lo[sr_star] + (np.arange(len(sr_star)) - sr_first)

    # Azimuthal halo: chordal radius r subtends RA width r / cos(dec) at the
    # ring's extreme declination (cos smallest there).
    edge_lo = -np.pi / 2 + delta * sr_ring
    edge_hi = edge_lo + delta
    min_cos = np.minimum(np.cos(edge_lo), np.cos(edge_hi))
    safe_cos = np.maximum(min_cos, 1e-12)
    # Rings touching the poles: halo covers the full circle.
    dra = np.where(min_cos < rh, np.pi, 1.05 * rh / safe_cos)
    col_halo = np.ceil(dra / (2 * np.pi) * ncol).astype(np.int64)
    col_halo = np.minimum(col_halo, ncol // 2)  # full circle at most
    col0 = np.floor(ra[sr_star] / (2 * np.pi) * ncol).astype(np.int64)

    # Expand (star, ring, col) triples: offsets -halo..+halo per pair.
    n_col = 2 * col_halo + 1
    p_star = np.repeat(sr_star, n_col)
    p_ring = np.repeat(sr_ring, n_col)
    p_first = np.repeat(np.cumsum(n_col) - n_col, n_col)
    offs = (np.arange(len(p_star)) - p_first) - np.repeat(col_halo, n_col)
    p_col = np.mod(np.repeat(col0, n_col) + offs, ncol)

    cells = p_ring * ncol + p_col
    stars = p_star
    # Deduplicate (a star can enter the same wrapped column twice).
    uniq = np.unique(cells * np.int64(s) + stars)
    cells, stars = uniq // s, uniq % s
    order = np.argsort(cells, kind="stable")
    return cells[order], stars[order], n_rings, ncol


def build_star_grid_compact(
    catalog: Catalog,
    *,
    cell_size: float = DEFAULT_CELL_SIZE,
    k0: int = DEFAULT_K0,
    psf_width: float = PSF_WIDTH,
    radius: Optional[float] = None,
) -> CompactStarGrid:
    """Offline bucket build (the ``generate-tree`` analogue, StarMap.hs:90-91).

    Each star is inserted into every cell whose (radius-expanded) region it
    falls in, so queries touch exactly one cell. ``cell_size`` is the ring
    height in radians; it must exceed ``2×radius`` (default 2·3·psf_width).
    ``k0`` picks the base-table slot count — excess candidates of dense
    cells go to the overflow table.
    """
    r = QUERY_RADIUS if radius is None else float(radius)
    r = float(max(r, 3.0 * psf_width))
    if cell_size <= 2 * r:
        raise ValueError(f"cell_size {cell_size} must exceed 2×query radius {r}")

    cells, stars, n_rings, ncol = _insertion_pairs(catalog, cell_size, r)
    n_cells = n_rings * ncol
    counts = np.bincount(cells, minlength=n_cells).astype(np.int32)

    slots = np.zeros((len(cells), _ROW), np.float64)
    if len(cells):
        slots[:, 0:3] = np.asarray(catalog.pos, np.float64)[stars]
        slots[:, 3] = np.asarray(catalog.mag, np.float64)[stars]
        slots[:, 4:7] = rgb_basis(catalog.hue, catalog.sat)[stars]

    return CompactStarGrid(
        counts=counts,
        slots=slots,
        n_rings=n_rings,
        n_cols=ncol,
        n_stars=int(catalog.pos.shape[0]),
        psf_width=float(psf_width),
        radius=r,
        k0=int(k0),
    )


def build_star_grid(
    catalog: Catalog,
    *,
    cell_size: float = DEFAULT_CELL_SIZE,
    k0: int = DEFAULT_K0,
    psf_width: float = PSF_WIDTH,
    radius: Optional[float] = None,
    dtype=jnp.float32,
    device: bool = True,
) -> StarGrid:
    """Build and densify in one step (see :func:`build_star_grid_compact`).

    ``device=False`` keeps the tables as host numpy arrays (full float64
    even without jax_enable_x64) — the offline build/serialise path needs no
    device transfer, and jnp.asarray would silently downcast f64 to f32.
    """
    compact = build_star_grid_compact(
        catalog, cell_size=cell_size, k0=k0, psf_width=psf_width, radius=radius
    )
    return compact.to_grid(dtype=dtype, device=device)


def save_star_grid(grid, path: str) -> str:
    """Serialise to ``.npz`` (the ``stars.kdt`` analogue); returns the path
    actually written (np.savez appends the suffix but np.load would not, so
    the name is normalised here). Accepts a :class:`CompactStarGrid` (the
    offline-build product) or a dense :class:`StarGrid` (reconstructed to
    compact form first). Slot values are stored float64."""
    if isinstance(grid, StarGrid):
        grid = _dense_to_compact(grid)
    if not path.endswith(".npz"):
        path = path + ".npz"
    np.savez_compressed(
        path,
        version=_FORMAT_VERSION,
        counts=grid.counts.astype(np.int32),
        slots=np.asarray(grid.slots, np.float64),
        n_rings=grid.n_rings,
        n_cols=grid.n_cols,
        n_stars=grid.n_stars,
        psf_width=grid.psf_width,
        radius=grid.radius,
        k0=grid.k0,
    )
    return path


def _dense_to_compact(grid: StarGrid) -> CompactStarGrid:
    """Recover the CSR form from dense tables (sentinels are unambiguous:
    a real candidate always has mag ≪ 1e9)."""
    base = np.asarray(grid.cell_data, np.float64)
    ovf = np.asarray(grid.ovf_data, np.float64)
    c, k0 = base.shape[0], base.shape[1]
    ptr = base[:, 0, 7].astype(np.int64)
    base = base.copy()
    base[:, 0, 7] = 0.0

    bvalid = base[..., 3] < _SENTINEL_MAG / 2  # (C, K0)
    counts = bvalid.sum(axis=1).astype(np.int64)
    rows = [base[bvalid]]
    cell_of = [np.repeat(np.arange(c), counts)]
    slot_of = [np.concatenate([np.arange(k) for k in counts]) if c else
               np.zeros(0, np.int64)]
    if grid.has_overflow:
        ovalid = ovf[..., 3] < _SENTINEL_MAG / 2
        ocounts_row = ovalid.sum(axis=1).astype(np.int64)
        has = ptr > 0
        ocells = np.flatnonzero(has)
        ocounts = np.zeros(c, np.int64)
        ocounts[ocells] = ocounts_row[ptr[ocells]]
        rows.append(ovf[ptr[ocells]][ovalid[ptr[ocells]]])
        cell_of.append(np.repeat(ocells, ocounts[ocells]))
        slot_of.append(
            k0 + (np.concatenate([np.arange(k) for k in ocounts[ocells]])
                  if len(ocells) else np.zeros(0, np.int64))
        )
        counts = counts + ocounts
    rows = np.concatenate(rows)
    cell_of = np.concatenate(cell_of)
    slot_of = np.concatenate(slot_of)
    order = np.lexsort((slot_of, cell_of))
    return CompactStarGrid(
        counts=counts.astype(np.int32),
        slots=rows[order],
        n_rings=grid.n_rings,
        n_cols=grid.n_cols,
        n_stars=grid.n_stars,
        psf_width=grid.psf_width,
        radius=grid.radius,
        k0=k0,
    )


def load_star_grid_compact(path: str) -> CompactStarGrid:
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"
    z = np.load(path)
    if int(z["version"]) != _FORMAT_VERSION:
        raise ValueError(
            f"unsupported star-grid format version {int(z['version'])} "
            f"(expected {_FORMAT_VERSION}; rebuild with generate-grid)"
        )
    return CompactStarGrid(
        counts=z["counts"],
        slots=z["slots"],
        n_rings=int(z["n_rings"]),
        n_cols=int(z["n_cols"]),
        n_stars=int(z["n_stars"]),
        psf_width=float(z["psf_width"]),
        radius=float(z["radius"]),
        k0=int(z["k0"]),
    )


def load_star_grid(path: str, dtype=jnp.float32,
                   k0: Optional[int] = None) -> StarGrid:
    return load_star_grid_compact(path).to_grid(dtype=dtype, k0=k0)

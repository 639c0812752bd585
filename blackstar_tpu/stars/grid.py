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

* ``cell_data`` (C, K0·8): the first K0 candidate slots of every cell —
  small fixed rows sized for the *typical* cell, gathered once per ray (or
  once per 4-ray group in :meth:`StarGrid.lookup_grouped`);
* ``ovf_data`` (R, K1·8): the excess slots of the few dense cells
  (galactic band, clusters); row 0 is an all-sentinel dummy. A cell's
  overflow row index is packed into slot 0's aux field, so discovering it
  costs no extra gather. Overflow (and grouped-lookup fallback) work is
  compacted at block granularity and processed pay-as-you-go by a
  ``while_loop`` over just the flagged blocks — exact for every input,
  cost proportional to the actual dense coverage. See DESIGN.md §3 for
  the measured TPU cost model behind each choice.

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

_FORMAT_VERSION = 6
_ROW = 8  # floats per candidate slot: x y z mag H_r H_g H_b aux
_SENTINEL_POS = 9.0
_SENTINEL_MAG = 1e9
DEFAULT_K0 = 8  # base slots/cell: 256 B rows (the gather sweet spot)
DEFAULT_CELL_SIZE = 0.008
# Rays per group in lookup_grouped. 4 is the measured sweet spot on the
# default scene: at 8 the strong-lensing belt (where adjacent escape
# directions diverge beyond the build margin) covers ~20% of rays and blows
# every per-chunk fallback capacity; at 4 the validity offset halves and
# the belt shrinks to a few percent.
GROUP = 4

# ---- fast cell ids ---------------------------------------------------------
#
# XLA's arcsin/arctan2 (full range reduction, ~1e-16 accuracy) measured
# ~6 ms/frame of the grouped star stage on v5e — and dominate the per-ray
# invalid fallback. Exactness does NOT require exact cell assignment: the
# build halo guarantees every star within `radius` (chordal) of a cell's box
# is in its candidate list, so a lookup through ANY cell whose box is within
# `margin = radius − 3w` of the ray is exact (DESIGN.md §3). Exact ids give
# distance 0; ids computed from an approximate (dec, ra) with angular error
# ≤ ε only ever assign a box within ε of the ray. The approximations below
# have a PROVEN bound (gated by tests/test_stars.py::test_fast_cell_id_bound
# over dense+adversarial f32 sweeps):
#
#   * asin: Abramowitz–Stegun 4.4.45 sqrt-weighted cubic, |err| ≤ 6.8e-5
#   * atan2: octant-folded odd minimax polynomial (7 even terms),
#     |err| ≤ 5e-7 + f32 rounding
#
# Total assignment error ≤ _FAST_CELL_ERR (dec error + ra error·cos(dec) +
# f32 evaluation noise, measured ≤ 9e-5; bound kept 2× above measurement).
# The fast path is enabled only when margin ≥ _FAST_CELL_MIN_MARGIN and the
# compute dtype carries ≥ f32 precision; small-margin grids keep the exact
# transcendentals (their per-ray path relies on distance-0 assignment).
_FAST_CELL_ERR = 2.0e-4
_FAST_CELL_MIN_MARGIN = 15.0 * _FAST_CELL_ERR  # 3e-3; production margin 6e-3

# A&S 4.4.45 coefficients (|asin err| ≤ 6.8e-5 on [0, 1]).
_ASIN_C = (1.5707288, -0.2121144, 0.0742610, -0.0187293)
# Chebyshev-fit atan(t)/t in t² on [0, 1], |err| ≤ 5e-7 (lowest order first).
_ATAN_C = (0.99999933, -0.33326375, 0.19879872, -0.13480406,
           0.08374156, -0.03689863, 0.00782548)


def _fast_asin(z):
    """asin with |error| ≤ 6.8e-5 rad and no transcendental lowering
    (A&S 4.4.45): asin(x) = π/2 − √(1−x)·(a₀+a₁x+a₂x²+a₃x³) on [0,1],
    odd-extended by sign."""
    az = jnp.abs(z)
    a0, a1, a2, a3 = _ASIN_C
    p = a0 + az * (a1 + az * (a2 + az * a3))
    r = jnp.pi / 2 - jnp.sqrt(jnp.maximum(1.0 - az, 0.0)) * p
    return jnp.where(z < 0, -r, r)


def _fast_ra(ny, nx):
    """atan2(ny, nx) folded into [0, 2π), |error| ≤ ~1e-6 rad: octant
    reduction (one divide) + odd minimax polynomial on [0, 1]."""
    dt = nx.dtype
    ax = jnp.abs(nx)
    ay = jnp.abs(ny)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, jnp.asarray(1e-30, dt))
    u = t * t
    c = _ATAN_C
    p = c[6]
    for k in (5, 4, 3, 2, 1, 0):
        p = c[k] + u * p
    a = t * p  # atan in [0, π/4]
    a = jnp.where(ay > ax, jnp.pi / 2 - a, a)
    a = jnp.where(nx < 0, jnp.pi - a, a)
    return jnp.where(ny < 0, 2.0 * jnp.pi - a, a)


def _guard(ok, fast_val, slow_fn, differentiable: bool):
    """``fast_val`` if ``ok`` else ``slow_fn()``, with the slow branch
    guaranteed NOT to execute when ``ok``.

    ``lax.cond`` can be lowered to predicated both-branch execution on TPU
    (measured: the rarely-taken exact-fallback branches were costing more
    than the whole fast path); a 0-or-1-trip ``while_loop`` cannot be
    predicated. ``while_loop`` is not reverse-mode differentiable, so the
    differentiable path keeps the (slower but transposable) ``cond``.
    """
    if differentiable:
        return jax.lax.cond(ok, lambda _: fast_val, lambda _: slow_fn(), None)

    def cond_fn(carry):
        return ~carry[0]

    def body_fn(carry):
        return jnp.asarray(True), slow_fn()

    return jax.lax.while_loop(cond_fn, body_fn, (ok, fast_val))[1]


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

    # Tables are stored 2-D — (C, K0·8) and (R, K1·8) — NOT (C, K0, 8):
    # gathering through a (C, K, 8).reshape(C, -1) inside jit measured 13×
    # slower on TPU (the minor-dim-8 layout forces a relayout of the whole
    # table); the true 2-D layout gathers at ~9 ns/row.
    cell_data: jax.Array  # (C, K0·8) base candidate slots, sentinel-padded
    ovf_data: jax.Array  # (R, K1·8) overflow slots; row 0 = dummy
    # (R,) int32 — used 8-slot octets per overflow row (0 for the dummy).
    # K1 is sized by the DENSEST cell (galactic-band cores) but the median
    # overflow cell uses ~2 of its octets; forward paths bound their octet
    # scan by the max over each gathered batch, which is exact (slots past
    # the used prefix are sentinels) and — because compaction batches are
    # image-coherent — usually far below K1/8.
    ovf_octets: jax.Array
    # Static metadata.
    n_rings: int = dataclasses.field(metadata=dict(static=True))
    n_cols: int = dataclasses.field(metadata=dict(static=True))
    n_stars: int = dataclasses.field(metadata=dict(static=True))
    psf_width: float = dataclasses.field(metadata=dict(static=True))
    radius: float = dataclasses.field(metadata=dict(static=True))
    # Optional SECOND overflow tier (``to_grid(ovf_split=...)``): the first
    # ``ovf_split`` octets of every overflow cell stay in the (narrow)
    # ``ovf_data`` rows; the rare deeper cells chain into ``ovf2_data``
    # through a pointer packed in base slot 1's aux field. Measured on the
    # production artifact (470k stars, k0=32, K1=10 octets): the median
    # overflow row uses 2 of 10 octets, so single-tier rows gather 2560 B
    # each where ~512 B are live; at ovf_split=4 the gathered overflow
    # bytes halve and the tier-2 pass touches only ~3% of group blocks
    # (vs ~23% for tier 1 on the default 1080p framing).
    ovf2_data: Optional[jax.Array] = None  # (R2, K2·8); row 0 = dummy
    ovf2_octets: Optional[jax.Array] = None  # (R2,) int32
    # Tiny per-ring / per-column trig tables (attached by ``to_grid`` for
    # f32/f64 grids) — replace the grouped validity stage's per-group
    # cos/sin/arcsin center math with two small-table row gathers (small
    # tables gather ~3× faster than big ones; sweep_gather.py). Computed in
    # float64 offline, so MORE accurate than the runtime transcendentals
    # they replace. ring_table (n_rings, 8):
    #   [sin dec_c, cos dec_c, usable₀², sin dec₊, cos dec₊, sin dec₋,
    #    cos dec₋, usable±²]
    # where dec± = dec_c ± δ/4 are the centers of the two half-box balls of
    # the 3-ball validity test and usable² the squared chordal admit radii
    # (0.99·margin + inscribed radius, same slack family as the inline
    # form). col_table (n_cols, 2): [cos ra_c, sin ra_c].
    ring_table: Optional[jax.Array] = None
    col_table: Optional[jax.Array] = None

    @property
    def pad_k(self) -> int:
        return self.cell_data.shape[1] // _ROW

    @property
    def has_overflow(self) -> bool:
        return self.ovf_data.shape[0] > 1

    @property
    def has_ovf2(self) -> bool:
        return self.ovf2_data is not None and self.ovf2_data.shape[0] > 1

    def _ovf_tiers(self):
        """(table, used-octets, base-row pointer column) per overflow tier.
        Every lookup path processes the tiers identically — tier 2 just has
        far rarer flags, so its compacted pass is near-free."""
        tiers = []
        if self.has_overflow:
            tiers.append((self.ovf_data, self.ovf_octets, 7))
        if self.has_ovf2:
            tiers.append((self.ovf2_data, self.ovf2_octets, _ROW + 7))
        return tiers

    @property
    def margin(self) -> float:
        """Build halo beyond the query radius: how far a ray direction may
        sit from its gathered cell while its whole query disk is still
        covered. > 0 enables :meth:`lookup_grouped`."""
        return max(0.0, self.radius - 3.0 * self.psf_width)

    @property
    def dtype(self):
        return self.cell_data.dtype

    def astype(self, dtype) -> "StarGrid":
        dt = jnp.dtype(dtype)
        # Overflow-row POINTERS are float-encoded in the slot-1 aux columns
        # of cell_data: they stay exact only while the target mantissa can
        # represent every row index. bf16/f16 would silently corrupt them
        # and mis-gather overflow rows — refuse instead.
        max_ptr = max(self.ovf_data.shape[0],
                      0 if self.ovf2_data is None else self.ovf2_data.shape[0])
        mant = jnp.finfo(dt).nmant + 1  # implicit leading bit
        if max_ptr > (1 << mant):
            raise ValueError(
                f"cannot cast StarGrid to {dt}: overflow-row pointers up to "
                f"{max_ptr} need {max_ptr.bit_length()} mantissa bits, "
                f"{dt} has {mant}"
            )
        # Trig tables stay at (at least) f32: their values feed the validity
        # soundness argument, which half precision cannot carry — the
        # half-dtype grouped path falls back to the inline transcendental
        # form when the tables are absent.
        tdt = dt if jnp.finfo(dt).nmant >= 23 else None
        return dataclasses.replace(
            self,
            cell_data=self.cell_data.astype(dt),
            ovf_data=self.ovf_data.astype(dt),
            ovf2_data=(None if self.ovf2_data is None
                       else self.ovf2_data.astype(dt)),
            ring_table=(None if self.ring_table is None or tdt is None
                        else self.ring_table.astype(tdt)),
            col_table=(None if self.col_table is None or tdt is None
                       else self.col_table.astype(tdt)),
        )

    def nbytes(self) -> int:
        n = self.cell_data.nbytes + self.ovf_data.nbytes
        if self.ovf2_data is not None:
            n += self.ovf2_data.nbytes
        for t in (self.ring_table, self.col_table):
            if t is not None:
                n += t.nbytes
        return n

    def cell_ids(self, nvel: jnp.ndarray) -> jnp.ndarray:
        """Bucket id for unit directions (N, 3)."""
        return self._cell_ids_comp(nvel[..., 0], nvel[..., 1], nvel[..., 2])

    def _fast_cells_ok(self, dt) -> bool:
        """Whether the bounded-error fast cell ids keep lookups exact: the
        build margin must absorb the assignment error (see the module note
        above :func:`_fast_asin`) and the dtype must carry f32 precision."""
        return (self.margin >= _FAST_CELL_MIN_MARGIN
                and jnp.finfo(dt).nmant >= 23)

    def _cell_ids_comp(self, nx, ny, nz) -> jnp.ndarray:
        """Bucket id from unit-direction component planes: declination ring,
        then azimuthal column — pure arithmetic on the equirect layout."""
        dt = nx.dtype
        two_pi = 2.0 * jnp.pi
        delta = jnp.asarray(jnp.pi / self.n_rings, dt)
        if self._fast_cells_ok(dt):
            dec = _fast_asin(jnp.clip(nz, -1.0, 1.0))
            ra = _fast_ra(ny, nx)
        else:
            dec = jnp.arcsin(jnp.clip(nz, -1.0, 1.0))
            ra = jnp.arctan2(ny, nx) % two_pi
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

    # ---- columnized candidate math -------------------------------------
    #
    # The natural (rays, slots, 8) formulation is a TPU layout disaster:
    # minor dims of 8/3 waste ~16× of both memory bandwidth and vector
    # lanes (measured: 23 ms/frame @1080p for K0=8 — more than the gather
    # itself). These helpers keep every intermediate a flat (M,) or (g, M)
    # array (lane dim = rays) by slicing *columns* out of the gathered 2-D
    # rows, unrolling the slot loop.

    def _slot_math(self, rows2d, s0, s_count, planes, intensity, saturation,
                   accs):
        """Accumulate candidate RGB for slots [s0, s0+s_count) of gathered
        rows. ``rows2d``: (M, W) with W >= (s0+s_count)·8. ``planes``: a
        list of (rx, ry, rz) unit-direction planes, each (M,) — a group of
        g rays sharing each gathered row is passed as g separate planes so
        EVERY intermediate is a flat (M,) array (full vector lanes; the
        natural (M, g) broadcast form wastes 16× of the VPU on minor-dim-g
        padding — measured 22 ms/frame at 1080p vs ~2 for this form).
        ``accs``: matching list of (ar, ag, ab) accumulators. Exact
        ``starLookup`` per-star math (StarMap.hs:93-114); the
        difference-first d² keeps full precision at d ~ w in float32
        (2−2·s·v would cancel catastrophically).

        **Gradient mode** (the hand-derived star-stage VJP, stars/diff.py):
        a 6-tuple plane ``(rx, ry, rz, wr, wg, wb)`` — rays plus the
        incoming per-channel cotangents of the UNCLAMPED sums — selects the
        reverse-mode math instead: the matching accumulator is a 5-tuple
        ``(gx, gy, gz, gI, gS)`` of ∂L/∂(ray direction components) and the
        per-ray partials w.r.t. starIntensity / starSaturation. The
        formulas mirror jax.grad of the forward exactly, including the
        0.5 tie-split of ``min(1, e)`` at e == 1 (lax.min's JVP) — gated by
        tests/test_star_diff.py against jax.grad of the autodiff path."""
        dt = rows2d.dtype
        w = jnp.asarray(self.psf_width, dt)
        r2lim = (3.0 * w) ** 2
        a = jnp.log(jnp.asarray(2.0, dt)) / DYNAMIC
        inv2w2 = 1.0 / (2.0 * w * w)
        # 2-D (M, g) ray arrays broadcast each row's columns over the
        # trailing in-group axis. ONLY viable inside the octet scan — the
        # fully unrolled broadcast form splits into per-channel fusions
        # that re-read the rows (measured 5× slower).
        if planes[0][0].ndim == 2:
            cv = lambda v: v[:, None]
        else:
            cv = lambda v: v
        out = list(accs)
        for k in range(s0, s0 + s_count):
            sx = cv(rows2d[:, k * _ROW + 0])
            sy = cv(rows2d[:, k * _ROW + 1])
            sz = cv(rows2d[:, k * _ROW + 2])
            logb0 = cv(a * (MAX_BRIGHTNESS - rows2d[:, k * _ROW + 3]))
            hr = cv(rows2d[:, k * _ROW + 4])
            hg = cv(rows2d[:, k * _ROW + 5])
            hb = cv(rows2d[:, k * _ROW + 6])
            cr = 1.0 + saturation * hr
            cg = 1.0 + saturation * hg
            cb = 1.0 + saturation * hb
            for j, plane in enumerate(planes):
                rx, ry, rz = plane[:3]
                dx = sx - rx
                dy = sy - ry
                dz = sz - rz
                d2 = dx * dx + dy * dy + dz * dz
                within = d2 <= r2lim
                # Outside the 3w cutoff the contribution is exactly 0 (the
                # reference's inRadius pre-filter) — sentinels (pos 9.0
                # and/or mag 1e9) die here too.
                e = jnp.exp(jnp.where(within, logb0 - d2 * inv2w2, -jnp.inf))
                u = jnp.minimum(1.0, e)
                if len(plane) == 3:
                    val = u * intensity
                    ar, ag, ab = out[j]
                    out[j] = (ar + val * cr, ag + val * cg, ab + val * cb)
                    continue
                # Reverse sweep: out_c += I·u·c_c with u = min(1, e),
                # e = exp(logb0 − d²/(2w²)) (0 outside the cutoff),
                # c_c = 1 + sat·H_c, d² = |ray − star|².
                wr, wg, wb = plane[3:]
                cw = wr * cr + wg * cg + wb * cb  # Σ_c w̄_c·c_c = ∂L/∂(I·u)
                hw = wr * hr + wg * hg + wb * hb  # Σ_c w̄_c·H_c
                # du/de: 1 below the cap, 0 above, 0.5 at an exact tie
                # (lax.min's balanced JVP — measure-zero but mirrored so the
                # jax.grad equality gate is watertight).
                due = jnp.where(e < 1.0, 1.0,
                                jnp.where(e == 1.0, 0.5, 0.0))
                # ∂L/∂d² = I·cw·(du/de)·e·(−1/(2w²)); ∂d²/∂r_i = −2·d_i.
                gd2 = (intensity * cw) * (due * e) * (-inv2w2)
                gx, gy, gz, gi, gs = out[j]
                out[j] = (
                    gx - 2.0 * gd2 * dx,
                    gy - 2.0 * gd2 * dy,
                    gz - 2.0 * gd2 * dz,
                    gi + u * cw,
                    gs + (u * intensity) * hw,
                )
        return out

    def _octet_math(self, rows2d, planes, intensity, saturation, accs,
                    max_oct=None):
        """Like :meth:`_slot_math` over ALL slots of ``rows2d``, but in
        8-slot chunks via a ``fori_loop`` + aligned ``dynamic_slice`` so
        (a) wide rows don't unroll into huge programs and (b) XLA emits ONE
        pass over the gathered rows per iteration — the fully-unrolled form
        was split into ~7 fusions each re-reading the whole row buffer at
        10 GiB/s (profiled), and a scan over a pre-transposed copy paid a
        full layout copy of the buffer instead. Slot count must be a
        multiple of 8 (the overflow table is padded so).

        ``max_oct`` (traced int32, forward-only — a dynamic trip count has
        no VJP) stops the scan after the batch's last USED octet: slots
        past a row's used prefix are sentinels, so truncation is exact."""
        m, width = rows2d.shape
        n_oct = width // (8 * _ROW)
        if n_oct * 8 * _ROW != width:
            raise ValueError(f"row width {width} not a multiple of 64")
        # Unrolling is only safe for a SINGLE octet: at ≥2 octets XLA splits
        # the unrolled form into per-channel fusions that each re-read the
        # whole row buffer (measured 5×; a 16-slot unroll cost 80 ms/frame).
        if n_oct <= 1:
            return self._slot_math(
                rows2d, 0, width // _ROW, planes, intensity, saturation, accs
            )

        def body(k, carry):
            blk = jax.lax.dynamic_slice_in_dim(rows2d, k * 8 * _ROW, 8 * _ROW, 1)
            return self._slot_math(blk, 0, 8, planes, intensity, saturation,
                                   carry)

        hi = n_oct if max_oct is None else jnp.minimum(
            jnp.asarray(max_oct, jnp.int32), n_oct
        )
        return jax.lax.fori_loop(0, hi, body, [tuple(a) for a in accs])

    @staticmethod
    def _oct_bound(octs, optr, differentiable: bool):
        """Max used-octet count over a batch of overflow pointers (into the
        given tier's ``octs`` array) — the dynamic scan bound for
        :meth:`_octet_math`. None on the AD path (a traced trip count is
        not reverse-mode differentiable)."""
        if differentiable:
            return None
        return jnp.max(octs[optr])

    def _batched_blocks(self, dt, bf, pos, block, body_fn, per_unit,
                        batch_blocks, n_bufs=3, skip_if_empty=False):
        """Pay-as-you-go block compaction: process only the flagged blocks,
        in ``batch_blocks``-sized while_loop batches, and merge results back
        with a block-row gather. Cost scales with the ACTUAL flagged count
        (a fixed capacity would bill every chunk for the worst one), and
        results are exact for every input — no capacity to blow, no guard.

        ``bf``: (nb,) block flags; ``pos``: cumsum(bf)−1; ``block``: units
        per block; ``body_fn(flat_unit_ids) -> n_bufs × (len·per_unit,)``
        channel values (unit-major). Returns n_bufs × (nb·block·per_unit,)
        adds, zero outside flagged blocks. Not reverse-mode differentiable
        (the while_loop) — callers keep a capacity-based variant for AD.

        ``skip_if_empty``: wrap the whole apparatus (nonzero, buffers,
        batch loop, merge gathers) in a 0/1-trip guard on ``any(bf)``.
        Measured r4c on v5e: the apparatus costs ~9 ms/frame at ZERO
        flagged blocks (materialisation boundaries in the chunk pipeline),
        and the invalid-fallback flags are belt-localised — most chunks
        have none — so their pass guards; the overflow flags cover most
        chunks (galactic band), so that pass doesn't bother.
        """
        nb = bf.shape[0]
        b = min(batch_blocks, nb)
        nb_pad = -(-nb // b) * b
        width = block * per_unit

        def run():
            bsel = jnp.nonzero(bf, size=nb_pad, fill_value=nb - 1)[0]
            n_used = jnp.sum(bf)
            bufs = tuple(
                jnp.zeros((nb_pad * width,), dt) for _ in range(n_bufs)
            )

            def cond_fn(c):
                return c[0] * b < n_used

            def body(c):
                i, bufs = c
                blks = jax.lax.dynamic_slice_in_dim(bsel, i * b, b)
                uids = (blks[:, None] * block + jnp.arange(block)).reshape(-1)
                vals = body_fn(uids)
                bufs = tuple(
                    jax.lax.dynamic_update_slice(bf_, v, (i * b * width,))
                    for bf_, v in zip(bufs, vals)
                )
                return (i + 1, bufs)

            _, bufs = jax.lax.while_loop(cond_fn, body, (jnp.int32(0), bufs))

            def merge(buf):
                rows = buf.reshape(nb_pad, width)[jnp.minimum(pos, nb_pad - 1)]
                return jnp.where(bf[:, None], rows, 0.0).reshape(-1)

            return tuple(merge(buf) for buf in bufs)

        if not skip_if_empty:
            return run()
        zeros = tuple(jnp.zeros((nb * width,), dt) for _ in range(n_bufs))
        return _guard(~jnp.any(bf), zeros, run, differentiable=False)

    def _base_math(self, rows2d, planes, intensity, saturation, accs):
        """Candidate math over the base table's K0 slots: unrolled when
        narrow, octet-scanned when wide (fusion-splitting avoidance)."""
        if self.pad_k % 8 == 0 and self.pad_k > 8:
            return self._octet_math(rows2d, planes, intensity, saturation, accs)
        return self._slot_math(
            rows2d, 0, self.pad_k, planes, intensity, saturation, accs
        )

    def _per_ray_rgb(self, nx, ny, nz, intensity, saturation,
                     ovf_block: int = 8, ovf_frac: float = 0.5,
                     differentiable: bool = False, mask=None, wcols=None):
        """Unclamped per-ray RGB accumulators (ar, ag, ab) for unit
        direction planes — own-cell base row plus its overflow row. Used on
        (already compacted) subsets; the overflow gather is block-compacted
        once more (most fallback rays are in the lensing belt, not the
        galactic band), with an exact full-width guarded fallback.

        ``mask`` (optional, (m,) bool): rays whose result the caller will
        DISCARD (block-granular billing admits ~5× more rays than are
        invalid on the production frame). Masked-off rays are steered to
        cell 0 / overflow row 0 — one repeatedly-gathered (cached) row
        instead of ~3.5 KB of unique table bytes each — and drop out of
        the batch octet bound. Their outputs are garbage by design.

        ``wcols`` (optional, 3-tuple of (m,) cotangents): gradient mode —
        returns the 5-tuple ``(gx, gy, gz, gI, gS)`` per-ray partials
        instead (see :meth:`_slot_math`)."""
        dt = nx.dtype
        m = nx.shape[0]
        cell = self._cell_ids_comp(nx, ny, nz)
        if mask is not None:
            cell = jnp.where(mask, cell, 0)
        # Pointers are read from the RAW gathered rows (grid dtype) before
        # the cast to the ray dtype: a low-mantissa ray dtype (bf16/f16)
        # would silently round pointer values and mis-gather overflow rows.
        raw = self.cell_data[cell]
        row = raw.astype(dt)
        pl = (nx, ny, nz) if wcols is None else (nx, ny, nz, *wcols)
        nch = 3 if wcols is None else 5  # fwd RGB / grad channel count
        z = jnp.zeros((m,), dt)
        [acc] = self._base_math(
            row, [pl], intensity, saturation, [(z,) * nch]
        )
        for tbl, octs, pcol in self._ovf_tiers():
            optr = raw[:, pcol].astype(jnp.int32)
            if mask is not None:
                # Cell 0 may itself carry overflow; discarded rays must not
                # drag its (or any) row depth into the batch octet bound.
                optr = jnp.where(mask, optr, 0)
            if not ovf_block or m % ovf_block or m < 8 * ovf_block:
                # Full-width overflow row per ray (row 0 = all-sentinel dummy).
                orow = tbl[optr].astype(dt)
                [acc] = self._octet_math(
                    orow, [pl], intensity, saturation, [acc],
                    max_oct=self._oct_bound(octs, optr, differentiable),
                )
                continue
            has = optr > 0
            nb = m // ovf_block
            bf = has.reshape(nb, ovf_block).any(axis=1)
            mb = max(1, int(nb * ovf_frac))
            sel = jnp.nonzero(bf, size=mb, fill_value=nb)[0]
            pos = jnp.minimum(jnp.cumsum(bf) - 1, mb - 1)
            ridx = (
                jnp.minimum(sel, nb - 1)[:, None] * ovf_block
                + jnp.arange(ovf_block)
            ).reshape(-1)
            orow = tbl[optr[ridx]].astype(dt)
            zm = jnp.zeros((ridx.shape[0],), dt)
            [sub] = self._octet_math(
                orow, [tuple(c[ridx] for c in pl)], intensity, saturation,
                [(zm,) * nch],
                max_oct=self._oct_bound(octs, optr[ridx], differentiable),
            )

            def merge(acc_p, sub_p, bf=bf, pos=pos, mb=mb):
                blk = sub_p.reshape(mb, ovf_block)[pos]
                return acc_p + jnp.where(bf[:, None], blk, 0.0).reshape(m)

            fast_val = tuple(merge(a_, s_) for a_, s_ in zip(acc, sub))

            def slow(tbl=tbl, octs=octs, optr=optr, acc=acc):
                orow_all = tbl[optr].astype(dt)
                [r] = self._octet_math(
                    orow_all, [pl], intensity, saturation, [acc],
                    max_oct=self._oct_bound(octs, optr, differentiable),
                )
                return tuple(r)

            acc = _guard(jnp.sum(bf) <= mb, fast_val, slow, differentiable)
        return acc

    def lookup(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
        chunk: int = 1 << 17,
        ovf_capacity: float = 0.25,
        differentiable: bool = False,
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
            step = lambda args: self._lookup_block(
                args[0], intensity, saturation, args[1],
                ovf_capacity=ovf_capacity, differentiable=differentiable,
            )
            if differentiable:
                # Rematerialise each chunk in the backward: AD of the
                # chunked map otherwise stores every chunk's octet-scan
                # residuals (gathered candidate rows per iteration) — at
                # 1080p that is tens of GB and OOMs the compile (r4,
                # DESIGN.md §5). Recompute-in-backward keeps the residuals
                # at one chunk's inputs.
                step = jax.checkpoint(step)
            out = jax.lax.map(step, (velp, act))
            return out.reshape(n_pad, 3)[:n]
        return self._lookup_block(
            vel, intensity, saturation, active, ovf_capacity=ovf_capacity,
            differentiable=differentiable,
        )

    def _lookup_block(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
        ovf_capacity: float = 0.25,
        ray_block: int = 32,
        differentiable: bool = False,
    ) -> jnp.ndarray:
        dt = vel.dtype
        n = vel.shape[0]
        if self.n_stars == 0:
            return jnp.zeros((n, 3), dt)

        if active is not None:
            # Dead lanes get a harmless probe direction.
            vel = jnp.where(active[:, None], vel, jnp.ones((), dt))
        vx, vy, vz = vel[:, 0], vel[:, 1], vel[:, 2]
        inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        nx, ny, nz = vx * inv, vy * inv, vz * inv
        cell = self._cell_ids_comp(nx, ny, nz)

        # ONE contiguous-row gather per ray from the 2-D (C, K0·8) table.
        raw = self.cell_data[cell]  # grid dtype — pointer columns stay exact
        data = raw.astype(dt)  # (n, K0·8)
        intensity = intensity.astype(dt)
        saturation = saturation.astype(dt)
        z = jnp.zeros((n,), dt)
        [(ar, ag, ab)] = self._base_math(
            data, [(nx, ny, nz)], intensity, saturation, [(z, z, z)]
        )

        for tbl, octs, pcol in self._ovf_tiers():
            rowid = raw[:, pcol].astype(jnp.int32)  # base-row aux; 0 = none
            has = rowid > 0
            if active is not None:
                has = has & active
            if n % ray_block or n < 8 * ray_block:
                # Tiny/ragged block: just gather a second row for every ray
                # (row 0 is the all-sentinel dummy).
                orow = tbl[rowid].astype(dt)
                [(ar, ag, ab)] = self._octet_math(
                    orow, [(nx, ny, nz)], intensity, saturation,
                    [(ar, ag, ab)],
                    max_oct=self._oct_bound(octs, rowid, differentiable),
                )
            else:
                # Block-granular compaction: per-element jnp.nonzero /
                # scatter on 2M rays are sort-based and cost ~20 ms EACH on
                # TPU (measured), so flags are reduced to ray_block-sized
                # blocks, the few flagged blocks are compacted with a tiny
                # nonzero, and results come back via a block-row *gather*
                # (no scatter anywhere).
                nb = n // ray_block
                bf = has.reshape(nb, ray_block).any(axis=1)
                mb = max(1, int(nb * ovf_capacity))
                sel = jnp.nonzero(bf, size=mb, fill_value=nb)[0]
                pos = jnp.minimum(jnp.cumsum(bf) - 1, mb - 1)
                ridx = (
                    jnp.minimum(sel, nb - 1)[:, None] * ray_block
                    + jnp.arange(ray_block)
                ).reshape(-1)
                orow = tbl[rowid[ridx]].astype(dt)
                zm = jnp.zeros((ridx.shape[0],), dt)
                [sub] = self._octet_math(
                    orow, [(nx[ridx], ny[ridx], nz[ridx])],
                    intensity, saturation, [(zm, zm, zm)],
                    max_oct=self._oct_bound(octs, rowid[ridx], differentiable),
                )

                def merge(acc_p, sub_p, bf=bf, pos=pos, mb=mb):
                    blk = sub_p.reshape(mb, ray_block)[pos]  # (nb, rb)
                    blk = jnp.where(bf[:, None], blk, 0.0)
                    return acc_p + blk.reshape(n)

                fast_val = tuple(
                    merge(a_, s_) for a_, s_ in zip((ar, ag, ab), sub)
                )

                def slow(tbl=tbl, octs=octs, rowid=rowid, acc=(ar, ag, ab)):
                    # Capacity exceeded (dense galactic-band framing):
                    # exact full-width second gather for every ray.
                    orow_all = tbl[rowid].astype(dt)
                    [r] = self._octet_math(
                        orow_all, [(nx, ny, nz)], intensity, saturation,
                        [acc],
                        max_oct=self._oct_bound(octs, rowid, differentiable),
                    )
                    return tuple(r)

                ar, ag, ab = _guard(
                    jnp.sum(bf) <= mb, fast_val, slow, differentiable
                )

        out = jnp.minimum(jnp.stack([ar, ag, ab], axis=-1), 1.0)
        if active is not None:
            out = jnp.where(active[:, None], out, jnp.zeros((), dt))
        return out

    # ---- grouped lookup (the production full-frame path) ----------------

    def lookup_grouped(
        self,
        vel: jnp.ndarray,
        intensity: jnp.ndarray,
        saturation: jnp.ndarray,
        active: Optional[jnp.ndarray] = None,
        chunk: int = 1 << 17,
        group: int = GROUP,
        ray_block: int = 32,
        group_block: int = 4,
        invalid_frac: float = 0.25,
        ovf_frac: float = 0.5,
        ovf_batch_blocks: int = 512,
        inv_batch_blocks: int = 256,
        inv_ovf_block: int = 0,
        inv_mask_steer: bool = False,
        row_pitch: Optional[int] = None,
        row_bands: int = 2,
        differentiable: bool = False,
        debug_stages=None,
        wplanes=None,
        clamp: bool = True,
    ) -> jnp.ndarray:
        """Celestial-sphere colour with ONE table gather per ``group``
        consecutive rays instead of per ray.

        ``wplanes`` (a 3-tuple of (n,) per-channel cotangents of the
        UNCLAMPED sums) runs the hand-derived reverse sweep instead —
        same production schedule, returns the 5-tuple of (n,) gradient
        channel flats ``(gx, gy, gz, gI, gS)`` w.r.t. the NORMALISED ray
        directions and the intensity/saturation scalars (unreduced).
        ``clamp=False`` returns raw unclamped sums with no active mask.
        Both serve the custom-vjp star stage (stars/diff.py).

        Requires a grid built with ``radius > 3·psf_width`` (a *group
        margin*): the halo guarantees that any ray within
        ``margin`` (chordal) of the gathered cell's representative
        direction has its whole query disk covered by that cell's candidate
        list. Rays that fail this test (lensing-divergent groups, wide-fov
        frames) are recomputed exactly through the per-ray path, compacted
        at ``ray_block`` granularity; if a compaction capacity is exceeded,
        a ``lax.cond`` falls back to the exact ungrouped lookup for the
        whole chunk — results are exact for EVERY input, grouping only
        changes the schedule.

        ``row_pitch`` (the image width, for rays in row-major pixel order)
        enables the ``row_bands``×``group`` *row-band* schedule: groups are
        formed from ``group`` consecutive pixels of ``row_bands`` adjacent
        image rows, so one gathered cell row serves ``row_bands·group``
        rays — 1/``row_bands`` of the per-group work for a modestly larger
        group spread (a 2×4 pixel block has a 1.58 px circumradius, 4×4 has
        2.12 px, vs 1.5 px for a 1×4 run). Forward-only; ignored when it
        doesn't tile the input.
        """
        n = vel.shape[0]
        dt = vel.dtype
        if wplanes is not None or not clamp:
            if self.margin <= 0.0:
                raise ValueError(
                    "the custom-vjp star stage needs a group margin "
                    "(grid built with radius > 3·psf_width)"
                )
            if self.n_stars == 0:
                z = jnp.zeros((n,), dt)
                return (z,) * 5 if wplanes is not None \
                    else jnp.zeros((n, 3), dt)
        if self.margin <= 0.0:
            return self.lookup(vel, intensity, saturation, active,
                               chunk=chunk, differentiable=differentiable)
        if self.n_stars == 0:
            return jnp.zeros((n, 3), dt)
        # Padding alignment: each part's group count must tile by BOTH block
        # granularities — the overflow compaction (group_block) and the
        # invalid compaction (ray_block // rays-per-group, for the banded
        # and unbanded part shapes). An lcm, not a max: non-power-of-two
        # knob values otherwise crash in the block reshapes.
        import math

        gpb1 = max(1, ray_block // group)
        gpbp = max(1, ray_block // (max(1, int(row_bands)) * group))
        align = group * math.lcm(group_block, gpb1, gpbp)
        kw = dict(
            group=group, ray_block=ray_block, group_block=group_block,
            invalid_frac=invalid_frac, ovf_frac=ovf_frac,
            ovf_batch_blocks=ovf_batch_blocks,
            inv_batch_blocks=inv_batch_blocks,
            inv_ovf_block=inv_ovf_block, inv_mask_steer=inv_mask_steer,
            differentiable=differentiable, debug_stages=debug_stages,
            clamp=clamp,
        )
        vx, vy, vz = vel[:, 0], vel[:, 1], vel[:, 2]
        p = int(row_bands)
        use_bands = (
            row_pitch is not None
            and row_pitch > 0
            and p > 1
            and not differentiable
            and n % (p * row_pitch) == 0
            and n // p >= align
        )
        if use_bands:
            hp = n // (p * row_pitch)

            def split(v):
                v2 = v.reshape(hp, p, row_pitch)
                return [v2[:, i, :].reshape(-1) for i in range(p)]

            px, py, pz = split(vx), split(vy), split(vz)
            acts = split(active) if active is not None else [None] * p
            parts = [(px[i], py[i], pz[i]) for i in range(p)]
            wparts = None
            if wplanes is not None:
                ws = [split(w) for w in wplanes]
                wparts = [tuple(ws[c][i] for c in range(3))
                          for i in range(p)]
            outs = self._run_parts(
                parts, list(acts), intensity, saturation,
                chunk=max(align, chunk // p // align * align),
                align=align, kw=kw, wparts=wparts,
            )
            if wplanes is not None:
                # Re-interleave each gradient channel's band parts back
                # into flat ray order.
                return tuple(
                    jnp.stack([outs[i][c].reshape(hp, row_pitch)
                               for i in range(p)], axis=1).reshape(n)
                    for c in range(5)
                )
            return jnp.stack(
                [o.reshape(hp, row_pitch, 3) for o in outs], axis=1
            ).reshape(n, 3)
        [out] = self._run_parts(
            [(vx, vy, vz)], [active], intensity, saturation,
            chunk=chunk, align=align, kw=kw,
            wparts=None if wplanes is None else [tuple(wplanes)],
        )
        return out

    def _norm_views(self, parts, actives, g):
        """Normalised (G, g) component views of each part's rays — free
        row-major reshapes of the flat ray order; dead lanes get a harmless
        probe direction. Shared by the grouped core and the frame-level
        invalid pass (bitwise-identical op sequences ⇒ identical values)."""
        dt = parts[0][0].dtype
        n_groups = parts[0][0].shape[0] // g
        nx4s, ny4s, nz4s = [], [], []
        for (vx, vy, vz), act in zip(parts, actives):
            if act is not None:
                one = jnp.ones((), dt)
                vx = jnp.where(act, vx, one)
                vy = jnp.where(act, vy, one)
                vz = jnp.where(act, vz, one)
            inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
            nx4s.append((vx * inv).reshape(n_groups, g))
            ny4s.append((vy * inv).reshape(n_groups, g))
            nz4s.append((vz * inv).reshape(n_groups, g))
        return nx4s, ny4s, nz4s

    def _run_parts(self, parts, actives, intensity, saturation, *,
                   chunk, align, kw, wparts=None):
        """Pad each part to ``align``, split into at most ``chunk``-ray
        ``lax.map`` chunks, and run :meth:`_grouped_parts`. Returns per-part
        (n, 3) colours — or, with ``wparts`` (per-part cotangent 3-tuples,
        the reverse star sweep), per-part 5-tuples of (n,) gradient
        channel flats. Cotangents pad with ZEROS (padding lanes must not
        contribute to the parameter partials).

        Negative result (r4e, v5e): hoisting the invalid fallback OUT of
        the chunk map to run once per frame — motivated by its ~9 ms
        apparatus floor at zero flagged blocks — measured 43.4 vs 38.2
        ms/frame in-chunk: the full-frame sum/mask buffers materialised
        across the map boundary plus the frame-level re-normalisation cost
        more than the 16× apparatus they saved. The machinery was removed
        (same precedent as the r2 Z-order permutation); see DESIGN.md §3."""
        dt = parts[0][0].dtype
        n = parts[0][0].shape[0]
        # Every lax.map chunk must itself satisfy the block alignment.
        chunk = max(align, chunk // align * align)
        n_pad = -(-n // align) * align
        if n_pad > chunk:
            n_pad = -(-n // chunk) * chunk
        if n_pad != n:
            pad = n_pad - n
            one = jnp.ones((pad,), dt)
            parts = [tuple(jnp.concatenate([v, one]) for v in p)
                     for p in parts]
            if wparts is not None:
                zw = jnp.zeros((pad,), dt)
                wparts = [tuple(jnp.concatenate([w, zw]) for w in wp)
                          for wp in wparts]
            actives = [
                jnp.concatenate([a, jnp.zeros((pad,), bool)])
                if a is not None
                else jnp.ones((n_pad,), bool).at[n:].set(False)
                for a in actives
            ]
        if n_pad > chunk:
            flat = [v.reshape(-1, chunk) for p in parts for v in p]
            acts = [
                a.reshape(-1, chunk)
                if a is not None
                else jnp.ones((n_pad // chunk, chunk), bool)
                for a in actives
            ]
            wflat = ([] if wparts is None else
                     [w.reshape(-1, chunk) for wp in wparts for w in wp])
            n_parts = len(parts)

            def step(a):
                ps = [tuple(a[3 * p + c] for c in range(3))
                      for p in range(n_parts)]
                acts_ = list(a[3 * n_parts:4 * n_parts])
                wb = 4 * n_parts
                wps = (None if wparts is None else
                       [tuple(a[wb + 3 * p + c] for c in range(3))
                        for p in range(n_parts)])
                outs = self._grouped_parts(
                    ps, acts_, intensity, saturation, wplanes=wps, **kw
                )
                return tuple(outs)

            if kw.get("differentiable"):
                # See ``lookup``: without per-chunk remat the backward
                # stores every chunk's octet-scan residuals and OOMs at
                # production ray counts.
                step = jax.checkpoint(step)
            outs = jax.lax.map(step, (*flat, *acts, *wflat))

            def reasm(o):
                if isinstance(o, tuple):
                    return tuple(reasm(c) for c in o)
                return o.reshape((n_pad,) + o.shape[2:])[:n]

            return [reasm(o) for o in outs]
        outs = self._grouped_parts(parts, actives, intensity, saturation,
                                   wplanes=wparts, **kw)

        def cut(o):
            if isinstance(o, tuple):
                return tuple(cut(c) for c in o)
            return o[:n]

        return [cut(o) for o in outs]

    def _invalid_fallback(self, chTs, inv_rays, nx4s, ny4s, nz4s, intensity,
                          saturation, *, g, gt, ray_block, inv_batch_blocks,
                          inv_ovf_block, inv_mask_steer, dt, w4s=None):
        """Exact per-ray recompute of the invalid (lensing-belt) rays,
        while-batched at (ray_block//gt)-group block granularity; returns
        ``chTs`` with invalid lanes replaced. Forward-only (the while_loop
        has no VJP) — the reverse star sweep (stars/diff.py) reuses it
        INSIDE its custom-vjp backward with ``w4s`` set (per-part 3-tuples
        of (G, g) cotangent views), where the lanes become the 5 gradient
        channels of :meth:`_slot_math`.

        Body notes (all r4-measured, DESIGN.md §3): block billing admits
        ~5× more rays than are invalid and the merge discards the extras —
        ``inv_mask_steer`` steers those to one row (flat on v5e: identical-
        row gathers don't dedupe, default off); ``inv_ovf_block`` block-
        compacts the overflow gather (nested machinery loses, default 0 =
        full-width rows)."""
        n_parts = len(nx4s)
        n_groups = nx4s[0].shape[0]
        n = n_groups * g
        nch = 3 if w4s is None else 5
        gpb = max(1, ray_block // gt)  # groups per block
        nbr = n_groups // gpb
        inv_any = inv_rays[0].any(axis=1)
        for ir in inv_rays[1:]:
            inv_any = inv_any | ir.any(axis=1)
        ibf = inv_any.reshape(nbr, gpb).any(axis=1)
        ipos = jnp.cumsum(ibf) - 1

        def inv_body(gsel):
            # Row-gather the (G, g) ray views, flatten (small), recompute
            # per ray against its OWN cell. All parts share ONE
            # _per_ray_rgb call; the part split of the result is a cheap
            # major-axis slice of a small array.
            fxs = [nx4s[p][gsel].reshape(-1) for p in range(n_parts)]
            fys = [ny4s[p][gsel].reshape(-1) for p in range(n_parts)]
            fzs = [nz4s[p][gsel].reshape(-1) for p in range(n_parts)]
            fms = [inv_rays[p][gsel].reshape(-1) for p in range(n_parts)]
            m1 = fxs[0].shape[0]
            cat = (lambda vs: jnp.concatenate(vs)) if n_parts > 1 \
                else (lambda vs: vs[0])
            facc = self._per_ray_rgb(
                cat(fxs), cat(fys), cat(fzs),
                intensity, saturation,
                ovf_block=inv_ovf_block,
                mask=(cat(fms) if inv_mask_steer else None),
                wcols=None if w4s is None else tuple(
                    cat([w4s[p][c][gsel].reshape(-1)
                         for p in range(n_parts)])
                    for c in range(3)
                ),
            )
            return tuple(
                c[p * m1:(p + 1) * m1]
                for p in range(n_parts) for c in facc
            )

        flat_f = self._batched_blocks(
            dt, ibf, ipos, gpb, inv_body, per_unit=g, n_bufs=nch * n_parts,
            batch_blocks=inv_batch_blocks, skip_if_empty=True,
        )
        inv_flats = [ir.reshape(n) for ir in inv_rays]
        return [
            tuple(
                jnp.where(inv_flats[p], flat_f[nch * p + c], chTs[p][c])
                for c in range(nch)
            )
            for p in range(n_parts)
        ]

    def _grouped_parts(
        self, parts, actives, intensity, saturation, *,
        group, ray_block, group_block, invalid_frac, ovf_frac,
        ovf_batch_blocks=512, inv_batch_blocks=256, inv_ovf_block=0,
        inv_mask_steer=False, defer_invalid=False,
        differentiable=False, debug_stages=None,
        wplanes=None, clamp=True,
    ):
        """Grouped-lookup core over one or more ray *parts*.

        ``parts`` is a list of ``(vx, vy, vz)`` flat component planes, all
        the same length n; group i is formed from rays [i·g, (i+1)·g) of
        EVERY part, so one gathered cell row serves ``len(parts)·group``
        rays. The single-part case is the classic 1×g consecutive-pixel
        group; the row-band schedule (:meth:`lookup_grouped`) passes the
        p adjacent image rows of a p×g pixel block as p parts — same
        per-ray math, 1/p of the per-group work (gather, cell ids,
        validity, flags), and a modestly larger group spread (2×4 blocks
        have a 1.58 px circumradius, 4×4 have 2.12 px, vs 1.5 px for 1×4
        runs). Returns a list of per-part
        (n, 3) colours. The differentiable path (capacity-based compaction
        + cond guards) supports a single part only.

        ``wplanes`` (per-part 3-tuples of (n,) cotangent flats) switches to
        the reverse star sweep (stars/diff.py): the SAME schedule —
        gathers, validity, pay-as-you-go overflow/invalid machinery — runs
        the 5-channel gradient math of :meth:`_slot_math` and returns, per
        part, the 5 unreduced channel flats ``(gx, gy, gz, gI, gS)``.
        ``clamp=False`` returns the raw unclamped/unmasked sums (the
        custom-vjp forward — clamp and active mask live outside it).
        """
        # debug_stages: None = everything (production); else a set drawn
        # from {"validity", "ovf", "ovf2", "invalid", "guard"} for perf
        # isolation (results are NOT exact when stages are dropped).
        on = (lambda s: True) if debug_stages is None else debug_stages.__contains__
        n_parts = len(parts)
        if differentiable and n_parts != 1:
            raise ValueError("multi-part grouped lookup is forward-only")
        if wplanes is not None and differentiable:
            raise ValueError(
                "the gradient sweep runs inside a custom-vjp backward and "
                "uses the production (while-batched) machinery"
            )
        nch = 3 if wplanes is None else 5
        dt = parts[0][0].dtype
        n = parts[0][0].shape[0]
        g = group
        gt = n_parts * g  # rays served per gathered row
        n_groups = n // g
        intensity = intensity.astype(dt)
        saturation = saturation.astype(dt)

        # (G, g)-shaped ray views (:meth:`_norm_views`) — free row-major
        # reshapes of the flat ray order. Math broadcasts each gathered
        # row's columns over the trailing in-group axis inside the octet
        # scan; the representative direction is the (normalised) mean over
        # ALL the group's rays — a minor-axis reduce, ~10× cheaper than a
        # strided every-g-th slice on TPU (any deinterleaving of flat
        # arrays measured ~2 GB/s).
        nx4s, ny4s, nz4s = self._norm_views(parts, actives, g)
        repx = repy = repz = 0.0
        for p in range(n_parts):
            repx = repx + nx4s[p].mean(axis=-1)
            repy = repy + ny4s[p].mean(axis=-1)
            repz = repz + nz4s[p].mean(axis=-1)
        rinv = jax.lax.rsqrt(repx * repx + repy * repy + repz * repz)
        # A degenerate (near-zero) mean yields NaN/garbage cell ids; the
        # validity test then fails those rays into the exact per-ray
        # fallback, so correctness is unaffected.
        repcell = self._cell_ids_comp(repx * rinv, repy * rinv, repz * rinv)

        braw = self.cell_data[repcell]  # (G, K0·8) — THE gather
        base = braw.astype(dt)  # pointer columns read from braw (exactness)

        # Validity metadata: the build halo guarantees every star within
        # `margin` (chordal) of the CELL BOX is in the cell's candidate
        # list, so a ray is covered iff dist(ray, box) ≤ margin. Testing
        # against the box's inscribed ball (center c0, radius r_in) admits
        # every ray with |ray − c0| ≤ margin + r_in — ~2× more than testing
        # against the representative point alone. With the precomputed trig
        # tables the test upgrades to THREE balls (center + the two dec-
        # half-box balls — boxes are never wider than tall on the equirect
        # layout, so dec is the long axis): strictly more admitted rays at
        # ~2 extra subtract/dot tests per ray, zero transcendentals, and
        # two tiny-table row gathers instead of five cos/sin per group.
        pm_balls = None
        if self.ring_table is not None:
            rrow = self.ring_table[repcell // self.n_cols].astype(dt)
            crow = self.col_table[repcell % self.n_cols].astype(dt)
            cra, sra = crow[:, 0], crow[:, 1]
            cx, cy, cz = rrow[:, 1] * cra, rrow[:, 1] * sra, rrow[:, 0]
            usable2 = rrow[:, 2]
            u2_pm = rrow[:, 7]
            pm_balls = [
                (rrow[:, 4] * cra, rrow[:, 4] * sra, rrow[:, 3], u2_pm),
                (rrow[:, 6] * cra, rrow[:, 6] * sra, rrow[:, 5], u2_pm),
            ]
        else:
            delta = jnp.asarray(jnp.pi / self.n_rings, dt)
            ring = (repcell // self.n_cols).astype(dt)
            col = (repcell % self.n_cols).astype(dt)
            dec_c = -jnp.pi / 2 + (ring + 0.5) * delta
            ra_c = (col + 0.5) * (2.0 * jnp.pi / self.n_cols)
            cos_dec = jnp.cos(dec_c)
            cx = cos_dec * jnp.cos(ra_c)
            cy = cos_dec * jnp.sin(ra_c)
            cz = jnp.sin(dec_c)
            # Inscribed radius: half the smaller box extent (ring height δ,
            # or the column arc shrunk by cos at the ring's far edge), with
            # slack for the chordal-vs-angular approximations.
            cos_edge = jnp.minimum(
                jnp.abs(jnp.cos(dec_c - 0.5 * delta)),
                jnp.abs(jnp.cos(dec_c + 0.5 * delta)),
            )
            col_w = (2.0 * jnp.pi / self.n_cols) * cos_edge
            r_in = 0.45 * jnp.minimum(delta, col_w)
            usable = jnp.asarray(self.margin * 0.99, dt) + r_in  # (G,)
            usable2 = usable * usable

        # NOTE: a fused Pallas kernel for this base math was built and
        # measured in round 2 (group→lane expansion via one-hot MXU
        # matmuls) — it LOST on both axes: the MXU truncates f32 operands
        # to bf16 (fatal at PSF scales: d² needs ~1e-7 of resolution), and
        # the ~k0·7 small matmuls ran slower than the XLA broadcast-scan
        # form (70 vs 49 ms/frame). Removed; see DESIGN.md §3.
        zg = jnp.zeros((n_groups, g), dt)
        w4s = None
        if wplanes is None:
            planes = [(nx4s[p], ny4s[p], nz4s[p]) for p in range(n_parts)]
        else:
            # (G, g) cotangent views — free row-major reshapes, like the
            # ray views (w is zero on inactive/clamped lanes by the outer
            # where/min VJPs, so no extra masking is needed anywhere).
            w4s = [tuple(w.reshape(n_groups, g) for w in wplanes[p])
                   for p in range(n_parts)]
            planes = [(nx4s[p], ny4s[p], nz4s[p]) + w4s[p]
                      for p in range(n_parts)]
        accs = self._base_math(
            base, planes, intensity, saturation,
            [(zg,) * nch for _ in range(n_parts)],
        )

        valids = []
        for p in range(n_parts):
            dxr = nx4s[p] - cx[:, None]
            dyr = ny4s[p] - cy[:, None]
            dzr = nz4s[p] - cz[:, None]
            ok = (dxr * dxr + dyr * dyr + dzr * dzr
                  <= usable2[:, None])
            if pm_balls is not None:
                for bx, by, bz, bu2 in pm_balls:
                    dxb = nx4s[p] - bx[:, None]
                    dyb = ny4s[p] - by[:, None]
                    dzb = nz4s[p] - bz[:, None]
                    ok = ok | (dxb * dxb + dyb * dyb + dzb * dzb
                               <= bu2[:, None])
            valids.append(ok)  # (G, g) per part

        # Overflow of the rep cell, block-compacted over GROUPS — one pass
        # per tier (tier 2, when present, has ~7× rarer flags; see the
        # ``ovf2_data`` field note).
        ovf_ok = jnp.asarray(True)
        for tier_i, (tbl, octs, pcol) in enumerate(self._ovf_tiers()):
            if not on("ovf" if tier_i == 0 else "ovf2"):
                continue
            optr = braw[:, pcol].astype(jnp.int32)  # (G,)
            hasg = optr > 0
            nbg = n_groups // group_block
            obf = hasg.reshape(nbg, group_block).any(axis=1)
            opos = jnp.cumsum(obf) - 1

            def ovf_body(gsel, tbl=tbl, octs=octs, optr=optr):
                # gsel: flat group ids — their overflow RGB per ray. Ray
                # extraction is a ROW gather of the (G, g) views (element
                # gathers on flat arrays run at ~2 GB/s on TPU). Returns
                # nch·n_parts flats, part-major — separate buffers per part
                # keep every downstream merge a contiguous row gather.
                orow = tbl[optr[gsel]].astype(dt)
                rays = [tuple(v[gsel] for v in planes[p])
                        for p in range(n_parts)]
                zo = jnp.zeros((gsel.shape[0], g), dt)
                outs = self._octet_math(
                    orow, rays, intensity, saturation,
                    [(zo,) * nch for _ in range(n_parts)],
                    max_oct=self._oct_bound(octs, optr[gsel], differentiable),
                )
                return tuple(
                    c.reshape(-1) for part in outs for c in part
                )

            if not differentiable:
                # Pay-as-you-go: a while_loop processes only the flagged
                # blocks in fixed-size batches — cost scales with the
                # actual overflow coverage, results are exact for every
                # input (no capacity to blow).
                flat_adds = self._batched_blocks(
                    dt, obf, opos, group_block, ovf_body, per_unit=g,
                    batch_blocks=ovf_batch_blocks, n_bufs=nch * n_parts,
                )
                part_adds = [flat_adds[nch * p:nch * p + nch]
                             for p in range(n_parts)]
            else:
                mbg = max(1, int(nbg * ovf_frac))
                osel = jnp.nonzero(obf, size=mbg, fill_value=nbg)[0]
                gsel = (
                    jnp.minimum(osel, nbg - 1)[:, None] * group_block
                    + jnp.arange(group_block)
                ).reshape(-1)
                vals = ovf_body(gsel)  # ((mbg·gb·g,),)×3 ray-ordered
                pos_c = jnp.minimum(opos, mbg - 1)
                row_w = group_block * g

                def merge(vc, obf=obf, pos_c=pos_c, mbg=mbg, row_w=row_w):
                    sel_rows = vc.reshape(mbg, row_w)[pos_c]  # (nbg, gb·g)
                    return jnp.where(obf[:, None], sel_rows, 0.0).reshape(-1)

                add = tuple(merge(v) for v in vals)
                part_adds = [add]
                ovf_ok = ovf_ok & (jnp.sum(obf) <= mbg)

            # Each part's adds are per-RAY ordered (n,).
            accs = [
                tuple(a + pa.reshape(n_groups, g)
                      for a, pa in zip(acc, part_adds[p]))
                for p, acc in enumerate(accs)
            ]

        inv_rays = []
        for p, act in enumerate(actives):
            ir = ~valids[p]  # (G, g)
            if act is not None:
                ir = ir & act.reshape(n_groups, g)
            inv_rays.append(ir)

        chTs = [
            tuple(c.reshape(n) for c in acc) for acc in accs
        ]  # per part: (arT, agT, abT)
        inv_flats = [ir.reshape(n) for ir in inv_rays]

        inv_ok = jnp.asarray(True)
        if on("invalid"):
            if not differentiable:
                chTs = self._invalid_fallback(
                    chTs, inv_rays, nx4s, ny4s, nz4s, intensity, saturation,
                    g=g, gt=gt, ray_block=ray_block,
                    inv_batch_blocks=inv_batch_blocks,
                    inv_ovf_block=inv_ovf_block,
                    inv_mask_steer=inv_mask_steer, dt=dt, w4s=w4s,
                )
            else:
                gpb = max(1, ray_block // gt)  # groups per block
                nbr = n_groups // gpb
                inv_any = inv_rays[0].any(axis=1)
                for ir in inv_rays[1:]:
                    inv_any = inv_any | ir.any(axis=1)
                ibf = inv_any.reshape(nbr, gpb).any(axis=1)
                ipos = jnp.cumsum(ibf) - 1

                def inv_body(gsel):
                    fxs = [nx4s[p][gsel].reshape(-1)
                           for p in range(n_parts)]
                    fys = [ny4s[p][gsel].reshape(-1)
                           for p in range(n_parts)]
                    fzs = [nz4s[p][gsel].reshape(-1)
                           for p in range(n_parts)]
                    m1 = fxs[0].shape[0]
                    facc = self._per_ray_rgb(
                        jnp.concatenate(fxs) if n_parts > 1 else fxs[0],
                        jnp.concatenate(fys) if n_parts > 1 else fys[0],
                        jnp.concatenate(fzs) if n_parts > 1 else fzs[0],
                        intensity, saturation, ovf_block=8,
                        differentiable=True,
                    )
                    return tuple(
                        c[p * m1:(p + 1) * m1]
                        for p in range(n_parts) for c in facc
                    )

                mbr = max(1, int(nbr * invalid_frac))
                isel = jnp.nonzero(ibf, size=mbr, fill_value=nbr)[0]
                ipos_c = jnp.minimum(ipos, mbr - 1)
                gsel = (
                    jnp.minimum(isel, nbr - 1)[:, None] * gpb
                    + jnp.arange(gpb)
                ).reshape(-1)  # (mbr·gpb,) group ids
                facc = inv_body(gsel)
                inv_ok = jnp.sum(ibf) <= mbr
                row_w = gpb * g
                inv_flat = inv_flats[0]

                def imerge(grouped_p, fp):
                    blk = fp.reshape(mbr, row_w)[ipos_c]  # (nbr, gpb·g)
                    merged = jnp.where(ibf[:, None], blk, 0.0).reshape(n)
                    return jnp.where(inv_flat, merged, grouped_p)

                chTs = [tuple(
                    imerge(chTs[0][c], facc[c]) for c in range(3)
                )]

        if wplanes is not None:
            # Reverse sweep: unreduced per-ray gradient channel flats. No
            # clamp/active handling — those are outside the custom-vjp
            # boundary, already folded into the incoming cotangents.
            return [tuple(chTs[p]) for p in range(n_parts)]
        if not clamp:
            # Custom-vjp forward: raw unclamped sums (clamp + active mask
            # applied by autodiff-visible ops outside the wrapper).
            return [jnp.stack(list(chTs[p]), axis=-1) for p in range(n_parts)]

        outs = []
        for p, act in enumerate(actives):
            out_p = jnp.minimum(jnp.stack(list(chTs[p]), axis=-1), 1.0)
            if act is not None:
                out_p = jnp.where(act[:, None], out_p, jnp.zeros((), dt))
            outs.append(out_p)

        if not differentiable or not on("guard"):
            # The batched paths are exact by construction — no guard needed.
            return outs

        # Differentiable path: a blown compaction capacity falls back to
        # the ungrouped exact path for the whole block.
        vx, vy, vz = parts[0]
        active = actives[0]

        def slow():
            vel3 = jnp.stack([vx, vy, vz], axis=-1)
            return self._lookup_block(
                vel3, intensity, saturation, active,
                differentiable=differentiable,
            )

        return [_guard(ovf_ok & inv_ok, outs[0], slow, differentiable)]


def _trig_tables(n_rings: int, n_cols: int, margin: float):
    """Float64 per-ring / per-column trig tables for the grouped validity
    stage (see the ``StarGrid.ring_table`` field note).

    The admit radii keep the inline form's slack family: a chordal ball of
    radius 0.45·min(angular extents) sits inside the angular box (0.45 vs
    0.5 absorbs the chordal-vs-angular conversion), and the ± half-box
    balls at dec_c ± δ/4 use the worst column arc over their own dec
    band — so "within usable of a center" still implies "query disk covered
    by the cell's candidate list"."""
    delta = np.pi / n_rings
    ring = np.arange(n_rings, dtype=np.float64)
    dec_c = -np.pi / 2 + (ring + 0.5) * delta
    col_arc = 2.0 * np.pi / n_cols

    def col_w(lo, hi):
        return col_arc * np.minimum(np.abs(np.cos(lo)), np.abs(np.cos(hi)))

    r_in0 = 0.45 * np.minimum(delta,
                              col_w(dec_c - 0.5 * delta, dec_c + 0.5 * delta))
    r_p = 0.45 * np.minimum(0.5 * delta, col_w(dec_c, dec_c + 0.5 * delta))
    r_m = 0.45 * np.minimum(0.5 * delta, col_w(dec_c - 0.5 * delta, dec_c))
    u0 = 0.99 * margin + r_in0
    u_pm = 0.99 * margin + np.minimum(r_p, r_m)
    dec_p = dec_c + 0.25 * delta
    dec_m = dec_c - 0.25 * delta
    ring_table = np.stack(
        [np.sin(dec_c), np.cos(dec_c), u0 * u0,
         np.sin(dec_p), np.cos(dec_p), np.sin(dec_m), np.cos(dec_m),
         u_pm * u_pm],
        axis=1,
    )
    ra_c = (np.arange(n_cols, dtype=np.float64) + 0.5) * col_arc
    col_table = np.stack([np.cos(ra_c), np.sin(ra_c)], axis=1)
    return ring_table, col_table


@dataclass
class CompactStarGrid:
    """Host-side CSR form of the grid: per-cell candidate counts plus
    star ids into a deduplicated (S, 8) slot-row table (a star inserted
    into many halo cells stores its 8 floats once). This is what gets
    serialised (~30× smaller than the padded device tables) and what
    ``to_grid`` densifies into a :class:`StarGrid` at any ``k0``."""

    counts: np.ndarray  # (C,) int32 candidates per cell
    star_ids: np.ndarray  # (P,) int32/int64 into star_rows, CSR order
    star_rows: np.ndarray  # (S, 8) float64 per-star slot rows
    n_rings: int
    n_cols: int
    n_stars: int
    psf_width: float
    radius: float
    k0: int = DEFAULT_K0

    @property
    def n_cells(self) -> int:
        return self.counts.shape[0]

    @property
    def slots(self) -> np.ndarray:
        """(P, 8) candidate slots in CSR order (materialised)."""
        return self.star_rows[self.star_ids]

    def to_grid(self, dtype=jnp.float32, device: bool = True,
                k0: Optional[int] = None,
                ovf_split: Optional[int] = None) -> StarGrid:
        """Materialise the dense two-level device tables.

        ``ovf_split`` (octets) enables the THREE-level layout: overflow
        rows keep only their first ``ovf_split`` octets; deeper cells chain
        into a second overflow table via a pointer packed in base slot 1's
        aux field. Needs ``k0 >= 2``; a no-op when no row exceeds the
        split. See the ``StarGrid.ovf2_data`` field note for the measured
        rationale."""
        if ovf_split is not None and int(ovf_split) < 1:
            raise ValueError(f"ovf_split must be >= 1 octet, got {ovf_split}")
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
        slots = self.slots

        bm = slot < k0e
        base[cells[bm], slot[bm], :] = slots[bm]
        base[cells[bm], slot[bm], 7] = 0.0  # aux field is not star data

        # Overflow rows are padded to whole octets (8 slots) so the scanned
        # lookup math needs no ragged tail.
        k1 = max(0, k_max - k0e)
        k1 = -(-k1 // 8) * 8 if k1 else 0
        ovf2 = None
        ovf2_octets = None
        if k1 == 0:
            ovf = np.zeros((1, 1, _ROW), np.float64)
            ovf[..., 0:3] = _SENTINEL_POS
            ovf[..., 3] = _SENTINEL_MAG
            ovf_octets = np.zeros(1, np.int32)
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
            ovf[row_of_cell[cells[om]], slot[om] - k0e, :] = slots[om]
            # Overflow pointer lives in the base row's aux field: row+0 is
            # the dummy, so 0 means "none". Exact in f32 up to 2^24.
            base[:, 0, 7] = row_of_cell
            ovf_octets = np.zeros(n_ovf + 1, np.int32)
            ovf_octets[1:] = -(-(counts[ovf_cells] - k0e) // 8)

            if (ovf_split is not None and k0e >= 2
                    and k1 > int(ovf_split) * 8):
                s8 = int(ovf_split) * 8  # tier-1 slots
                deep = np.flatnonzero(ovf_octets > int(ovf_split))
                n2 = len(deep)
                if n2 + 1 >= (1 << 24):
                    raise ValueError(
                        f"{n2} tier-2 overflow rows cannot be pointer-"
                        f"encoded in float32 — raise k0 or ovf_split"
                    )
                ovf2 = np.zeros((n2 + 1, k1 - s8, _ROW), np.float64)
                ovf2[..., 0:3] = _SENTINEL_POS
                ovf2[..., 3] = _SENTINEL_MAG
                ovf2[1:] = ovf[deep, s8:]
                ovf2_octets = np.zeros(n2 + 1, np.int32)
                ovf2_octets[1:] = ovf_octets[deep] - int(ovf_split)
                # Tier-2 pointer: overflow row -> tier-2 row, then packed
                # per CELL into base slot 1's aux (0 = no chain).
                t2_of_row = np.zeros(n_ovf + 1, np.int64)
                t2_of_row[deep] = 1 + np.arange(n2)
                base[:, 1, 7] = t2_of_row[row_of_cell]
                ovf = np.ascontiguousarray(ovf[:, :s8])
                ovf_octets = np.minimum(ovf_octets, np.int32(ovf_split))

        base = base.reshape(base.shape[0], -1)
        ovf = ovf.reshape(ovf.shape[0], -1)
        if ovf2 is not None:
            ovf2 = ovf2.reshape(ovf2.shape[0], -1)
        # Same pointer-exactness rule as StarGrid.astype: the float-encoded
        # overflow pointers must survive the cast (bf16/f16 would corrupt
        # them silently).
        max_ptr = max(ovf.shape[0], 0 if ovf2 is None else ovf2.shape[0])
        mant = jnp.finfo(jnp.dtype(dtype)).nmant + 1
        if max_ptr > (1 << mant):
            raise ValueError(
                f"cannot build StarGrid at {jnp.dtype(dtype)}: overflow-row "
                f"pointers up to {max_ptr} need {max_ptr.bit_length()} "
                f"mantissa bits, {jnp.dtype(dtype)} has {mant}"
            )
        margin = max(0.0, float(self.radius) - 3.0 * float(self.psf_width))
        rt = ct = None
        if jnp.finfo(jnp.dtype(dtype)).nmant >= 23:
            # Validity soundness can't ride half-precision table values —
            # half-dtype grids keep the inline transcendental form.
            tdt = np.float64 if jnp.dtype(dtype) == jnp.float64 else np.float32
            rt, ct = _trig_tables(int(self.n_rings), int(self.n_cols), margin)
            rt, ct = rt.astype(tdt), ct.astype(tdt)
        if device:
            dt = jnp.dtype(dtype)
            cd, od = jnp.asarray(base, dt), jnp.asarray(ovf, dt)
            oo = jnp.asarray(ovf_octets)
            od2 = None if ovf2 is None else jnp.asarray(ovf2, dt)
            oo2 = None if ovf2 is None else jnp.asarray(ovf2_octets)
            rt = None if rt is None else jnp.asarray(rt)
            ct = None if ct is None else jnp.asarray(ct)
        else:
            dt = np.dtype(dtype)
            cd, od = base.astype(dt), ovf.astype(dt)
            oo = ovf_octets
            od2 = None if ovf2 is None else ovf2.astype(dt)
            oo2 = ovf2_octets
        return StarGrid(
            cell_data=cd,
            ovf_data=od,
            ovf_octets=oo,
            n_rings=int(self.n_rings),
            n_cols=int(self.n_cols),
            n_stars=int(self.n_stars),
            psf_width=float(self.psf_width),
            radius=float(self.radius),
            ovf2_data=od2,
            ovf2_octets=oo2,
            ring_table=rt,
            col_table=ct,
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

    # Azimuthal halo: chordal radius r subtends RA width r / cos(dec). The
    # star can sit up to rh OUTSIDE the ring in declination (that is what
    # the ring halo above admits), where cos(dec) is smaller than at the
    # ring's own edge — take the worst cos over the rh-extended band, or
    # near-pole rays at the margin fringe silently miss candidates
    # (found by tests/test_stars.py::test_insertion_covers_radius_at_poles).
    edge_lo = -np.pi / 2 + delta * sr_ring
    edge_hi = edge_lo + delta
    ext_lo = np.maximum(edge_lo - rh, -np.pi / 2)
    ext_hi = np.minimum(edge_hi + rh, np.pi / 2)
    min_cos = np.minimum(np.cos(ext_lo), np.cos(ext_hi))
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
    height in radians. ``radius`` MAY exceed ``cell_size`` — the
    insertion-pair builder expands stars into every overlapped cell, so
    arbitrary halo/cell ratios are valid (the production artifact uses
    cell_size=0.006 with radius=0.0075).
    ``k0`` picks the base-table slot count — excess candidates of dense
    cells go to the overflow table.
    """
    r = QUERY_RADIUS if radius is None else float(radius)
    r = float(max(r, 3.0 * psf_width))
    if cell_size <= 0:
        raise ValueError(f"cell_size must be positive, got {cell_size}")
    # Note: radius MAY exceed cell_size — the insertion-pair builder handles
    # arbitrary halos (multi-ring, wrapped columns). A radius beyond
    # 3·psf_width is the *group margin* used by ``StarGrid.lookup_grouped``.

    cells, stars, n_rings, ncol = _insertion_pairs(catalog, cell_size, r)
    n_cells = n_rings * ncol
    counts = np.bincount(cells, minlength=n_cells).astype(np.int32)

    s = int(catalog.pos.shape[0])
    star_rows = np.zeros((s, _ROW), np.float64)
    if s:
        star_rows[:, 0:3] = np.asarray(catalog.pos, np.float64)
        star_rows[:, 3] = np.asarray(catalog.mag, np.float64)
        star_rows[:, 4:7] = rgb_basis(catalog.hue, catalog.sat)

    return CompactStarGrid(
        counts=counts,
        star_ids=stars.astype(np.int32 if s < (1 << 31) else np.int64),
        star_rows=star_rows,
        n_rings=n_rings,
        n_cols=ncol,
        n_stars=s,
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
    ovf_split: Optional[int] = None,
) -> StarGrid:
    """Build and densify in one step (see :func:`build_star_grid_compact`).

    ``device=False`` keeps the tables as host numpy arrays (full float64
    even without jax_enable_x64) — the offline build/serialise path needs no
    device transfer, and jnp.asarray would silently downcast f64 to f32.
    """
    compact = build_star_grid_compact(
        catalog, cell_size=cell_size, k0=k0, psf_width=psf_width, radius=radius
    )
    return compact.to_grid(dtype=dtype, device=device, ovf_split=ovf_split)


def save_star_grid(grid, path: str) -> str:
    """Serialise to ``.npz`` (the ``stars.kdt`` analogue); returns the path
    actually written (np.savez appends the suffix but np.load would not, so
    the name is normalised here). Accepts a :class:`CompactStarGrid` (the
    offline-build product) or a dense :class:`StarGrid` (reconstructed to
    compact form first). Slot values are *stored* as float64, but their
    precision is that of the grid being saved: full f64 only for compact /
    offline builds or ``device=False`` grids — a dense grid built at f32
    round-trips with f32-precision values upcast to f64."""
    if isinstance(grid, StarGrid):
        grid = _dense_to_compact(grid)
    if not path.endswith(".npz"):
        path = path + ".npz"
    # Atomic write: a ~15 s build interrupted mid-save must never leave a
    # truncated file at the final path (ensure_star_grid's existence check
    # would then satisfy forever and every np.load would fail opaquely).
    tmp = path[:-4] + ".tmp.npz"  # keep the suffix: np.savez appends it
    np.savez_compressed(
        tmp,
        version=_FORMAT_VERSION,
        counts=grid.counts.astype(np.int32),
        star_ids=grid.star_ids,
        star_rows=np.asarray(grid.star_rows, np.float64),
        n_rings=grid.n_rings,
        n_cols=grid.n_cols,
        n_stars=grid.n_stars,
        psf_width=grid.psf_width,
        radius=grid.radius,
        k0=grid.k0,
    )
    os.replace(tmp, path)
    return path


def _dense_to_compact(grid: StarGrid) -> CompactStarGrid:
    """Recover the CSR form from dense tables (sentinels are unambiguous:
    a real candidate always has mag ≪ 1e9)."""
    base = np.asarray(grid.cell_data, np.float64)
    base = base.reshape(base.shape[0], -1, _ROW)
    ovf = np.asarray(grid.ovf_data, np.float64)
    ovf = ovf.reshape(ovf.shape[0], -1, _ROW)
    c, k0 = base.shape[0], base.shape[1]
    ptr = base[:, 0, 7].astype(np.int64)
    ptr2 = (base[:, 1, 7].astype(np.int64)
            if grid.has_ovf2 and k0 >= 2 else np.zeros(c, np.int64))
    base = base.copy()
    base[:, 0, 7] = 0.0
    if k0 >= 2:
        base[:, 1, 7] = 0.0

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
    if grid.has_ovf2:
        # Tier-2 chain: slots continue after the (full, by construction)
        # tier-1 row of the same cell.
        ovf2 = np.asarray(grid.ovf2_data, np.float64)
        ovf2 = ovf2.reshape(ovf2.shape[0], -1, _ROW)
        o2valid = ovf2[..., 3] < _SENTINEL_MAG / 2
        o2counts_row = o2valid.sum(axis=1).astype(np.int64)
        cells2 = np.flatnonzero(ptr2 > 0)
        oc2 = np.zeros(c, np.int64)
        oc2[cells2] = o2counts_row[ptr2[cells2]]
        rows.append(ovf2[ptr2[cells2]][o2valid[ptr2[cells2]]])
        cell_of.append(np.repeat(cells2, oc2[cells2]))
        t1_slots = ovf.shape[1]
        slot_of.append(
            k0 + t1_slots
            + (np.concatenate([np.arange(k) for k in oc2[cells2]])
               if len(cells2) else np.zeros(0, np.int64))
        )
        counts = counts + oc2
    rows = np.concatenate(rows)
    cell_of = np.concatenate(cell_of)
    slot_of = np.concatenate(slot_of)
    order = np.lexsort((slot_of, cell_of))
    rows = rows[order]
    # Deduplicate identical slot rows back into a star table (bitwise —
    # halo copies of a star are exact duplicates). Small grids only; the
    # offline builder produces the deduplicated form natively.
    view = np.ascontiguousarray(rows).view(
        np.dtype((np.void, rows.dtype.itemsize * rows.shape[1]))
    ).reshape(-1)
    uniq, ids = np.unique(view, return_inverse=True)
    star_rows = uniq.view(rows.dtype).reshape(-1, rows.shape[1])
    return CompactStarGrid(
        counts=counts.astype(np.int32),
        star_ids=ids.astype(np.int32),
        star_rows=star_rows,
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
        star_ids=z["star_ids"],
        star_rows=z["star_rows"],
        n_rings=int(z["n_rings"]),
        n_cols=int(z["n_cols"]),
        n_stars=int(z["n_stars"]),
        psf_width=float(z["psf_width"]),
        radius=float(z["radius"]),
        k0=int(z["k0"]),
    )


def load_star_grid(path: str, dtype=jnp.float32,
                   k0: Optional[int] = None,
                   ovf_split: Optional[int] = None) -> StarGrid:
    """Load the CSR artifact and materialise device tables. ``k0`` and
    ``ovf_split`` override the table layout at load time (the on-disk form
    is layout-free, so no rebuild is needed to re-tier)."""
    return load_star_grid_compact(path).to_grid(dtype=dtype, k0=k0,
                                                ovf_split=ovf_split)

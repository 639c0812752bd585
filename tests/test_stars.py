"""Star subsystem tests: PPM parsing, grid build, lookup vs brute force."""

import math

import numpy as np
import jax.numpy as jnp

from blackstar_tpu.stars.catalog import (
    Catalog,
    encode_ppm,
    parse_ppm,
    ra_dec_to_cartesian,
    spectral_color,
)
from blackstar_tpu.stars.grid import (
    QUERY_RADIUS,
    build_star_grid,
    load_star_grid,
    save_star_grid,
)
from tests import oracle


def _random_catalog(n, seed=0, clusters=False):
    rng = np.random.default_rng(seed)
    if clusters and n >= 8:
        # Half the stars clumped tightly around a few centres (worst case for
        # bucket occupancy), half uniform.
        k = n // 2
        centers = rng.normal(size=(4, 3))
        centers /= np.linalg.norm(centers, axis=-1, keepdims=True)
        pts = centers[rng.integers(0, 4, k)] + 5e-4 * rng.normal(size=(k, 3))
        rest = rng.normal(size=(n - k, 3))
        v = np.concatenate([pts, rest])
    else:
        v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    mags = rng.integers(400, 1400, n)
    chars = rng.choice(list("OBAFGKM?"), n)
    hue = np.array([spectral_color(c)[0] for c in chars])
    sat = np.array([spectral_color(c)[1] for c in chars])
    return Catalog(pos=v, mag=mags.astype(np.int32), hue=hue, sat=sat)


def test_ppm_roundtrip():
    rng = np.random.default_rng(1)
    n = 64
    ra = rng.uniform(0, 2 * math.pi, n)
    dec = rng.uniform(-math.pi / 2, math.pi / 2, n)
    chars = rng.choice(list("OBAFGKM"), n)
    mag = rng.integers(-100, 1500, n).astype(np.int16)
    data = encode_ppm(ra, dec, chars, mag)
    cat = parse_ppm(data)
    assert cat.n_stars == n
    np.testing.assert_allclose(cat.pos, ra_dec_to_cartesian(ra, dec), atol=1e-14)
    np.testing.assert_array_equal(cat.mag, mag.astype(np.int32))
    for i, c in enumerate(chars):
        assert (cat.hue[i], cat.sat[i]) == spectral_color(c)


def test_unit_positions():
    cat = _random_catalog(100)
    np.testing.assert_allclose(np.linalg.norm(cat.pos, axis=-1), 1.0, atol=1e-12)


def _check_grid_vs_bruteforce(cat, dirs, intensity=0.7, saturation=0.7):
    grid = build_star_grid(cat, dtype=jnp.float64)
    got = np.asarray(
        grid.lookup(jnp.asarray(dirs), jnp.float64(intensity), jnp.float64(saturation))
    )
    want = np.stack([oracle.star_lookup(cat, intensity, saturation, d) for d in dirs])
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_lookup_matches_bruteforce_random():
    cat = _random_catalog(500, seed=2)
    rng = np.random.default_rng(3)
    dirs = rng.normal(size=(200, 3))
    # Mix in directions at/near actual stars so hits occur.
    dirs[:100] = cat.pos[:100] + 4e-4 * rng.normal(size=(100, 3))
    _check_grid_vs_bruteforce(cat, dirs)


def test_lookup_matches_bruteforce_clusters():
    cat = _random_catalog(400, seed=4, clusters=True)
    rng = np.random.default_rng(5)
    dirs = cat.pos[rng.integers(0, 400, 150)] + 3e-4 * rng.normal(size=(150, 3))
    _check_grid_vs_bruteforce(cat, dirs)


def test_lookup_poles_and_ra_wrap():
    """Stars at the poles and straddling RA = 0/2π must be found."""
    eps = 3e-4
    pos = np.array(
        [
            [0.0, 0.0, 1.0],  # north pole
            [0.0, 0.0, -1.0],  # south pole
            ra_dec_to_cartesian(np.float64(2 * math.pi - 1e-5), np.float64(0.1)),
            ra_dec_to_cartesian(np.float64(1e-5), np.float64(-0.2)),
        ]
    )
    cat = Catalog(
        pos=pos / np.linalg.norm(pos, axis=-1, keepdims=True),
        mag=np.array([900, 900, 900, 900], np.int32),
        hue=np.array([0.631, 0.628, 0.094, 0.0]),
        sat=np.array([0.39, 0.33, 0.56, 0.0]),
    )
    rng = np.random.default_rng(6)
    probes = np.repeat(cat.pos, 8, axis=0) + eps * rng.normal(size=(32, 3))
    _check_grid_vs_bruteforce(cat, probes)


def test_lookup_respects_cutoff_radius():
    """A star just outside 3w contributes nothing even though its Gaussian
    tail is nonzero (inRadius cutoff, StarMap.hs:104)."""
    base = np.array([1.0, 0.0, 0.0])
    # Chordal offset slightly beyond the cutoff.
    off = np.array([0.0, QUERY_RADIUS * 1.05, 0.0])
    star = base + off
    star /= np.linalg.norm(star)
    # Re-scale so chordal distance from base exceeds cutoff after normalise.
    cat = Catalog(
        pos=star[None, :],
        mag=np.array([0], np.int32),  # extremely bright -> clamped val=1
        hue=np.array([0.5]),
        sat=np.array([0.3]),
    )
    d2 = np.sum((cat.pos[0] - base) ** 2)
    grid = build_star_grid(cat, dtype=jnp.float64)
    got = np.asarray(grid.lookup(jnp.asarray(base[None, :]), jnp.float64(1.0), jnp.float64(1.0)))
    want = oracle.star_lookup(cat, 1.0, 1.0, base)
    np.testing.assert_allclose(got[0], want, atol=1e-14)
    if d2 > QUERY_RADIUS**2:
        np.testing.assert_allclose(got[0], 0.0, atol=1e-14)


def test_intensity_clamp_and_channel_clamp():
    """Bright star: per-star val clamps at 1·intensity; summed channels clamp at 1."""
    pos = np.array([[1.0, 0.0, 0.0]] * 5) + np.array(
        [[0, i * 1e-5, 0] for i in range(5)]
    )
    pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
    cat = Catalog(
        pos=pos,
        mag=np.full(5, -500, np.int32),
        hue=np.full(5, 0.1),
        sat=np.full(5, 0.2),
    )
    dirs = np.array([[1.0, 0.0, 0.0]])
    _check_grid_vs_bruteforce(cat, dirs, intensity=0.9, saturation=1.2)
    grid = build_star_grid(cat, dtype=jnp.float64)
    got = np.asarray(grid.lookup(jnp.asarray(dirs), jnp.float64(0.9), jnp.float64(1.2)))
    assert got.max() <= 1.0 + 1e-12


class TestOverflow:
    """The two-level table: cells denser than k0 spill into the overflow
    table; rays there pay a compacted second gather (or the exact full-width
    fallback when the compaction capacity is exceeded)."""

    def _dense_catalog(self, n=60, seed=11):
        # All stars inside one query radius -> one cell holds everything.
        rng = np.random.default_rng(seed)
        base = np.array([0.3, -0.5, 0.81])
        pos = base + 2e-4 * rng.normal(size=(n, 3))
        pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
        return Catalog(
            pos=pos,
            mag=rng.integers(900, 1400, n).astype(np.int32),
            hue=np.full(n, 0.094),
            sat=np.full(n, 0.29),
        )

    def test_overflow_matches_bruteforce(self):
        cat = self._dense_catalog()
        grid = build_star_grid(cat, k0=8, dtype=jnp.float64)
        assert grid.has_overflow
        rng = np.random.default_rng(12)
        dirs = cat.pos[rng.integers(0, cat.n_stars, 64)] + 3e-4 * rng.normal(
            size=(64, 3)
        )
        got = np.asarray(
            grid.lookup(jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.7))
        )
        want = np.stack([oracle.star_lookup(cat, 0.7, 0.7, d) for d in dirs])
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_compaction_and_fallback_paths_agree(self):
        """Large block -> compacted second gather; tiny ovf_capacity forces
        the lax.cond slow path. All three must agree with k0=large (single
        dense table, no overflow at all)."""
        cat = self._dense_catalog(40, seed=13)
        rng = np.random.default_rng(14)
        n = 4096
        dirs = np.where(
            (rng.uniform(size=(n, 1)) < 0.5),
            cat.pos[rng.integers(0, cat.n_stars, n)] + 3e-4 * rng.normal(size=(n, 3)),
            rng.normal(size=(n, 3)),
        )
        args = (jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.7))

        dense = build_star_grid(cat, k0=64, dtype=jnp.float64)
        assert not dense.has_overflow
        want = np.asarray(dense.lookup(*args))

        grid = build_star_grid(cat, k0=4, dtype=jnp.float64)
        assert grid.has_overflow
        got_fast = np.asarray(grid.lookup(*args, ovf_capacity=0.9))
        got_slow = np.asarray(grid.lookup(*args, ovf_capacity=0.125001))
        np.testing.assert_allclose(got_fast, want, atol=1e-12)
        np.testing.assert_allclose(got_slow, want, atol=1e-12)

    def test_ovf_octets_metadata(self):
        """ovf_octets must record each overflow row's used-octet prefix —
        the dynamic scan bound must never cut off a real candidate."""
        cat = self._dense_catalog(60, seed=17)
        grid = build_star_grid(cat, k0=8, dtype=jnp.float64)
        assert grid.has_overflow
        octs = np.asarray(grid.ovf_octets)
        ovf = np.asarray(grid.ovf_data).reshape(octs.shape[0], -1, 8)
        used = (ovf[..., 3] < 1e8).sum(axis=1)  # non-sentinel slots per row
        np.testing.assert_array_equal(octs, -(-used // 8))
        assert octs[0] == 0  # dummy row
        assert octs.max() >= 2  # the bound actually has multiple octets

    def test_overflow_roundtrip_and_k0_override(self, tmp_path):
        cat = self._dense_catalog(30, seed=15)
        grid = build_star_grid(cat, k0=6, dtype=jnp.float64)
        path = save_star_grid(grid, str(tmp_path / "ovf.grid"))
        loaded = load_star_grid(path, dtype=jnp.float64)
        np.testing.assert_array_equal(
            np.asarray(loaded.cell_data), np.asarray(grid.cell_data)
        )
        np.testing.assert_array_equal(
            np.asarray(loaded.ovf_data), np.asarray(grid.ovf_data)
        )
        # Densify the same compact file at a different k0: same results.
        wide = load_star_grid(path, dtype=jnp.float64, k0=64)
        assert not wide.has_overflow
        rng = np.random.default_rng(16)
        dirs = jnp.asarray(
            cat.pos[rng.integers(0, cat.n_stars, 32)]
            + 3e-4 * rng.normal(size=(32, 3))
        )
        a = np.asarray(loaded.lookup(dirs, jnp.float64(0.7), jnp.float64(0.7)))
        b = np.asarray(wide.lookup(dirs, jnp.float64(0.7), jnp.float64(0.7)))
        np.testing.assert_allclose(a, b, atol=1e-12)


class TestOvfSplit:
    """The optional THIRD level (``to_grid(ovf_split=...)``): overflow rows
    keep their first ``ovf_split`` octets; deeper cells chain into a second
    overflow table via base slot 1's aux pointer. Results must be identical
    to the single-tier layout on every lookup path — the split only changes
    gathered row widths."""

    def _dense_catalog(self, n=120, seed=99):
        rng = np.random.default_rng(seed)
        base = np.array([0.3, -0.5, 0.81])
        pos = base + 2e-4 * rng.normal(size=(n, 3))
        pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
        return Catalog(
            pos=pos,
            mag=rng.integers(900, 1400, n).astype(np.int32),
            hue=np.full(n, 0.094),
            sat=np.full(n, 0.29),
        )

    def _grids(self, cat, ovf_split=2, k0=4):
        kw = dict(dtype=jnp.float64, radius=0.006, cell_size=0.008, k0=k0)
        ref = build_star_grid(cat, **kw)
        split = build_star_grid(cat, ovf_split=ovf_split, **kw)
        assert ref.has_overflow and not ref.has_ovf2
        assert split.has_ovf2
        return ref, split

    def _dirs(self, cat, n, seed):
        rng = np.random.default_rng(seed)
        d = cat.pos[rng.integers(0, cat.n_stars, n)]
        d = d + 3e-4 * rng.normal(size=(n, 3))
        d[:: 7] = rng.normal(size=d[::7].shape)  # some misses/divergents
        return jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    def test_metadata_and_tables(self):
        ref, split = self._grids(self._dense_catalog())
        octs1 = np.asarray(split.ovf_octets)
        octs2 = np.asarray(split.ovf2_octets)
        assert octs1.max() <= 2 and octs1[0] == 0 and octs2[0] == 0
        assert split.ovf_data.shape[1] == 2 * 8 * 8
        # Tier-1 ∥ tier-2 reassembles the reference overflow rows.
        r = np.asarray(ref.ovf_data)
        t1 = np.asarray(split.ovf_data)
        np.testing.assert_array_equal(t1, r[:, : t1.shape[1]])
        base = np.asarray(split.cell_data)
        ptr1 = base[:, 7].astype(np.int64)
        ptr2 = base[:, 15].astype(np.int64)
        deep = ptr2 > 0
        assert deep.any() and (ptr1[deep] > 0).all()
        t2 = np.asarray(split.ovf2_data)
        np.testing.assert_array_equal(
            t2[ptr2[deep]], r[ptr1[deep], t1.shape[1]:]
        )
        # Used-octet bookkeeping is conserved across the split.
        ro = np.asarray(ref.ovf_octets)
        np.testing.assert_array_equal(
            octs1[ptr1[deep]] + octs2[ptr2[deep]], ro[ptr1[deep]]
        )

    def test_all_lookup_paths_match(self):
        cat = self._dense_catalog()
        ref, split = self._grids(cat)
        dirs = self._dirs(cat, 1024, seed=101)
        args = (jnp.float64(0.7), jnp.float64(0.9))
        want = np.asarray(ref.lookup(dirs, *args))
        np.testing.assert_allclose(
            np.asarray(split.lookup(dirs, *args)), want, atol=1e-12
        )
        np.testing.assert_allclose(  # capacity exceeded -> guarded slow path
            np.asarray(split.lookup(dirs, *args, ovf_capacity=0.01)),
            want, atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(split.lookup_grouped(dirs, *args)), want, atol=1e-12
        )
        np.testing.assert_allclose(
            np.asarray(split.lookup_grouped(dirs, *args, chunk=256)),
            want, atol=1e-12,
        )

    def test_row_band_and_differentiable(self):
        import jax

        cat = self._dense_catalog()
        ref, split = self._grids(cat)
        h, w = 8, 64
        rng = np.random.default_rng(102)
        c = cat.pos[3]
        u = np.linalg.svd(c[None])[2][1:]
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        dirs = (c[None, None] + 2e-4 * (xx - w / 2)[..., None] * u[0]
                + 2e-4 * (yy - h / 2)[..., None] * u[1]).reshape(-1, 3)
        dirs += 2e-5 * rng.normal(size=dirs.shape)
        dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
        args = (jnp.float64(0.7), jnp.float64(0.9))
        want = np.asarray(ref.lookup(dirs, *args))
        got = np.asarray(
            split.lookup_grouped(dirs, *args, row_pitch=w, row_bands=2)
        )
        np.testing.assert_allclose(got, want, atol=1e-12)
        got4 = np.asarray(
            split.lookup_grouped(dirs, *args, row_pitch=w, row_bands=4)
        )
        np.testing.assert_allclose(got4, want, atol=1e-12)

        def loss(i, s, g):
            return jnp.sum(g.lookup_grouped(dirs, i, s,
                                            differentiable=True) ** 2)

        gi1, gs1 = jax.grad(loss, argnums=(0, 1))(*args, ref)
        gi2, gs2 = jax.grad(loss, argnums=(0, 1))(*args, split)
        np.testing.assert_allclose(float(gi2), float(gi1), rtol=1e-10)
        np.testing.assert_allclose(float(gs2), float(gs1), rtol=1e-10)

    def test_roundtrip_and_noop_split(self, tmp_path):
        cat = self._dense_catalog(n=60, seed=103)
        ref, split = self._grids(cat)
        # A dense split grid serialises back to the SAME compact artifact.
        path = save_star_grid(split, str(tmp_path / "split.grid"))
        loaded = load_star_grid(path, dtype=jnp.float64, ovf_split=2)
        np.testing.assert_array_equal(
            np.asarray(loaded.cell_data), np.asarray(split.cell_data)
        )
        np.testing.assert_array_equal(
            np.asarray(loaded.ovf_data), np.asarray(split.ovf_data)
        )
        np.testing.assert_array_equal(
            np.asarray(loaded.ovf2_data), np.asarray(split.ovf2_data)
        )
        # Loading WITHOUT the split reproduces the single-tier layout.
        single = load_star_grid(path, dtype=jnp.float64)
        assert not single.has_ovf2
        np.testing.assert_array_equal(
            np.asarray(single.ovf_data), np.asarray(ref.ovf_data)
        )
        # A split at/above the max octet count is a no-op.
        wide = load_star_grid(path, dtype=jnp.float64, ovf_split=1000)
        assert not wide.has_ovf2


class TestGroupedLookup:
    """lookup_grouped: one gather per 8-ray group; per-ray validity against
    the build margin; block-compacted exact fallbacks. Must equal the
    per-ray lookup (and hence the brute-force oracle) on EVERY input."""

    def _grid(self, cat, **kw):
        kw.setdefault("radius", 0.006)  # margin = 4.5 mrad
        kw.setdefault("cell_size", 0.008)
        return build_star_grid(cat, dtype=jnp.float64, **kw)

    def _dirs_coherent(self, cat, n, seed, spread=3e-4):
        """Groups of 8 nearly-parallel directions (like neighbouring
        pixels), centred near catalogue stars so hits occur."""
        rng = np.random.default_rng(seed)
        centers = cat.pos[rng.integers(0, cat.n_stars, n // 8)]
        dirs = np.repeat(centers, 8, axis=0) + spread * rng.normal(size=(n, 3))
        return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    def _check(self, grid, dirs, active=None, **kw):
        args = (jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.9))
        act = None if active is None else jnp.asarray(active)
        got = np.asarray(grid.lookup_grouped(*args, act, **kw))
        want = np.asarray(grid.lookup(*args, act))
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_matches_per_ray_coherent(self):
        cat = _random_catalog(600, seed=21)
        grid = self._grid(cat)
        self._check(grid, self._dirs_coherent(cat, 1024, seed=22))

    def test_divergent_groups_fall_back_exactly(self):
        """Random (totally incoherent) directions: nearly every ray fails
        the margin test -> the whole answer comes from the per-ray fallback
        (and the capacity cond when it overflows)."""
        cat = _random_catalog(500, seed=23)
        grid = self._grid(cat)
        rng = np.random.default_rng(24)
        dirs = rng.normal(size=(2048, 3))
        dirs[::3] = cat.pos[rng.integers(0, cat.n_stars, len(dirs[::3]))]
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        # generous capacity: exercised fallback; tiny capacity: slow cond
        self._check(grid, dirs, invalid_frac=1.0)
        self._check(grid, dirs, invalid_frac=0.01)

    def test_overflow_cells_grouped(self):
        """A dense clump (overflow rows) viewed by coherent groups."""
        rng = np.random.default_rng(25)
        base = np.array([0.3, -0.5, 0.81])
        pos = base + 2e-4 * rng.normal(size=(60, 3))
        pos /= np.linalg.norm(pos, axis=-1, keepdims=True)
        cat = Catalog(
            pos=pos,
            mag=rng.integers(900, 1400, 60).astype(np.int32),
            hue=np.full(60, 0.094),
            sat=np.full(60, 0.29),
        )
        grid = self._grid(cat, k0=8)
        assert grid.has_overflow
        dirs = self._dirs_coherent(cat, 512, seed=26)
        self._check(grid, dirs, ovf_frac=1.0)
        self._check(grid, dirs, ovf_frac=0.01)  # capacity -> slow path

    def test_active_mask_and_ragged(self):
        cat = _random_catalog(300, seed=27)
        grid = self._grid(cat)
        dirs = self._dirs_coherent(cat, 1000, seed=28)[:997]  # ragged
        rng = np.random.default_rng(29)
        active = rng.uniform(size=997) < 0.8
        self._check(grid, dirs, active=active)

    def test_no_margin_grid_delegates(self):
        cat = _random_catalog(200, seed=30)
        grid = build_star_grid(cat, dtype=jnp.float64)  # margin 0
        assert grid.margin == 0.0
        dirs = self._dirs_coherent(cat, 256, seed=31)
        self._check(grid, dirs)

    def test_differentiable_path(self):
        """differentiable=True swaps the while_loop machinery for the
        capacity+cond form: results must match, and gradients w.r.t.
        intensity/saturation must flow and agree with the per-ray path."""
        import jax

        cat = _random_catalog(500, seed=40)
        grid = self._grid(cat)
        dirs = jnp.asarray(self._dirs_coherent(cat, 1024, seed=41))

        out_fwd = np.asarray(
            grid.lookup_grouped(dirs, jnp.float64(0.7), jnp.float64(0.9))
        )
        out_diff = np.asarray(
            grid.lookup_grouped(
                dirs, jnp.float64(0.7), jnp.float64(0.9), differentiable=True
            )
        )
        np.testing.assert_allclose(out_diff, out_fwd, atol=1e-12)

        def loss(i, s, fn):
            return jnp.sum(fn(dirs, i, s, differentiable=True) ** 2)

        gi1, gs1 = jax.grad(loss, argnums=(0, 1))(
            jnp.float64(0.7), jnp.float64(0.9), grid.lookup_grouped
        )
        gi2, gs2 = jax.grad(loss, argnums=(0, 1))(
            jnp.float64(0.7), jnp.float64(0.9), grid.lookup
        )
        np.testing.assert_allclose(float(gi1), float(gi2), rtol=1e-10)
        np.testing.assert_allclose(float(gs1), float(gs2), rtol=1e-10)

    def test_float32(self):
        cat = _random_catalog(400, seed=32)
        grid = build_star_grid(cat, dtype=jnp.float32, radius=0.006,
                               cell_size=0.008)
        dirs = jnp.asarray(self._dirs_coherent(cat, 512, seed=33), jnp.float32)
        got = np.asarray(
            grid.lookup_grouped(dirs, jnp.float32(0.7), jnp.float32(0.9))
        )
        want = np.asarray(
            grid.lookup(dirs, jnp.float32(0.7), jnp.float32(0.9))
        )
        np.testing.assert_allclose(got, want, atol=2e-6)

    def _dirs_image(self, cat, h, w, seed, spread=2e-4):
        """Row-major image of smoothly varying directions (neighbouring
        pixels AND neighbouring rows nearly parallel, like camera rays),
        centred near catalogue stars so hits occur."""
        rng = np.random.default_rng(seed)
        c = cat.pos[rng.integers(0, cat.n_stars)]
        u = np.linalg.svd(c[None])[2][1:]  # tangent basis
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
        dirs = (
            c[None, None]
            + spread * (xx - w / 2)[..., None] * u[0]
            + spread * (yy - h / 2)[..., None] * u[1]
        ).reshape(-1, 3)
        dirs += 0.1 * spread * rng.normal(size=dirs.shape)
        return dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    def test_row_pair_schedule(self):
        """row_pitch engages the 2×g row-pair parts: must equal the
        per-ray path on image-ordered rays, with and without an active
        mask, and across the chunked lax.map path."""
        cat = _random_catalog(700, seed=60, clusters=True)
        grid = self._grid(cat, k0=8)
        assert grid.has_overflow
        h, w = 16, 64
        dirs = self._dirs_image(cat, h, w, seed=61)
        rng = np.random.default_rng(62)
        active = rng.uniform(size=h * w) < 0.85
        for act in (None, active):
            self._check(grid, dirs, active=act, row_pitch=w)
            # chunked: each part maps in 2 chunks of 256 rays
            self._check(grid, dirs, active=act, row_pitch=w, chunk=512)
        # Divergent rays sprinkled in: exact fallback per part.
        dirs2 = dirs.copy()
        dirs2[::13] = rng.normal(size=dirs2[::13].shape)
        dirs2 /= np.linalg.norm(dirs2, axis=-1, keepdims=True)
        self._check(grid, dirs2, row_pitch=w)
        # Non-tiling row_pitch is ignored, not an error.
        self._check(grid, dirs[: h * w - w], row_pitch=w - 3)

    def test_row_quad_schedule(self):
        """row_bands=4 engages the 4×g row-band parts (one gather per 16
        rays): must equal the per-ray path on image-ordered rays, with an
        active mask, chunked, and with divergent rays forcing the exact
        per-ray fallback."""
        cat = _random_catalog(700, seed=63, clusters=True)
        grid = self._grid(cat, k0=8)
        assert grid.has_overflow
        h, w = 16, 64
        dirs = self._dirs_image(cat, h, w, seed=64)
        rng = np.random.default_rng(65)
        active = rng.uniform(size=h * w) < 0.85
        for act in (None, active):
            self._check(grid, dirs, active=act, row_pitch=w, row_bands=4)
            self._check(grid, dirs, active=act, row_pitch=w, row_bands=4,
                        chunk=512)
        dirs2 = dirs.copy()
        dirs2[::13] = rng.normal(size=dirs2[::13].shape)
        dirs2 /= np.linalg.norm(dirs2, axis=-1, keepdims=True)
        self._check(grid, dirs2, row_pitch=w, row_bands=4)
        # Height not divisible by 4: the band schedule is skipped, not an
        # error (falls back to single-part grouping).
        self._check(grid, dirs[: 14 * w], row_pitch=w, row_bands=4)

    def test_mixed_divergent_active_f32(self):
        """Mixed workload probe: coherent groups + divergent rays + an
        active mask at k0=16 (clustered catalogue, overflow present) — the
        grouped path must match the per-ray path."""
        rng = np.random.default_rng(50)
        cat = _random_catalog(800, seed=51, clusters=True)
        grid = build_star_grid(cat, dtype=jnp.float32, radius=0.006,
                               cell_size=0.008, k0=16)
        n = 4096
        dirs = self._dirs_coherent(cat, n, seed=52).astype(np.float32)
        dirs[::17] = rng.normal(size=dirs[::17].shape)  # divergent rays
        dirs = jnp.asarray(dirs / np.linalg.norm(dirs, axis=-1, keepdims=True))
        active = jnp.asarray(rng.uniform(size=n) < 0.9)
        args = (dirs, jnp.float32(0.7), jnp.float32(0.9), active)
        want = np.asarray(grid.lookup(*args))
        got = np.asarray(grid.lookup_grouped(*args))
        np.testing.assert_allclose(got, want, atol=2e-6)


def test_empty_catalog():
    cat = Catalog(
        pos=np.zeros((0, 3)), mag=np.zeros(0, np.int32), hue=np.zeros(0), sat=np.zeros(0)
    )
    grid = build_star_grid(cat, dtype=jnp.float64)
    out = np.asarray(grid.lookup(jnp.ones((4, 3)), jnp.float64(1.0), jnp.float64(1.0)))
    np.testing.assert_array_equal(out, 0.0)


def test_grid_save_load_roundtrip(tmp_path):
    cat = _random_catalog(64, seed=7)
    grid = build_star_grid(cat, dtype=jnp.float64)
    path = str(tmp_path / "stars.npz")
    save_star_grid(grid, path)
    loaded = load_star_grid(path, dtype=jnp.float64)
    rng = np.random.default_rng(8)
    dirs = cat.pos[:16] + 3e-4 * rng.normal(size=(16, 3))
    a = np.asarray(grid.lookup(jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.7)))
    b = np.asarray(loaded.lookup(jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.7)))
    np.testing.assert_allclose(a, b, atol=0)


def test_host_build_preserves_float64_and_suffix_normalised(tmp_path):
    """The offline build path (device=False) must keep full f64 precision
    without touching jax (no silent x64 downcast), and save/load must agree
    on names without the .npz suffix."""
    cat = _random_catalog(64, seed=9)
    grid = build_star_grid(cat, dtype=np.float64, device=False)
    assert isinstance(grid.cell_data, np.ndarray)
    assert grid.cell_data.dtype == np.float64
    base = str(tmp_path / "stars.grid")  # no suffix
    written = save_star_grid(grid, base)
    assert written.endswith(".npz")
    loaded = load_star_grid(base, dtype=jnp.float64)  # suffix-free load works
    np.testing.assert_array_equal(
        np.asarray(loaded.cell_data), grid.cell_data
    )


def test_astype_rejects_pointer_corrupting_dtypes():
    """ADVICE r2: overflow-row pointers are float-encoded in the aux
    columns — casting to a dtype whose mantissa cannot represent the
    largest row index must raise instead of silently mis-gathering."""
    import dataclasses

    import pytest

    cat = _random_catalog(300, seed=11, clusters=True)
    grid = build_star_grid(cat, k0=4, dtype=jnp.float32)
    assert grid.has_overflow
    # f32 <-> f64 keep every pointer exact — allowed both ways.
    grid.astype(jnp.float64).astype(jnp.float32)
    # Fake a table deep enough that bf16's 8 mantissa bits cannot encode
    # the last row index (the guard keys off the table height).
    deep = dataclasses.replace(
        grid, ovf_data=jnp.zeros((300, grid.ovf_data.shape[1]), jnp.float32)
    )
    with pytest.raises(ValueError, match="mantissa"):
        deep.astype(jnp.bfloat16)


def test_insertion_covers_radius_at_poles():
    """Build invariant behind the grouped lookup's exactness claim: every
    star within the build radius of a cell's (sampled) box must be in that
    cell's candidate list. Near-pole rings are the regression case — the
    azimuthal halo must use the cos(dec) of the rh-EXTENDED band, not the
    ring's own edge (a star admitted by the declination halo sits where
    cos is smaller; the old code missed candidates by up to 7.7e-4 chordal
    at cell_size=0.008/radius=0.0075)."""
    from blackstar_tpu.stars.grid import build_star_grid_compact

    rng = np.random.default_rng(0)
    n = 120
    dec = np.pi / 2 - np.abs(rng.normal(0, 0.05, n))
    ra = rng.uniform(0, 2 * np.pi, n)
    pos = np.stack([np.cos(dec) * np.cos(ra), np.cos(dec) * np.sin(ra),
                    np.sin(dec)], -1)
    cat = Catalog(pos=pos, mag=np.full(n, 900, np.int32),
                  hue=np.zeros(n), sat=np.zeros(n))
    cell_size, radius = 0.008, 0.0075
    g = build_star_grid_compact(cat, cell_size=cell_size, radius=radius)
    delta = np.pi / g.n_rings
    cw = 2 * np.pi / g.n_cols
    starts = np.concatenate([[0], np.cumsum(g.counts)])
    t = np.linspace(0, 1, 7)
    for si in range(n):
        p, d0 = pos[si], dec[si]
        r_lo = max(0, int((d0 - 2.5 * radius + np.pi / 2) / delta))
        r_hi = min(g.n_rings, int((d0 + 2.5 * radius + np.pi / 2) / delta) + 1)
        for ring in range(r_lo, r_hi):
            lo = -np.pi / 2 + ring * delta
            ra_s = np.arange(g.n_cols)[:, None] * cw + t[None, :] * cw
            dec_s = lo + t * delta
            cd, sd = np.cos(dec_s), np.sin(dec_s)
            bx = np.stack(
                [cd[None, None, :] * np.cos(ra_s)[:, :, None],
                 cd[None, None, :] * np.sin(ra_s)[:, :, None],
                 np.broadcast_to(sd, (g.n_cols, 7, 7))], -1)
            dmin = np.sqrt(((bx - p) ** 2).sum(-1)).reshape(g.n_cols, -1).min(-1)
            # Sampled distance >= true distance, so any flagged cell is a
            # REAL coverage requirement (no false positives possible).
            for col in np.flatnonzero(dmin <= radius * 0.999):
                cell = ring * g.n_cols + col
                ids = g.star_ids[starts[cell]:starts[cell + 1]]
                rows = g.star_rows[ids]
                assert np.any(
                    np.all(np.isclose(rows[:, 0:3], p, atol=1e-12), axis=-1)
                ), f"star {si} missing from cell {cell} (short by {radius - dmin[col]:.2e})"


def test_grouped_lookup_odd_knobs_do_not_crash():
    """Non-power-of-two chunk / group_block values are legal sweep knobs:
    the padding alignment must be an lcm of the block granularities (these
    exact calls crashed in block reshapes before the lcm fix)."""
    cat = _random_catalog(300, seed=12)
    grid = build_star_grid(cat, dtype=jnp.float64, cell_size=0.03,
                           radius=0.012)
    rng = np.random.default_rng(2)
    v = rng.normal(size=(1000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    v = jnp.asarray(v)
    ii, ss = jnp.float64(0.7), jnp.float64(0.7)
    want = grid.lookup(v, intensity=ii, saturation=ss)
    # Two variants keep the compile cost down: the chunk-only case (the
    # lax.map split path) and the all-odd combination.
    for kw in ({"chunk": 1000},
               {"chunk": 1000, "group_block": 6, "ray_block": 24}):
        got = grid.lookup_grouped(v, intensity=ii, saturation=ss, **kw)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-12, err_msg=str(kw))


class TestFastCellIds:
    """The bounded-error fast cell-id path (grid._fast_asin/_fast_ra):
    margin-gated transcendental elimination for cell assignment. Exactness
    rests on a PROVEN angular error bound ≪ margin — gate the bound itself
    and the end-to-end results against the float64 brute-force oracle."""

    def test_error_bound_dense_and_adversarial(self):
        from blackstar_tpu.stars.grid import (_FAST_CELL_ERR, _fast_asin,
                                              _fast_ra)

        rng = np.random.default_rng(7)
        # Declination: dense sweep + adversarial near-pole values (the
        # sqrt(1−|z|) weight is the numerically delicate part in f32).
        z = np.concatenate([
            np.linspace(-1.0, 1.0, 1_000_001),
            1.0 - 10.0 ** rng.uniform(-10, 0, 100_000),
            -(1.0 - 10.0 ** rng.uniform(-10, 0, 100_000)),
        ]).astype(np.float32)
        dec = np.asarray(_fast_asin(jnp.asarray(z)), np.float64)
        err_dec = np.abs(dec - np.arcsin(np.clip(z.astype(np.float64), -1, 1)))

        # Right ascension: random unit directions at all declinations,
        # including near-pole (tiny |x|,|y| — the scale-invariant fold must
        # not lose arc accuracy there) and near-axis octant boundaries.
        v = rng.normal(size=(500_000, 3))
        v[:50_000, 2] = np.sign(v[:50_000, 2]) * (
            1.0 - 10.0 ** rng.uniform(-8, -2, 50_000)
        )
        v[50_000:100_000, 0] *= 1e-6  # |y| >> |x| fold boundary
        v[100_000:150_000, 1] *= 1e-6
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        v32 = v.astype(np.float32)
        ra = np.asarray(
            _fast_ra(jnp.asarray(v32[:, 1]), jnp.asarray(v32[:, 0])),
            np.float64,
        )
        x64 = v32[:, 0].astype(np.float64)
        y64 = v32[:, 1].astype(np.float64)
        ra_true = np.mod(np.arctan2(y64, x64), 2 * np.pi)
        dra = np.abs(ra - ra_true)
        dra = np.minimum(dra, 2 * np.pi - dra)  # wrap
        cosd = np.sqrt(x64 * x64 + y64 * y64)  # cos(dec) of the direction
        err_arc = dra * cosd

        total = err_dec.max() + err_arc.max()
        assert total <= _FAST_CELL_ERR, (err_dec.max(), err_arc.max())
        # The gate margin must dominate the bound by the documented factor.
        from blackstar_tpu.stars.grid import _FAST_CELL_MIN_MARGIN

        assert _FAST_CELL_MIN_MARGIN >= 10 * _FAST_CELL_ERR

    def test_fast_path_matches_bruteforce(self):
        """Production-like margin grid → fast ids are in play on BOTH the
        per-ray and grouped paths; gate directly against the f64 oracle
        (grouped-vs-per-ray alone would not catch a shared wrong cell)."""
        cat = _random_catalog(400, seed=31, clusters=True)
        grid = build_star_grid(cat, dtype=jnp.float64, radius=0.0075,
                               cell_size=0.006)
        assert grid._fast_cells_ok(jnp.float64)
        assert grid.ring_table is not None  # 3-ball validity active too
        rng = np.random.default_rng(32)
        dirs = np.concatenate([
            cat.pos[rng.integers(0, cat.n_stars, 96)]
            + 4e-4 * rng.normal(size=(96, 3)),
            rng.normal(size=(32, 3)),
        ])
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        want = np.stack([oracle.star_lookup(cat, 0.7, 0.9, d) for d in dirs])
        got = np.asarray(
            grid.lookup(jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.9))
        )
        np.testing.assert_allclose(got, want, atol=1e-12)
        got_g = np.asarray(grid.lookup_grouped(
            jnp.asarray(dirs), jnp.float64(0.7), jnp.float64(0.9),
        ))
        np.testing.assert_allclose(got_g, want, atol=1e-12)

    def test_small_margin_grid_keeps_exact_ids(self):
        cat = _random_catalog(50, seed=33)
        grid = build_star_grid(cat, dtype=jnp.float64)  # margin 0
        assert not grid._fast_cells_ok(jnp.float64)

    def test_poles_and_wrap_through_fast_path(self):
        """Pole stars and RA-wrap straddlers with a margin grid (fast ids)."""
        eps = 3e-4
        pos = np.array([
            [0.0, 0.0, 1.0],
            [0.0, 0.0, -1.0],
            ra_dec_to_cartesian(np.float64(2 * math.pi - 1e-5),
                                np.float64(0.1)),
            ra_dec_to_cartesian(np.float64(1e-5), np.float64(-0.2)),
        ])
        cat = Catalog(
            pos=pos / np.linalg.norm(pos, axis=-1, keepdims=True),
            mag=np.array([900, 900, 900, 900], np.int32),
            hue=np.array([0.631, 0.628, 0.094, 0.0]),
            sat=np.array([0.39, 0.33, 0.56, 0.0]),
        )
        rng = np.random.default_rng(34)
        probes = np.repeat(cat.pos, 8, axis=0) + eps * rng.normal(size=(32, 3))
        probes /= np.linalg.norm(probes, axis=-1, keepdims=True)
        grid = build_star_grid(cat, dtype=jnp.float64, radius=0.0075,
                               cell_size=0.006)
        assert grid._fast_cells_ok(jnp.float64)
        want = np.stack([oracle.star_lookup(cat, 0.7, 0.7, d) for d in probes])
        got = np.asarray(grid.lookup(jnp.asarray(probes), jnp.float64(0.7),
                                     jnp.float64(0.7)))
        np.testing.assert_allclose(got, want, atol=1e-12)


def test_differentiable_chunked_lookup_grads_match_unchunked():
    """Per-chunk remat (jax.checkpoint) keeps the 1080p differentiable
    star stage compilable (r4: un-rematerialised octet-scan residuals OOM
    at 33 GB); gradients through the chunked+remat path must equal the
    unchunked path's."""
    import jax

    cat = _random_catalog(500, seed=41, clusters=True)
    grid = build_star_grid(cat, dtype=jnp.float64, radius=0.0075,
                           cell_size=0.006)
    rng = np.random.default_rng(42)
    dirs = cat.pos[rng.integers(0, cat.n_stars, 2048)]
    dirs = dirs + 3e-4 * rng.normal(size=(2048, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    v = jnp.asarray(dirs)

    def loss(i, s, chunk):
        out = grid.lookup_grouped(v, intensity=i, saturation=s,
                                  chunk=chunk, differentiable=True)
        return jnp.sum(out * out)

    for fn in (grid.lookup_grouped, grid.lookup):
        def loss(i, s, chunk, fn=fn):
            out = fn(v, intensity=i, saturation=s, chunk=chunk,
                     differentiable=True)
            return jnp.sum(out * out)

        gi_u, gs_u = jax.grad(loss, argnums=(0, 1))(
            jnp.float64(0.7), jnp.float64(0.9), 4096)
        gi_c, gs_c = jax.grad(loss, argnums=(0, 1))(
            jnp.float64(0.7), jnp.float64(0.9), 512)
        np.testing.assert_allclose(float(gi_c), float(gi_u), rtol=1e-12)
        np.testing.assert_allclose(float(gs_c), float(gs_u), rtol=1e-12)

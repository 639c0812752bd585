"""Deterministic full-scale synthetic star catalogue + grid build.

The reference *requires* a star map: `blackstar` exits when `stars.kdt` is
missing (app/Main.hs:46-50) and every escaped ray does a star lookup
(Raytracer.hs:94-95). Its README points at the PPM star catalogue
(~470k stars, README.md:19-23). This box has no network egress, so this
script synthesises a catalogue of the same scale and statistical shape —
**deterministically** (fixed seed), so the committed artifacts are exactly
reproducible from this script:

    python scripts/make_starfield.py            # writes stars.ppm + stars.grid.npz

Statistical shape (matching the real PPM catalogue's relevant properties):

* **Count**: 470,000 stars.
* **Sky distribution**: a fraction of stars concentrated toward the galactic
  plane (exponential falloff in galactic latitude, scale height ~8 deg) on
  top of an isotropic component; galactic frame rotated to equatorial
  coordinates via the standard NGP (RA 192.86 deg, Dec 27.13 deg). This
  reproduces the Milky-Way band — the feature that drives worst-case
  per-cell occupancy in the bucketed grid.
* **Magnitudes**: the PPM magnitude field is raw centi-magnitudes
  (StarMap.hs:52 uses it raw with 950 = "maximum brightness" ~ the 9.5 mag
  survey limit); counts grow ~x2 per 0.5 mag toward the faint limit, so
  magnitudes are inverse-CDF sampled from an exponential number-count law
  over [-150, 1250].
* **Spectral classes**: Morgan-Keenan mix of a magnitude-limited survey
  (A/F/K dominated), including ~5% unclassified (falls back to hue 0/sat 0,
  StarMap.hs:72).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SEED = 20260817
N_STARS = 470_000
PLANE_FRAC = 0.45  # fraction of stars in the galactic-plane component
SCALE_HEIGHT = np.deg2rad(8.0)  # exponential scale of |b| in the plane component

# Galactic -> equatorial rotation from the standard J2000 north galactic pole
# (RA 192.85948 deg, Dec 27.12825 deg) and galactic longitude of the
# ascending node l_omega = 32.93192 deg.
_NGP_RA = np.deg2rad(192.85948)
_NGP_DEC = np.deg2rad(27.12825)
_L_OMEGA = np.deg2rad(32.93192)

# Magnitude-limited MK class mix (fractions; remainder unclassified).
SPECTRAL_MIX = [
    ("A", 0.22), ("F", 0.20), ("K", 0.19), ("B", 0.14),
    ("G", 0.13), ("M", 0.06), ("O", 0.01),
]


def _galactic_to_equatorial(l: np.ndarray, b: np.ndarray):
    """(l, b) -> (ra, dec), standard J2000 transform."""
    sb, cb = np.sin(b), np.cos(b)
    sd_ngp, cd_ngp = np.sin(_NGP_DEC), np.cos(_NGP_DEC)
    x = np.cos(l - _L_OMEGA) * cb
    y = np.sin(l - _L_OMEGA) * cb
    dec = np.arcsin(sb * sd_ngp + y * cd_ngp)
    ra = _NGP_RA + np.arctan2(x, sb * cd_ngp - y * sd_ngp)
    return np.mod(ra, 2 * np.pi), dec


def synth_catalog(n: int = N_STARS, seed: int = SEED):
    """Deterministic (ra, dec, spectral, mag_centimag) arrays."""
    rng = np.random.default_rng(seed)

    n_plane = int(round(n * PLANE_FRAC))
    n_iso = n - n_plane

    # Isotropic component.
    dec_iso = np.arcsin(rng.uniform(-1.0, 1.0, n_iso))
    ra_iso = rng.uniform(0.0, 2 * np.pi, n_iso)

    # Galactic-plane component: |b| ~ Exp(scale), sign random, l uniform.
    b = rng.exponential(SCALE_HEIGHT, n_plane) * rng.choice([-1.0, 1.0], n_plane)
    b = np.clip(b, -np.pi / 2 + 1e-6, np.pi / 2 - 1e-6)
    l = rng.uniform(0.0, 2 * np.pi, n_plane)
    ra_pl, dec_pl = _galactic_to_equatorial(l, b)

    ra = np.concatenate([ra_iso, ra_pl])
    dec = np.concatenate([dec_iso, dec_pl])

    # Magnitudes (centimag): p(m) ~ exp(k m), counts ~x2 per 50 centimag.
    k = np.log(2.0) / 50.0
    a, bb = -150.0, 1250.0
    u = rng.uniform(0.0, 1.0, n)
    mag = np.log(u * (np.exp(k * bb) - np.exp(k * a)) + np.exp(k * a)) / k
    mag = np.round(mag).astype(np.int16)

    # Spectral classes.
    classes = [c for c, _ in SPECTRAL_MIX] + ["X"]  # X = unclassified
    probs = [p for _, p in SPECTRAL_MIX]
    probs.append(1.0 - sum(probs))
    spectral = rng.choice(np.array([ord(c) for c in classes], np.uint8), n, p=probs)

    # One deterministic shuffle so components are interleaved.
    order = rng.permutation(n)
    return ra[order], dec[order], spectral[order], mag[order]


def write_ppm(path: str, ra, dec, spectral, mag) -> None:
    from blackstar_tpu.stars.catalog import encode_ppm

    data = encode_ppm(ra=ra, dec=dec, spectral=[chr(s) for s in spectral], mag=mag)
    with open(path, "wb") as f:
        f.write(data)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap.add_argument("--n", type=int, default=N_STARS)
    ap.add_argument("--seed", type=int, default=SEED)
    ap.add_argument("--ppm", default=os.path.join(here, "stars.ppm"))
    ap.add_argument("--grid", default=os.path.join(here, "stars.grid.npz"))
    ap.add_argument("--cell-size", type=float, default=None,
                    help="override the library's default grid cell size")
    ap.add_argument("--skip-grid", action="store_true")
    args = ap.parse_args(argv)

    ra, dec, spectral, mag = synth_catalog(args.n, args.seed)
    write_ppm(args.ppm, ra, dec, spectral, mag)
    print(f"Wrote {args.n} stars to {args.ppm} "
          f"({os.path.getsize(args.ppm) / 1e6:.1f} MB)")

    if args.skip_grid:
        return 0

    # Build with the production grouped-lookup parameters (stars/artifact.py).
    from blackstar_tpu.stars import artifact
    from blackstar_tpu.stars.catalog import read_catalog
    from blackstar_tpu.stars.grid import build_star_grid_compact, save_star_grid

    compact = build_star_grid_compact(
        read_catalog(args.ppm),
        cell_size=args.cell_size or artifact.CELL_SIZE,
        radius=artifact.RADIUS,
        k0=artifact.K0,
    )
    out = save_star_grid(compact, args.grid)
    print(f"Grid: {out} ({os.path.getsize(out) / 1e6:.1f} MB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())

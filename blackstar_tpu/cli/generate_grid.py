"""generate-grid CLI — offline star-structure build (reference
app/GenerateTree.hs:11-29, ``generate-tree PPM stars.kdt``).

Usage::

    python -m blackstar_tpu generate-grid PPM stars.grid.npz

Parses the PPM star catalogue (binary format, StarMap.hs:44-58) and builds
the bucketed spherical grid that replaces the reference's k-d tree, then
serialises it to ``.npz``.
"""

from __future__ import annotations

import argparse
import os
import sys

from blackstar_tpu.util import prompt_overwrite_file, time_action


def build_parser(parser=None) -> argparse.ArgumentParser:
    # Defaults are pinned to the committed artifact's production build
    # (stars/artifact.py): cell size / halo radius / k0 sized for the
    # grouped full-frame lookup. A grid built with the bare query radius
    # (margin 0) would silently disable ``lookup_grouped`` — the ~10×
    # slower per-ray path — for anyone rebuilding from a PPM catalogue.
    from blackstar_tpu.stars import artifact

    p = parser or argparse.ArgumentParser(prog="blackstar generate-grid")
    p.add_argument(
        "catalog",
        help="star catalogue: a PPM binary file, or an existing reference "
        "stars.kdt (pass --kdt) to migrate a serialized tree directly",
    )
    p.add_argument("output", help="output star-grid path (.npz)")
    p.add_argument(
        "--kdt",
        action="store_true",
        help="parse CATALOG as a reference stars.kdt (cereal-encoded k-d "
        "tree, StarMap.hs:82-88) instead of a PPM catalogue",
    )
    p.add_argument("-f", "--force", action="store_true", help="overwrite without asking")
    p.add_argument(
        "--cell-size",
        type=float,
        default=artifact.CELL_SIZE,
        help="grid ring height (rad)",
    )
    p.add_argument(
        "--radius",
        type=float,
        default=artifact.RADIUS,
        help="build halo radius (rad); the excess over 3·psf_width is the "
        "group margin enabling the grouped lookup",
    )
    p.add_argument(
        "--k0",
        type=int,
        default=artifact.K0,
        help="base-table candidate slots per cell (excess goes to the "
        "overflow table)",
    )
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from blackstar_tpu.stars.catalog import read_catalog
    from blackstar_tpu.stars.grid import build_star_grid_compact, save_star_grid

    if not os.path.isfile(args.catalog):
        print(f"Error: file {args.catalog} doesn't exist.")
        return 1

    print(f"Reading {args.catalog}...")
    if args.kdt:
        from blackstar_tpu.stars.kdt import read_kdt

        catalog = read_kdt(args.catalog)
    else:
        catalog = read_catalog(args.catalog)
    print(f"Parsed {catalog.n_stars} stars.")

    with time_action("Building the star grid"):
        # The compact CSR form is what gets serialised (float64 slots);
        # loaders densify at each scene's compute dtype (f32 TPU, f64
        # golden).
        grid = build_star_grid_compact(
            catalog, cell_size=args.cell_size, radius=args.radius,
            k0=args.k0,
        )

    out = args.output if args.output.endswith(".npz") else args.output + ".npz"
    if prompt_overwrite_file(out, lambda p: save_star_grid(grid, p),
                             force=args.force):
        print("Star grid saved.")
        return 0
    return 1


if __name__ == "__main__":
    sys.exit(main())

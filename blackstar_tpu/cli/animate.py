"""Animate CLI — keyframe expansion (reference app/Animate.hs:33-66).

Usage::

    python -m blackstar_tpu animate ANIM.yaml [-o DIR] [--force]

Writes one scene YAML per frame (``<basename>_<paddedIdx>.yaml``) into the
output directory; rendering them is a separate batch ``render`` run, and
``scripts/ffmpeg-animate`` muxes the stills into a video.
"""

from __future__ import annotations

import argparse
import os
import sys

from blackstar_tpu.animation import frame_filename, generate_frames, load_animation, validate_keyframes
from blackstar_tpu.util import normalize_path, prompt_overwrite_file


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser(prog="blackstar animate")
    p.add_argument("inputfile", help="animation YAML file")
    p.add_argument("-o", "--output", default="", metavar="PATH", help="output directory")
    p.add_argument("-f", "--force", action="store_true", help="overwrite files without asking")
    p.add_argument(
        "--render", action="store_true",
        help="render frames straight to PNG (device-resident fast path) "
        "instead of expanding per-frame YAMLs",
    )
    p.add_argument("--preview", action="store_true", help="with --render: preview size")
    p.add_argument("--sharded", action="store_true", help="with --render: shard over devices")
    p.add_argument("--starmap", default="stars.grid.npz", metavar="PATH",
                   help="with --render: star grid path")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    in_path = args.inputfile
    basename = os.path.splitext(os.path.basename(in_path))[0]
    if not os.path.isfile(in_path):
        print("Couldn't open input file.")
        return 1

    out_path = normalize_path(args.output) if args.output else os.getcwd()
    os.makedirs(out_path, exist_ok=True)

    try:
        anim = load_animation(in_path)
    except Exception as e:
        print(f"Error when decoding config:\n{e}")
        return 1
    try:
        validate_keyframes(sorted(anim.keyframes, key=lambda k: k.time))
    except ValueError as e:
        print(e)
        return 1

    if args.render:
        from blackstar_tpu.cli.render import _load_stars
        from blackstar_tpu.video import render_animation

        if not args.force:
            # The device-resident loop writes frames asynchronously — no
            # per-frame prompt is possible, so honour -f up front instead
            # of silently clobbering a previous run's frames.
            from blackstar_tpu.animation import pad_zero

            existing = [
                os.path.join(
                    out_path, f"{basename}_{pad_zero(anim.n_frames - 1, i)}.png"
                )
                for i in range(anim.n_frames)
            ]
            existing = [p for p in existing if os.path.exists(p)]
            if existing:
                print(
                    f"{len(existing)} frame(s) already exist in {out_path} "
                    "(e.g. " + existing[0] + ") — pass -f/--force to "
                    "overwrite."
                )
                return 1

        star_grid = _load_stars(args.starmap)
        if star_grid is not None:
            # Resolve the per-dtype cache to the actual grid for this
            # animation's compute dtype.
            import jax.numpy as jnp

            star_grid = star_grid.get(jnp.dtype(anim.scene.dtype))
        paths = render_animation(
            anim,
            out_path,
            star_grid=star_grid,
            basename=basename,
            preview=args.preview,
            sharded=args.sharded,
            progress=lambda i, n: print(f"Frame {i}/{n}", end="\r"),
        )
        print(f"\nRendered {len(paths)} frames to {out_path}.")
        return 0

    from blackstar_tpu.config import save_config

    for idx, frame in enumerate(generate_frames(anim)):
        filename = os.path.join(out_path, frame_filename(basename, anim.n_frames, idx))
        prompt_overwrite_file(
            filename, lambda p, cfg=frame: save_config(cfg, p), force=args.force
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())

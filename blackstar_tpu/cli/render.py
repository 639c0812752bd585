"""Render CLI — the ``blackstar`` executable (reference app/Main.hs:43-125).

Usage::

    python -m blackstar_tpu render SCENE.yaml [-o DIR] [--preview] [--force]
                                   [--starmap stars.grid.npz] [--sharded]

A directory input renders every ``*.yaml`` inside it in sorted order (batch
mode, app/Main.hs:64-78). ``--preview`` caps the long side at 300 px and
disables supersampling/bloom (app/Main.hs:93-103), prefixing outputs with
``prev-``. ``--sharded`` spreads rays over every visible device via the mesh
renderer (the multi-chip replacement for massiv's multicore ``Par``).
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

from blackstar_tpu.util import clear_screen, normalize_path, prompt_overwrite_file, time_action

DEFAULT_STARMAP = "stars.grid.npz"


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser(prog="blackstar render")
    p.add_argument("inputfile", help="scene YAML file or directory of scenes")
    p.add_argument("-o", "--output", default="", metavar="PATH", help="output directory")
    p.add_argument("--preview", action="store_true", help="preview render (small size)")
    p.add_argument("-f", "--force", action="store_true", help="overwrite images without asking")
    p.add_argument(
        "--starmap", default=DEFAULT_STARMAP, metavar="PATH",
        help=f"path to star grid (default: {DEFAULT_STARMAP})",
    )
    p.add_argument("--sharded", action="store_true", help="shard rays over all devices")
    p.add_argument("--stats", action="store_true", help="print per-render ray statistics")
    p.add_argument(
        "--resume", action="store_true",
        help="batch mode: skip scenes whose output PNG already exists",
    )
    p.add_argument(
        "--profile", metavar="DIR", default="",
        help="capture a jax.profiler trace of the renders into DIR",
    )
    p.add_argument(
        "--shard-scenes", metavar="I/N", default="",
        help="batch mode across hosts: render only scenes i, i+N, i+2N, ... "
        "(e.g. --shard-scenes 0/4 on host 0 of 4)",
    )
    return p


class _StarGridCache:
    """Per-dtype star-grid loader: the .npz stores full-precision (f64)
    values, so each scene dtype gets a grid loaded at that precision
    (a float64 golden run must not see f32-rounded star data)."""

    def __init__(self, path: str):
        self.path = path
        self._grids = {}

    def get(self, dtype):
        import jax.numpy as jnp

        dt = jnp.dtype(dtype)
        if dt not in self._grids:
            from blackstar_tpu.stars.grid import load_star_grid

            self._grids[dt] = load_star_grid(self.path, dtype=dt)
        return self._grids[dt]


def _load_stars(path: str):
    """Missing starmap is a warning, not an error — scenes render with a
    black sky (the reference exits instead, app/Main.hs:46-50; degrading
    gracefully is deliberate since the catalogue is an external download)."""
    if not os.path.exists(path):
        if os.path.exists(path + ".npz"):
            path = path + ".npz"
        else:
            print(f"Warning: starmap {path} not found; rendering without stars.")
            return None
    # Defer the actual load until the first scene's dtype is known.
    print("Starmap found.")
    return _StarGridCache(path)


def handle_scene(args, star_grid, outdir: str, filename: str, writer=None) -> bool:
    import numpy as np

    from blackstar_tpu.config import apply_preview, load_config
    from blackstar_tpu.imageio import write_png

    scene_name = os.path.splitext(os.path.basename(filename))[0]
    if args.preview:
        out_name = os.path.join(outdir, "prev-" + scene_name + ".png")
    else:
        out_name = os.path.join(outdir, scene_name + ".png")
    if args.resume and os.path.exists(out_name):
        print(f"Skipping {filename} ({out_name} exists).")
        return True
    print(f"Reading {filename}...")
    try:
        cfg = load_config(filename)
    except Exception as e:  # parse errors skip the scene (app/Main.hs:91)
        print(f"Error when decoding config:\n{e}")
        return False
    print("Scene successfully read.")
    if args.preview:
        cfg = apply_preview(cfg)
        scene_name = "prev-" + scene_name

    params, static = cfg.params(), cfg.static()
    if static.jdtype == np.float64:
        import jax

        if not jax.config.jax_enable_x64:
            print(
                "Note: this scene requests float64 but x64 is disabled — "
                "arrays will silently be float32. For float64 golden "
                "renders set JAX_ENABLE_X64=1 on a CPU backend."
            )
    grid = star_grid.get(static.jdtype) if star_grid is not None else None

    print(f"Rendering {scene_name}...")
    with time_action("Rendering"):
        img = _render(args, params, static, grid, with_stats=args.stats)

    if cfg.scene.bloom_strength != 0.0:
        print("Applying bloom...")
        with time_action("Bloom"):
            img = _sync(_jit_bloom(static)(img, params.bloom_strength))

    # sRGB + uint8 quantisation on device: a quarter of the bytes cross the
    # host boundary (the fetch dominates on tunneled TPUs). write_png and
    # the writer pool both take already-encoded uint8 frames directly.
    rgb8 = np.asarray(_jit_encode()(img))

    print(f"Saving to {out_name}...")
    if writer is not None and args.force:
        # Batch mode with the native pool: hand the frame to a writer thread
        # and start the next render immediately (keeps the device busy).
        # --force is the overwrite consent, so existing outputs (the normal
        # re-render workflow) stay on the async path too.
        writer.submit(out_name, rgb8)
    else:
        prompt_overwrite_file(
            out_name, lambda p: write_png(rgb8, p), force=args.force
        )
    return True


def _sync(x):
    """Force execution before returning (timing truthfulness): on the
    tunneled TPU ``block_until_ready`` does not actually block, so fetch one
    scalar through the array instead (see CLAUDE.md)."""
    import jax

    jax.device_get(x.ravel()[0])
    return x


# jit wrappers are cached per StaticConfig so batch mode over same-shape
# scenes reuses one trace/compile instead of retracing per scene.
@functools.lru_cache(maxsize=32)
def _jit_render(static, sharded: bool, with_stats: bool):
    import jax

    if sharded:
        from blackstar_tpu.parallel.render import render_sharded

        return jax.jit(lambda p, g: render_sharded(p, static, g))
    from blackstar_tpu.render import render

    return jax.jit(lambda p, g: render(p, static, g, with_stats=with_stats))


@functools.lru_cache(maxsize=32)
def _jit_bloom(static):
    import jax

    from blackstar_tpu.ops.filters import bloom

    return jax.jit(lambda img, strength: bloom(img, strength, static.bloom_divider))


@functools.lru_cache(maxsize=1)
def _jit_encode():
    import jax

    from blackstar_tpu.imageio import encode_rgb8

    return jax.jit(encode_rgb8)


def _render(args, params, static, grid, with_stats=False):
    if args.sharded and with_stats:
        print("Note: --stats is not supported with --sharded; ignoring.")
        with_stats = False
    fn = _jit_render(static, args.sharded, with_stats)
    if with_stats:
        img, stats = fn(params, grid)
        img = _sync(img)
        print(
            f"steps={int(stats.steps)} escaped={float(stats.escaped_frac):.3f} "
            f"horizon={float(stats.horizon_frac):.3f} "
            f"truncated={float(stats.truncated_frac):.4f}"
        )
        return img
    return _sync(fn(params, grid))


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    star_grid = _load_stars(args.starmap)

    outdir = normalize_path(args.output) if args.output else os.getcwd()
    os.makedirs(outdir, exist_ok=True)

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        import jax

        os.makedirs(args.profile, exist_ok=True)
        profile_ctx = jax.profiler.trace(args.profile)

    filename = normalize_path(args.inputfile)
    with profile_ctx:
        if os.path.isdir(filename):
            print(f"{filename} is a directory. Rendering all scenes inside it...")
            files = sorted(
                os.path.join(filename, f)
                for f in os.listdir(filename)
                if f.endswith(".yaml")
            )
            if args.shard_scenes:
                # Frame-parallel batch across hosts (the reference's manual
                # multi-node workflow, README.md:89-93, made a flag).
                try:
                    i, n = (int(v) for v in args.shard_scenes.split("/"))
                    if not 0 <= i < n:
                        raise ValueError
                except ValueError:
                    print(f"invalid --shard-scenes {args.shard_scenes!r} (expected I/N with 0 <= I < N)")
                    return 2
                files = files[i::n]
            writer = _make_writer(args)
            oks = []
            try:
                for idx, scn in enumerate(files, 1):
                    clear_screen()
                    print(f"Batch mode progress: {idx}/{len(files)}")
                    oks.append(handle_scene(args, star_grid, outdir, scn, writer=writer))
            finally:
                if writer is not None:
                    errors = writer.wait()
                    writer.close()
                    if errors:
                        print(f"Warning: {errors} frame(s) failed to write.")
            # Reference batch semantics: failures are printed and skipped
            # (app/Main.hs:72-78); exit non-zero only if nothing rendered.
            if files and not any(oks):
                print(f"Error: all {len(files)} scene(s) failed to render.")
                return 1
        else:
            if not handle_scene(args, star_grid, outdir, filename):
                return 1
    print("Everything done. Thank you!")
    return 0


def _make_writer(args):
    """Async PNG pool for batch mode (needs the native lib and --force)."""
    if not args.force:
        return None
    try:
        from blackstar_tpu.native import AsyncFrameWriter, available

        return AsyncFrameWriter(4) if available() else None
    except Exception:
        return None


if __name__ == "__main__":
    sys.exit(main())

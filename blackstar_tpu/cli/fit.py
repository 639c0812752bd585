"""Fit CLI — inverse rendering: recover scene parameters from an image.

No reference analogue (flannelhead/blackstar is forward-only); this is the
differentiable framework's capstone surface. Gradient-descends the scene's
differentiable parameters (camera pose/fov, disk inner/outer/opacity/colour,
star intensity/saturation, black-hole mass) until the render matches a
target PNG, then writes the fitted scene YAML.

Usage::

    python -m blackstar_tpu fit SCENE.yaml TARGET.png [-o FITTED.yaml]
        [--steps 200] [--lr 1e-2] [--fit mass,disk] [--pyramid 2]
        [--starmap stars.grid.npz] [--sharded] [--checkpoint ck.npz] [--force]

The target must match the scene resolution and be an sRGB PNG (it is gamma-
decoded back to linear before the L2 loss). ``--fit`` restricts which
parameters move: a comma list of substrings matched against dotted leaf
paths (``.mass``, ``.disk.outer``, ``.camera.position``, …); default all.
"""

from __future__ import annotations

import argparse
import os
import sys

from blackstar_tpu.util import normalize_path, prompt_overwrite_file, time_action


def build_parser(parser=None) -> argparse.ArgumentParser:
    p = parser or argparse.ArgumentParser(prog="blackstar fit")
    p.add_argument("scene", help="initial-guess scene YAML")
    p.add_argument("target", help="target image (sRGB PNG, scene resolution)")
    p.add_argument("-o", "--output", default="", metavar="PATH",
                   help="fitted scene YAML (default: <scene>-fitted.yaml)")
    p.add_argument("--steps", type=int, default=200, help="optimisation steps")
    p.add_argument("--lr", type=float, default=1e-2, help="adam learning rate")
    p.add_argument(
        "--fit", default="", metavar="PATHS",
        help="comma list of parameter-path substrings to optimise "
        "(e.g. 'mass,disk.outer'); default: every differentiable leaf",
    )
    p.add_argument("--pyramid", type=int, default=0,
                   help="extra box-blurred loss levels for long-range gradients")
    p.add_argument("--starmap", default="", metavar="PATH",
                   help="star grid (needed if the target has stars)")
    p.add_argument("--sharded", action="store_true",
                   help="shard rays over all devices")
    p.add_argument("--checkpoint", default="", metavar="PATH",
                   help="also save the fitted parameter pytree as .npz")
    p.add_argument("-f", "--force", action="store_true",
                   help="overwrite the output without asking")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    import jax.numpy as jnp
    import numpy as np

    from blackstar_tpu.config import config_with_params, load_config, save_config
    from blackstar_tpu.fit import fit_scene, save_params, trainable_mask
    from blackstar_tpu.imageio import read_png, srgb_decode

    scene_path = normalize_path(args.scene)
    try:
        cfg = load_config(scene_path)
    except Exception as e:
        print(f"Error when decoding config:\n{e}")
        return 1
    params, static = cfg.params(), cfg.static()

    rgb8 = read_png(normalize_path(args.target))
    w, h = cfg.scene.resolution
    if rgb8.shape[:2] != (h, w):
        print(
            f"target is {rgb8.shape[1]}x{rgb8.shape[0]} but the scene "
            f"resolution is {w}x{h} — resize one of them."
        )
        return 1
    import jax

    if static.jdtype == jnp.float64 and not jax.config.jax_enable_x64:
        print(
            "Note: this scene requests float64 but x64 is disabled — "
            "fitting at float32 (set JAX_ENABLE_X64=1 for full precision)."
        )
    target = srgb_decode(jnp.asarray(rgb8, static.jdtype) / 255.0)
    if cfg.scene.bloom_strength != 0.0:
        print(
            "Note: the fit compares pre-bloom renders; a bloomed target "
            "biases bright regions (set bloomStrength: 0 when rendering "
            "fitting targets)."
        )

    star_grid = None
    if args.starmap:
        from blackstar_tpu.stars.grid import load_star_grid

        star_grid = load_star_grid(args.starmap, dtype=static.jdtype)

    grad_mask = None
    if args.fit:
        keys = [k.strip() for k in args.fit.split(",") if k.strip()]
        grad_mask = trainable_mask(params, lambda path: any(k in path for k in keys))

    mesh = None
    if args.sharded:
        from blackstar_tpu.parallel import make_mesh

        mesh = make_mesh()

    n_report = max(1, args.steps // 10)

    def progress(i, state, loss):
        if (i + 1) % n_report == 0 or i == 0:
            print(f"step {i + 1:5d}/{args.steps}  loss {loss:.3e}")

    print(f"Fitting {scene_path} to {args.target} ({args.steps} steps)...")
    with time_action("Fitting"):
        fitted, losses = fit_scene(
            params, static, target, star_grid,
            steps=args.steps, learning_rate=args.lr, mesh=mesh,
            grad_mask=grad_mask, pyramid=args.pyramid, callback=progress,
        )
    print(f"loss: {losses[0]:.3e} -> {losses[-1]:.3e}")

    out = normalize_path(args.output) if args.output else (
        os.path.splitext(scene_path)[0] + "-fitted.yaml"
    )
    fitted_cfg = config_with_params(cfg, fitted)
    if prompt_overwrite_file(out, lambda p: save_config(fitted_cfg, p),
                             force=args.force):
        print(f"Fitted scene written to {out}.")
    if args.checkpoint:
        save_params(fitted, args.checkpoint)
        print(f"Parameter checkpoint written to {args.checkpoint}.")
    return 0


if __name__ == "__main__":
    sys.exit(main())

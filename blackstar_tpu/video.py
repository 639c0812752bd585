"""Whole-animation rendering: keyframes -> frames -> PNGs, device-resident.

The reference renders animations via a YAML round-trip: ``animate`` expands
keyframes into N scene files, the render CLI loops over them sequentially
(app/Animate.hs + app/Main.hs:64-78). That surface is preserved in
``blackstar_tpu.cli``; this module is the TPU-native fast path that skips it:
camera interpolation happens on device (:func:`blackstar_tpu.animation.
camera_at`), every frame reuses one compiled render, and finished frames are
handed to the native async PNG pool so the chip never waits on IO.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Callable, List, Optional

import jax
import numpy as np

from blackstar_tpu.animation import Animation, camera_at, pad_zero, validate_keyframes
from blackstar_tpu.config import Config


def render_animation(
    anim: Animation,
    out_dir: str,
    *,
    star_grid=None,
    basename: str = "frame",
    preview: bool = False,
    sharded: bool = False,
    writer_threads: int = 4,
    batch_frames: int = 8,
    progress: Optional[Callable[[int, int], None]] = None,
) -> List[str]:
    """Render every frame of ``anim`` to ``out_dir``; returns the PNG paths.

    One jit-compiled render function serves all frames (the camera is a
    traced argument, so nothing retraces between frames); ``batch_frames``
    cameras render per device dispatch (``lax.map``), amortising host
    round-trip latency; PNG encode/write overlaps the next batch's render
    via the native pool when available.
    """
    from blackstar_tpu.config import default_max_steps
    from blackstar_tpu.ops.filters import bloom
    from blackstar_tpu.render import render

    frames_sorted = sorted(anim.keyframes, key=lambda k: k.time)
    validate_keyframes(frames_sorted)
    os.makedirs(out_dir, exist_ok=True)

    scene = anim.scene
    if scene.max_steps is None:
        # One compiled render serves every frame, so the static step cap must
        # cover the *farthest* camera. |pos| is maximised at a keyframe under
        # linear interpolation, so the per-keyframe maximum is exact.
        scene = dataclasses.replace(
            scene,
            max_steps=max(
                default_max_steps(Config(scene=scene, camera=k.camera))
                for k in frames_sorted
            ),
        )
    cfg = Config(scene=scene, camera=frames_sorted[0].camera)
    if preview:
        from blackstar_tpu.config import apply_preview

        cfg = apply_preview(cfg)
    base_params = cfg.params()
    static = cfg.static()
    grid = star_grid
    if grid is not None and grid.dtype != static.jdtype:
        grid = grid.astype(static.jdtype)

    if sharded:
        from blackstar_tpu.parallel.render import render_sharded as _render

    else:
        _render = render

    with_bloom = cfg.scene.bloom_strength != 0.0

    def frame_fn(params, g):
        from blackstar_tpu.imageio import encode_rgb8

        img = _render(params, static, g)
        if with_bloom:
            img = bloom(img, params.bloom_strength, static.bloom_divider)
        # sRGB + uint8 quantisation on device: only a quarter of the bytes
        # cross the host boundary (the frame fetch, not the render,
        # dominates animation throughput on a tunneled TPU).
        return encode_rgb8(img)

    b = max(1, int(batch_frames))

    # The star grid rides as an ARGUMENT: a closed-over grid would be baked
    # into the program as a constant (hundreds of MB for the full-scale
    # catalogue — blows compile-request limits and the compile cache).
    @jax.jit
    def batch_fn(cams_b, g):
        return jax.lax.map(
            lambda cam: frame_fn(
                dataclasses.replace(base_params, camera=cam), g
            ),
            cams_b,
        )

    n = anim.n_frames
    ts = np.arange(n) / max(n - 1, 1)
    cams = camera_at(anim.keyframes, ts)

    writer = None
    try:
        from blackstar_tpu.native import AsyncFrameWriter, available

        if available():
            writer = AsyncFrameWriter(writer_threads)
    except Exception:
        writer = None

    paths = []

    def drain(entry):
        start, out = entry
        imgs = np.asarray(out)
        for j in range(min(b, n - start)):
            i = start + j
            path = os.path.join(out_dir, f"{basename}_{pad_zero(n - 1, i)}.png")
            if writer is not None:
                writer.submit(path, imgs[j])
            else:
                from blackstar_tpu.imageio import write_png

                write_png(imgs[j], path)
            paths.append(path)
            if progress is not None:
                progress(i + 1, n)

    try:
        # Double-buffered: dispatch batch k+1 (and start its device->host
        # copy) before fetching batch k, so the fetch latency overlaps the
        # next batch's render.
        pending = []
        for start in range(0, n, b):
            # Clamp the tail by repeating the last frame's camera: lax.map
            # needs a fixed batch size and extra renders are just discarded.
            idx = np.minimum(np.arange(start, start + b), n - 1)
            cams_b = jax.tree.map(lambda a: a[idx], cams)
            out = batch_fn(cams_b, grid)
            try:
                out.copy_to_host_async()
            except AttributeError:
                pass
            pending.append((start, out))
            if len(pending) > 1:
                drain(pending.pop(0))
        while pending:
            drain(pending.pop(0))
    except BaseException:
        # Drain the pool but let the original error (OOM, interrupt, ...)
        # propagate instead of masking it with a write-failure report.
        if writer is not None:
            writer.close()
        raise
    if writer is not None:
        errors = writer.wait()
        writer.close()
        if errors:
            raise IOError(f"{errors} animation frame(s) failed to write")
    return paths

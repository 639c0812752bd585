"""Animation throughput on the TPU: render animations/default-ani.yaml via
the device-resident path (video.render_animation) at preview and 1080p,
reporting frames/s and whether the run is render- or IO/link-bound.

Run on the TPU:  python -u scripts/bench_animation.py [n_frames]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import dataclasses

    from blackstar_tpu.animation import load_animation
    from blackstar_tpu.stars.artifact import default_star_grid
    from blackstar_tpu.util import enable_compilation_cache
    from blackstar_tpu.video import render_animation

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    anim = load_animation(os.path.join(here, "animations", "default-ani.yaml"))
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    anim = dataclasses.replace(anim, n_frames=n_frames)
    grid = default_star_grid()

    for label, preview, res in (("preview", True, None), ("1080p", False, (1920, 1080))):
        a = anim
        if res is not None:
            a = dataclasses.replace(
                a, scene=dataclasses.replace(a.scene, resolution=res)
            )
        out = f"/tmp/anim_bench_{label}"
        # Warm-up (compile) on a 2-frame run.
        render_animation(dataclasses.replace(a, n_frames=2), out, star_grid=grid)
        t0 = time.perf_counter()
        paths = render_animation(a, out, star_grid=grid)
        dt = time.perf_counter() - t0
        print(
            f"{label:8s}: {len(paths)} frames in {dt:.2f} s = "
            f"{len(paths) / dt:6.2f} fps ({dt / len(paths) * 1e3:6.1f} ms/frame)"
        )


if __name__ == "__main__":
    main()

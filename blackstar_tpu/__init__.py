"""blackstar_tpu — TPU-native differentiable Schwarzschild black-hole renderer.

A from-scratch JAX/Pallas framework with the capabilities of the reference
Haskell ray tracer (flannelhead/blackstar): null-geodesic RK4 integration,
accretion-disk shading with front-to-back alpha compositing, celestial-sphere
star rendering, bloom + supersampling post-processing, YAML scene configs,
keyframe animation, and batch CLIs — redesigned TPU-first:

* per-pixel recursion      -> fixed-step masked marching (XLA while_loop and a
                              Pallas kernel with per-tile early exit)
* k-d tree star search     -> sorted spherical-grid bucketed gather
* per-core work stealing   -> ray-tile sharding over a `jax.sharding.Mesh`
* pure rendering           -> end-to-end differentiable w.r.t. camera pose,
                              disk parameters, black-hole mass (scene fitting)
"""

from blackstar_tpu.config import (
    Camera,
    Config,
    Scene,
    SceneParams,
    StaticConfig,
    load_config,
    config_from_dict,
)
from blackstar_tpu.render import render, render_rgb, render_image
from blackstar_tpu.imageio import srgb_encode, to_uint8, write_png

# Submodules imported lazily by most callers but re-exported for discovery:
# blackstar_tpu.fit (scene fitting), .animation (keyframes), .video
# (device-resident animation rendering), .parallel (mesh sharding),
# .stars (catalogue + grid), .native (C++ IO runtime), .debug (checkify).

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Config",
    "Scene",
    "SceneParams",
    "StaticConfig",
    "load_config",
    "config_from_dict",
    "render",
    "render_rgb",
    "render_image",
    "srgb_encode",
    "to_uint8",
    "write_png",
]

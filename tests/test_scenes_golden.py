"""Golden coverage of ALL nine reference scene YAMLs (scenes/*.yaml): each
scene's exact camera/disk/step parameters rendered at reduced resolution and
compared to the scalar float64 oracle (the 'allclose to the reference output
per scene YAML' gate, SURVEY.md §4.2). Resolution is the only change —
geometry, fov, disk, and step size are verbatim from the scene files."""

import glob
import os

import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.config import Config, load_config
from blackstar_tpu.render import render
from tests import oracle

SCENES = sorted(
    glob.glob(os.path.join(os.path.dirname(__file__), "..", "scenes", "*.yaml"))
)
assert len(SCENES) == 9, SCENES


def _oracle_cached(cfg, path, width):
    """The scalar float64 oracle costs ~19 s at 64×36; since it is a pure
    function of the scene parameters AND the oracle source, cache its output
    keyed by a hash of the *resolved* config plus tests/oracle.py itself —
    an oracle edit auto-invalidates the committed cache (ADVICE r2), and a
    stale cache cannot mask a regression in the renderer."""
    import hashlib
    import json

    cache_dir = os.path.join(os.path.dirname(__file__), "golden_cache")
    oracle_src = open(os.path.join(os.path.dirname(__file__), "oracle.py"), "rb").read()
    key_src = json.dumps(cfg.to_dict(), sort_keys=True).encode() + oracle_src
    key = hashlib.sha256(key_src).hexdigest()[:24]
    name = f"{os.path.basename(path).removesuffix('.yaml')}_{width}_{key}.npy"
    cache = os.path.join(cache_dir, name)
    if os.path.exists(cache):
        return np.load(cache)
    want = oracle.render(cfg, None)
    os.makedirs(cache_dir, exist_ok=True)
    np.save(cache, want)
    return want


def _check_scene(path, width):
    cfg = load_config(path)
    # Shrink to oracle-tractable size, preserve aspect; keep supersampling
    # (it doubles the internal resolution, still tiny).
    w, h = cfg.scene.resolution
    import dataclasses

    scene = dataclasses.replace(
        cfg.scene,
        resolution=(width, max(2, width * h // w)),
        dtype="float64",
        bloom_strength=0.0,
    )
    cfg = Config(scene=scene, camera=cfg.camera)
    got, stats = render(cfg.params(), cfg.static(), with_stats=True)
    # The derived step cap must not truncate any ray on any reference scene
    # (SURVEY §7 "hard parts": termination -> fixed steps).
    assert float(stats.truncated_frac) == 0.0
    want = _oracle_cached(cfg, path, width) if width > 16 else oracle.render(cfg, None)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-7)


@pytest.mark.parametrize("path", SCENES, ids=[os.path.basename(p) for p in SCENES])
def test_scene_matches_oracle(path):
    _check_scene(path, 16)


# The disk scenes get a denser probe: a 16-px grid under a wide fov samples
# the disk edge sparsely, so aspect/interpolation bugs could slip through
# (VERDICT r1 weak #7). 64x36 costs ~19 s of scalar oracle per scene — only
# the three disk-bearing scenes pay it.
_DISK_SCENES = [p for p in SCENES if os.path.basename(p) in
                ("default.yaml", "lensing-disk.yaml", "wideangle-disk.yaml")]
assert len(_DISK_SCENES) == 3


@pytest.mark.parametrize(
    "path", _DISK_SCENES, ids=[os.path.basename(p) for p in _DISK_SCENES]
)
def test_disk_scene_matches_oracle_medium_res(path):
    _check_scene(path, 64)

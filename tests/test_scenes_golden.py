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


@pytest.mark.parametrize("path", SCENES, ids=[os.path.basename(p) for p in SCENES])
def test_scene_matches_oracle(path):
    cfg = load_config(path)
    # Shrink to oracle-tractable size, preserve aspect; keep supersampling
    # (it doubles the internal resolution, still tiny).
    w, h = cfg.scene.resolution
    import dataclasses

    scene = dataclasses.replace(
        cfg.scene,
        resolution=(16, max(2, 16 * h // w)),
        dtype="float64",
        bloom_strength=0.0,
    )
    cfg = Config(scene=scene, camera=cfg.camera)
    got, stats = render(cfg.params(), cfg.static(), with_stats=True)
    # The derived step cap must not truncate any ray on any reference scene
    # (SURVEY §7 "hard parts": termination -> fixed steps).
    assert float(stats.truncated_frac) == 0.0
    want = oracle.render(cfg, None)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-7)

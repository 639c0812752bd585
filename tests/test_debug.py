"""Numerics checking (blackstar_tpu.debug)."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.config import Config
from blackstar_tpu.debug import checked_render, render_hlo
from blackstar_tpu.render import render


def _cfg(**scene):
    scene = {"resolution": [8, 5], "maxSteps": 60, "dtype": "float64",
             "diskOpacity": 0.9, **scene}
    return Config.from_dict(
        {
            "camera": {"position": [0, 1, -20], "lookAt": [0, 0, 0],
                       "upVec": [0, 1, 0], "fov": 1.5},
            "scene": scene,
        }
    )


def test_checked_render_clean_scene_passes():
    cfg = _cfg()
    img = checked_render(cfg.params(), cfg.static())
    want = render(cfg.params(), cfg.static(), differentiable=True)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=0)


def test_checked_render_flags_bad_params():
    """A NaN camera position must be reported, not silently rendered."""
    cfg = _cfg()
    params = cfg.params()
    bad = dataclasses.replace(
        params,
        camera=dataclasses.replace(
            params.camera, position=params.camera.position.at[0].set(jnp.nan)
        ),
    )
    with pytest.raises(Exception):  # checkify raises JaxRuntimeError/ValueError
        checked_render(bad, cfg.static())


def test_render_hlo_returns_text():
    cfg = _cfg()
    txt = render_hlo(cfg.params(), cfg.static())
    assert "HloModule" in txt or "hlo" in txt.lower()

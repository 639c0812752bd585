"""Config layer tests (schema, defaults, derived config, preview)."""

import dataclasses

import numpy as np
import pytest

from blackstar_tpu.config import (
    Config,
    apply_preview,
    load_config,
    preview_resolution,
    save_config,
    static_config,
)

MINIMAL = {
    "camera": {
        "position": [0, 1, -20],
        "lookAt": [2, 0, 0],
        "upVec": [-0.2, 1, 0],
        "fov": 1.5,
    }
}


def test_scene_defaults_match_reference():
    """Defaults per ConfigFile.hs:66-81."""
    cfg = Config.from_dict(MINIMAL)
    s = cfg.scene
    assert s.step_size == 0.3
    assert s.bloom_strength == 0.4
    assert s.bloom_divider == 25
    assert s.star_intensity == 0.7
    assert s.star_saturation == 0.7
    assert s.disk_color == (0.16, 0.1, 0.95)
    assert s.disk_opacity == 0.0
    assert s.disk_inner == 3.0
    assert s.disk_outer == 12.0
    assert s.resolution == (1280, 720)
    assert s.supersampling is False
    assert s.mass == 1.0


def test_disk_color_hue_normalised():
    """YAML hue is degrees; parser divides by 360 (ConfigFile.hs:50-51)."""
    d = dict(MINIMAL, scene={"diskColor": [180, 0.1, 1.05]})
    cfg = Config.from_dict(d)
    assert cfg.scene.disk_color == pytest.approx((0.5, 0.1, 1.05))


def test_unknown_scene_keys_ignored():
    """e.g. the reference example animation's `diskHSV` (default applies)."""
    d = dict(MINIMAL, scene={"diskHSV": [180, 0.1, 1.05]})
    cfg = Config.from_dict(d)
    assert cfg.scene.disk_color == (0.16, 0.1, 0.95)


def test_missing_camera_raises():
    with pytest.raises(ValueError):
        Config.from_dict({"scene": {}})


def test_load_all_repo_scenes():
    import glob
    import os

    scenes = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "scenes", "*.yaml")))
    assert len(scenes) == 9
    for path in scenes:
        cfg = load_config(path)
        assert cfg.scene.resolution[0] > 0


def test_yaml_roundtrip(tmp_path):
    d = dict(MINIMAL, scene={"diskColor": [120, 0.3, 0.8], "diskOpacity": 0.5})
    cfg = Config.from_dict(d)
    p = str(tmp_path / "scene.yaml")
    save_config(cfg, p)
    cfg2 = load_config(p)
    assert cfg2.scene.disk_color == pytest.approx(cfg.scene.disk_color)
    assert cfg2.camera == cfg.camera


def test_preview_resolution():
    """Long side capped at 300, aspect preserved (app/Main.hs:96-99)."""
    assert preview_resolution(1920, 1080) == (300, 168)
    assert preview_resolution(1080, 1920) == (168, 300)
    assert preview_resolution(100, 100) == (300, 300)


def test_apply_preview_disables_ss_and_bloom():
    d = dict(MINIMAL, scene={"supersampling": True, "bloomStrength": 0.4})
    cfg = apply_preview(Config.from_dict(d))
    assert cfg.scene.supersampling is False
    assert cfg.scene.bloom_strength == 0.0
    assert cfg.scene.resolution == (300, 168)


def test_static_config_derivation():
    d = dict(MINIMAL, scene={"supersampling": True, "resolution": [640, 360]})
    st = static_config(Config.from_dict(d))
    assert (st.render_width, st.render_height) == (1280, 720)
    assert (st.width, st.height) == (640, 360)
    assert st.max_steps > 300  # enough to cross ~2×safe radius at h=0.3
    assert hash(st)  # must be hashable for jit static arg


def test_params_pytree():
    import jax

    cfg = Config.from_dict(MINIMAL)
    params = cfg.params()
    leaves = jax.tree.leaves(params)
    assert all(hasattr(l, "dtype") for l in leaves)
    # differentiable fields present
    assert params.camera.position.shape == (3,)
    assert params.disk.color_hsi.shape == (3,)
    assert params.mass.shape == ()


def test_extension_fields_round_trip(tmp_path):
    """mass/maxSteps/dtype must survive YAML round-trips (the animate CLI
    re-serialises scenes per frame), but stay absent for default configs so
    untouched YAMLs remain reference-schema compatible."""
    from blackstar_tpu.config import load_config, save_config

    d = dict(MINIMAL)
    d["scene"] = {"mass": 2.0, "maxSteps": 123, "dtype": "float64"}
    cfg = Config.from_dict(d)
    path = str(tmp_path / "cfg.yaml")
    save_config(cfg, path)
    back = load_config(path)
    assert back.scene.mass == 2.0
    assert back.scene.max_steps == 123
    assert back.scene.dtype == "float64"

    plain = Config.from_dict(MINIMAL).scene.to_dict()
    assert "mass" not in plain and "maxSteps" not in plain and "dtype" not in plain


def test_max_steps_zero_is_honoured():
    """maxSteps: 0 must not be replaced by the derived default (falsy-zero)."""
    from blackstar_tpu.config import Config

    cfg = Config.from_dict({
        "camera": {"position": [0, 1, -20], "lookAt": [0, 0, 0],
                   "upVec": [0, 1, 0], "fov": 1.5},
        "scene": {"resolution": [4, 3], "maxSteps": 0},
    })
    assert cfg.static().max_steps == 0

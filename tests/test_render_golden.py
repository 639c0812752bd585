"""Golden end-to-end render tests: the vectorised TPU pipeline (float64 on
CPU) must match the scalar float64 oracle per scene configuration (survey §4.2
— the BASELINE.json 'allclose to the reference output per scene YAML' gate,
checked against our independent scalar implementation of the reference
semantics)."""

import numpy as np
import jax.numpy as jnp
import pytest

from blackstar_tpu.config import Config
from blackstar_tpu.render import render, render_rgb
from blackstar_tpu.stars.grid import build_star_grid
from tests import oracle
from tests.test_stars import _random_catalog


def _cfg(res=(16, 9), **scene):
    scene = dict(scene)
    scene.setdefault("dtype", "float64")
    scene["resolution"] = list(res)
    return Config.from_dict(
        {
            "camera": {
                "position": [0, 1, -20],
                "lookAt": [2, 0, 0],
                "upVec": [-0.2, 1, 0],
                "fov": 1.5,
            },
            "scene": scene,
        }
    )


def _compare(cfg, stars=None, atol=1e-7):
    grid = build_star_grid(stars, dtype=jnp.float64) if stars is not None else None
    got = np.asarray(render(cfg.params(), cfg.static(), grid))
    want = oracle.render(cfg, stars)
    np.testing.assert_allclose(got, want, atol=atol)


def test_golden_disk_scene():
    """default.yaml-like: disk on, no stars (black sky)."""
    _compare(_cfg(diskOpacity=0.95, diskInner=1.8, diskOuter=13.0, bloomStrength=0.0))


def test_golden_no_disk():
    """lensing.yaml-like: pure lensing, no disk."""
    _compare(_cfg(diskOpacity=0.0, bloomStrength=0.0))


def test_golden_supersampling():
    _compare(
        _cfg(res=(8, 6), diskOpacity=0.95, diskInner=1.8, diskOuter=13.0, supersampling=True)
    )


def test_golden_with_stars():
    """Celestial sphere: synthetic catalogue clustered along ray directions."""
    rng = np.random.default_rng(11)
    cat = _random_catalog(300, seed=12)
    # Aim a bunch of stars into the camera's field of view (looking +x-ish
    # from (0,1,-20)) so escaped rays actually hit them.
    fwd = np.array([2.0, -1.0, 20.0])
    fwd /= np.linalg.norm(fwd)
    aimed = fwd + 0.3 * rng.normal(size=(200, 3))
    aimed /= np.linalg.norm(aimed, axis=-1, keepdims=True)
    pos = np.concatenate([cat.pos[:100], aimed])
    from blackstar_tpu.stars.catalog import Catalog

    cat = Catalog(
        pos=pos,
        mag=np.concatenate([cat.mag[:100], rng.integers(600, 1100, 200).astype(np.int32)]),
        hue=np.concatenate([cat.hue[:100], np.full(200, 0.094)]),
        sat=np.concatenate([cat.sat[:100], np.full(200, 0.29)]),
    )
    _compare(_cfg(diskOpacity=0.0, starIntensity=0.4, starSaturation=1.5), stars=cat)


def test_golden_wideangle_disk():
    cfg = Config.from_dict(
        {
            "camera": {
                "position": [-6, 1, -20],
                "lookAt": [-6, -4, 0],
                "upVec": [-0.2, 1, 0],
                "fov": 3.5,
            },
            "scene": {
                "resolution": [14, 8],
                "diskOpacity": 0.95,
                "diskInner": 2.5,
                "diskOuter": 12,
                "dtype": "float64",
            },
        }
    )
    _compare(cfg)


def test_golden_full_pipeline_with_bloom():
    """render_rgb = march + supersample + bloom vs oracle chain."""
    cfg = _cfg(res=(26, 14), diskOpacity=0.95, diskInner=1.8, diskOuter=13.0, bloomStrength=0.3)
    got = np.asarray(render_rgb(cfg.params(), cfg.static()))
    base = oracle.render(cfg, None)
    want = oracle.bloom(base, 0.3, 25)
    np.testing.assert_allclose(got, want, atol=1e-9)


def test_preview_matches_small_render():
    """Preview is just the same pipeline at reduced static resolution."""
    from blackstar_tpu.config import apply_preview

    cfg = _cfg(res=(20, 10), diskOpacity=0.95, bloomStrength=0.5)
    pcfg = apply_preview(cfg)
    assert pcfg.scene.resolution == (300, 150)
    # render the tiny original instead (300px preview oracle would be slow);
    # just verify preview static plumbing produces the right shapes.
    st = pcfg.static()
    assert (st.width, st.height) == (300, 150)
    assert st.supersampling is False


def test_grouped_eligibility_schedule():
    """The grouped star lookup is a schedule choice gated on (fov, width,
    margin): eligible at the canonical 1080p/fov1.5 frame, ineligible for
    tiny previews, margin-free grids, or absurd fovs."""
    from blackstar_tpu.config import Config, Scene, Camera
    from blackstar_tpu.render import _grouped_eligible
    from blackstar_tpu.stars.grid import build_star_grid
    from tests.test_stars import _random_catalog

    cat = _random_catalog(100, seed=60)
    grid_m = build_star_grid(cat, cell_size=0.006, radius=0.0075)
    grid_0 = build_star_grid(cat)  # margin 0
    assert grid_m.margin > 0 and grid_0.margin == 0.0

    def st(w, h, fov):
        cam = Camera(position=(0, 1, -20), look_at=(0, 0, 0), up=(0, 1, 0), fov=fov)
        return Config(scene=Scene(resolution=(w, h)), camera=cam).static()

    n1080 = 1920 * 1080
    assert _grouped_eligible(grid_m, st(1920, 1080, 1.5), n1080)
    assert _grouped_eligible(grid_m, st(1920, 1080, 3.5), n1080)
    assert not _grouped_eligible(grid_0, st(1920, 1080, 1.5), n1080)
    assert not _grouped_eligible(grid_m, st(300, 168, 1.5), 300 * 168)  # preview
    assert not _grouped_eligible(grid_m, st(1920, 1080, 30.0), n1080)


def test_train_step_takes_grid_as_argument():
    """Regression: jitting a train step must not bake the star grid in as a
    program constant (full-scale tables blow compile-size limits) — the
    grid rides as a call-time argument."""
    import dataclasses

    import optax

    from blackstar_tpu.fit import init_train_state, make_train_step
    from blackstar_tpu.stars.grid import build_star_grid
    from tests.test_stars import _random_catalog

    import jax

    cfg = _cfg(res=(12, 8), diskOpacity=0.9, maxSteps=60, dtype="float32")
    static, params = cfg.static(), cfg.params()
    grid = build_star_grid(_random_catalog(64, seed=61), dtype=jnp.float32)
    opt = optax.adam(1e-2)
    state = init_train_state(params, opt)
    target = jnp.zeros((static.height, static.width, 3), jnp.float32)
    step = jax.jit(make_train_step(static, opt))
    state2, loss = step(state, target, grid)
    assert jnp.isfinite(loss)


def test_golden_large_mass():
    """mass=5 (rs=5): the escape radius, step cap, and orbit margin must all
    scale with rs — before the r3 fix, safe stayed at r=50 (just 10 rs out,
    misclassifying deflected rays) and the +60 path margin covered barely
    one photon orbit, so ring-winding rays truncated to black. Gates both
    the oracle match and zero truncation."""
    from blackstar_tpu.render import render as _render

    cfg = _cfg(res=(10, 6), diskOpacity=0.95, diskInner=9.0, diskOuter=18.0,
               mass=5.0)
    img, stats = _render(cfg.params(), cfg.static(), with_stats=True)
    assert float(stats.truncated_frac) == 0.0
    assert 0.0 < float(stats.horizon_frac) < 1.0  # rs=5 shadow in frame
    _compare(cfg)

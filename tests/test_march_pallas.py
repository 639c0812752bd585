"""Pallas march kernel vs the XLA reference path (interpret mode on CPU).

The kernel must agree with ``geodesic.march`` in float32 up to rsqrt-vs-
divide rounding (the kernel restructures 1/r⁵ as rsqrt powers)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.camera import generate_rays
from blackstar_tpu.color import hsi_to_rgb
from blackstar_tpu.config import Config
from blackstar_tpu.geodesic import ACTIVE, ESCAPED, HORIZON, march
from blackstar_tpu.ops.march_pallas import march_pallas
from blackstar_tpu.render import safe_distance


def _cfg(res=(16, 8), **scene):
    scene = dict(scene)
    scene.setdefault("dtype", "float32")
    scene.setdefault("maxSteps", 400)
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


def _run_both(cfg, block_rows=8):
    params, static = cfg.params(), cfg.static()
    pos0, vel0 = generate_rays(params.camera, static.render_width, static.render_height,
                               dtype=jnp.float32)
    safe = safe_distance(params, jnp.float32)
    ref = march(pos0, vel0, params, static, safe)
    got = march_pallas(
        pos0,
        vel0,
        step_size=static.step_size,
        max_steps=static.max_steps,
        mass=params.mass,
        safe_distance=safe,
        disk_on=static.disk_on,
        disk_inner=params.disk.inner,
        disk_outer=params.disk.outer,
        disk_opacity=params.disk.opacity,
        disk_rgb=hsi_to_rgb(params.disk.color_hsi.astype(jnp.float32)),
        block_rows=block_rows,
        interpret=True,
    )
    return ref, got


def _assert_match(ref, got, n):
    status_ref = np.asarray(ref.status)
    status_got = np.asarray(got.status)
    # Allow tiny disagreement only where f32 rounding flips a borderline
    # event; require statuses almost everywhere equal.
    mismatch = status_ref != status_got
    assert mismatch.mean() < 0.02, f"status mismatch on {mismatch.mean():.1%} of rays"
    ok = ~mismatch
    np.testing.assert_allclose(
        np.asarray(got.acc_rgba)[ok], np.asarray(ref.acc_rgba)[ok], rtol=2e-4, atol=2e-4
    )
    esc = ok & (status_ref == ESCAPED)
    ref_dir = np.asarray(ref.vel)[esc]
    got_dir = np.asarray(got.vel)[esc]
    ref_dir /= np.linalg.norm(ref_dir, axis=-1, keepdims=True)
    got_dir /= np.linalg.norm(got_dir, axis=-1, keepdims=True)
    # Escape directions agree to a fraction of the star PSF width (5e-4).
    assert np.max(np.linalg.norm(ref_dir - got_dir, axis=-1), initial=0.0) < 2e-4


def test_pallas_matches_xla_disk():
    cfg = _cfg(diskOpacity=0.95, diskInner=1.8, diskOuter=13.0)
    ref, got = _run_both(cfg)
    _assert_match(ref, got, cfg.static().n_rays)


def test_pallas_matches_xla_no_disk():
    cfg = _cfg(diskOpacity=0.0)
    ref, got = _run_both(cfg)
    _assert_match(ref, got, cfg.static().n_rays)


def test_pallas_ragged_padding():
    """15×7 = 105 rays pad to a whole tile; padding must not leak."""
    cfg = _cfg(res=(15, 7), diskOpacity=0.95)
    ref, got = _run_both(cfg, block_rows=8)
    assert got.acc_rgba.shape == (105, 4)
    assert got.status.shape == (105,)
    _assert_match(ref, got, 105)


def test_deferred_shading_bitwise_equals_inline():
    """Block-deferred disk shading must be a pure scheduling change: every
    output bitwise-identical to the inline-shading kernel."""
    cfg = _cfg(res=(8, 5), diskOpacity=0.9, maxSteps=64)
    params, static = cfg.params(), cfg.static()
    pos0, vel0 = generate_rays(params.camera, static.render_width,
                               static.render_height, dtype=jnp.float32)
    kw = dict(
        step_size=static.step_size, max_steps=static.max_steps,
        mass=params.mass, safe_distance=safe_distance(params, jnp.float32),
        disk_on=True, disk_inner=params.disk.inner,
        disk_outer=params.disk.outer, disk_opacity=params.disk.opacity,
        disk_rgb=hsi_to_rgb(params.disk.color_hsi.astype(jnp.float32)),
        block_rows=2, interpret=True,
    )
    a = march_pallas(pos0, vel0, disk_defer=False, **kw)
    b = march_pallas(pos0, vel0, disk_defer=True, **kw)
    assert bool(jnp.all(a.acc_rgba == b.acc_rgba))
    assert bool(jnp.all(a.vel == b.vel))
    assert bool(jnp.all(a.status == b.status))


def test_render_with_pallas_flag():
    """render(use_pallas=True, interpret fallback unavailable) — exercise the
    dispatch plumbing on CPU via interpret-mode kernel call."""
    cfg = _cfg(res=(8, 4), diskOpacity=0.95, maxSteps=200)
    params, static = cfg.params(), cfg.static()
    from blackstar_tpu.render import render

    a = np.asarray(render(params, static, use_pallas=False))
    assert a.shape == (4, 8, 3)
    assert np.isfinite(a).all()

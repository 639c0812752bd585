"""Mesh-sharded rendering correctness on the virtual 8-device CPU mesh
(survey §4.4): sharded render == unsharded render, and sharded parameter
gradients == single-device gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.config import Config
from blackstar_tpu.parallel.mesh import make_mesh
from blackstar_tpu.parallel.render import render_sharded
from blackstar_tpu.render import render


def _cfg(res=(16, 9), **scene):
    scene = dict(scene)
    scene.setdefault("dtype", "float64")
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


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must fake 8 CPU devices"
    return make_mesh(jax.devices()[:8])


def test_sharded_matches_unsharded(mesh):
    cfg = _cfg(diskOpacity=0.95, diskInner=1.8, diskOuter=13.0)
    params, static = cfg.params(), cfg.static()
    want = np.asarray(render(params, static))
    got = np.asarray(render_sharded(params, static, mesh=mesh))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_with_stars_matches(mesh):
    from blackstar_tpu.stars.grid import build_star_grid
    from tests.test_stars import _random_catalog

    cat = _random_catalog(500, seed=3)
    grid = build_star_grid(cat, dtype=jnp.float64)
    cfg = _cfg(diskOpacity=0.0, starIntensity=0.8, starSaturation=1.0)
    params, static = cfg.params(), cfg.static()
    want = np.asarray(render(params, static, grid))
    got = np.asarray(render_sharded(params, static, grid, mesh=mesh))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_ragged_tail(mesh):
    """n_rays not divisible by n_devices: 13×7 = 91 rays over 8 devices."""
    cfg = _cfg(res=(13, 7), diskOpacity=0.95)
    params, static = cfg.params(), cfg.static()
    want = np.asarray(render(params, static))
    got = np.asarray(render_sharded(params, static, mesh=mesh))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_supersampling(mesh):
    cfg = _cfg(res=(8, 6), diskOpacity=0.95, supersampling=True)
    params, static = cfg.params(), cfg.static()
    want = np.asarray(render(params, static))
    got = np.asarray(render_sharded(params, static, mesh=mesh))
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_sharded_gradients_match(mesh):
    """Backward pass psums parameter grads: must equal the single-device
    gradient of the same scalar loss."""
    cfg = _cfg(res=(10, 6), diskOpacity=0.95, maxSteps=200)
    params, static = cfg.params(), cfg.static()

    def loss_single(p):
        return jnp.mean(render(p, static, differentiable=True) ** 2)

    def loss_sharded(p):
        return jnp.mean(render_sharded(p, static, mesh=mesh, differentiable=True) ** 2)

    g1 = jax.grad(loss_single)(params)
    # The checkpointed march inside shard_map requires jit (eager shard_map
    # doesn't support closed_call).
    g2 = jax.jit(jax.grad(loss_sharded))(params)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-8, atol=1e-12)


def test_sharded_jits_and_caches(mesh):
    cfg = _cfg(res=(8, 5), diskOpacity=0.95)
    params, static = cfg.params(), cfg.static()
    fn = jax.jit(lambda p: render_sharded(p, static, mesh=mesh))
    a = fn(params)
    b = fn(params)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

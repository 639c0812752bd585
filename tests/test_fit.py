"""Differentiability gates (survey §4.3): finite-difference checks of pixel
gradients w.r.t. camera pose, disk parameters, and black-hole mass, plus the
scene-fitting loop actually recovering a perturbed parameter."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from blackstar_tpu.config import Config
from blackstar_tpu.fit import fit_scene, image_loss, init_train_state, make_train_step
from blackstar_tpu.render import render


def _cfg(res=(12, 7), **scene):
    scene = dict(scene)
    scene.setdefault("dtype", "float64")
    scene.setdefault("maxSteps", 300)
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


def _fd_check(loss_fn, params, get, set_, eps=1e-6, rtol=5e-4, atol=1e-9):
    """Central finite difference vs autodiff for one scalar parameter."""
    g = get(jax.grad(loss_fn)(params))
    lo = loss_fn(set_(params, get(params) - eps))
    hi = loss_fn(set_(params, get(params) + eps))
    fd = (hi - lo) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), np.asarray(fd), rtol=rtol, atol=atol)


@pytest.fixture(scope="module")
def disk_setup():
    cfg = _cfg(diskOpacity=0.95, diskInner=1.8, diskOuter=13.0)
    params, static = cfg.params(), cfg.static()
    target = render(params, static, differentiable=True)

    def loss(p):
        return image_loss(p, static, target)

    return params, static, target, loss


class TestFiniteDifference:
    def test_grad_disk_inner(self, disk_setup):
        params, _, _, loss = disk_setup
        _fd_check(
            loss,
            params,
            get=lambda p: p.disk.inner,
            set_=lambda p, v: dataclasses.replace(
                p, disk=dataclasses.replace(p.disk, inner=v)
            ),
        )

    def test_grad_disk_outer(self, disk_setup):
        params, _, _, loss = disk_setup
        _fd_check(
            loss,
            params,
            get=lambda p: p.disk.outer,
            set_=lambda p, v: dataclasses.replace(
                p, disk=dataclasses.replace(p.disk, outer=v)
            ),
        )

    def test_grad_disk_opacity(self, disk_setup):
        params, _, _, loss = disk_setup
        _fd_check(
            loss,
            params,
            get=lambda p: p.disk.opacity,
            set_=lambda p, v: dataclasses.replace(
                p, disk=dataclasses.replace(p.disk, opacity=v)
            ),
        )

    def test_grad_camera_fov(self, disk_setup):
        params, _, _, loss = disk_setup
        _fd_check(
            loss,
            params,
            get=lambda p: p.camera.fov,
            set_=lambda p, v: dataclasses.replace(
                p, camera=dataclasses.replace(p.camera, fov=v)
            ),
        )

    def test_grad_camera_position(self, disk_setup):
        """Gradient w.r.t. one camera coordinate (y). Camera position moves
        every ray origin and the safe-distance, all differentiable."""
        params, _, _, loss = disk_setup

        def get(p):
            return p.camera.position[1]

        def set_(p, v):
            pos = p.camera.position.at[1].set(v)
            return dataclasses.replace(p, camera=dataclasses.replace(p.camera, position=pos))

        _fd_check(loss, params, get, set_, eps=1e-6, rtol=1e-3)

    def test_grad_mass(self, disk_setup):
        """The black-hole mass (Schwarzschild radius) — the headline new
        differentiable parameter (the reference hard-codes rs=1)."""
        params, _, _, loss = disk_setup
        _fd_check(
            loss,
            params,
            get=lambda p: p.mass,
            set_=lambda p, v: dataclasses.replace(p, mass=v),
            eps=1e-6,
            rtol=1e-3,
        )


def test_grad_star_params_finite_difference():
    """FD gates for starIntensity/starSaturation — gradients flow through
    the escaped-ray velocity into the celestial-sphere lookup."""
    from blackstar_tpu.camera import generate_rays
    from blackstar_tpu.geodesic import ESCAPED
    from blackstar_tpu.render import run_march
    from blackstar_tpu.stars.catalog import Catalog
    from blackstar_tpu.stars.grid import build_star_grid

    cfg = _cfg(res=(10, 6), diskOpacity=0.4, maxSteps=250)
    params, static = cfg.params(), cfg.static()

    # Place stars exactly on (slightly perturbed) escaped-ray directions so
    # the PSF query actually hits — a random catalogue almost never lands
    # within the 0.0015-rad query radius of only 60 rays.
    pos0, vel0 = generate_rays(params.camera, static.render_width,
                               static.render_height, dtype=jnp.float64)
    res = run_march(pos0, vel0, params, static, use_pallas=False)
    esc = np.asarray(res.vel)[np.asarray(res.status) == ESCAPED]
    esc = esc / np.linalg.norm(esc, axis=-1, keepdims=True)
    rng = np.random.default_rng(9)
    spos = np.repeat(esc, 3, axis=0) + 5e-4 * rng.normal(size=(esc.shape[0] * 3, 3))
    spos = spos / np.linalg.norm(spos, axis=-1, keepdims=True)
    cat = Catalog(
        pos=spos,
        mag=rng.integers(600, 1100, len(spos)).astype(np.int32),
        hue=np.full(len(spos), 0.094),
        sat=np.full(len(spos), 0.29),
    )
    grid = build_star_grid(cat, dtype=jnp.float64)
    target = render(params, static, grid, differentiable=True) * 0.9

    def loss(p):
        return image_loss(p, static, target, grid)

    # Guard against a vacuous test (0 == 0 passes allclose): rays must
    # actually escape and hit stars for these gradients to exist.
    g = jax.grad(loss)(params)
    assert float(jnp.abs(g.stars.intensity)) > 0

    for get, set_ in [
        (
            lambda p: p.stars.intensity,
            lambda p, v: dataclasses.replace(
                p, stars=dataclasses.replace(p.stars, intensity=v)
            ),
        ),
        (
            lambda p: p.stars.saturation,
            lambda p, v: dataclasses.replace(
                p, stars=dataclasses.replace(p.stars, saturation=v)
            ),
        ),
    ]:
        _fd_check(loss, params, get, set_, eps=1e-6, rtol=1e-3, atol=1e-12)


def test_fit_recovers_disk_outer():
    """Gradient descent pulls a perturbed diskOuter back toward the truth."""
    cfg = _cfg(res=(16, 9), diskOpacity=0.95, diskInner=1.8, diskOuter=13.0)
    static = cfg.static()
    true_params = cfg.params()
    target = render(true_params, static, differentiable=True)

    start = dataclasses.replace(
        true_params,
        disk=dataclasses.replace(true_params.disk, outer=jnp.float64(11.0)),
    )
    # Optimise only via adam on the full pytree; other params start at truth.
    fitted, losses = fit_scene(
        start, static, target, steps=40, learning_rate=0.05, jit=True
    )
    assert losses[-1] < losses[0] * 0.2, f"loss did not drop: {losses[0]} -> {losses[-1]}"
    assert abs(float(fitted.disk.outer) - 13.0) < abs(11.0 - 13.0)


def test_trainable_mask_freezes_leaves():
    """Masked leaves must not move during fitting; unmasked ones must."""
    from blackstar_tpu.fit import trainable_mask

    cfg = _cfg(res=(8, 5), diskOpacity=0.95, maxSteps=100)
    static = cfg.static()
    truth = cfg.params()
    target = render(truth, static, differentiable=True)
    start = dataclasses.replace(
        truth, disk=dataclasses.replace(truth.disk, outer=jnp.float64(11.0))
    )
    mask = trainable_mask(start, lambda p: p == ".disk.outer")
    fitted, _ = fit_scene(
        start, static, target, steps=8, learning_rate=0.05, grad_mask=mask
    )
    # Only disk.outer moved.
    assert float(fitted.disk.outer) != 11.0
    np.testing.assert_array_equal(np.asarray(fitted.mass), np.asarray(start.mass))
    np.testing.assert_array_equal(
        np.asarray(fitted.camera.position), np.asarray(start.camera.position)
    )
    np.testing.assert_array_equal(
        np.asarray(fitted.disk.inner), np.asarray(start.disk.inner)
    )


def test_pyramid_loss_runs_and_descends():
    """Multi-scale loss: differentiable, and descent still reduces it."""
    cfg = _cfg(res=(12, 7), diskOpacity=0.95, maxSteps=150)
    static = cfg.static()
    truth = cfg.params()
    target = render(truth, static, differentiable=True)
    start = dataclasses.replace(
        truth, disk=dataclasses.replace(truth.disk, outer=jnp.float64(11.0))
    )
    g = jax.grad(lambda p: image_loss(p, static, target, pyramid=2))(start)
    assert float(jnp.abs(g.disk.outer)) > 0  # differentiable through the blurs
    fitted, losses = fit_scene(
        start, static, target, steps=20, learning_rate=0.02, pyramid=2
    )
    assert min(losses) < losses[0]
    # Pyramid levels only add terms; a perfect match still has zero loss.
    assert float(image_loss(truth, static, target, pyramid=2)) == 0.0


def test_param_checkpoint_round_trip(tmp_path):
    from blackstar_tpu.fit import load_params, save_params

    cfg = _cfg()
    p = cfg.params()
    path = str(tmp_path / "ckpt.npz")
    save_params(p, path)
    q = load_params(path, p)
    for a, b in zip(jax.tree.leaves(p), jax.tree.leaves(q)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_step_shapes_and_finiteness():
    cfg = _cfg(res=(8, 5), diskOpacity=0.95)
    static = cfg.static()
    params = cfg.params()
    opt = optax.sgd(1e-3)
    state = init_train_state(params, opt)
    target = jnp.zeros((static.height, static.width, 3), jnp.float64)
    step = jax.jit(make_train_step(static, opt))
    state2, loss = step(state, target)
    assert np.isfinite(float(loss))
    assert int(state2.step) == 1
    # Every parameter leaf keeps its shape/dtype.
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(state2.params)):
        assert a.shape == b.shape and a.dtype == b.dtype

"""Full hand-derived march adjoint vs jax.grad of the production march."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.color import hsi_to_rgb
from blackstar_tpu.config import (
    CameraParams,
    Config,
    DiskParams,
    SceneParams,
    StarParams,
)
from blackstar_tpu.geodesic import march
from blackstar_tpu.ops.march_vjp import march_adjoint_reference

H = 0.3
MAX_STEPS = 50
SAFE = 2500.0


def _setup(n=48, disk_opacity=0.95, seed=0):
    rng = np.random.default_rng(seed)
    pos0 = jnp.asarray([0.0, 1.0, -20.0])
    # Directions biased toward the hole so some rays capture/cross the disk.
    fwd = np.array([0.0, -0.05, 1.0])
    dirs = fwd + 0.25 * rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    vel0 = jnp.asarray(dirs)
    args = dict(
        mass=jnp.asarray(1.0, jnp.float64),
        inner=jnp.asarray(1.8, jnp.float64),
        outer=jnp.asarray(13.0, jnp.float64),
        opacity=jnp.asarray(disk_opacity, jnp.float64),
        color_hsi=jnp.asarray([0.5, 0.1, 1.05], jnp.float64),
    )
    cot_acc = jnp.asarray(rng.normal(size=(n, 4)))
    cot_vel = jnp.asarray(rng.normal(size=(n, 3)))
    return pos0, vel0, args, cot_acc, cot_vel


def _march_wrapper(static):
    def f(pos0, vel0, mass, inner, outer, opacity, color_hsi):
        params = SceneParams(
            camera=CameraParams(
                position=pos0,
                look_at=jnp.zeros(3, jnp.float64),
                up=jnp.asarray([0.0, 1.0, 0.0]),
                fov=jnp.asarray(1.5, jnp.float64),
            ),
            disk=DiskParams(inner=inner, outer=outer, opacity=opacity, color_hsi=color_hsi),
            stars=StarParams(
                intensity=jnp.asarray(0.7, jnp.float64),
                saturation=jnp.asarray(0.7, jnp.float64),
            ),
            bloom_strength=jnp.asarray(0.0, jnp.float64),
            mass=mass,
        )
        res = march(pos0, vel0, params, static, SAFE, differentiable=True)
        return res.acc_rgba, res.vel

    return f


@pytest.mark.parametrize("disk_opacity", [0.95, 0.0], ids=["disk", "no-disk"])
def test_adjoint_matches_autodiff(disk_opacity):
    pos0, vel0, args, cot_acc, cot_vel = _setup(disk_opacity=disk_opacity)
    disk_on = disk_opacity != 0.0

    cfg = Config.from_dict(
        {
            "camera": {"position": [0, 1, -20], "lookAt": [0, 0, 0],
                       "upVec": [0, 1, 0], "fov": 1.5},
            "scene": {"resolution": [8, 6], "diskOpacity": disk_opacity,
                      "maxSteps": MAX_STEPS, "stepSize": H, "dtype": "float64"},
        }
    )
    static = cfg.static()
    assert static.max_steps == MAX_STEPS

    f = _march_wrapper(static)
    _, vjp = jax.vjp(
        f, pos0, vel0, args["mass"], args["inner"], args["outer"],
        args["opacity"], args["color_hsi"],
    )
    want = vjp((cot_acc, cot_vel))
    w_pos0, w_vel0, w_mass, w_inner, w_outer, w_op, w_hsi = want

    disk_rgb = hsi_to_rgb(args["color_hsi"])
    g_pos0, g_vel0, g_mass, g_inner, g_outer, g_op, g_rgb = march_adjoint_reference(
        pos0,
        vel0,
        h=H,
        max_steps=MAX_STEPS,
        mass=args["mass"],
        inner=args["inner"],
        outer=args["outer"],
        opacity=args["opacity"],
        disk_rgb=disk_rgb,
        safe=SAFE,
        disk_on=disk_on,
        cot_acc=cot_acc,
        cot_vel=cot_vel,
    )
    # rgb̄ → hsī through the (outside-the-adjoint) colour conversion.
    _, hsi_vjp = jax.vjp(hsi_to_rgb, args["color_hsi"])
    (g_hsi,) = hsi_vjp(g_rgb)

    np.testing.assert_allclose(np.asarray(g_vel0), np.asarray(w_vel0), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_pos0), np.asarray(w_pos0), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(g_mass), float(w_mass), rtol=1e-9)
    np.testing.assert_allclose(float(g_inner), float(w_inner), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(g_outer), float(w_outer), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(float(g_op), float(w_op), rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(g_hsi), np.asarray(w_hsi), rtol=1e-9, atol=1e-12)


def test_adjoint_nonzero_disk_grads():
    """Sanity: with a disk and crossing rays, disk-parameter grads are live."""
    pos0, vel0, args, cot_acc, cot_vel = _setup(disk_opacity=0.95)
    disk_rgb = hsi_to_rgb(args["color_hsi"])
    _, _, _, g_inner, g_outer, g_op, g_rgb = march_adjoint_reference(
        pos0, vel0, h=H, max_steps=MAX_STEPS, mass=args["mass"],
        inner=args["inner"], outer=args["outer"], opacity=args["opacity"],
        disk_rgb=disk_rgb, safe=SAFE, disk_on=True,
        cot_acc=cot_acc, cot_vel=cot_vel,
    )
    assert float(jnp.abs(g_inner)) > 0
    assert float(jnp.abs(g_outer)) > 0
    assert float(jnp.abs(g_op)) > 0
    assert float(jnp.sum(jnp.abs(g_rgb))) > 0

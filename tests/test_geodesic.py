"""Geodesic integrator tests: RK4 vs oracle, conservation, physics checks."""

import numpy as np
import jax
import jax.numpy as jnp

from blackstar_tpu.config import Config
from blackstar_tpu.geodesic import ACTIVE, ESCAPED, HORIZON, march, rk4_step
from tests import oracle


def _cfg(**scene):
    scene.setdefault("dtype", "float64")
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


def test_rk4_single_step_matches_oracle():
    rng = np.random.default_rng(0)
    pos = rng.uniform(-10, 10, (20, 3))
    vel = rng.uniform(-1, 1, (20, 3))
    vel /= np.linalg.norm(vel, axis=-1, keepdims=True)
    h2 = np.sum(np.cross(pos, vel) ** 2, axis=-1)
    got_pos, got_vel = rk4_step(jnp.asarray(pos), jnp.asarray(vel), 0.3, jnp.asarray(h2), 1.0)
    for i in range(20):
        want_vel, want_pos = oracle.rk4(0.3, h2[i], vel[i], pos[i])
        np.testing.assert_allclose(np.asarray(got_pos)[i], want_pos, atol=1e-13)
        np.testing.assert_allclose(np.asarray(got_vel)[i], want_vel, atol=1e-13)


def _integrate(pos, vel, h, n):
    h2 = jnp.sum(jnp.cross(pos, vel) ** 2, axis=-1)

    def body(_, s):
        return rk4_step(s[0], s[1], h, h2, 1.0)

    return jax.jit(lambda s: jax.lax.fori_loop(0, n, body, s))((pos, vel))


def test_angular_momentum_conserved():
    """|pos × vel|² is a constant of motion; RK4 should hold it to ~1e-8."""
    # Impact parameter 8 (well outside the photon sphere's critical b≈2.6),
    # so the fixed step resolves the trajectory accurately.
    pos = jnp.array([[-30.0, 8.0, 0.0]])
    vel = jnp.array([[1.0, 0.0, 0.0]])
    h2 = jnp.sum(jnp.cross(pos, vel) ** 2, axis=-1)
    p, v = _integrate(pos, vel, 0.3, 200)
    h2_end = jnp.sum(jnp.cross(p, v) ** 2, axis=-1)
    np.testing.assert_allclose(np.asarray(h2_end), np.asarray(h2), rtol=1e-8)


def test_weak_field_deflection():
    """Light passing at impact parameter b deflects by 2·rs/b (rs=1 units).

    Classic GR check for the -1.5·h²/r⁵ pseudo-Newtonian form (which
    reproduces exact null geodesics of Schwarzschild)."""
    b = 30.0
    pos = jnp.array([[-800.0, b, 0.0]])
    vel = jnp.array([[1.0, 0.0, 0.0]])
    p, v = _integrate(pos, vel, 0.1, 16000)
    assert float(p[0, 0]) > 700.0  # passed well beyond the hole
    v_end = np.asarray(v[0])
    deflection = np.arctan2(-v_end[1], v_end[0])
    # leading + second-order PPN term: 2rs/b + (15π/16)(rs/b)²
    expected = 2.0 / b + (15 * np.pi / 16) / b**2
    np.testing.assert_allclose(deflection, expected, rtol=0.01)


def test_march_statuses():
    """Escape for outward rays; horizon capture for aimed rays."""
    cfg = _cfg()
    static = cfg.static()
    params = cfg.params()

    pos0 = jnp.array([0.0, 1.0, -20.0], jnp.float64)
    aimed = -pos0 / jnp.linalg.norm(pos0)  # straight at the hole
    outward = pos0 / jnp.linalg.norm(pos0)
    vel0 = jnp.stack([aimed, outward])
    res = march(pos0, vel0, params, static, safe_distance=2500.0)
    status = np.asarray(res.status)
    assert status[0] == HORIZON
    assert status[1] == ESCAPED
    # Escaped ray kept a straight line: frozen velocity == initial direction.
    np.testing.assert_allclose(np.asarray(res.vel[1]), np.asarray(outward), atol=1e-9)


def test_march_no_truncation_on_default_scene():
    """The static step cap must not cut off any ray (survey §7 hard part)."""
    cfg = _cfg(resolution=[64, 36], diskOpacity=0.95, diskInner=1.8, diskOuter=13)
    static = cfg.static()
    params = cfg.params()
    from blackstar_tpu.camera import generate_rays
    from blackstar_tpu.render import safe_distance

    pos0, vel0 = generate_rays(params.camera, 64, 36, dtype=jnp.float64)
    res = march(pos0, vel0, params, static, safe_distance(params, jnp.float64))
    assert int(np.sum(np.asarray(res.status) == ACTIVE)) == 0


def test_march_differentiable_matches_while_loop():
    cfg = _cfg(resolution=[16, 9], diskOpacity=0.95)
    static = cfg.static()
    params = cfg.params()
    from blackstar_tpu.camera import generate_rays
    from blackstar_tpu.render import safe_distance

    pos0, vel0 = generate_rays(params.camera, 16, 9, dtype=jnp.float64)
    sd = safe_distance(params, jnp.float64)
    r1 = march(pos0, vel0, params, static, sd, differentiable=False)
    r2 = march(pos0, vel0, params, static, sd, differentiable=True)
    np.testing.assert_allclose(np.asarray(r1.acc_rgba), np.asarray(r2.acc_rgba), atol=1e-12)
    np.testing.assert_array_equal(np.asarray(r1.status), np.asarray(r2.status))
    np.testing.assert_allclose(np.asarray(r1.vel), np.asarray(r2.vel), atol=1e-12)


def test_outward_rays_never_capture():
    """Property: photons launched outward from r >> rs never hit the horizon."""
    rng = np.random.default_rng(3)
    pos = rng.normal(size=(64, 3))
    pos = 30.0 * pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    out_dir = pos / np.linalg.norm(pos, axis=-1, keepdims=True)
    # random outward-ish directions (positive radial component)
    tang = rng.normal(size=(64, 3))
    tang /= np.linalg.norm(tang, axis=-1, keepdims=True)
    vel = out_dir + 0.8 * tang
    vel /= np.linalg.norm(vel, axis=-1, keepdims=True)
    vel = np.where((vel * out_dir).sum(-1, keepdims=True) > 0.1, vel, out_dir)

    cfg = _cfg()
    static = cfg.static()
    params = cfg.params()
    res = march(jnp.asarray(pos), jnp.asarray(vel), params, static, 2500.0)
    assert not np.any(np.asarray(res.status) == HORIZON)


def test_differentiable_path_respects_step_cap():
    """The fixed-length scan path must march exactly max_steps even when the
    cap is not a multiple of the checkpoint segment (it used to overrun by
    up to seg-1 steps, diverging from the while_loop path for truncated
    rays)."""
    import numpy as np

    from blackstar_tpu.config import Config
    from blackstar_tpu.render import render

    cfg = Config.from_dict(
        {
            "camera": {"position": [0, 1, -20], "lookAt": [0, 0, 0],
                       "upVec": [0, 1, 0], "fov": 1.5},
            # 27 steps: every ray truncates mid-flight; 27 % 25 != 0.
            "scene": {"resolution": [6, 4], "maxSteps": 27, "diskOpacity": 0.9,
                      "dtype": "float64"},
        }
    )
    params, static = cfg.params(), cfg.static()
    a = np.asarray(render(params, static, differentiable=False))
    b = np.asarray(render(params, static, differentiable=True))
    np.testing.assert_array_equal(a, b)

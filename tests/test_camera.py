"""Camera / ray-generation tests vs the scalar oracle."""

import numpy as np
import jax.numpy as jnp

from blackstar_tpu.camera import generate_rays, look_at_rotation
from blackstar_tpu.config import Config
from tests import oracle

CFG = Config.from_dict(
    {
        "camera": {
            "position": [0, 1, -20],
            "lookAt": [2, 0, 0],
            "upVec": [-0.2, 1, 0],
            "fov": 1.5,
        },
        "scene": {"dtype": "float64"},
    }
)


def test_look_at_rotation_matches_oracle():
    cam = CFG.params().camera
    got = np.asarray(look_at_rotation(cam.position, cam.look_at, cam.up))
    want = oracle.look_at_m33(
        np.array(CFG.camera.position, np.float64),
        np.array(CFG.camera.look_at, np.float64),
        np.array(CFG.camera.up, np.float64),
    )
    np.testing.assert_allclose(got, want, atol=1e-14)


def test_rotation_is_orthonormal():
    cam = CFG.params().camera
    rot = np.asarray(look_at_rotation(cam.position, cam.look_at, cam.up))
    np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-14)


def test_generate_rays_matches_oracle():
    w, h = 7, 5
    pos, vel = generate_rays(CFG.params().camera, w, h, dtype=jnp.float64)
    pos, vel = np.asarray(pos), np.asarray(vel).reshape(h, w, 3)
    for y in range(h):
        for x in range(w):
            want_vel, want_pos = oracle.generate_ray(CFG.camera, w, h, x, y)
            np.testing.assert_allclose(vel[y, x], want_vel, atol=1e-13)
            np.testing.assert_allclose(pos, want_pos, atol=1e-15)


def test_rays_are_unit_length():
    _, vel = generate_rays(CFG.params().camera, 16, 9, dtype=jnp.float64)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(vel), axis=-1), 1.0, atol=1e-13)


def test_center_ray_points_at_target():
    """A symmetric grid's central direction ~ lookAt - position."""
    cfg = Config.from_dict(
        {
            "camera": {
                "position": [0, 0, -10],
                "lookAt": [0, 0, 0],
                "upVec": [0, 1, 0],
                "fov": 1.0,
            }
        }
    )
    w = h = 101  # pixel (50, 50) has x/w - 0.5 ~ -0.0049; use exact half offset
    _, vel = generate_rays(cfg.params().camera, w, h, dtype=jnp.float64)
    centre = np.asarray(vel).reshape(h, w, 3)[50, 50]
    towards = np.array([0.0, 0.0, 1.0])
    # within half-pixel angular tolerance
    assert np.dot(centre, towards) > np.cos(0.02)

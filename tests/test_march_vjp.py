"""Hand-derived RK4 VJP vs JAX autodiff of the reference rk4_step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.geodesic import rk4_step
from blackstar_tpu.ops.march_vjp import Dot3, rk4_fwd, rk4_vjp


@pytest.fixture
def rays():
    rng = np.random.default_rng(0)
    n = 64
    pos = rng.uniform(-10, 10, (n, 3))
    vel = rng.normal(size=(n, 3))
    vel /= np.linalg.norm(vel, axis=-1, keepdims=True)
    h2 = np.einsum("ij,ij->i", np.cross(pos, vel), np.cross(pos, vel))
    return (
        jnp.asarray(pos, jnp.float64),
        jnp.asarray(vel, jnp.float64),
        jnp.asarray(h2, jnp.float64),
    )


def _as_dot3(arr):
    return Dot3(arr[:, 0], arr[:, 1], arr[:, 2])


def _from_dot3(d):
    return jnp.stack([d.x, d.y, d.z], axis=-1)


def test_rk4_fwd_matches_reference(rays):
    pos, vel, h2 = rays
    h, mass = 0.3, 1.1
    want_p, want_v = rk4_step(pos, vel, h, h2, jnp.float64(mass))
    coef = -1.5 * mass * h2
    got_p, got_v = rk4_fwd(_as_dot3(pos), _as_dot3(vel), h, coef)
    np.testing.assert_allclose(np.asarray(_from_dot3(got_p)), np.asarray(want_p), rtol=1e-13)
    np.testing.assert_allclose(np.asarray(_from_dot3(got_v)), np.asarray(want_v), rtol=1e-13)


def test_rk4_vjp_matches_autodiff(rays):
    pos, vel, h2 = rays
    h, mass = 0.3, 1.0
    coef = -1.5 * mass * h2
    rng = np.random.default_rng(1)
    pbar_out = jnp.asarray(rng.normal(size=pos.shape))
    vbar_out = jnp.asarray(rng.normal(size=vel.shape))

    # Autodiff reference: vjp of (pos, vel, coef) -> (new_pos, new_vel)
    def f(p, v, c):
        np_, nv = rk4_fwd(_as_dot3(p), _as_dot3(v), h, c)
        return _from_dot3(np_), _from_dot3(nv)

    _, vjp = jax.vjp(f, pos, vel, coef)
    want_p, want_v, want_c = vjp((pbar_out, vbar_out))

    got_p, got_v, got_c = rk4_vjp(
        _as_dot3(pos), _as_dot3(vel), h, coef, _as_dot3(pbar_out), _as_dot3(vbar_out)
    )
    np.testing.assert_allclose(np.asarray(_from_dot3(got_p)), np.asarray(want_p), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(_from_dot3(got_v)), np.asarray(want_v), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c), rtol=1e-10)


def test_rk4_vjp_matches_autodiff_of_reference_step(rays):
    """Against the *production* rk4_step (with its r⁵ = r²·r²·√r² form)."""
    pos, vel, h2 = rays
    h, mass = 0.3, 1.0

    def f(p, v, m):
        return rk4_step(p, v, h, h2, m)

    rng = np.random.default_rng(2)
    pbar_out = jnp.asarray(rng.normal(size=pos.shape))
    vbar_out = jnp.asarray(rng.normal(size=vel.shape))
    _, vjp = jax.vjp(f, pos, vel, jnp.float64(mass))
    want_p, want_v, want_m = vjp((pbar_out, vbar_out))

    coef = -1.5 * mass * h2
    got_p, got_v, got_c = rk4_vjp(
        _as_dot3(pos), _as_dot3(vel), h, coef, _as_dot3(pbar_out), _as_dot3(vbar_out)
    )
    # mass̄ = Σ_rays (−1.5·h²)·c̄oef
    got_m = jnp.sum(-1.5 * h2 * got_c)
    np.testing.assert_allclose(np.asarray(_from_dot3(got_p)), np.asarray(want_p), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(_from_dot3(got_v)), np.asarray(want_v), rtol=1e-9)
    np.testing.assert_allclose(float(got_m), float(want_m), rtol=1e-9)

"""Pallas adjoint kernel (interpret mode) vs the validated reference adjoint."""

import jax.numpy as jnp
import numpy as np
import pytest

from blackstar_tpu.color import hsi_to_rgb
from blackstar_tpu.ops.march_adjoint_pallas import march_adjoint_pallas
from blackstar_tpu.ops.march_vjp import march_adjoint_reference

H = 0.3
# 32 steps: rays from r=20 travel 9.6 units — plenty of disk crossings in
# the 1.8..13 annulus and every ray still active at the cap (the same
# regime as 50 steps, ~35% less interpreter time; suite budget, VERDICT r2
# weak #8 -> #8 runtime item).
MAX_STEPS = 32
SAFE = 2500.0


def _setup(n=96, disk_opacity=0.95, seed=4):
    rng = np.random.default_rng(seed)
    pos0 = jnp.asarray([0.0, 1.0, -20.0], jnp.float32)
    fwd = np.array([0.0, -0.05, 1.0])
    dirs = fwd + 0.25 * rng.normal(size=(n, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    vel0 = jnp.asarray(dirs, jnp.float32)
    cot_acc = jnp.asarray(rng.normal(size=(n, 4)), jnp.float32)
    cot_vel = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return pos0, vel0, cot_acc, cot_vel


@pytest.mark.parametrize("defer", [True, False], ids=["defer", "inline"])
@pytest.mark.parametrize("disk_opacity", [0.95, 0.0], ids=["disk", "no-disk"])
def test_pallas_adjoint_matches_reference(disk_opacity, defer):
    if disk_opacity == 0.0 and not defer:
        pytest.skip("defer is a no-op with the disk off")
    pos0, vel0, cot_acc, cot_vel = _setup(disk_opacity=disk_opacity)
    disk_on = disk_opacity != 0.0
    kw = dict(
        mass=jnp.float32(1.0),
        inner=jnp.float32(1.8),
        outer=jnp.float32(13.0),
        opacity=jnp.float32(disk_opacity),
        disk_rgb=hsi_to_rgb(jnp.asarray([0.5, 0.1, 1.05], jnp.float32)),
        safe=jnp.float32(SAFE),
    )
    want = march_adjoint_reference(
        pos0, vel0, h=H, max_steps=MAX_STEPS, disk_on=disk_on,
        cot_acc=cot_acc, cot_vel=cot_vel, **kw,
    )
    got = march_adjoint_pallas(
        pos0, vel0, cot_acc, cot_vel,
        step_size=H, max_steps=MAX_STEPS,
        mass=kw["mass"], safe_distance=kw["safe"], disk_on=disk_on,
        disk_inner=kw["inner"], disk_outer=kw["outer"],
        disk_opacity=kw["opacity"], disk_rgb=kw["disk_rgb"],
        block_rows=2, seg_len=8, defer_shade=defer, interpret=True,
    )
    names = ["pos0", "vel0", "mass", "inner", "outer", "opacity", "rgb"]
    for name, w, g in zip(names, want, got):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5, err_msg=name
        )


def test_store_stages_bitwise_identical():
    """The stored-stage VJP must be bit-for-bit the recompute VJP — the
    replay computed the identical expressions (same inputs, same op order).
    Via transitivity with the reference-match gate above, this also gates
    store_stages against the reference adjoint (no separate slow
    parametrisation needed). A reduced step count keeps disk crossings and
    the cap edge in play while the interpreter stays fast."""
    pos0, vel0, cot_acc, cot_vel = _setup()
    kw = dict(
        pos0=pos0, vel0=vel0, cot_acc=cot_acc, cot_vel=cot_vel,
        step_size=H, max_steps=20,
        mass=jnp.float32(1.0), safe_distance=jnp.float32(SAFE), disk_on=True,
        disk_inner=jnp.float32(1.8), disk_outer=jnp.float32(13.0),
        disk_opacity=jnp.float32(0.95),
        disk_rgb=hsi_to_rgb(jnp.asarray([0.5, 0.1, 1.05], jnp.float32)),
        block_rows=2, seg_len=8, interpret=True,
    )
    base = march_adjoint_pallas(store_stages=False, **kw)
    stag = march_adjoint_pallas(store_stages=True, **kw)
    nonzero = False
    for w, g in zip(base, stag):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
        nonzero = nonzero or bool(np.any(np.asarray(w) != 0.0))
    assert nonzero, "degenerate case: all gradients zero"


def test_pallas_adjoint_ragged_padding():
    """91 rays over 2x128-ray tiles: padding cotangents are zero and must
    contribute nothing to parameter gradients."""
    pos0, vel0, cot_acc, cot_vel = _setup(n=91)
    kw = dict(
        mass=jnp.float32(1.0), inner=jnp.float32(1.8), outer=jnp.float32(13.0),
        opacity=jnp.float32(0.95),
        disk_rgb=hsi_to_rgb(jnp.asarray([0.5, 0.1, 1.05], jnp.float32)),
        safe=jnp.float32(SAFE),
    )
    want = march_adjoint_reference(
        pos0, vel0, h=H, max_steps=MAX_STEPS, disk_on=True,
        cot_acc=cot_acc, cot_vel=cot_vel, **kw,
    )
    got = march_adjoint_pallas(
        pos0, vel0, cot_acc, cot_vel,
        step_size=H, max_steps=MAX_STEPS,
        mass=kw["mass"], safe_distance=kw["safe"], disk_on=True,
        disk_inner=kw["inner"], disk_outer=kw["outer"],
        disk_opacity=kw["opacity"], disk_rgb=kw["disk_rgb"],
        block_rows=1, seg_len=8, interpret=True,
    )
    assert got[1].shape == (91, 3)
    for w, g in zip(want, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5)

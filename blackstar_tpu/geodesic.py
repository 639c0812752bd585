"""Batched null-geodesic marching in Schwarzschild spacetime.

Physics per the reference (Raytracer.hs:113-134): photons follow the
pseudo-Cartesian Schwarzschild ODE

    d(vel)/dt = -1.5 · rs · h² / |pos|⁵ · pos,      d(pos)/dt = vel,

with ``h² = |pos × vel|²`` the conserved squared angular momentum computed
once per ray (Raytracer.hs:73), integrated with classic fixed-step RK4. The
reference hard-codes the Schwarzschild radius rs = 1; we expose it as the
differentiable ``mass`` parameter (rs² scales the horizon test ``r² < rs²``,
Raytracer.hs:93).

TPU-first redesign of the per-pixel recursion (``colorize``,
Raytracer.hs:77-86): every ray advances in lock-step through a *fixed-cap*
masked loop. Per-step classification (``findColor``, Raytracer.hs:88-102):

  1. ``r² < rs²``        -> horizon: terminal, opaque black
  2. ``r² > safe``       -> escaped: terminal, celestial-sphere colour looked
                            up later from the ray's frozen velocity
  3. disk-plane crossing -> blend a translucent layer front-to-back and keep
                            marching (sign(y) flip with the crossing radius
                            linearly interpolated in y, Raytracer.hs:96-102)

Terminated lanes freeze their state; the loop exits early once every ray in
the batch is done (``lax.while_loop``), or runs a static ``lax.scan`` with
``jax.checkpoint`` segments when reverse-mode differentiability is required.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from blackstar_tpu.color import blend_over, hsi_to_rgb
from blackstar_tpu.config import SceneParams, StaticConfig

# Ray status codes carried through the march loop.
ACTIVE = 0
ESCAPED = 1
HORIZON = 2


class MarchResult(NamedTuple):
    acc_rgba: jnp.ndarray  # (N, 4) front-to-back accumulated disk colour
    vel: jnp.ndarray  # (N, 3) frozen velocity (escape direction for ESCAPED)
    status: jnp.ndarray  # (N,) int32: ACTIVE (truncated) / ESCAPED / HORIZON
    steps: jnp.ndarray  # () int32 steps actually executed


def _rowdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(a * b, axis=-1)


def rk4_step(
    pos: jnp.ndarray, vel: jnp.ndarray, h, h2: jnp.ndarray, mass
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One classic RK4 step of the photon ODE (Raytracer.hs:113-134).

    ``pos``/``vel`` are (..., 3); ``h2`` is (...,) per-ray conserved angular
    momentum; ``h`` the step size; ``mass`` the Schwarzschild radius rs.
    """
    coef = -1.5 * mass * h2  # (...,)

    def f(p, v):
        r2 = _rowdot(p, p)
        r5 = r2 * r2 * jnp.sqrt(r2)
        acc = (coef / r5)[..., None] * p
        return acc, v  # (d vel, d pos)

    k1v, k1p = f(pos, vel)
    k2v, k2p = f(pos + (h / 2) * k1p, vel + (h / 2) * k1v)
    k3v, k3p = f(pos + (h / 2) * k2p, vel + (h / 2) * k2v)
    k4v, k4p = f(pos + h * k3p, vel + h * k3v)
    new_vel = vel + (h / 6) * (k1v + 2 * k2v + 2 * k3v + k4v)
    new_pos = pos + (h / 6) * (k1p + 2 * k2p + 2 * k3p + k4p)
    return new_pos, new_vel


def _march_step(state, *, h, h2, mass, safe, disk_on, disk_rgb, disk, valid=True):
    """One masked step for all rays: RK4 + classify + composite + freeze.

    The classifier evaluates on the *pre-step* state (old position radius and
    old velocity) exactly like ``findColor`` receiving ``crd'`` before
    ``newCrd`` (Raytracer.hs:79-81, :88-102). ``valid`` gates steps past the
    cap (used by the fixed-length differentiable path).
    """
    pos, vel, acc, status = state
    dt = pos.dtype

    new_pos, new_vel = rk4_step(pos, vel, h, h2, mass)

    r2 = _rowdot(pos, pos)
    active = (status == ACTIVE) & valid
    rs2 = mass * mass
    hit_horizon = active & (r2 < rs2)
    hit_escape = active & ~(r2 < rs2) & (r2 > safe)
    cont = active & ~hit_horizon & ~hit_escape

    if disk_on:
        inner2 = disk.inner * disk.inner
        outer2 = disk.outer * disk.outer
        y = pos[:, 1]
        y2 = new_pos[:, 1]
        r2n = _rowdot(new_pos, new_pos)
        sign_flip = jnp.sign(y) != jnp.sign(y2)
        denom = y2 - y
        denom_safe = jnp.where(sign_flip, denom, jnp.ones((), dt))
        r2ave = (y2 * r2 - y * r2n) / denom_safe
        hit_disk = (
            cont
            & (disk.opacity != 0)
            & sign_flip
            & (r2ave > inner2)
            & (r2ave < outer2)
        )
        # Guard sqrt/grad for masked lanes with an in-range dummy radius.
        r2ave_safe = jnp.where(hit_disk, r2ave, 0.5 * (inner2 + outer2))
        r = jnp.sqrt(r2ave_safe)
        # Radial profile sin(π·((rOuter−r)/(rOuter−rInner))²) (Raytracer.hs:104-111)
        frac = (disk.outer - r) / (disk.outer - disk.inner)
        intensity = jnp.sin(jnp.pi * frac * frac)
        layer = jnp.concatenate(
            [
                (disk_rgb[None, :] * intensity[:, None]),
                (intensity * disk.opacity)[:, None],
            ],
            axis=-1,
        )
        acc = jnp.where(hit_disk[:, None], blend_over(acc, layer), acc)

    status = jnp.where(
        hit_horizon,
        jnp.int32(HORIZON),
        jnp.where(hit_escape, jnp.int32(ESCAPED), status),
    )
    upd = cont[:, None]
    pos = jnp.where(upd, new_pos, pos)
    vel = jnp.where(upd, new_vel, vel)
    return pos, vel, acc, status


def march(
    pos0: jnp.ndarray,
    vel0: jnp.ndarray,
    params: SceneParams,
    static: StaticConfig,
    safe_distance: jnp.ndarray,
    *,
    differentiable: bool = False,
    checkpoint_segment: int = 25,
) -> MarchResult:
    """March a batch of rays to termination.

    ``pos0``: (3,) shared camera position or (N, 3); ``vel0``: (N, 3) unit
    directions. ``safe_distance`` is the squared escape radius
    (``max(50², 2|camPos|²)``, Raytracer.hs:59-60).

    ``differentiable=False`` uses ``lax.while_loop`` with whole-batch early
    exit (fast forward path). ``differentiable=True`` uses a static-length
    ``lax.scan`` of ``jax.checkpoint``-wrapped segments so reverse-mode AD
    works with O(n_steps/segment) saved states (the "checkpointed RK4 steps"
    design from the survey §7.5).
    """
    dt = static.jdtype
    vel0 = vel0.astype(dt)
    pos0 = jnp.broadcast_to(pos0.astype(dt), vel0.shape)
    n = vel0.shape[0]

    # Conserved angular momentum per ray (Raytracer.hs:73).
    cr = jnp.cross(pos0, vel0)
    h2 = _rowdot(cr, cr)

    disk_rgb = hsi_to_rgb(params.disk.color_hsi.astype(dt))
    step = partial(
        _march_step,
        h=jnp.asarray(static.step_size, dt),
        h2=h2,
        mass=params.mass.astype(dt),
        safe=jnp.asarray(safe_distance, dt),
        disk_on=static.disk_on,
        disk_rgb=disk_rgb,
        disk=jax.tree.map(lambda x: x.astype(dt), params.disk),
    )

    acc0 = jnp.zeros((n, 4), dt)
    status0 = jnp.zeros((n,), jnp.int32)
    max_steps = static.max_steps

    if not differentiable:
        def cond(carry):
            i, state = carry
            return (i < max_steps) & jnp.any(state[3] == ACTIVE)

        def body(carry):
            i, state = carry
            return i + 1, step(state)

        steps, state = jax.lax.while_loop(
            cond, body, (jnp.int32(0), (pos0, vel0, acc0, status0))
        )
    else:
        seg = max(1, min(checkpoint_segment, max_steps))
        n_segs = -(-max_steps // seg)

        @jax.checkpoint
        def segment(state, seg_idx):
            # Steps past the cap in the final segment are masked, so the
            # fixed-length path is exactly equivalent to the capped loop.
            state = jax.lax.fori_loop(
                0,
                seg,
                lambda j, s: step(s, valid=seg_idx * seg + j < max_steps),
                state,
            )
            return state, None

        state, _ = jax.lax.scan(
            segment, (pos0, vel0, acc0, status0), jnp.arange(n_segs)
        )
        steps = jnp.int32(max_steps)

    pos, vel, acc, status = state
    return MarchResult(acc_rgba=acc, vel=vel, status=status, steps=steps)

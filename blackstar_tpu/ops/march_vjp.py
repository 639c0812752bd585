"""Hand-derived adjoint of the geodesic march (reverse-mode gradients).

The autodiff backward of the checkpointed-scan march (geodesic.march,
differentiable=True) streams the full ray state through HBM every step and
cannot early-exit, making training ~20× slower than the Pallas forward. This
module derives the adjoint *by hand* so it can run inside a VMEM-resident
Pallas kernel (ops/march_adjoint_pallas) with the same tiling as the forward.

The math here is the exact reverse of ``geodesic._march_step``'s scan path
(same where-routing as JAX's AD: mask indicators are non-differentiable,
cotangents flow only through selected branches):

  * RK4 VJP (classic tableau, acceleration a(p) = coef·p/|p|⁵ with
    coef = −1.5·mass·h², h² per-ray conserved)
  * event masks (horizon/escape/disk) recomputed from the primal replay
  * front-to-back disk blend VJP (cotangents into the crossing geometry,
    the disk parameters, and the running alpha)
  * h² = |pos₀×vel₀|² VJP into the camera position and ray directions

Everything is written in plain jnp on (N,)-component arrays so the identical
code can be validated against ``jax.grad`` of the XLA march and then lifted
into the kernel. Validation: tests/test_march_vjp.py.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Dot3(NamedTuple):
    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    def __add__(self, o):
        return Dot3(self.x + o.x, self.y + o.y, self.z + o.z)

    def scale(self, s):
        return Dot3(s * self.x, s * self.y, s * self.z)

    def dot(self, o):
        return self.x * o.x + self.y * o.y + self.z * o.z


def _accel(p: Dot3, coef):
    r2 = p.dot(p)
    inv = jax.lax.rsqrt(r2)
    s = coef * inv * (inv * inv) * (inv * inv)  # coef / r^5
    return p.scale(s)


def _accel_vjp(p: Dot3, coef, abar: Dot3) -> Tuple[Dot3, jnp.ndarray]:
    """VJP of a(p) = coef·p·r2^{-5/2} w.r.t. (p, coef).

    p̄ = coef·r2^{-5/2}·ā − 5·coef·r2^{-7/2}·(p·ā)·p
    c̄oef = (p·ā)·r2^{-5/2}
    """
    r2 = p.dot(p)
    inv = jax.lax.rsqrt(r2)
    inv5 = inv * (inv * inv) * (inv * inv)
    pa = p.dot(abar)
    pbar = abar.scale(coef * inv5) + p.scale(-5.0 * coef * inv5 / r2 * pa)
    coef_bar = pa * inv5
    return pbar, coef_bar


def rk4_fwd(p: Dot3, v: Dot3, h, coef, *, with_stages: bool = False):
    """Forward RK4 step (identical tableau to geodesic.rk4_step).

    ``with_stages=True`` additionally returns the stage positions
    ``(q2, q3, q4)`` — the exact residuals :func:`rk4_vjp` needs, letting a
    caller that stores them (the Pallas adjoint's segment replay) skip the
    VJP's stage recomputation.
    """
    h2_ = h * 0.5
    k1v = _accel(p, coef)
    q2 = p + v.scale(h2_)
    u2 = v + k1v.scale(h2_)
    k2v = _accel(q2, coef)
    q3 = p + u2.scale(h2_)
    u3 = v + k2v.scale(h2_)
    k3v = _accel(q3, coef)
    q4 = p + u3.scale(h)
    u4 = v + k3v.scale(h)
    k4v = _accel(q4, coef)
    s = h / 6.0
    new_p = p + (v + (u2 + u3).scale(2.0) + u4).scale(s)
    new_v = v + (k1v + (k2v + k3v).scale(2.0) + k4v).scale(s)
    if with_stages:
        return new_p, new_v, (q2, q3, q4)
    return new_p, new_v


def rk4_vjp(
    p: Dot3, v: Dot3, h, coef, pbar_out: Dot3, vbar_out: Dot3, stages=None
) -> Tuple[Dot3, Dot3, jnp.ndarray]:
    """VJP of one RK4 step: (p̄', v̄') → (p̄, v̄, c̄oef), in the *fused-stage*
    closed form (r4; same derivative, ~35% fewer flops than the mechanical
    tableau reverse it replaces — see DESIGN.md §5).

    Eliminating the stage velocities u₂..u₄ from the tableau gives

        p' = p + h·v + (h²/6)(k₁+k₂+k₃)
        v' = v + (h/6)(k₁+2k₂+2k₃+k₄)
        q₂ = p + (h/2)v    q₃ = p + (h/2)v + (h²/4)k₁    q₄ = p + h·v + (h²/2)k₂

    so the stage cotangents collapse to (A = (h²/6)p̄' + (h/3)v̄'):

        k̄₄ = (h/6)v̄'              q̄₄ = J₄k̄₄
        k̄₂ = A + (h²/2)q̄₄         q̄₂ = J₂k̄₂
        k̄₃ = A                     q̄₃ = J₃k̄₃
        k̄₁ = (h²/6)p̄'+(h/6)v̄'+(h²/4)q̄₃        q̄₁ = J₁k̄₁
        p̄  = p̄' + q̄₁+q̄₂+q̄₃+q̄₄
        v̄  = v̄' + h·p̄' + (h/2)(q̄₂+q̄₃) + h·q̄₄

    with J = a'(q) = s·I + c·q qᵀ *symmetric* (s = coef·r⁻⁵,
    c = −5·coef·r⁻⁷), so each q̄ᵢ is one dot + two axpys — the u-chain
    bookkeeping of the mechanical reverse is gone, and so is its per-stage
    divide (r⁻² rides the shared rsqrt). Results agree with jax.grad of
    :func:`rk4_fwd` to reassociation-level rounding (gated at rtol 1e-10,
    tests/test_march_vjp.py).

    By default recomputes the forward stage positions from (p, v) — no
    residuals needed beyond the pre-step state, which is what makes the
    VMEM-checkpointed kernel adjoint possible. Pass ``stages=(q2, q3, q4)``
    (from ``rk4_fwd(..., with_stages=True)``) to skip that recomputation
    when the caller already holds them.
    """
    h2_ = h * 0.5
    if stages is None:
        # Recompute stage positions (the stage-Jacobian applications need
        # them; q4 needs k2, so two accelerations are unavoidable here).
        k1v = _accel(p, coef)
        q2 = p + v.scale(h2_)
        u2 = v + k1v.scale(h2_)
        k2v = _accel(q2, coef)
        q3 = p + u2.scale(h2_)
        u3 = v + k2v.scale(h2_)
        q4 = p + u3.scale(h)
    else:
        q2, q3, q4 = stages

    def jtp(q: Dot3, kbar: Dot3):
        """q̄ = J(q)ᵀk̄ (J symmetric) and the stage's c̄oef contribution."""
        r2 = q.dot(q)
        inv = jax.lax.rsqrt(r2)
        inv2 = inv * inv
        inv5 = inv * inv2 * inv2
        pa = q.dot(kbar)
        s = coef * inv5
        qbar = kbar.scale(s) + q.scale(-5.0 * s * inv2 * pa)
        return qbar, pa * inv5

    s6 = h / 6.0
    hh6 = h * h / 6.0
    k4b = vbar_out.scale(s6)
    q4bar, cb4 = jtp(q4, k4b)

    ax = hh6 * pbar_out.x + 2.0 * s6 * vbar_out.x
    ay = hh6 * pbar_out.y + 2.0 * s6 * vbar_out.y
    az = hh6 * pbar_out.z + 2.0 * s6 * vbar_out.z
    a_ = Dot3(ax, ay, az)

    k2b = a_ + q4bar.scale(h * h2_)
    q2bar, cb2 = jtp(q2, k2b)
    q3bar, cb3 = jtp(q3, a_)  # k̄3 = A
    k1b = a_ + vbar_out.scale(-s6) + q3bar.scale(h2_ * h2_)
    q1bar, cb1 = jtp(p, k1b)

    pbar = pbar_out + q1bar + q2bar + q3bar + q4bar
    q23 = q2bar + q3bar
    vbar = Dot3(
        vbar_out.x + h * pbar_out.x + h2_ * q23.x + h * q4bar.x,
        vbar_out.y + h * pbar_out.y + h2_ * q23.y + h * q4bar.y,
        vbar_out.z + h * pbar_out.z + h2_ * q23.z + h * q4bar.z,
    )
    coef_bar = (cb1 + cb2) + (cb3 + cb4)
    return pbar, vbar, coef_bar


# ---------------------------------------------------------------------------
# Shared per-step primitives: the primal march step and its VJP, written on
# Dot3 component arrays so the same (validated) code runs both in the plain
# JAX reference adjoint below and inside the Pallas adjoint kernel.
# ---------------------------------------------------------------------------


class StepConsts(NamedTuple):
    """Per-march constants (scalars except the per-ray ``coef``)."""

    h: jnp.ndarray
    coef: jnp.ndarray  # (N,) = −1.5·mass·h²
    rs2: jnp.ndarray
    safe: jnp.ndarray
    in2: jnp.ndarray
    out2: jnp.ndarray
    mid: jnp.ndarray
    inner: jnp.ndarray
    outer: jnp.ndarray
    opacity: jnp.ndarray
    rgb0: jnp.ndarray
    rgb1: jnp.ndarray
    rgb2: jnp.ndarray


class AdjointCarry(NamedTuple):
    """Reverse-sweep state: cotangents + per-ray parameter partials."""

    pbar: Dot3
    vbar: Dot3
    arbar: jnp.ndarray
    agbar: jnp.ndarray
    abbar: jnp.ndarray
    aabar: jnp.ndarray
    coef_bar: jnp.ndarray
    inner_bar: jnp.ndarray  # per-ray partial, reduced at the end
    outer_bar: jnp.ndarray
    opacity_bar: jnp.ndarray
    rgb0_bar: jnp.ndarray
    rgb1_bar: jnp.ndarray
    rgb2_bar: jnp.ndarray


def _step_masks(status, r2, rs2, safe):
    active = status == 0
    is_h = r2 < rs2
    is_e = r2 > safe
    hit_h = active & is_h
    hit_e = active & is_e & ~is_h
    cont = active & ~(is_h | is_e)
    return hit_h, hit_e, cont


def alpha_shade(cand, r2, r2n, y, ny, acc_a, c: StepConsts):
    """Apply one (candidate-masked) disk crossing to the running alpha.

    ``cand`` = cont ∧ opacity≠0 ∧ sign-flip; the radius-window test and the
    divide/sqrt/sin live here so callers can *defer* this whole function
    behind a block-level ``lax.cond`` (see ops/march_pallas.py — crossings
    are rare, this is the expensive part of a step). Alpha outputs are
    bitwise identical to the inline form: non-candidate lanes never update.
    """
    ds = jnp.where(cand, ny - y, 1.0)
    r2ave = (ny * r2 - y * r2n) / ds
    hit = cand & (r2ave > c.in2) & (r2ave < c.out2)
    r2s = jnp.where(hit, r2ave, c.mid)
    r = jnp.sqrt(r2s)
    frac = (c.outer - r) / (c.outer - c.inner)
    intensity = jnp.sin(jnp.pi * frac * frac)
    return jnp.where(hit, acc_a + intensity * c.opacity * (1.0 - acc_a), acc_a)


def step_primal(p: Dot3, v: Dot3, acc_a, status, c: StepConsts, valid,
                *, disk_on: bool, defer_shade: bool = False,
                return_stages: bool = False):
    """One primal march step (alpha + status only — the RGB accumulators are
    identity under the blend and not needed by the adjoint).

    With ``defer_shade=True`` the alpha update is NOT applied; instead the
    step returns a fifth element — the ``alpha_shade`` argument stash
    ``(cand, r2, r2n, y, ny)`` — so the caller can batch crossings behind
    one block-level cond. ``acc_a`` passes through untouched in that mode.
    With ``return_stages=True`` the RK4 stage positions ``(q2, q3, q4)``
    are appended as the final element so a replaying caller can store the
    exact residuals :func:`step_vjp` needs (skipping its recompute).
    """
    if return_stages:
        np_, nv, stages = rk4_fwd(p, v, c.h, c.coef, with_stages=True)
    else:
        np_, nv = rk4_fwd(p, v, c.h, c.coef)
    r2 = p.dot(p)
    hit_h, hit_e, cont = _step_masks(status, r2, c.rs2, c.safe)
    hit_h = hit_h & valid
    hit_e = hit_e & valid
    cont = cont & valid
    stash = None
    if disk_on:
        r2n = np_.dot(np_)
        flip = jnp.sign(p.y) != jnp.sign(np_.y)
        # On a sign flip the crossing radius² is a convex combination of r²
        # and r²', so steps whose endpoints are both outside the disk
        # annulus can never hit — excluding them empties most deferred
        # segments (outputs identical: their shades are hit-masked no-ops).
        may_hit = ~(((r2 > c.out2) & (r2n > c.out2))
                    | ((r2 < c.in2) & (r2n < c.in2)))
        cand = cont & (c.opacity != 0) & flip & may_hit
        if defer_shade:
            stash = (cand, r2, r2n, p.y, np_.y)
        else:
            acc_a = alpha_shade(cand, r2, r2n, p.y, np_.y, acc_a, c)
    status = status + 2 * hit_h.astype(jnp.int32) + hit_e.astype(jnp.int32)
    p = Dot3(*(jnp.where(cont, a, b) for a, b in zip(np_, p)))
    v = Dot3(*(jnp.where(cont, a, b) for a, b in zip(nv, v)))
    out = (p, v, acc_a, status)
    if defer_shade:
        out = out + (stash,)
    if return_stages:
        out = out + (stages,)
    return out


def step_vjp(p: Dot3, v: Dot3, acc_a, status, c: StepConsts, valid,
             carry: AdjointCarry, *, disk_on: bool,
             post_p: Dot3 = None, stages=None) -> AdjointCarry:
    """Reverse of :func:`step_primal` given the *pre-step* primal state.

    ``post_p`` (the step's *frozen* post-step position, i.e. the next
    step's pre-state) and ``stages`` (the RK4 stage positions from the
    replay) are optional stored residuals: passing them skips this
    function's primal recomputation. Bitwise-identical either way — on
    lanes where the step froze (``cont`` false), the post state differs
    from the recomputed one, but every quantity derived from it is masked
    by ``cont``-gated selectors or multiplied by zeroed cotangents.
    """
    if post_p is None:
        np_, _ = rk4_fwd(p, v, c.h, c.coef)
    else:
        np_ = post_p
    r2 = p.dot(p)
    _, _, cont = _step_masks(status, r2, c.rs2, c.safe)
    cont = cont & valid

    # Reverse of: p' = where(cont, np, p); v' = where(cont, nv, v)
    np_bar = Dot3(*(jnp.where(cont, b, 0.0) for b in carry.pbar))
    pbar = Dot3(*(jnp.where(cont, 0.0, b) for b in carry.pbar))
    nv_bar = Dot3(*(jnp.where(cont, b, 0.0) for b in carry.vbar))
    vbar = Dot3(*(jnp.where(cont, 0.0, b) for b in carry.vbar))
    zero = jnp.zeros_like(p.x)
    r2_bar = zero
    aabar = carry.aabar
    ib, ob, opb = carry.inner_bar, carry.outer_bar, carry.opacity_bar
    r0b, r1b, r2b_ = carry.rgb0_bar, carry.rgb1_bar, carry.rgb2_bar

    if disk_on:
        r2n = np_.dot(np_)
        flip = jnp.sign(p.y) != jnp.sign(np_.y)
        ds = jnp.where(flip, np_.y - p.y, 1.0)
        r2ave = (np_.y * r2 - p.y * r2n) / ds
        hit = cont & (c.opacity != 0) & flip & (r2ave > c.in2) & (r2ave < c.out2)
        r2s = jnp.where(hit, r2ave, c.mid)
        r = jnp.sqrt(r2s)
        frac = (c.outer - r) / (c.outer - c.inner)
        intensity = jnp.sin(jnp.pi * frac * frac)
        one_m = 1.0 - acc_a
        hitf = hit.astype(p.x.dtype)

        rgb_dot = (
            carry.arbar * c.rgb0 + carry.agbar * c.rgb1 + carry.abbar * c.rgb2
        )
        # acc_c' = acc_c + hit·I·rgb_c·(1−a); acc_a' = a + hit·I·op·(1−a)
        ibar = hitf * one_m * (rgb_dot + aabar * c.opacity)
        opb = opb + hitf * aabar * intensity * one_m
        r0b = r0b + hitf * carry.arbar * intensity * one_m
        r1b = r1b + hitf * carry.agbar * intensity * one_m
        r2b_ = r2b_ + hitf * carry.abbar * intensity * one_m
        aabar = aabar * (1.0 - hitf * intensity * c.opacity) - hitf * intensity * rgb_dot

        # I = sin(π·frac²); frac = (outer − r)/(outer − inner); r = √r2s
        frac_bar = ibar * jnp.cos(jnp.pi * frac * frac) * (2.0 * jnp.pi * frac)
        denom = c.outer - c.inner
        r_bar = -frac_bar / denom
        ob = ob + frac_bar * (r - c.inner) / (denom * denom)
        ib = ib + frac_bar * frac / denom
        r2ave_bar = jnp.where(hit, r_bar * 0.5 / r, 0.0)
        # r2ave = (y2·r2 − y·r2n)/ds, ds = y2 − y on crossing lanes
        y2_bar = r2ave_bar * (r2 - r2ave) / ds
        y_bar = r2ave_bar * (r2ave - r2n) / ds
        r2_bar = r2_bar + r2ave_bar * np_.y / ds
        r2n_bar = -r2ave_bar * p.y / ds
        np_bar = np_bar + np_.scale(2.0 * r2n_bar)
        np_bar = Dot3(np_bar.x, np_bar.y + y2_bar, np_bar.z)
        pbar = Dot3(pbar.x, pbar.y + y_bar, pbar.z)

    pbar = pbar + p.scale(2.0 * r2_bar)
    pb, vb, cb = rk4_vjp(p, v, c.h, c.coef, np_bar, nv_bar, stages=stages)
    return AdjointCarry(
        pbar=pbar + pb,
        vbar=vbar + vb,
        arbar=carry.arbar,
        agbar=carry.agbar,
        abbar=carry.abbar,
        aabar=aabar,
        coef_bar=carry.coef_bar + cb,
        inner_bar=ib,
        outer_bar=ob,
        opacity_bar=opb,
        rgb0_bar=r0b,
        rgb1_bar=r1b,
        rgb2_bar=r2b_,
    )


# ---------------------------------------------------------------------------
# Full march adjoint — reference implementation (plain jnp, stores every
# step; validates the math against jax.grad of geodesic.march and is the
# blueprint for the VMEM-checkpointed Pallas kernel).
# ---------------------------------------------------------------------------


def march_adjoint_reference(
    pos0: jnp.ndarray,  # (3,)
    vel0: jnp.ndarray,  # (N, 3)
    *,
    h: float,
    max_steps: int,
    mass,
    inner,
    outer,
    opacity,
    disk_rgb,  # (3,)
    safe,
    disk_on: bool,
    cot_acc: jnp.ndarray,  # (N, 4)
    cot_vel: jnp.ndarray,  # (N, 3)
):
    """Gradients of march outputs (acc_rgba, final vel) w.r.t. every
    differentiable input, derived by hand.

    Returns (pos0̄ (3,), vel0̄ (N,3), mass̄, inner̄, outer̄, opacitȳ, rgb̄ (3,)).
    Mirrors exactly what reverse-mode AD of ``geodesic.march``'s scan path
    computes (masks constant, cotangents routed through selected branches).
    """
    dt = vel0.dtype
    n = vel0.shape[0]
    p0b = jnp.broadcast_to(pos0.astype(dt), (n, 3))
    v0 = vel0.astype(dt)

    cr = jnp.cross(p0b, v0)
    h2 = jnp.sum(cr * cr, axis=-1)
    c = StepConsts(
        h=jnp.asarray(h, dt),
        coef=-1.5 * mass * h2,
        rs2=mass * mass,
        safe=jnp.asarray(safe, dt),
        in2=inner * inner,
        out2=outer * outer,
        mid=0.5 * (inner * inner + outer * outer),
        inner=inner,
        outer=outer,
        opacity=opacity,
        rgb0=disk_rgb[0],
        rgb1=disk_rgb[1],
        rgb2=disk_rgb[2],
    )

    p = Dot3(p0b[:, 0], p0b[:, 1], p0b[:, 2])
    v = Dot3(v0[:, 0], v0[:, 1], v0[:, 2])
    valid = jnp.asarray(True)

    # ---- forward, storing all pre-step states -------------------------------
    def fwd_step(carry, _):
        p, v, acc_a, status = carry
        pre = (p, v, acc_a, status)
        p, v, acc_a, status = step_primal(
            p, v, acc_a, status, c, valid, disk_on=disk_on
        )
        return (p, v, acc_a, status), pre

    acc_a0 = jnp.zeros((n,), dt)
    status0 = jnp.zeros((n,), jnp.int32)
    _, pres = jax.lax.scan(
        fwd_step, (p, v, acc_a0, status0), None, length=max_steps
    )

    # ---- backward ------------------------------------------------------------
    zero = jnp.zeros((n,), dt)
    carry = AdjointCarry(
        pbar=Dot3(zero, zero, zero),
        vbar=Dot3(
            cot_vel[:, 0].astype(dt), cot_vel[:, 1].astype(dt), cot_vel[:, 2].astype(dt)
        ),
        arbar=cot_acc[:, 0].astype(dt),
        agbar=cot_acc[:, 1].astype(dt),
        abbar=cot_acc[:, 2].astype(dt),
        aabar=cot_acc[:, 3].astype(dt),
        coef_bar=zero,
        inner_bar=zero,
        outer_bar=zero,
        opacity_bar=zero,
        rgb0_bar=zero,
        rgb1_bar=zero,
        rgb2_bar=zero,
    )

    def bwd_step(carry, pre):
        p, v, acc_a, status = pre
        return step_vjp(p, v, acc_a, status, c, valid, carry, disk_on=disk_on), None

    carry, _ = jax.lax.scan(bwd_step, carry, pres, reverse=True)

    # coef = −1.5·mass·h²
    h2_bar = -1.5 * mass * carry.coef_bar
    mass_bar = jnp.sum(-1.5 * h2 * carry.coef_bar)
    # h² = |p0×v0|²: v̄0 += 2·h̄2·(c×p0); p̄0 += 2·h̄2·(v0×c)
    v0bar = (
        jnp.stack([carry.vbar.x, carry.vbar.y, carry.vbar.z], axis=-1)
        + 2.0 * h2_bar[:, None] * jnp.cross(cr, p0b)
    )
    p0bar_rays = (
        jnp.stack([carry.pbar.x, carry.pbar.y, carry.pbar.z], axis=-1)
        + 2.0 * h2_bar[:, None] * jnp.cross(v0, cr)
    )
    pos0_bar = jnp.sum(p0bar_rays, axis=0)
    rgb_bar = jnp.stack(
        [
            jnp.sum(carry.rgb0_bar),
            jnp.sum(carry.rgb1_bar),
            jnp.sum(carry.rgb2_bar),
        ]
    )
    return (
        pos0_bar,
        v0bar,
        mass_bar,
        jnp.sum(carry.inner_bar),
        jnp.sum(carry.outer_bar),
        jnp.sum(carry.opacity_bar),
        rgb_bar,
    )

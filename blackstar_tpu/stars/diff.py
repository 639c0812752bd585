"""Differentiable star stage at PRODUCTION speed — a hand-derived VJP.

The autodiff star path (``lookup_grouped(differentiable=True)``) cannot use
the production machinery: ``while_loop`` has no VJP, so it falls back to
capacity-based compaction behind ``lax.cond`` guards — which this toolchain
lowers to predicated BOTH-branch execution — and its backward additionally
transposes the whole compaction apparatus. Measured on v5e @1080p with the
470k-star sky (r4, scripts/bench_diff_pipeline.py): +40 ms on the forward
and ~340 ms on the backward — the flagship *differentiable* pipeline ran at
4.2 Mrays/s.

This module instead wraps the production forward (row-band schedule,
pay-as-you-go ``while_loop`` compaction — stars/grid.py) in a
``jax.custom_vjp`` whose backward is the SAME machinery running the
hand-derived 5-channel gradient math (``StarGrid._slot_math`` grad mode):
one more production-schedule sweep instead of a transposed apparatus.
Inside a custom-vjp both passes may use ``while_loop`` freely.

The clamp (``min(acc, 1)``, StarMap.hs:115) and the escaped-ray mask stay
OUTSIDE the wrapper as ordinary autodiff-visible ops, so the incoming
cotangents arrive with the clamp/mask already folded in — the backward
needs no residuals beyond the primal inputs (both sweeps are
independently exact; they don't even need matching schedules).

Gradient semantics mirror ``jax.grad`` of the autodiff path exactly
(including lax.min's 0.5 tie-split at the PSF brightness cap); gated by
tests/test_star_diff.py at rtol 1e-11 (f64) against jax.grad.

Star-TABLE gradients are intentionally dropped: the grid's ``cell_data``
holds catalogue constants (star positions / magnitude / colour basis),
which are scene *data*, not scene *parameters* — no reference workload
trains them, and the production gather schedule has no transpose. The
backward therefore returns zero cotangents for every grid leaf (see
``bwd``); a future catalogue-fitting use must NOT route grid gradients
through this wrapper (use the capacity-compaction autodiff path instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _zero_cot(x):
    """Zero cotangent for a data (non-differentiated) leaf: float zeros for
    inexact dtypes, float0 for int/bool leaves (JAX's tangent type)."""
    if jnp.issubdtype(jnp.result_type(x), jnp.inexact):
        return jnp.zeros_like(x)
    return np.zeros(jnp.shape(x), jax.dtypes.float0)


@functools.lru_cache(maxsize=32)
def _make_star_vjp(kw_items):
    """Build (and cache) the custom-vjp star stage for one static schedule
    (group / row-band / chunk / batching knobs)."""
    kw = dict(kw_items)

    @jax.custom_vjp
    def f(grid, vel, intensity, saturation, active):
        # UNCLAMPED per-ray sums via the production schedule. active only
        # steers the schedule (probe substitution, invalid masking); the
        # output mask lives outside.
        return grid.lookup_grouped(
            vel, intensity, saturation, active, clamp=False, **kw
        )

    def fwd(grid, vel, intensity, saturation, active):
        out = f(grid, vel, intensity, saturation, active)
        return out, (grid, vel, intensity, saturation, active)

    def bwd(res, cot):
        grid, vel, intensity, saturation, active = res
        dt = vel.dtype
        wr, wg, wb = cot[:, 0], cot[:, 1], cot[:, 2]
        # Reverse sweep — the same production machinery, 5 gradient
        # channels per ray w.r.t. the NORMALISED directions + the two
        # scalar parameters.
        gnx, gny, gnz, gi, gs = grid.lookup_grouped(
            vel, intensity, saturation, active,
            wplanes=(wr, wg, wb), **kw
        )
        # Chain through the in-lookup normalisation n = v/|v| (with the
        # same dead-lane probe substitution — keeps |v| > 0; those lanes'
        # cotangents are already zero via the outer mask's VJP):
        # ∂n_i/∂v_j = inv·(δ_ij − n_i n_j).
        one = jnp.ones((), dt)
        vx = jnp.where(active, vel[:, 0], one)
        vy = jnp.where(active, vel[:, 1], one)
        vz = jnp.where(active, vel[:, 2], one)
        inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        nx, ny, nz = vx * inv, vy * inv, vz * inv
        gdotn = gnx * nx + gny * ny + gnz * nz
        gvel = jnp.stack(
            [(gnx - nx * gdotn) * inv,
             (gny - ny * gdotn) * inv,
             (gnz - nz * gdotn) * inv],
            axis=-1,
        )
        # Grid leaves are catalogue DATA, deliberately non-differentiated
        # (module docstring) — zero cotangents, not real table gradients.
        g_grid = jax.tree.map(_zero_cot, grid)
        g_active = np.zeros(jnp.shape(active), jax.dtypes.float0)
        return (g_grid, gvel, jnp.sum(gi).astype(intensity.dtype),
                jnp.sum(gs).astype(saturation.dtype), g_active)

    f.defvjp(fwd, bwd)
    return f


def lookup_grouped_diff(grid, vel, intensity, saturation, active, **kw):
    """Drop-in for the differentiable star stage on grouped-eligible
    frames: production-schedule forward, hand-derived production-schedule
    backward. ``kw`` takes the same static schedule knobs as
    :meth:`StarGrid.lookup_grouped` (group, row_pitch, row_bands, ...).

    Returns the clamped, escape-masked (n, 3) star colours — identical
    values to ``lookup_grouped(differentiable=True)`` and identical
    gradients to ``jax.grad`` through it (tests/test_star_diff.py).
    Star-table (grid) gradients are intentionally zero — module docstring.
    """
    if active is None:
        raise ValueError(
            "lookup_grouped_diff needs an explicit boolean active mask: the "
            "custom-vjp star stage uses it to steer the schedule in BOTH "
            "sweeps (probe substitution for dead lanes) and to fold the "
            "escape mask into the cotangents. Pass "
            "jnp.ones(vel.shape[0], bool) if every ray is live."
        )
    dt = vel.dtype
    f = _make_star_vjp(tuple(sorted(kw.items())))
    unclamped = f(
        grid, vel, intensity.astype(dt), saturation.astype(dt), active
    )
    out = jnp.minimum(unclamped, 1.0)
    return jnp.where(active[:, None], out, jnp.zeros((), dt))

"""Numerics checking and debug helpers.

The reference gets race-freedom and NaN-safety "for free" from Haskell's
purity (SURVEY.md §5); JAX gives the same purity guarantee, and this module
adds the missing piece — explicit NaN/Inf detection through the integrator —
via ``jax.experimental.checkify``. Use it when a scene renders black/garbage
to find out *where* the numerics died instead of staring at pixels.
"""

from __future__ import annotations

import jax

from blackstar_tpu.config import SceneParams, StaticConfig


def checked_render(params: SceneParams, static: StaticConfig, star_grid=None):
    """Render with float checks: raises ValueError naming the first NaN/Inf.

    Uses the differentiable (scan) march path — checkify instruments every
    step. Debug tool: expect a large slowdown vs the production render.
    """
    from jax.experimental import checkify

    from blackstar_tpu.render import render

    # The grid rides as a jit ARGUMENT: a closed-over full-scale star grid
    # would be baked in as hundreds of MB of constants (CLAUDE.md rule).
    def fn(p, g):
        return render(p, static, g, differentiable=True, use_pallas=False)

    checked = checkify.checkify(fn, errors=checkify.float_checks)
    err, img = jax.jit(checked)(params, star_grid)
    err.throw()
    return img


def render_hlo(params: SceneParams, static: StaticConfig, star_grid=None) -> str:
    """Optimised HLO text of the production render — for perf inspection."""
    from blackstar_tpu.render import render

    # Grid as an argument (not a constant) — keeps the dump readable and
    # the compile request small at full catalogue scale.
    lowered = jax.jit(
        lambda p, g: render(p, static, g)
    ).lower(params, star_grid)
    return lowered.compile().as_text()

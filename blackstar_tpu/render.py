"""Top-level rendering pipeline.

Mirrors the reference flow (Raytracer.hs:53-75 + app/Main.hs:105-123):

    rays = camera grid              (generateRay,   Raytracer.hs:40-51)
    march to termination            (colorize/rk4,  Raytracer.hs:69-134)
    celestial-sphere star shading   (starLookup,    StarMap.hs:93-115)
    composite bottom layer          (blend,         Raytracer.hs:34-37)
    supersample (optional)          (ImageFilters.hs:88-97)
    bloom (optional, caller/CLI)    (ImageFilters.hs:80-86)

TPU-first: the whole pipeline is one jittable function of a differentiable
``SceneParams`` pytree and a hashable ``StaticConfig``; star shading is a
batched bucketed gather over the escaped rays instead of a per-ray k-d query.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from blackstar_tpu.camera import generate_rays
from blackstar_tpu.config import Config, SceneParams, StaticConfig
from blackstar_tpu.geodesic import ACTIVE, ESCAPED, march
from blackstar_tpu.ops.filters import bloom, supersample


class RenderStats(NamedTuple):
    """Structured per-render observability (survey §5 'metrics' upgrade)."""

    steps: jnp.ndarray  # () int32 — integration steps executed
    escaped_frac: jnp.ndarray  # () fraction of rays that escaped
    horizon_frac: jnp.ndarray  # () fraction captured by the horizon
    truncated_frac: jnp.ndarray  # () fraction still active at the step cap


# The p×g pixel-block schedule of the production star lookup
# (stars/grid.lookup_grouped): ROW_BANDS image rows × STAR_GROUP consecutive
# pixels share one gathered cell row. (4, 4) is the measured v5e winner
# as of r5: the r3 sweep picked 2×4 (39-42 ms/frame vs 4×4's 47), but the
# r4 star-stage changes (bounded-error fast cell ids, 3-ball validity,
# compacted fallback overflow) shifted the optimum — with them, 4×4
# gains ~1.8 ms/frame on the FULL-pipeline bench (r5, two runs each:
# 33.38/33.49 vs 32.64/32.47 Mrays/s; isolated stage 36.8 vs 38.3,
# scripts/profile_star_stages.py). 4×8 still loses (42.6 isolated) —
# its extra invalid-fallback rays cost more than the saved gathers.
# The committed artifact's 6 mrad margin covers all four schedules at
# the flagship framing, and per-ray validity keeps
# every schedule exact. STAR_GROUP is
# an alias of the grid layer's GROUP — ONE constant governs the lookup
# default, the shade() call, the eligibility spread, and the sharded deal;
# flip it in stars/grid.py.
from blackstar_tpu.stars.grid import GROUP as STAR_GROUP  # noqa: E402

ROW_BANDS = 4


def safe_distance(params: SceneParams, dtype) -> jnp.ndarray:
    """``max((50·rs)², 2·|camPos|²)`` (Raytracer.hs:59-60), differentiable.

    The reference hard-codes rs=1, making its 50 literally "50 Schwarzschild
    radii"; with the mass extension the floor scales with rs so large-mass
    scenes don't flag still-deflected (or even plunging, rs > ~33) rays as
    escaped. Bitwise-identical at mass=1. ``safe`` enters comparisons only,
    so no gradient flows through it (matches autodiff)."""
    p = params.camera.position.astype(dtype)
    rs = params.mass.astype(dtype)
    return jnp.maximum((50.0 * rs) ** 2, 2.0 * jnp.dot(p, p))


def shade(res, params: SceneParams, star_grid, dt,
          static: "StaticConfig | None" = None,
          differentiable: bool = False) -> jnp.ndarray:
    """Composite the bottom layer under the accumulated disk RGBA.

    Bottom = celestial-sphere stars (alpha 1) for escaped rays, black for
    horizon-captured and step-cap-truncated rays (Raytracer.hs:88-95, blend
    at :34-37). Shared by the single-device and mesh-sharded render paths.
    """
    escaped = res.status == ESCAPED
    if star_grid is not None:
        lookup = star_grid.lookup
        kw = {}
        grouped = static is not None and _grouped_eligible(
            star_grid, static, res.vel.shape[0]
        )
        if grouped:
            lookup = star_grid.lookup_grouped
            kw["group"] = STAR_GROUP
            if res.vel.shape[0] == static.render_width * static.render_height:
                # Row-major pixel rays: the p×g row-band schedule divides the
                # per-group gather/validity work by p.
                # lookup_grouped skips the schedule when the frame height
                # doesn't tile by ROW_BANDS.
                kw["row_pitch"] = static.render_width
                kw["row_bands"] = ROW_BANDS
            # Compaction billing granularity: group_block 4 wins at native
            # pixel pitch (r5 full-pipeline A/B: 34.42/34.28 vs 33.38/33.49
            # Mrays/s @1080p; 8K 40.4 vs 39.2) but LOSES on supersampled
            # frames whose halved angular pitch doubles the belt rows per
            # block (default-aa 36.4 vs 38.3) — pick by workload.
            kw["group_block"] = 8 if static.supersampling else 4
        if grouped and differentiable:
            # Hand-derived star VJP (stars/diff.py): production forward
            # schedule AND a production-schedule backward sweep — the
            # autodiff path's capacity/cond machinery measured 4.2 Mrays/s
            # fwd+bwd at 1080p (r4); this runs the same schedule twice.
            from blackstar_tpu.stars.diff import lookup_grouped_diff

            star_rgb = lookup_grouped_diff(
                star_grid, res.vel,
                params.stars.intensity.astype(dt),
                params.stars.saturation.astype(dt),
                escaped, **kw,
            )
        else:
            star_rgb = lookup(
                res.vel,
                intensity=params.stars.intensity.astype(dt),
                saturation=params.stars.saturation.astype(dt),
                active=escaped,
                differentiable=differentiable,
                **kw,
            )
        bottom = jnp.where(escaped[:, None], star_rgb, jnp.zeros((), dt))
    else:
        bottom = jnp.zeros((res.vel.shape[0], 3), dt)

    acc = res.acc_rgba
    return acc[:, :3] + bottom * (1.0 - acc[:, 3:4])


# Below this many rays the grouped lookup's block machinery costs more than
# the per-ray path saves. Module-level so correctness gates (e.g.
# __graft_entry__.dryrun_multichip) can lower it to exercise the grouped
# path at tiny dryrun sizes — the schedule choice never changes results.
GROUPED_MIN_RAYS = 1 << 15


def _grouped_eligible(star_grid, static: StaticConfig, n_rays: int) -> bool:
    """Use the grouped star lookup when the grid carries a group margin and
    the frame's expected 8-pixel group spread fits inside it (a *schedule*
    choice only — per-ray validity keeps results exact even if the fitted
    fov drifts past the hint)."""
    margin = getattr(star_grid, "margin", 0.0)
    if margin <= 0.0 or static.fov_hint <= 0.0 or n_rays < GROUPED_MIN_RAYS:
        return False
    # Validity is tested against the group mean, so the worst in-group
    # offset is the pixel-block circumradius: half extents (STAR_GROUP−1)/2
    # across and (ROW_BANDS−1)/2 down (pixel pitch ≈ fov/width at the
    # frame centre, smaller toward the edges).
    px = static.fov_hint / max(1, static.render_width)
    spread = 0.5 * px * ((STAR_GROUP - 1) ** 2 + (ROW_BANDS - 1) ** 2) ** 0.5
    return spread * 1.3 <= margin


def pallas_eligible(static: StaticConfig, differentiable: bool = False) -> bool:
    """The Pallas kernels are valid exactly for float32 on a TPU backend —
    forward (ops/march_pallas) and, via the hand-derived adjoint
    (ops/march_diff), reverse-mode too."""
    del differentiable  # both directions are Pallas-backed
    return static.jdtype == jnp.float32 and jax.default_backend() == "tpu"


def run_march(
    pos0,
    vel0,
    params: SceneParams,
    static: StaticConfig,
    *,
    differentiable: bool = False,
    use_pallas="auto",
):
    """Dispatch the geodesic march to the Pallas TPU kernels or the XLA path.

    ``vel0`` may be an (N, 3) array (either path) or a tuple of three flat
    component arrays (Pallas path only).
    """
    if use_pallas == "auto":
        use_pallas = pallas_eligible(static, differentiable)
    safe = safe_distance(params, static.jdtype)
    if use_pallas:
        from blackstar_tpu.color import hsi_to_rgb

        disk_rgb = hsi_to_rgb(params.disk.color_hsi.astype(jnp.float32))
        if differentiable:
            from blackstar_tpu.ops.march_diff import march_diff

            return march_diff(
                pos0,
                vel0,
                step_size=static.step_size,
                max_steps=static.max_steps,
                disk_on=static.disk_on,
                mass=params.mass,
                inner=params.disk.inner,
                outer=params.disk.outer,
                opacity=params.disk.opacity,
                disk_rgb=disk_rgb,
                safe=safe,
            )
        from blackstar_tpu.ops.march_pallas import march_pallas

        return march_pallas(
            pos0,
            vel0,
            step_size=static.step_size,
            max_steps=static.max_steps,
            mass=params.mass,
            safe_distance=safe,
            disk_on=static.disk_on,
            disk_inner=params.disk.inner,
            disk_outer=params.disk.outer,
            disk_opacity=params.disk.opacity,
            disk_rgb=disk_rgb,
        )
    if isinstance(vel0, (tuple, list)):
        vel0 = jnp.stack(vel0, axis=-1)
    return march(pos0, vel0, params, static, safe, differentiable=differentiable)


def render(
    params: SceneParams,
    static: StaticConfig,
    star_grid=None,
    *,
    differentiable: bool = False,
    with_stats: bool = False,
    use_pallas="auto",
):
    """Render the linear-RGB image (H, W, 3) — before bloom, like
    ``Raytracer.render`` (bloom is applied by the driver, app/Main.hs:113-118).
    """
    dt = static.jdtype
    rw, rh = static.render_width, static.render_height
    if use_pallas is True or (use_pallas == "auto" and pallas_eligible(static, differentiable)):
        # Component-planes form feeds the kernel without an (N, 3)
        # materialisation + strided column extracts.
        from blackstar_tpu.camera import generate_ray_components

        pos0, vel0 = generate_ray_components(params.camera, rw, rh, dtype=dt)
    else:
        pos0, vel0 = generate_rays(params.camera, rw, rh, dtype=dt)

    # Note: no Z-order permutation — measured as a net loss on v5e (removed;
    # DESIGN.md §2): the 2M-row gathers cost more than the extra tile
    # coherence buys (per-ray step counts are near-uniform on real scenes).
    res = run_march(
        pos0,
        vel0,
        params,
        static,
        differentiable=differentiable,
        use_pallas=use_pallas,
    )

    rgb = shade(res, params, star_grid, dt, static,
                differentiable=differentiable)
    img = rgb.reshape(rh, rw, 3)

    if static.supersampling:
        img = supersample(img)

    if with_stats:
        from blackstar_tpu.geodesic import HORIZON

        # `steps`: executed count on every path — the XLA while_loop, the
        # Pallas forward, and the differentiable Pallas march (max over
        # tiles, unroll-granular; threaded through the custom_vjp).
        stats = RenderStats(
            steps=res.steps,
            escaped_frac=jnp.mean((res.status == ESCAPED).astype(jnp.float32)),
            horizon_frac=jnp.mean((res.status == HORIZON).astype(jnp.float32)),
            truncated_frac=jnp.mean((res.status == ACTIVE).astype(jnp.float32)),
        )
        return img, stats
    return img


def render_rgb(
    params: SceneParams,
    static: StaticConfig,
    star_grid=None,
    *,
    differentiable: bool = False,
):
    """Full pipeline including bloom (the CLI flow, app/Main.hs:105-123).

    The reference CLI skips the blur entirely when bloomStrength == 0
    (app/Main.hs:113-118); callers that know the strength statically should
    call ``render`` instead to avoid paying for the blur (``render_image``
    does this automatically).
    """
    img = render(params, static, star_grid, differentiable=differentiable)
    return bloom(img, params.bloom_strength.astype(img.dtype), static.bloom_divider)


import functools


@functools.lru_cache(maxsize=16)
def _jit_image_fn(with_bloom: bool):
    # Module-cached: a fresh jax.jit per render_image call would retrace
    # every image (~30 s first march trace on CPU); with one cached callable
    # repeat calls hit jit's dispatch cache (StaticConfig is hashable).
    fn = render_rgb if with_bloom else render
    return jax.jit(fn, static_argnums=(1,))


def render_image(cfg: Config, star_grid=None, *, preview: bool = False, jit: bool = True):
    """Convenience: Config -> numpy linear RGB image (bloom included when
    the scene enables it). Used by the CLI and tests."""
    import numpy as np

    base = cfg
    if preview:
        from blackstar_tpu.config import apply_preview

        base = apply_preview(cfg)
    params = base.params()
    static = base.static()
    with_bloom = base.scene.bloom_strength != 0.0
    if jit:
        fn = _jit_image_fn(with_bloom)
    else:
        fn = render_rgb if with_bloom else render
    img = fn(params, static, star_grid)
    return np.asarray(jax.device_get(img))

"""Hand-derived star-stage VJP (stars/diff.py) vs jax.grad.

The production differentiable star path wraps the while-batched grouped
lookup in a ``jax.custom_vjp`` whose backward runs the same machinery on
5 gradient channels (``StarGrid._slot_math`` grad mode). These tests gate
it against ``jax.grad`` of the transposable autodiff path
(``lookup_grouped(differentiable=True)``) — values and gradients w.r.t.
ray velocities (through the normalisation chain), starIntensity and
starSaturation — on inputs that exercise every piece of machinery:
overflow rows, the invalid (per-ray) fallback, active masks, non-unit
velocities, the row-band schedule, and the chunked ``lax.map`` path.
"""

import numpy as np
import jax
import jax.numpy as jnp

from blackstar_tpu.stars.diff import lookup_grouped_diff
from blackstar_tpu.stars.grid import build_star_grid

from tests.test_stars import _random_catalog


def _grid(cat, **kw):
    kw.setdefault("radius", 0.006)
    kw.setdefault("cell_size", 0.008)
    kw.setdefault("k0", 8)
    return build_star_grid(cat, dtype=jnp.float64, **kw)


def _assert_grads_match(grid, vel, active, cot, kw_new, kw_ref,
                        rtol=1e-11, jit=False):
    i0, s0 = jnp.float64(0.7), jnp.float64(0.9)

    def f_ref(vel, i, s):
        out = grid.lookup_grouped(vel, i, s, active, differentiable=True,
                                  **kw_ref)
        return jnp.sum(out * cot)

    def f_new(vel, i, s):
        out = lookup_grouped_diff(grid, vel, i, s, active, **kw_new)
        return jnp.sum(out * cot)

    g_ref_f = jax.grad(f_ref, argnums=(0, 1, 2))
    g_new_f = jax.grad(f_new, argnums=(0, 1, 2))
    if jit:
        f_ref, f_new = jax.jit(f_ref), jax.jit(f_new)
        g_ref_f, g_new_f = jax.jit(g_ref_f), jax.jit(g_new_f)

    v_ref, v_new = f_ref(vel, i0, s0), f_new(vel, i0, s0)
    assert abs(float(v_ref - v_new)) <= 1e-11 * max(1.0, abs(float(v_ref)))

    g_ref = g_ref_f(vel, i0, s0)
    g_new = g_new_f(vel, i0, s0)
    for a, b, name in zip(g_ref, g_new, ("vel", "intensity", "saturation")):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(1e-30, float(np.max(np.abs(a))))
        err = float(np.max(np.abs(a - b))) / scale
        assert err < rtol, (name, err)
    return g_new


def test_active_none_rejected():
    """The custom-vjp wrapper needs an explicit mask (r4 advisor finding:
    passing None used to die with an opaque TypeError at trace time)."""
    import pytest

    from blackstar_tpu.stars.diff import lookup_grouped_diff

    vel = jnp.ones((8, 3))
    with pytest.raises(ValueError, match="active mask"):
        lookup_grouped_diff(None, vel, jnp.float32(1.0), jnp.float32(1.0),
                            None)


def test_star_vjp_overflow_invalid_active():
    """Clustered catalogue (overflow rows) + divergent groups (invalid
    fallback) + active mask + non-unit velocities: grads == jax.grad."""
    cat = _random_catalog(600, seed=21, clusters=True)
    grid = _grid(cat)
    assert grid.has_overflow and grid.margin > 0

    rng = np.random.default_rng(22)
    n = 1024
    centers = cat.pos[rng.integers(0, cat.n_stars, n // 8)]
    dirs = np.repeat(centers, 8, axis=0) + 3e-4 * rng.normal(size=(n, 3))
    dirs[::17] = rng.normal(size=dirs[::17].shape)  # force invalid groups
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    vel = jnp.asarray(dirs) * 1.7  # non-unit: exercises the rsqrt chain
    active = jnp.asarray(rng.uniform(size=n) < 0.9)
    cot = jnp.asarray(rng.normal(size=(n, 3)))

    g = _assert_grads_match(grid, vel, active, cot,
                            kw_new=dict(group=4), kw_ref=dict(group=4))
    # Inactive lanes contribute nothing.
    gv = np.asarray(g[0])
    assert np.all(gv[~np.asarray(active)] == 0.0)
    # Something nontrivial flowed.
    assert np.max(np.abs(gv)) > 0


def test_star_vjp_rowbands_and_chunked():
    """The row-band (2×4 pixel block) schedule and the chunked lax.map
    path produce the same values AND gradients as the unbanded unchunked
    custom-vjp path (schedules never change either; the unbanded path is
    anchored to jax.grad by test_star_vjp_overflow_invalid_active)."""
    cat = _random_catalog(600, seed=21, clusters=True)
    grid = _grid(cat)
    rng = np.random.default_rng(30)
    w_img, h_img = 64, 16
    n = w_img * h_img
    px = np.linspace(-1, 1, w_img)[None, :].repeat(h_img, 0)
    py = np.linspace(-0.5, 0.5, h_img)[:, None].repeat(w_img, 1)
    d = cat.pos[5][None, None, :] + 2e-3 * np.stack([px, py, 0 * px], -1)
    d = d.reshape(n, 3)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    vel = jnp.asarray(d) * 0.9
    active = jnp.asarray(rng.uniform(size=n) < 0.95)
    cot = jnp.asarray(rng.normal(size=(n, 3)))
    i0, s0 = jnp.float64(0.7), jnp.float64(0.9)

    def run(kw):
        def f(vel, i, s):
            out = lookup_grouped_diff(grid, vel, i, s, active, **kw)
            return jnp.sum(out * cot)

        v = jax.jit(f)(vel, i0, s0)
        g = jax.jit(jax.grad(f, argnums=(0, 1, 2)))(vel, i0, s0)
        return float(v), [np.asarray(x) for x in g]

    v_ref, g_ref = run(dict(group=4))
    for kw in (dict(group=4, row_pitch=w_img, row_bands=2, chunk=512),
               dict(group=4, chunk=512)):
        v, g = run(kw)
        assert abs(v - v_ref) <= 1e-11 * max(1.0, abs(v_ref))
        for a, b, name in zip(g_ref, g, ("vel", "intensity", "saturation")):
            scale = max(1e-30, float(np.max(np.abs(a))))
            err = float(np.max(np.abs(a - b))) / scale
            assert err < 1e-11, (kw, name, err)


def test_render_level_star_grads_fd():
    """render(differentiable=True) through the custom-vjp star stage:
    star-parameter gradients match central finite differences at the
    image-loss level (the flagship training objective)."""
    import dataclasses
    import dataclasses
    import importlib

    from blackstar_tpu.config import load_config
    from blackstar_tpu.fit import image_loss

    # The package re-exports the render FUNCTION under the same name; go
    # through importlib for the module (same pattern as __graft_entry__).
    render_mod = importlib.import_module("blackstar_tpu.render")

    # Large halo: at 64 px across a 1.5 rad fov the production 4×4
    # pixel-block spread is ~0.05 rad (×1.3 in _grouped_eligible), so the
    # grid needs a margin well beyond it for the grouped schedule to be
    # eligible at this tiny test resolution.
    cat = _random_catalog(800, seed=41)
    grid = _grid(cat, radius=0.09, cell_size=0.03)

    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    cfg = dataclasses.replace(
        cfg, scene=dataclasses.replace(cfg.scene, resolution=(64, 32),
                                       step_size=1.0, supersampling=False)
    )
    static = cfg.static()
    params = cfg.params()

    old_floor = render_mod.GROUPED_MIN_RAYS
    render_mod.GROUPED_MIN_RAYS = 64
    try:
        assert render_mod._grouped_eligible(grid, static, 64 * 32)
        target = jax.jit(
            lambda p: render_mod.render(p, static, grid)
        )(params)

        def loss(iv, sv):
            p = dataclasses.replace(
                params, stars=dataclasses.replace(
                    params.stars, intensity=iv, saturation=sv)
            )
            return image_loss(p, static, target, grid)

        gi, gs = jax.jit(jax.grad(loss, argnums=(0, 1)))(
            params.stars.intensity, params.stars.saturation
        )
        eps = 1e-5
        for g, idx in ((gi, 0), (gs, 1)):
            args = [params.stars.intensity, params.stars.saturation]
            args[idx] = args[idx] + eps
            hi = float(loss(*args))
            args[idx] = args[idx] - 2 * eps
            lo = float(loss(*args))
            fd = (hi - lo) / (2 * eps)
            assert abs(float(g) - fd) <= 1e-6 + 1e-4 * abs(fd), (idx, g, fd)
    finally:
        render_mod.GROUPED_MIN_RAYS = old_floor


def test_render_schedule_group_block_by_workload(monkeypatch):
    """The render layer bills star compaction at group_block 4 for
    native-pitch frames and 8 for supersampled ones (the r5 measured
    split — see render.py). Captures the kwargs actually passed to
    lookup_grouped so a schedule regression cannot land silently."""
    import dataclasses
    import importlib

    from blackstar_tpu.config import load_config
    from blackstar_tpu.stars import grid as grid_mod

    render_mod = importlib.import_module("blackstar_tpu.render")

    cat = _random_catalog(300, seed=43)
    grid = _grid(cat, radius=0.09, cell_size=0.03)

    import os
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))

    captured = {}
    real = grid_mod.StarGrid.lookup_grouped

    def spy(self, vel, *args, **kw):
        captured.update(kw)
        return real(self, vel, *args, **kw)

    monkeypatch.setattr(grid_mod.StarGrid, "lookup_grouped", spy)
    monkeypatch.setattr(render_mod, "GROUPED_MIN_RAYS", 64)

    for ss, want_gb in ((False, 4), (True, 8)):
        cfg2 = dataclasses.replace(
            cfg, scene=dataclasses.replace(
                cfg.scene, resolution=(64, 32), step_size=1.0,
                supersampling=ss)
        )
        static = cfg2.static()
        assert render_mod._grouped_eligible(
            grid, static, static.render_width * static.render_height)
        captured.clear()
        render_mod.render(cfg2.params(), static, grid)
        assert captured.get("group_block") == want_gb, (ss, captured)

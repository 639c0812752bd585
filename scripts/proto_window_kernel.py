"""Prototype: pass-1 of the range-window Pallas star stage (base rows only).

Measures the REAL cost of the windowed-gather mechanism on hardware — the
micro-probe (probe_dynamic_gather.py) prices the primitives; this pipes
them together the way the production stage would:

  XLA pre-pass: normalise directions -> (ring, col) -> per-tile window
  start (mean-direction centred) -> per-ray in-window row index + covered
  mask.
  Pallas kernel (grid over 4096-ray tiles): one 3-D strided DMA pulls the
  (DR x DC x 256) base-row window into VMEM, `take_along_axis` selects
  each ray's own cell row (tpu.dynamic_gather), and the exact starLookup
  slot math (StarMap.hs:93-114 — same formulation as StarGrid._slot_math)
  accumulates RGB per ray.

Correctness: interpret mode (CPU) gates the kernel against the production
``StarGrid.lookup`` per-ray path on covered rays, on a synthetic
no-overflow grid. Cost: on TPU, K-loop device-side timing at the
production scale (507 tiles of 4096 rays = 1080p).

Both index layouts for the gather are included (--idx tall|wide): 'tall'
feeds (4096, 1) indices straight in; 'wide' feeds a natural (32, 128)
plane and shape-casts in-kernel (a lane->sublane relayout whose price is
one of the open Mosaic questions).

Usage:
  python scripts/proto_window_kernel.py --interpret     # CPU semantics
  python scripts/proto_window_kernel.py                 # TPU cost
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

T = 4096          # rays per tile == window rows (take_along_axis constraint)
DR, DC = 32, 128  # window: DR rings x DC cols; DR*DC == T
ROW = 8           # floats per slot
MAX_BRIGHTNESS = 950.0
DYNAMIC = 50.0


def _kernel(starts_ref, widx_ref, rx_ref, ry_ref, rz_ref, tbl_ref,
            or_ref, og_ref, ob_ref, scratch, sem, *, pad_k, psf_width,
            intensity, saturation, idx_layout):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    r0 = starts_ref[i, 0]
    c0 = starts_ref[i, 1]
    cp = pltpu.make_async_copy(
        tbl_ref.at[pl.ds(r0, DR), pl.ds(c0, DC), :], scratch, sem
    )
    cp.start()
    cp.wait()

    window = scratch[:].reshape(T, pad_k * ROW)
    if idx_layout == "tall":
        idx = widx_ref[:]                       # (T, 1)
    else:
        idx = widx_ref[:].reshape(T, 1)         # (32, 128) -> (T, 1)
    rows = jnp.take_along_axis(
        window, jnp.broadcast_to(idx, window.shape), axis=0,
        mode="promise_in_bounds",
    )

    rx, ry, rz = rx_ref[:], ry_ref[:], rz_ref[:]   # (32, 128)
    dt = rows.dtype
    w = jnp.asarray(psf_width, dt)
    r2lim = (3.0 * w) ** 2
    a = jnp.log(jnp.asarray(2.0, dt)) / DYNAMIC
    inv2w2 = 1.0 / (2.0 * w * w)
    sat = jnp.asarray(saturation, dt)
    inten = jnp.asarray(intensity, dt)

    def col(k, c):
        return rows[:, k * ROW + c].reshape(32, 128)

    ar = jnp.zeros((32, 128), dt)
    ag = jnp.zeros((32, 128), dt)
    ab = jnp.zeros((32, 128), dt)
    for k in range(pad_k):
        sx, sy, sz = col(k, 0), col(k, 1), col(k, 2)
        logb0 = a * (MAX_BRIGHTNESS - col(k, 3))
        cr = 1.0 + sat * col(k, 4)
        cg = 1.0 + sat * col(k, 5)
        cb = 1.0 + sat * col(k, 6)
        dx = sx - rx
        dy = sy - ry
        dz = sz - rz
        d2 = dx * dx + dy * dy + dz * dz
        within = d2 <= r2lim
        e = jnp.exp(jnp.where(within, logb0 - d2 * inv2w2, -jnp.inf))
        val = jnp.minimum(1.0, e) * inten
        ar = ar + val * cr
        ag = ag + val * cg
        ab = ab + val * cb
    or_ref[:] = ar
    og_ref[:] = ag
    ob_ref[:] = ab


def build_pass1(n_tiles, pad_k, psf_width, intensity, saturation,
                nr, nc, idx_layout, interpret):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if idx_layout == "tall":
        widx_spec = pl.BlockSpec((T, 1), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM)
    else:
        widx_spec = pl.BlockSpec((1, 32, 128), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    plane = lambda: pl.BlockSpec((1, 32, 128), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    out = lambda: pl.BlockSpec((1, 32, 128), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[widx_spec, plane(), plane(), plane(),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(out(), out(), out()),
        scratch_shapes=[
            pltpu.VMEM((DR, DC, pad_k * ROW), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(
        _kernel, pad_k=pad_k, psf_width=psf_width, intensity=intensity,
        saturation=saturation, idx_layout=idx_layout,
    )
    shape = jax.ShapeDtypeStruct((n_tiles, 32, 128), jnp.float32)
    return pl.pallas_call(
        kern,
        out_shape=(shape, shape, shape),
        grid_spec=grid_spec,
        interpret=interpret,
    )


def prepass(v, esc, nr, nc):
    """Directions -> per-tile window starts + per-ray window index/cover."""
    import jax.numpy as jnp

    n = v.shape[0]
    n_tiles = n // T
    dec = jnp.arcsin(jnp.clip(v[:, 2], -1, 1))
    ra = jnp.mod(jnp.arctan2(v[:, 1], v[:, 0]), 2 * jnp.pi)
    delta = jnp.pi / nr
    ring = jnp.clip(jnp.floor((dec + jnp.pi / 2) / delta).astype(jnp.int32),
                    0, nr - 1)
    col = jnp.clip(jnp.floor(ra / (2 * jnp.pi) * nc).astype(jnp.int32),
                   0, nc - 1)
    vt = v.reshape(n_tiles, T, 3)
    mean = vt.mean(axis=1)
    mean = mean / jnp.linalg.norm(mean, axis=-1, keepdims=True)
    mdec = jnp.arcsin(jnp.clip(mean[:, 2], -1, 1))
    mra = jnp.mod(jnp.arctan2(mean[:, 1], mean[:, 0]), 2 * jnp.pi)
    mring = jnp.clip(jnp.floor((mdec + jnp.pi / 2) / delta).astype(jnp.int32),
                     0, nr - 1)
    mcol = jnp.clip(jnp.floor(mra / (2 * jnp.pi) * nc).astype(jnp.int32),
                    0, nc - 1)
    r0 = jnp.clip(mring - DR // 2, 0, nr - DR)
    c0 = jnp.clip(mcol - DC // 2, 0, nc - DC)  # no seam wrap in the proto
    starts = jnp.stack([r0, c0], axis=-1)
    ring_t = ring.reshape(n_tiles, T)
    col_t = col.reshape(n_tiles, T)
    rrel = ring_t - r0[:, None]
    crel = col_t - c0[:, None]
    covered = ((rrel >= 0) & (rrel < DR) & (crel >= 0) & (crel < DC)
               & esc.reshape(n_tiles, T))
    widx = jnp.where(covered, rrel * DC + crel, 0).astype(jnp.int32)
    return starts, widx, covered


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--idx", choices=("tall", "wide"), default="tall")
    ap.add_argument("--tiles", type=int, default=507,
                    help="tile count for the TPU timing run (507 = 1080p)")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blackstar_tpu.stars.catalog import Catalog
    from blackstar_tpu.stars.grid import build_star_grid

    # Synthetic catalogue on a small sphere patch; cells sized so the
    # build has NO overflow (pass-1 proto covers base rows only).
    rng = np.random.default_rng(7)
    n_stars = 4000
    sdec = rng.uniform(-0.8, 0.8, n_stars)
    sra = rng.uniform(0.5, 5.5, n_stars)
    pos = np.stack([np.cos(sdec) * np.cos(sra), np.cos(sdec) * np.sin(sra),
                    np.sin(sdec)], axis=-1)
    cat = Catalog(
        pos=pos,
        mag=rng.integers(300, 900, n_stars).astype(np.int32),
        hue=rng.uniform(0, 1, n_stars),
        sat=rng.uniform(0, 1, n_stars),
    )
    grid = build_star_grid(cat, cell_size=0.02, radius=0.0075,
                           dtype=jnp.float32)
    assert not grid.has_overflow, "proto needs a no-overflow build"
    nr, nc = grid.n_rings, grid.n_cols
    pad_k = grid.pad_k
    print(f"grid {nr}x{nc} pad_k={pad_k} stars={grid.n_stars} "
          f"ovf_rows={grid.ovf_data.shape[0]}")

    n_tiles = 4 if args.interpret else args.tiles
    n = n_tiles * T
    # smooth per-tile direction clusters + 5% outliers (uncovered path)
    centers_dec = rng.uniform(-0.6, 0.6, n_tiles)
    centers_ra = rng.uniform(1.0, 5.0, n_tiles)
    d = np.repeat(centers_dec, T) + rng.normal(0, 0.02, n)
    r = np.repeat(centers_ra, T) + rng.normal(0, 0.04, n)
    out = rng.uniform(size=n) < 0.05
    d = np.where(out, rng.uniform(-0.7, 0.7, n), d)
    r = np.where(out, rng.uniform(0.6, 5.4, n), r)
    v = np.stack([np.cos(d) * np.cos(r), np.cos(d) * np.sin(r),
                  np.sin(d)], axis=-1).astype(np.float32)
    v = jnp.asarray(v)
    esc = jnp.ones((n,), bool)

    starts, widx, covered = jax.jit(
        lambda v, e: prepass(v, e, nr, nc))(v, esc)
    widx_in = (jnp.asarray(widx).reshape(n, 1) if args.idx == "tall"
               else jnp.asarray(widx).reshape(n_tiles, 32, 128))
    rx = v[:, 0].reshape(n_tiles, 32, 128)
    ry = v[:, 1].reshape(n_tiles, 32, 128)
    rz = v[:, 2].reshape(n_tiles, 32, 128)

    tbl3 = grid.cell_data.reshape(nr, nc, pad_k * ROW)
    fn = build_pass1(n_tiles, pad_k, grid.psf_width, 0.7, 0.7, nr, nc,
                     args.idx, args.interpret)
    call = jax.jit(lambda s, w, x, y, z, t: fn(s, w, x, y, z, t))
    orr, org, orb = call(starts, widx_in, rx, ry, rz, tbl3)

    # oracle: the production per-ray path (clamped later; compare unclamped
    # is not exposed -> compare through the same min(1,.) on both sides)
    ref = grid.lookup(v, jnp.float32(0.7), jnp.float32(0.7), esc,
                      chunk=1 << 22)
    got = np.stack([np.asarray(orr).reshape(n), np.asarray(org).reshape(n),
                    np.asarray(orb).reshape(n)], axis=-1)
    got = np.minimum(got, 1.0)
    m = np.asarray(covered).reshape(n)
    err = np.abs(got[m] - np.asarray(ref)[m]).max() if m.any() else 0.0
    print(f"covered frac {m.mean():.4f}  max|err| on covered: {err:.3e}")
    if args.interpret:
        assert err < 1e-6, "kernel does not match the production lookup"
        print("INTERPRET SEMANTICS OK")
        return

    # device-side steady-state timing: K calls in one jit, index perturbed
    K = 30

    @jax.jit
    def loop(s, wdx, x, y, z, t):
        def body(k, acc):
            w2 = jnp.bitwise_xor(wdx, k & 0)  # defeat hoisting, keep values
            a, b, c = fn(s, w2, x, y, z, t)
            return acc + a[0, 0, 0] + b[0, 0, 0] + c[0, 0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(loop(starts, widx_in, rx, ry, rz, tbl3))
    t0 = time.perf_counter()
    float(loop(starts, widx_in, rx, ry, rz, tbl3))
    dt = (time.perf_counter() - t0) / K
    print(f"pass-1 kernel: {dt * 1e3:.2f} ms / {n_tiles} tiles "
          f"({n / dt / 1e6:.1f} Mrays/s; {dt * 1e9 / n:.2f} ns/ray)")


if __name__ == "__main__":
    main()

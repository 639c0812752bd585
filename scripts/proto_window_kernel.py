"""Prototype: range-window Pallas star stage (base pass K1 + overflow K2).

OUTCOME (r5, v5e hardware): semantics are EXACT in interpret mode
(f64 max|err| 4.4e-16 vs the production per-ray lookup), but Mosaic
REJECTS the row select on hardware — ``Not implemented: Multiple source
vregs along gather dimension`` — and probe_dynamic_gather.py pins the
supported envelope to single-vreg gathers (R=8 sublane / 128-lane).
The mechanism is dead on this TPU generation; kept as the documented
experiment behind DESIGN.md §3's r5 closure.

Measures the REAL cost of the windowed-gather mechanism on hardware — the
micro-probe (probe_dynamic_gather.py) prices the primitives; this pipes
them together the way a production ``lookup_windowed`` would:

  XLA pre-pass: normalise directions -> (ring, col) -> per-tile window
  start (mean-direction centred) -> per-ray in-window row index + covered
  mask.
  K1 (grid over 4096-ray tiles): one 3-D strided DMA pulls the
  (DR x DC x K0*8) base-row window into VMEM, `take_along_axis` selects
  each ray's own cell row (tpu.dynamic_gather), the exact starLookup slot
  math (StarMap.hs:93-114, same formulation as StarGrid._slot_math)
  accumulates RGB per ray, and the packed overflow-row pointer (base slot
  0 aux, grid.py row layout) is emitted per ray.
  XLA glue: per-tile min positive pointer (a trivial reduce on K1's optr
  output) -> K2 window starts.
  K2: DMAs the (OVW x K1slots*8) overflow-row window + its used-octet
  counts, selects each participating ray's overflow row, octet-scans with
  a tile-level dynamic bound, masks non-participants, adds RGB.

  Left for pass 3 (see DESIGN.md par 3 r5): uncovered rays, overflow rays
  whose pointer misses the OVW window (sorted flat-window pass +
  compacted exact fallback).

Correctness: interpret mode (CPU) gates K1+K2 against the production
``StarGrid.lookup`` per-ray path on covered rays, on a synthetic grid
WITH overflow cells. Cost: on TPU, K-loop device-side timing at the
production scale (507 tiles of 4096 rays = 1080p).

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

T = 4096          # rays per tile == base window rows (take_along_axis shape)
DR, DC = 32, 128  # base window: DR rings x DC cols; DR*DC == T
OVW = 2048        # overflow window rows; T must be a multiple of OVW
ROW = 8           # floats per slot
MAX_BRIGHTNESS = 950.0
DYNAMIC = 50.0


def _star_math(rows, rx, ry, rz, psf_width, intensity, saturation,
               accs, s0, s_count):
    """starLookup slot math for slots [s0, s0+s_count) of gathered rows
    (N, >=s0+s_count * 8); ray planes and accumulators are (32, 128)."""
    import jax.numpy as jnp

    dt = rows.dtype
    w = jnp.asarray(psf_width, dt)
    r2lim = (3.0 * w) ** 2
    a = jnp.log(jnp.asarray(2.0, dt)) / DYNAMIC
    inv2w2 = 1.0 / (2.0 * w * w)
    sat = jnp.asarray(saturation, dt)
    inten = jnp.asarray(intensity, dt)
    shape = rx.shape

    def col(k, c):
        return rows[:, k * ROW + c].reshape(shape)

    ar, ag, ab = accs
    for k in range(s0, s0 + s_count):
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
    return ar, ag, ab


def _k1_kernel(starts_ref, widx_ref, rx_ref, ry_ref, rz_ref, tbl_ref,
               or_ref, og_ref, ob_ref, optr_ref, scratch, sem, *,
               pad_k, psf_width, intensity, saturation):
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
    idx = widx_ref[:]                           # (T, 1)
    rows = jnp.take_along_axis(
        window, jnp.broadcast_to(idx, window.shape), axis=0,
        mode="promise_in_bounds",
    )
    rx, ry, rz = rx_ref[0], ry_ref[0], rz_ref[0]   # (32, 128)
    z = jnp.zeros((32, 128), rows.dtype)
    ar, ag, ab = _star_math(rows, rx, ry, rz, psf_width, intensity,
                            saturation, (z, z, z), 0, pad_k)
    or_ref[0] = ar
    og_ref[0] = ag
    ob_ref[0] = ab
    # packed overflow pointer: slot 0 aux column (grid.py row layout);
    # exact in f32 for every valid row index (max ~77k << 2^24)
    optr_ref[0] = rows[:, 7].reshape(32, 128).astype(jnp.int32)


def _k2_kernel(starts_ref, optr_ref, cov_ref, rx_ref, ry_ref, rz_ref,
               tbl_ref, octs_ref, or_ref, og_ref, ob_ref,
               scratch, octs_win, sem, sem2, *, n_oct, psf_width,
               intensity, saturation):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    s = starts_ref[i, 0]
    w1 = n_oct * 8 * ROW
    cp = pltpu.make_async_copy(tbl_ref.at[pl.ds(s, OVW), :], scratch, sem)
    cp.start()
    cp2 = pltpu.make_async_copy(octs_ref.at[pl.ds(s, OVW), :], octs_win, sem2)
    cp2.start()
    cp.wait()
    cp2.wait()

    optr = optr_ref[0]                   # (32, 128) i32
    cov = cov_ref[0]                     # (32, 128) i32 (0/1)
    within = (optr >= s) & (optr < s + OVW) & (optr > 0) & (cov > 0)
    widx2 = jnp.where(within, optr - s, 0)

    # tile-level dynamic octet bound: max used octets over the whole
    # window (a superset of the rows the tile's rays use — exact, slots
    # past a row's used prefix are sentinels)
    max_oct = jnp.max(octs_win[:])

    rx, ry, rz = rx_ref[0], ry_ref[0], rz_ref[0]
    n_chunk = T // OVW
    # Mosaic has no in-kernel dynamic_slice primitive — the octet loop
    # instead reads the scratch ref directly with a minor-dim pl.ds whose
    # start is a provable 128-multiple (CLAUDE.md landmine list), i.e.
    # PAIRS of 64-float octets; n_oct is padded even by the host.
    n_pair = n_oct // 2

    accs = []
    for c in range(n_chunk):
        sl = slice(c * (32 // n_chunk), (c + 1) * (32 // n_chunk))
        idx = widx2[sl].reshape(OVW, 1)
        crx, cry, crz = rx[sl], ry[sl], rz[sl]
        # derive the zero carries from a live value: literal broadcast
        # zeros as loop carries hit the Mosaic replicated-layout backedge
        # bug (CLAUDE.md landmine list)
        z = crx * 0.0

        def body(p, acc, idx=idx, crx=crx, cry=cry, crz=crz):
            blk = scratch[:, pl.ds(p * 128, 128)]   # 2 octets = 16 slots
            rows = jnp.take_along_axis(
                blk, jnp.broadcast_to(idx, blk.shape), axis=0,
                mode="promise_in_bounds",
            )
            return _star_math(rows, crx, cry, crz, psf_width, intensity,
                              saturation, acc, 0, 16)

        acc = jax.lax.fori_loop(
            0, jnp.minimum((max_oct + 1) // 2, n_pair), body, (z, z, z)
        )
        accs.append(acc)

    cat = (lambda vs: jnp.concatenate(vs, axis=0)) if n_chunk > 1 \
        else (lambda vs: vs[0])
    ar = cat([a[0] for a in accs])
    ag = cat([a[1] for a in accs])
    ab = cat([a[2] for a in accs])
    mask = within
    zf = jnp.zeros((), ar.dtype)
    or_ref[0] = jnp.where(mask, ar, zf)
    og_ref[0] = jnp.where(mask, ag, zf)
    ob_ref[0] = jnp.where(mask, ab, zf)


def build_k1(n_tiles, pad_k, psf_width, intensity, saturation, interpret,
             dtype=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = lambda: pl.BlockSpec((1, 32, 128), lambda i, s: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((T, 1), lambda i, s: (i, 0),
                         memory_space=pltpu.VMEM),
            plane(), plane(), plane(),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(plane(), plane(), plane(), plane()),
        scratch_shapes=[
            pltpu.VMEM((DR, DC, pad_k * ROW), dtype or jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(
        _k1_kernel, pad_k=pad_k, psf_width=psf_width, intensity=intensity,
        saturation=saturation,
    )
    f32 = jax.ShapeDtypeStruct((n_tiles, 32, 128), dtype or jnp.float32)
    i32 = jax.ShapeDtypeStruct((n_tiles, 32, 128), jnp.int32)
    return pl.pallas_call(
        kern, out_shape=(f32, f32, f32, i32), grid_spec=grid_spec,
        interpret=interpret,
    )


def build_k2(n_tiles, n_oct, psf_width, intensity, saturation, interpret,
             dtype=None):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    plane = lambda dt=None: pl.BlockSpec((1, 32, 128), lambda i, s: (i, 0, 0),
                                         memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            plane(), plane(), plane(), plane(), plane(),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(plane(), plane(), plane()),
        scratch_shapes=[
            pltpu.VMEM((OVW, n_oct * 8 * ROW), dtype or jnp.float32),
            pltpu.VMEM((OVW, 1), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kern = functools.partial(
        _k2_kernel, n_oct=n_oct, psf_width=psf_width, intensity=intensity,
        saturation=saturation,
    )
    f32 = jax.ShapeDtypeStruct((n_tiles, 32, 128), dtype or jnp.float32)
    return pl.pallas_call(
        kern, out_shape=(f32, f32, f32), grid_spec=grid_spec,
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


def run_stage(v, esc, grid, intensity, saturation, interpret):
    """Full K1 + K2 windowed stage; returns (rgb, covered, ovf_missed)."""
    import jax
    import jax.numpy as jnp

    nr, nc, pad_k = grid.n_rings, grid.n_cols, grid.pad_k
    n = v.shape[0]
    n_tiles = n // T
    n_oct = grid.ovf_data.shape[1] // (8 * ROW)
    tbl3 = grid.cell_data.reshape(nr, nc, pad_k * ROW)
    # pad the ovf table: rows so any clamped window start stays in range,
    # columns to an EVEN octet count (the kernel scans 128-float octet
    # pairs; zero sentinels die at the 3w cutoff, d2 = |r|^2 = 1)
    ovf_rows = grid.ovf_data.shape[0]
    pad_to = max(OVW + 1, ovf_rows)
    n_oct = n_oct + (n_oct & 1)
    ovf_tbl = jnp.zeros((pad_to, n_oct * 8 * ROW), grid.ovf_data.dtype)
    ovf_tbl = ovf_tbl.at[:ovf_rows, :grid.ovf_data.shape[1]].set(
        grid.ovf_data)
    octs2 = jnp.concatenate(
        [grid.ovf_octets, jnp.zeros((pad_to - ovf_rows,), jnp.int32)]
    )[:, None]

    dt = grid.cell_data.dtype
    k1 = build_k1(n_tiles, pad_k, grid.psf_width, intensity, saturation,
                  interpret, dtype=dt)
    k2 = build_k2(n_tiles, n_oct, grid.psf_width, intensity, saturation,
                  interpret, dtype=dt)

    def stage_fn(v, esc):
        # normalise exactly as the production _lookup_block does
        # (grid.py:736-737) — raw near-unit directions perturb the exp
        # argument by ~1e-4 through inv2w2 and fail the 1e-6 gate
        vx, vy, vz = v[:, 0], v[:, 1], v[:, 2]
        inv = jax.lax.rsqrt(vx * vx + vy * vy + vz * vz)
        v = v * inv[:, None]
        starts, widx, covered = prepass(v, esc, nr, nc)
        rx = v[:, 0].reshape(n_tiles, 32, 128)
        ry = v[:, 1].reshape(n_tiles, 32, 128)
        rz = v[:, 2].reshape(n_tiles, 32, 128)
        ar, ag, ab, optr = k1(starts, widx.reshape(n, 1), rx, ry, rz, tbl3)
        covp = covered.reshape(n_tiles, 32, 128).astype(jnp.int32)
        optr = jnp.where(covp > 0, optr, 0)
        # per-tile min positive pointer -> K2 window start
        big = jnp.int32(1 << 30)
        pmin = jnp.min(
            jnp.where(optr > 0, optr, big).reshape(n_tiles, -1), axis=1
        )
        s2 = jnp.clip(jnp.where(pmin == big, 1, pmin), 1,
                      max(1, pad_to - OVW))[:, None]
        if grid.has_overflow:
            br, bg, bb = k2(s2, optr, covp, rx, ry, rz, ovf_tbl, octs2)
            ar, ag, ab = ar + br, ag + bg, ab + bb
            ovf_missed = (optr > 0) & ((optr < s2[:, :, None])
                                       | (optr >= s2[:, :, None] + OVW))
        else:
            ovf_missed = jnp.zeros_like(optr, bool)
        rgb = jnp.stack(
            [ar.reshape(n), ag.reshape(n), ab.reshape(n)], axis=-1
        )
        rgb = jnp.minimum(rgb, 1.0)
        rgb = jnp.where(covered.reshape(n)[:, None], rgb, 0.0)
        return rgb, covered.reshape(n), ovf_missed.reshape(n)

    return stage_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--tiles", type=int, default=507,
                    help="tile count for the TPU timing run (507 = 1080p)")
    args = ap.parse_args()

    import jax

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
        # gate SEMANTICS in f64: the f32 form hits ~1e-5 FMA-contraction
        # noise through inv2w2 = 2e6 in the exp argument (same reason the
        # production exactness gates run f64 — tests/test_stars.py)
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from blackstar_tpu.stars.catalog import Catalog
    from blackstar_tpu.stars.grid import build_star_grid

    # Synthetic catalogue: a smooth field PLUS dense clusters so some
    # cells overflow k0 (k0=8 keeps the proto's tables small).
    rng = np.random.default_rng(7)
    n_bg = 6000
    sdec = rng.uniform(-0.8, 0.8, n_bg)
    sra = rng.uniform(0.5, 5.5, n_bg)
    # clusters: 40 spots x 60 stars inside ~1 cell each
    n_cl, cl_sz = 40, 60
    cdec = rng.uniform(-0.5, 0.5, n_cl)
    cra = rng.uniform(1.0, 5.0, n_cl)
    sdec = np.concatenate([sdec, (np.repeat(cdec, cl_sz)
                                  + rng.normal(0, 0.004, n_cl * cl_sz))])
    sra = np.concatenate([sra, (np.repeat(cra, cl_sz)
                                + rng.normal(0, 0.004, n_cl * cl_sz))])
    n_stars = len(sdec)
    pos = np.stack([np.cos(sdec) * np.cos(sra), np.cos(sdec) * np.sin(sra),
                    np.sin(sdec)], axis=-1)
    cat = Catalog(
        pos=pos,
        mag=rng.integers(300, 900, n_stars).astype(np.int32),
        hue=rng.uniform(0, 1, n_stars),
        sat=rng.uniform(0, 1, n_stars),
    )
    wdt = jnp.float64 if args.interpret else jnp.float32
    grid = build_star_grid(cat, cell_size=0.02, radius=0.0075, k0=8,
                           dtype=wdt)
    print(f"grid {grid.n_rings}x{grid.n_cols} pad_k={grid.pad_k} "
          f"stars={grid.n_stars} ovf_rows={grid.ovf_data.shape[0]} "
          f"ovf_octets_max={int(np.asarray(grid.ovf_octets).max())}")

    n_tiles = 4 if args.interpret else args.tiles
    n = n_tiles * T
    centers_dec = rng.uniform(-0.45, 0.45, n_tiles)
    centers_ra = rng.uniform(1.0, 5.0, n_tiles)
    d = np.repeat(centers_dec, T) + rng.normal(0, 0.02, n)
    r = np.repeat(centers_ra, T) + rng.normal(0, 0.04, n)
    out = rng.uniform(size=n) < 0.05
    d = np.where(out, rng.uniform(-0.7, 0.7, n), d)
    r = np.where(out, rng.uniform(0.6, 5.4, n), r)
    v = np.stack([np.cos(d) * np.cos(r), np.cos(d) * np.sin(r),
                  np.sin(d)], axis=-1).astype(np.dtype(wdt))
    v = jnp.asarray(v)
    esc = jnp.ones((n,), bool)

    stage_fn = run_stage(v, esc, grid, 0.7, 0.7, args.interpret)
    stage = jax.jit(stage_fn)
    rgb, covered, ovf_missed = stage(v, esc)

    ref = grid.lookup(v, wdt(0.7), wdt(0.7), esc, chunk=1 << 22)
    got = np.asarray(rgb)
    m = (np.asarray(covered) & ~np.asarray(ovf_missed))
    err = np.abs(got[m] - np.asarray(ref)[m]).max() if m.any() else 0.0
    print(f"covered {np.asarray(covered).mean():.4f}  "
          f"ovf_missed {np.asarray(ovf_missed).mean():.4f}  "
          f"max|err| (covered & not missed): {err:.3e}")
    if args.interpret:
        assert err < 1e-9, "windowed K1+K2 does not match production lookup"
        print("INTERPRET SEMANTICS OK")
        return

    # Device-side steady state: K stage iterations inside ONE dispatch
    # (input perturbed per iteration so XLA cannot hoist), scalar-fetch
    # forced — the tunnel's ~27 ms/dispatch floor stays amortised.
    K = 20

    @jax.jit
    def loop(v, esc):
        def body(k, acc):
            vv = v.at[0, 0].add(1e-7 * (k + 1).astype(jnp.float32))
            r, _, _ = stage_fn(vv, esc)
            return acc + r[0, 0]
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    float(loop(v, esc))
    t0 = time.perf_counter()
    float(loop(v, esc))
    dt = (time.perf_counter() - t0) / K
    print(f"K1+K2 windowed stage: {dt * 1e3:.2f} ms / {n_tiles} tiles "
          f"({n / dt / 1e6:.1f} Mrays/s; {dt * 1e9 / n:.2f} ns/ray)")


if __name__ == "__main__":
    main()

"""Mosaic capability probe: in-kernel dynamic row gather on TPU v5e.

Three rounds of measurement (DESIGN.md §3) closed the star stage's ~24 ms
XLA-apparatus gap with the verdict "needs a per-tile dynamic work-list
mechanism Pallas lacks" — per-row DMA gathers are issue-bound, and Mosaic
had no vector gather. jax 0.9's Mosaic lowering HAS grown a
``tpu.dynamic_gather`` path: ``lax.gather`` in the exact
``jnp.take_along_axis`` shape (indices.shape == operand.shape, slice (1,1),
batching on the other dim) lowers to a native sublane/lane gather
(jax/_src/pallas/mosaic/lowering.py::_gather_lowering_rule).

This probe answers, on real hardware:
  1. does axis-0 (cross-SUBLANE) dynamic_gather compile and run for
     R = 8 .. 2048 rows (i.e. across vregs, not just within one (8,128)
     tile)?   — the star-stage row-select needs R ≈ 256-1024
  2. is it correct vs the XLA gather?
  3. how fast is it (ns per gathered row, vs the ~10 ns/row + 13 ns/KB
     XLA HBM-gather bound that shaped the current design)?
  4. same questions for axis-1 (cross-LANE) gathers
  5. per-DMA overhead of a dynamic-start HBM->VMEM range copy
     (pltpu.make_async_copy with pl.ds), the other half of a
     range-DMA + in-VMEM-select star kernel.

Run:  python scripts/probe_dynamic_gather.py            (TPU)
      python scripts/probe_dynamic_gather.py --interpret (CPU semantics only)
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def row_gather_kernel(idx_ref, tbl_ref, out_ref):
    """out[i, :] = tbl[idx[i], :] via take_along_axis (axis 0).

    idx arrives as (R, 1) int32 in VMEM; broadcast across the minor dim to
    match the table shape as the lowering rule requires.
    """
    idx = idx_ref[:]                     # (R, 1)
    tbl = tbl_ref[:]                     # (R, L)
    idx2 = jnp.broadcast_to(idx, tbl.shape)
    out_ref[:] = jnp.take_along_axis(tbl, idx2, axis=0)


def lane_gather_kernel(idx_ref, tbl_ref, out_ref):
    """out[i, j] = tbl[i, idx[i, j]] (axis 1, cross-lane)."""
    out_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=1)


def _pallas_row_gather(R, L, interpret):
    return pl.pallas_call(
        row_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _pallas_lane_gather(R, L, interpret):
    return pl.pallas_call(
        lane_gather_kernel,
        out_shape=jax.ShapeDtypeStruct((R, L), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )


def _timed_loop(fn, args, iters):
    """Device-side steady state: run fn iters x inside one jit, perturbing
    the integer index input so XLA cannot hoist; returns s/iter."""

    @jax.jit
    def k_loop(*a):
        def body(i, acc):
            out = fn(jnp.bitwise_xor(a[0], i & 1), *a[1:])
            return acc + out[0, 0]

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(k_loop(*args))  # compile+warm
    t0 = time.perf_counter()
    float(k_loop(*args))
    return (time.perf_counter() - t0) / iters


def probe_row_gather(interpret):
    print("--- axis-0 (cross-sublane) dynamic row gather ---")
    for R in (8, 64, 256, 512, 1024, 2048):
        L = 256
        rng = np.random.default_rng(0)
        tbl = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, R, (R, 1)), jnp.int32)
        try:
            fn = _pallas_row_gather(R, L, interpret)
            got = np.asarray(fn(idx, tbl))
        except Exception as e:  # noqa: BLE001 — report capability, not crash
            print(f"R={R:5d} L={L}: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})")
            continue
        want = np.asarray(tbl)[np.asarray(idx)[:, 0]]
        ok = np.array_equal(got, want)
        msg = f"R={R:5d} L={L}: ok={ok}"
        if ok and not interpret:
            s = _timed_loop(fn, (idx, tbl), 300)
            msg += (f"  {s * 1e9 / R:7.2f} ns/row  "
                    f"({R * L * 4 / s / 1e9:6.1f} GB/s effective)")
        print(msg)


def probe_lane_gather(interpret):
    print("--- axis-1 (cross-lane) dynamic gather ---")
    for R, L in ((8, 128), (256, 128), (512, 256)):
        rng = np.random.default_rng(0)
        tbl = jnp.asarray(rng.standard_normal((R, L)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, L, (R, L)), jnp.int32)
        try:
            fn = _pallas_lane_gather(R, L, interpret)
            got = np.asarray(fn(idx, tbl))
        except Exception as e:  # noqa: BLE001
            print(f"R={R:5d} L={L}: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})")
            continue
        want = np.take_along_axis(np.asarray(tbl), np.asarray(idx), axis=1)
        ok = np.array_equal(got, want)
        msg = f"R={R:5d} L={L}: ok={ok}"
        if ok and not interpret:
            s = _timed_loop(fn, (idx, tbl), 300)
            msg += f"  {s * 1e9 / (R * L):7.3f} ns/elem"
        print(msg)


def probe_range_dma(interpret):
    """Dynamic-start HBM->VMEM range copy cost: the star kernel would DMA a
    contiguous cell-row range per ray tile (2 DMAs per tile with double
    buffering). Measures per-DMA overhead at range sizes 64..1024 rows."""
    print("--- dynamic-start HBM->VMEM range DMA ---")
    C, L = 1 << 16, 256  # 64 MB resident table

    def make(rows):
        def kernel(start_ref, hbm_ref, out_ref):
            def body(scratch, sem):
                start = start_ref[0]
                cp = pltpu.make_async_copy(
                    hbm_ref.at[pl.ds(start, rows)], scratch, sem
                )
                cp.start()
                cp.wait()
                out_ref[:] = scratch[:, :128]

            pl.run_scoped(
                body,
                scratch=pltpu.VMEM((rows, L), jnp.float32),
                sem=pltpu.SemaphoreType.DMA(()),
            )

        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )

    rng = np.random.default_rng(0)
    tbl = jnp.asarray(rng.standard_normal((C, L)), jnp.float32)
    for rows in (64, 256, 1024):
        start = jnp.asarray([128], jnp.int32)
        try:
            fn = make(rows)
            got = np.asarray(fn(start, tbl))
        except Exception as e:  # noqa: BLE001
            print(f"rows={rows:5d}: UNSUPPORTED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:120]})")
            continue
        want = np.asarray(tbl)[128:128 + rows, :128]
        ok = np.array_equal(got, want)
        msg = f"rows={rows:5d} ({rows * L * 4 // 1024:5d} KB): ok={ok}"
        if ok and not interpret:
            s = _timed_loop(fn, (start, tbl), 300)
            msg += (f"  {s * 1e6:8.2f} us/DMA  "
                    f"({rows * L * 4 / s / 1e9:6.1f} GB/s)")
        print(msg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true",
                    help="semantics-only run (CPU)")
    args = ap.parse_args()
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    print("platform:", jax.devices()[0].platform)
    probe_row_gather(args.interpret)
    probe_lane_gather(args.interpret)
    probe_range_dma(args.interpret)


if __name__ == "__main__":
    main()

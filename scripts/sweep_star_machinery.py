"""Sweep the star-lookup machinery knobs on the TPU.

Round-2 profiling (scripts/profile_star_stages.py) showed the grouped
lookup's cost is dominated by the overflow + invalid-fallback machinery
(~32 of 46.6 ms/frame), not the base gather+math (14.6 ms). Candidate
levers measured here, one axis at a time on production escape directions:

  1. chunk size — the default 2^17 splits a 1080p frame into 16 lax.map
     chunks, each paying the compaction machinery's fixed costs (buffer
     zeroing, block merges, while-loop ramp) again;
  2. k0 — the base-table slot count (load-time rematerialisation trades
     base gather bytes against overflow volume);
  3. batch_blocks for the pay-as-you-go overflow/invalid while_loops
     (bigger batches = fewer iterations, bounded overshoot).

Usage: python scripts/sweep_star_machinery.py [--k0-sweep] [--quick]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp

K = 8


def timeit(name, fn, *args):
    fn(*args).block_until_ready()
    float(jnp.sum(fn(*args)))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        times.append((time.perf_counter() - t0) / K)
    t = min(times)
    print(f"{name:<52} {t * 1e3:8.2f} ms/frame", flush=True)
    return t


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k0-sweep", action="store_true")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--decide", action="store_true",
                    help="only the production-default candidates, best "
                    "first — for flaky-tunnel sessions where the most "
                    "informative timings must land first")
    args = ap.parse_args()

    from blackstar_tpu.config import load_config
    from blackstar_tpu.render import run_march
    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.geodesic import ESCAPED
    from blackstar_tpu.stars.grid import load_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(here, "scenes", "default.yaml"))
    static = cfg.static()
    params = cfg.params()

    rw, rh = static.render_width, static.render_height
    pos0, vel0 = generate_ray_components(params.camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static))(params)
    vel = res.vel
    escaped = res.status == ESCAPED
    print(f"escaped: {float(jnp.mean(escaped.astype(jnp.float32))):.3f}",
          flush=True)

    ii, ss = params.stars.intensity, params.stars.saturation

    def k_loop(body):
        def f(*a):
            def it(i, acc):
                return acc + body(i, *a)
            return jax.lax.fori_loop(0, K, it, jnp.float32(0.0))
        return jax.jit(f)

    def grouped(name, grid, **kw):
        return timeit(
            name,
            k_loop(lambda i, v, a, g: jnp.sum(g.lookup_grouped(
                v, intensity=ii + 1e-6 * i, saturation=ss, active=a, **kw))),
            vel, escaped, grid,
        )

    grid_path = os.path.join(here, "stars.grid.npz")
    grid = load_star_grid(grid_path)
    print(f"{grid.n_stars} stars, K0={grid.pad_k}, "
          f"ovf {grid.ovf_data.shape}, base {grid.cell_data.shape}", flush=True)

    if args.decide:
        # Decision set for the production defaults (ROW_BANDS / chunk /
        # artifact k0+ovf_split), most informative first.
        grouped("BASELINE: row-pair, chunk 2^17 (production)", grid,
                row_pitch=rw)
        grouped("row-quad, chunk 2^21", grid, row_pitch=rw, row_bands=4,
                chunk=1 << 21)
        g4 = load_star_grid(grid_path, ovf_split=4)
        grouped("row-quad, 2^21, ovf_split=4", g4, row_pitch=rw,
                row_bands=4, chunk=1 << 21)
        grouped("row-quad, 2^21, ovf_split=4, ovf_batch 128", g4,
                row_pitch=rw, row_bands=4, chunk=1 << 21,
                ovf_batch_blocks=128)
        grouped("row-pair, 2^21, ovf_split=4", g4, row_pitch=rw,
                chunk=1 << 21)
        del g4
        g162 = load_star_grid(grid_path, k0=16, ovf_split=2)
        grouped("row-quad, 2^21, k0=16, ovf_split=2", g162, row_pitch=rw,
                row_bands=4, chunk=1 << 21)
        # 4×8 pixel blocks (gt=32 rays/row — the largest block the 6 mrad
        # artifact margin covers at 1080p/fov 1.5: spread 3.0 mrad ×1.3).
        grouped("4x8 blocks, 2^21, k0=16, ovf_split=2", g162, row_pitch=rw,
                row_bands=4, group=8, chunk=1 << 21)
        del g162
        g4b = load_star_grid(grid_path, ovf_split=4)
        grouped("4x8 blocks, 2^21, ovf_split=4", g4b, row_pitch=rw,
                row_bands=4, group=8, chunk=1 << 21)
        del g4b
        return

    # --- 1. chunk size (fixed-cost amplification across lax.map chunks) ---
    grouped("chunk 2^17 (production default)", grid)
    grouped("chunk 2^18", grid, chunk=1 << 18)
    grouped("chunk 2^19", grid, chunk=1 << 19)
    grouped("chunk 2^21 (single block)", grid, chunk=1 << 21)

    # --- 1b. row-band schedules (p adjacent rows × g pixels) -----------
    grouped("row-pair, chunk 2^17", grid, row_pitch=rw)
    grouped("row-pair, chunk 2^21", grid, row_pitch=rw, chunk=1 << 21)
    grouped("row-pair g=8 (2x8), chunk 2^21", grid, row_pitch=rw,
            group=8, chunk=1 << 21)
    grouped("row-quad (4x4), chunk 2^17", grid, row_pitch=rw, row_bands=4)
    grouped("row-quad (4x4), chunk 2^21", grid, row_pitch=rw, row_bands=4,
            chunk=1 << 21)
    grouped("4x8 blocks, chunk 2^21", grid, row_pitch=rw, row_bands=4,
            group=8, chunk=1 << 21)

    if not args.quick:
        # --- 3. pay-as-you-go batch sizes at the best chunk ----------------
        for ck in (1 << 17, 1 << 21):
            tag = "2^17" if ck == 1 << 17 else "2^21"
            grouped(f"chunk {tag}, ovf_batch 2048", grid, chunk=ck,
                    ovf_batch_blocks=2048)
            grouped(f"chunk {tag}, inv_batch 1024", grid, chunk=ck,
                    inv_batch_blocks=1024)
            grouped(f"chunk {tag}, both batches 4x", grid, chunk=ck,
                    ovf_batch_blocks=2048, inv_batch_blocks=1024)
            grouped(f"chunk {tag}, row-pair, both batches 4x", grid,
                    chunk=ck, row_pitch=rw,
                    ovf_batch_blocks=2048, inv_batch_blocks=1024)
        # Small overflow batches: the dynamic octet bound makes narrow
        # batches pay fewer octets (batch max ~7/10 at 512 blocks; image-
        # coherent 128-block batches should sit lower).
        grouped("row-quad, ovf_batch 128", grid, row_pitch=rw, row_bands=4,
                chunk=1 << 21, ovf_batch_blocks=128)
        grouped("row-quad, ovf_batch 256", grid, row_pitch=rw, row_bands=4,
                chunk=1 << 21, ovf_batch_blocks=256)
        # Invalid-fallback billing granularity: at 4×4 a ray_block-32
        # invalid block bills 32 recomputed rays per flagged block (2
        # groups); ray_block 16 halves the billing to one 16-ray group.
        grouped("row-quad, ray_block 16", grid, row_pitch=rw, row_bands=4,
                chunk=1 << 21, ray_block=16)

    # --- 1c. two-tier overflow split (load-time rematerialisation) -----
    # Measured schedule stats on the default 1080p framing (CPU-exact,
    # scripts/star_schedule_stats.py logic): tier-2 flags fall from 23% of
    # group blocks to 13.5/7.6/3.4% at split 2/3/4, and the gathered
    # overflow bytes halve at split 4 (DESIGN.md §3).
    if not args.quick:
        for split in (2, 3, 4):
            gs = load_star_grid(grid_path, ovf_split=split)
            print(f"ovf_split={split}: ovf {gs.ovf_data.shape} "
                  f"ovf2 {gs.ovf2_data.shape}", flush=True)
            grouped(f"ovf_split={split}, chunk 2^17", gs)
            grouped(f"ovf_split={split}, row-quad, chunk 2^21", gs,
                    row_pitch=rw, row_bands=4, chunk=1 << 21)
            del gs

    # --- 2. k0 rematerialisation --------------------------------------
    if args.k0_sweep:
        del grid
        for k0 in (16, 24, 48):
            g2 = load_star_grid(grid_path, k0=k0)
            print(f"k0={k0}: base {g2.cell_data.shape} "
                  f"ovf {g2.ovf_data.shape}", flush=True)
            grouped(f"k0={k0}, chunk 2^17", g2)
            grouped(f"k0={k0}, chunk 2^21", g2, chunk=1 << 21)
            grouped(f"k0={k0}, row-quad, chunk 2^21", g2, row_pitch=rw,
                    row_bands=4, chunk=1 << 21)
            del g2
        # Combined best-guess: moderate k0 + split + row-quad.
        for k0, split in ((16, 2), (32, 4), (48, 4)):
            g3 = load_star_grid(grid_path, k0=k0, ovf_split=split)
            grouped(f"k0={k0}, ovf_split={split}, row-quad, 2^21", g3,
                    row_pitch=rw, row_bands=4, chunk=1 << 21)
            del g3


if __name__ == "__main__":
    main()

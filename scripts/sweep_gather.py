"""Measure the TPU cost model of XLA row gathers: rows x row-bytes.

The star-grid lookup is gather-bound (DESIGN.md #3). Round 1 established
that the 2-D-view row gather is row-count-bound (~11 ns/row) and
"insensitive to row width" — but that was measured at <=256 B rows. The
grouped-lookup redesign (fewer, wider rows) needs the full curve: where does
row width start to cost, and at what effective bandwidth does it stream?

Run on the TPU:  python scripts/sweep_gather.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def time_fn(fn, *args, reps=3):
    """Device-side steady-state seconds per call (bench.py methodology)."""
    float(fn(*args))  # compile + warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main():
    print(f"backend: {jax.default_backend()}")
    key = jax.random.PRNGKey(0)
    n_src = 1 << 15  # 32768 source rows — bigger than any cache

    for rows in (1 << 18, 1 << 21):  # 262k (grouped) and 2M (per-ray)
        for row_f32 in (64, 128, 256, 512, 1024, 2048):
            if rows * row_f32 * 4 > 5e9:
                continue  # gather output would blow HBM
            src = jax.random.normal(key, (n_src, row_f32), jnp.float32)
            idx = jax.random.randint(key, (rows,), 0, n_src, jnp.int32)

            # Enough in-dispatch iterations that the ~27 ms tunnel floor
            # stays <10% of the measurement.
            k_iters = max(1, int(3e9 / (rows * row_f32 * 4)))

            def run(src, idx, k_iters=k_iters):
                def body(i, acc):
                    g = src[(idx + i) % n_src]  # perturb so XLA can't hoist
                    # Consume every column — slicing would let XLA narrow
                    # the gather to the consumed bytes only.
                    return acc + jnp.sum(g)

                return jax.lax.fori_loop(0, k_iters, body, jnp.float32(0.0))

            t = time_fn(jax.jit(run), src, idx) / k_iters
            bytes_moved = rows * row_f32 * 4
            print(
                f"rows={rows:>8} row={row_f32 * 4:>5}B iters={k_iters:>3} "
                f"t={t * 1e3:8.3f} ms  {t / rows * 1e9:6.2f} ns/row  "
                f"{bytes_moved / t / 1e9:7.1f} GB/s"
            )


if __name__ == "__main__":
    main()

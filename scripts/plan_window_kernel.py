"""Exact-geometry feasibility stats for the range-window Pallas star kernel.

The prospective kernel (r5; DESIGN.md §3 ceiling follow-up) shades stars
per-ray — each ray reads its OWN cell row, no group validity, no grouped
fallback — by caching a contiguous window of ``R`` base-table rows in VMEM
per ray tile (one range DMA) and selecting rows in-kernel with
``tpu.dynamic_gather``. Its feasibility hangs on geometry questions this
script answers on CPU with production escape directions (no TPU needed):

  1. window coverage: processing rays in row-major tiles of T rays with a
     length-R cell-id window, what fraction of rays is LEFT OVER (cell
     outside the window)?  (mean-centred window vs the sorted-optimal one)
  2. overflow locality: are packed overflow-row pointers monotone in cell
     id (CSR build order), and how wide is the per-tile overflow row range
     (the second DMA)?
  3. second chance: sorting the leftover rays by cell id and re-tiling
     them into T-ray chunks, what fraction is covered by each chunk's own
     window (the "sorted-belt pass"), and what remains for the exact
     XLA per-ray fallback?

Usage: python scripts/plan_window_kernel.py [--scene ...] [-T 4096]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("-T", "--tile", type=int, default=4096,
                    help="rays per kernel tile (= window rows R)")
    ap.add_argument("--windows", type=int, nargs="*",
                    default=[2048, 4096, 8192],
                    help="window sizes R to evaluate")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from blackstar_tpu.camera import generate_ray_components
    from blackstar_tpu.config import load_config
    from blackstar_tpu.geodesic import ESCAPED
    from blackstar_tpu.render import run_march
    from blackstar_tpu.stars.grid import load_star_grid
    from blackstar_tpu.util import enable_compilation_cache

    enable_compilation_cache()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(args.scene or os.path.join(here, "scenes", "default.yaml"))
    static, params = cfg.static(), cfg.params()
    rw, rh = static.render_width, static.render_height

    grid = load_star_grid(os.path.join(here, "stars.grid.npz"))
    nr, nc = grid.n_rings, grid.n_cols
    delta = np.pi / nr
    base_aux = np.asarray(grid.cell_data[:, 7]).astype(np.int64)
    n_ovf = int(np.asarray(grid.ovf_data).shape[0])

    pos0, vel0 = generate_ray_components(params.camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static,
                                      use_pallas=False))(params)
    comps = (res.vel if isinstance(res.vel, tuple)
             else (res.vel[:, 0], res.vel[:, 1], res.vel[:, 2]))
    vel = np.stack([np.asarray(c) for c in comps], axis=-1).astype(np.float64)
    esc = np.asarray(res.status == ESCAPED)
    n = vel.shape[0]
    print(f"rays={n} escaped frac {esc.mean():.4f}  grid {nr}x{nc} "
          f"(C={nr * nc}) ovf_rows={n_ovf}")

    v = vel / np.linalg.norm(vel, axis=-1, keepdims=True)
    v = np.where(esc[:, None], v, 1 / np.sqrt(3))  # production probe dir

    dec = np.arcsin(np.clip(v[:, 2], -1, 1))
    ra = np.mod(np.arctan2(v[:, 1], v[:, 0]), 2 * np.pi)
    ring = np.clip(np.floor((dec + np.pi / 2) / delta).astype(np.int64),
                   0, nr - 1)
    col = np.clip(np.floor(ra / (2 * np.pi) * nc).astype(np.int64), 0, nc - 1)
    cells = ring * nc + col

    # ---- 2. overflow pointer monotonicity / per-window ovf span ----------
    flat_ptr = base_aux  # (C,) pointer per cell, 0 = none
    cells_w_ovf = np.flatnonzero(flat_ptr > 0)
    ptrs = flat_ptr[cells_w_ovf]
    mono = bool(np.all(np.diff(ptrs) > 0))
    print(f"ovf pointers monotone in cell id: {mono} "
          f"(cells with ovf {len(cells_w_ovf)})")

    T = args.tile
    n_pad = -(-n // T) * T
    cells_p = np.concatenate([cells, np.full(n_pad - n, cells[-1])])
    esc_p = np.concatenate([esc, np.zeros(n_pad - n, bool)])
    tiles_c = cells_p.reshape(-1, T)
    tiles_e = esc_p.reshape(-1, T)
    n_tiles = tiles_c.shape[0]

    vx = np.concatenate([v, np.tile(v[-1:], (n_pad - n, 1))]).reshape(-1, T, 3)

    def window_cover(tc, te, starts, R):
        """fraction of escaped rays per tile with cell in [start, start+R)."""
        inw = (tc >= starts[:, None]) & (tc < (starts + R)[:, None])
        cov = (inw & te).sum() / max(1, te.sum())
        return cov, inw

    for R in args.windows:
        # (a) mean-direction-centred window (cheap XLA pre-pass analogue)
        mean = vx.mean(axis=1)
        mean /= np.linalg.norm(mean, axis=-1, keepdims=True)
        mdec = np.arcsin(np.clip(mean[:, 2], -1, 1))
        mra = np.mod(np.arctan2(mean[:, 1], mean[:, 0]), 2 * np.pi)
        mring = np.clip(np.floor((mdec + np.pi / 2) / delta).astype(np.int64),
                        0, nr - 1)
        mcol = np.clip(np.floor(mra / (2 * np.pi) * nc).astype(np.int64),
                       0, nc - 1)
        mcell = mring * nc + mcol
        starts_m = np.clip(mcell - R // 2, 0, nr * nc - R)
        cov_m, _ = window_cover(tiles_c, tiles_e, starts_m, R)

        # (b) sorted-optimal window per tile (upper bound, O(T log T)/tile)
        covs = np.empty(n_tiles)
        starts_o = np.empty(n_tiles, np.int64)
        for t in range(n_tiles):
            tc = np.sort(tiles_c[t][tiles_e[t]])
            if len(tc) == 0:
                covs[t] = 1.0
                starts_o[t] = 0
                continue
            # two-pointer max rays in any length-R window
            j = np.searchsorted(tc, tc - R + 1, side="left")
            k = np.arange(len(tc)) - j + 1
            b = int(np.argmax(k))
            covs[t] = k[b] / len(tc)
            starts_o[t] = max(0, tc[b] - R + 1)
        # overall optimal coverage weighted by escaped count
        wts = tiles_e.sum(axis=1)
        cov_o = float((covs * wts).sum() / wts.sum())

        # per-window overflow span at the optimal starts
        spans = []
        for t in range(n_tiles):
            lo, hi = starts_o[t], starts_o[t] + R
            sel = (cells_w_ovf >= lo) & (cells_w_ovf < hi)
            p = ptrs[sel]
            spans.append(0 if len(p) == 0 else int(p.max() - p.min() + 1))
        spans = np.asarray(spans)
        print(f"R={R:5d}: cover mean-centred {cov_m:.4f}  "
              f"sorted-optimal {cov_o:.4f}  "
              f"ovf-span p50/p90/max {np.percentile(spans, 50):.0f}/"
              f"{np.percentile(spans, 90):.0f}/{spans.max()}")

        # (c) sorted-belt second pass at this R (using optimal starts)
        inw = (tiles_c >= starts_o[:, None]) & (tiles_c < (starts_o + R)[:, None])
        left = (~inw) & tiles_e
        leftover = tiles_c[left]
        frac_left = left.sum() / max(1, tiles_e.sum())
        if len(leftover):
            lc = np.sort(leftover)
            chunks = lc[: len(lc) // T * T].reshape(-1, T)
            if len(chunks):
                spread_ok = (chunks[:, -1] - chunks[:, 0] + 1) <= R
                pass2_cov = spread_ok.mean()
            else:
                pass2_cov = 1.0  # single partial chunk: spread check below
            tailspread = int(lc[-1] - lc[max(0, len(lc) - len(lc) % T)] + 1) \
                if len(lc) % T else 0
            resid = (1.0 - pass2_cov) * frac_left
            print(f"         leftover {frac_left:.4f} of escaped rays; "
                  f"sorted {len(lc)} rays -> {max(1, len(lc) // T)} chunks, "
                  f"chunk-spread<=R frac {pass2_cov:.3f} "
                  f"(tail spread {tailspread}); residual ~{resid:.5f}")


if __name__ == "__main__":
    main()

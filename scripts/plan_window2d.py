"""2-D-window feasibility stats for the range-window Pallas star kernel.

Follow-up to plan_window_kernel.py, whose headline negative result is that
FLAT cell-id windows cannot work: the default camera is tilted relative to
the sky grid, so row-major ray tiles sweep declination rings diagonally and
a 4096-row flat window covers only ~6-10% of a tile (sorted-optimal!).

This script evaluates the fix: square IMAGE tiles (P x P pixels) with a
(DR rings x DC cols) rectangular cell window per tile — DMA-able as one
strided copy from the (n_rings, n_cols*256) base table. A ray is covered
iff its own cell lies in the tile's rectangle (modular in columns).
Reports coverage, window-center quality (mean direction vs per-tile
median ring/col), and the leftover population for the sorted-belt pass.

Usage: python scripts/plan_window2d.py [--scene ...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
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

    pos0, vel0 = generate_ray_components(params.camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static,
                                      use_pallas=False))(params)
    comps = (res.vel if isinstance(res.vel, tuple)
             else (res.vel[:, 0], res.vel[:, 1], res.vel[:, 2]))
    vel = np.stack([np.asarray(c) for c in comps], axis=-1).astype(np.float64)
    esc = np.asarray(res.status == ESCAPED)

    v = vel / np.linalg.norm(vel, axis=-1, keepdims=True)
    v = np.where(esc[:, None], v, 1 / np.sqrt(3))

    dec = np.arcsin(np.clip(v[:, 2], -1, 1))
    ra = np.mod(np.arctan2(v[:, 1], v[:, 0]), 2 * np.pi)
    ring = np.clip(np.floor((dec + np.pi / 2) / delta).astype(np.int64),
                   0, nr - 1)
    col = np.clip(np.floor(ra / (2 * np.pi) * nc).astype(np.int64), 0, nc - 1)

    ring_i = ring.reshape(rh, rw)
    col_i = col.reshape(rh, rw)
    esc_i = esc.reshape(rh, rw)
    aux_i = base_aux[(ring_i * nc + col_i)]

    def run(P, DR, DC):
        th, tw = -(-rh // P), -(-rw // P)
        tot = covd = 0
        left_cells = []
        ovf_cov = ovf_tot = 0
        for ty in range(th):
            for tx in range(tw):
                r = ring_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
                c = col_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
                e = esc_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
                a = aux_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
                if not e.any():
                    continue
                # centre on the per-tile median escaped ring / circular-median col
                r0 = int(np.median(r[e])) - DR // 2
                r0 = max(0, min(nr - DR, r0))
                # circular median col: use the angular mean of the tile dirs
                cm = np.angle(np.exp(1j * (c[e] + 0.5) * 2 * np.pi / nc)
                              .mean()) % (2 * np.pi)
                c0 = (int(cm / (2 * np.pi) * nc) - DC // 2) % nc
                inr = (r >= r0) & (r < r0 + DR)
                inc = ((c - c0) % nc) < DC
                cov = inr & inc
                tot += int(e.sum())
                covd += int((cov & e).sum())
                # overflow rays covered by the window (their ovf row must be
                # handled by the ovf pass either way; count for interest)
                ovf_tot += int(((a > 0) & e).sum())
                ovf_cov += int(((a > 0) & e & cov).sum())
                lc = (r[~cov & e] * nc + c[~cov & e])
                if len(lc):
                    left_cells.append(lc)
        frac = 1 - covd / tot
        print(f"P={P:4d} DR={DR:3d} DC={DC:4d} (rows {DR * DC:6d}): "
              f"uncovered {frac:.4f} of escaped "
              f"(ovf rays {ovf_tot / tot:.4f} of escaped)")
        # sorted-belt second pass over leftovers: chunks of C2 rays, each
        # with its own flat window of W2 rows (C2 < W2 trades gather waste
        # for coverage)
        if left_cells:
            lc = np.sort(np.concatenate(left_cells))
            for C2, W2 in ((DR * DC, DR * DC), (1024, 4096), (2048, 8192)):
                nchunk = -(-len(lc) // C2)
                ok = okr = 0
                for i in range(nchunk):
                    ch = lc[i * C2:(i + 1) * C2]
                    if ch[-1] - ch[0] + 1 <= W2:
                        ok += 1
                        okr += len(ch)
                print(f"    pass2 C2={C2:5d} W2={W2:5d}: {len(lc)} rays -> "
                      f"{nchunk} chunks, covered-chunk frac {ok / max(1, nchunk):.3f} "
                      f"ray frac {okr / len(lc):.3f} "
                      f"residual {(len(lc) - okr) / max(1, tot):.4f} of escaped")

    for P, DR, DC in ((64, 32, 128), (64, 64, 128), (64, 64, 256),
                      (64, 96, 170), (32, 32, 128), (32, 64, 128)):
        run(P, DR, DC)


if __name__ == "__main__":
    main()

"""Exact geometry statistics for candidate star-lookup schedules — CPU-only.

Marches the default 1080p scene on the CPU backend (float32, XLA while_loop
path — identical classification to production) and reports, for each p×g
row-band grouping of the production escape directions:

* invalid-ray fraction (rays outside their group cell's validity ball →
  exact per-ray fallback volume),
* invalid-group / invalid-block fractions (the compaction granularities),
* overflow-flagged group/block fractions,
* the mean per-batch max used-octet count (what the dynamic octet bound
  of ``StarGrid.ovf_octets`` actually pays at a given batch size).

This predicts the relative cost of schedules without TPU time; the
hardware sweep (``sweep_star_machinery.py``) prices them. Round-2 numbers
are recorded in DESIGN.md §3.

Usage: python scripts/star_schedule_stats.py [--scene scenes/default.yaml]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--ovf-batch-blocks", type=int, default=512)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
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
    margin = grid.margin
    nr, nc = grid.n_rings, grid.n_cols
    delta = np.pi / nr
    base_aux = np.asarray(grid.cell_data[:, 7]).astype(np.int64)
    octs = np.asarray(grid.ovf_octets)

    pos0, vel0 = generate_ray_components(params.camera, rw, rh,
                                         dtype=static.jdtype)
    res = jax.jit(lambda p: run_march(pos0, vel0, p, static,
                                      use_pallas=False))(params)
    comps = (res.vel if isinstance(res.vel, tuple)
             else (res.vel[:, 0], res.vel[:, 1], res.vel[:, 2]))
    vel = np.stack([np.asarray(c) for c in comps], axis=-1).astype(np.float64)
    esc = np.asarray(res.status == ESCAPED)
    print(f"escaped frac {esc.mean():.4f}")

    v = vel / np.linalg.norm(vel, axis=-1, keepdims=True)
    v = np.where(esc[:, None], v, 1 / np.sqrt(3))  # production probe dir

    def cell_of(p):
        dec = np.arcsin(np.clip(p[:, 2], -1, 1))
        ra = np.mod(np.arctan2(p[:, 1], p[:, 0]), 2 * np.pi)
        ring = np.clip(np.floor((dec + np.pi / 2) / delta).astype(np.int64),
                       0, nr - 1)
        col = np.clip(np.floor(ra / (2 * np.pi) * nc).astype(np.int64),
                      0, nc - 1)
        return ring * nc + col

    def stats(p_rows, gsize):
        if rh % p_rows or rw % gsize:
            return
        img = v.reshape(rh, rw, 3)
        hb = rh // p_rows
        members = (img.reshape(hb, p_rows, rw, 3)
                   .transpose(0, 2, 1, 3)
                   .reshape(hb, rw // gsize, gsize, p_rows, 3))
        memf = members.reshape(-1, gsize * p_rows, 3)
        mean = memf.mean(axis=1)
        rep = mean / np.linalg.norm(mean, axis=-1, keepdims=True)
        g_tot = memf.shape[0]
        cells = cell_of(rep)
        ring = cells // nc
        col = cells % nc
        dec_c = -np.pi / 2 + (ring + 0.5) * delta
        ra_c = (col + 0.5) * (2 * np.pi / nc)
        cx = np.cos(dec_c) * np.cos(ra_c)
        cy = np.cos(dec_c) * np.sin(ra_c)
        cz = np.sin(dec_c)
        cos_edge = np.minimum(np.abs(np.cos(dec_c - 0.5 * delta)),
                              np.abs(np.cos(dec_c + 0.5 * delta)))
        col_w = (2 * np.pi / nc) * cos_edge
        r_in = 0.45 * np.minimum(delta, col_w)
        usable = margin * 0.99 + r_in
        d2 = ((memf - np.stack([cx, cy, cz], -1)[:, None, :]) ** 2).sum(-1)
        inv = d2 > (usable ** 2)[:, None]
        inv_group = inv.any(axis=1)
        gpb = max(1, 32 // (gsize * p_rows))
        nbr = g_tot // gpb
        ibf = inv_group[: nbr * gpb].reshape(nbr, gpb).any(axis=1)
        optr = base_aux[cells]
        hasg = optr > 0
        nbg = g_tot // 8
        obf = hasg[: nbg * 8].reshape(nbg, 8).any(axis=1)
        fl = np.flatnonzero(obf)
        b = args.ovf_batch_blocks
        mx = [octs[optr[(fl[i:i + b][:, None] * 8
                         + np.arange(8)).reshape(-1)]].max()
              for i in range(0, len(fl), b)] or [0]
        print(f"{p_rows}x{gsize}: groups={g_tot:7d} "
              f"inv_ray={inv.mean():.4f} inv_grp={inv_group.mean():.4f} "
              f"inv_blk={ibf.mean():.4f} ovf_grp={hasg.mean():.4f} "
              f"ovf_blk={obf.mean():.4f} "
              f"mean_batch_max_oct={np.mean(mx):.2f}/{octs.max()}")

    for p_rows, gsize in ((1, 4), (2, 4), (4, 4), (2, 8), (4, 8)):
        stats(p_rows, gsize)


if __name__ == "__main__":
    main()

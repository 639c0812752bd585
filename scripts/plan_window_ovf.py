"""Overflow-window feasibility for the range-window star kernel.

Overflow-row pointers are monotone in cell id (plan_window_kernel.py), so
IF each ray tile's overflow pointers span a small range, pass 1 can DMA a
per-tile overflow window [min_ptr, min_ptr + OVW) alongside the base
window — no reordered tables, no band phases. This measures, for the
chosen tile/window geometry, the distribution of per-tile ovf-pointer
spans over COVERED rays and the fraction of ovf work captured by fixed
OVW windows.

Usage: python scripts/plan_window_ovf.py [-P 64 --dr 32 --dc 128]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("-P", type=int, default=64)
    ap.add_argument("--dr", type=int, default=32)
    ap.add_argument("--dc", type=int, default=128)
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
    octs = np.asarray(grid.ovf_octets)

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

    P, DR, DC = args.P, args.dr, args.dc
    ring_i = ring.reshape(rh, rw)
    col_i = col.reshape(rh, rw)
    esc_i = esc.reshape(rh, rw)

    spans, octsum = [], []
    tot_ovf = cap1024 = cap2048 = cap4096 = 0
    th, tw = -(-rh // P), -(-rw // P)
    for ty in range(th):
        for tx in range(tw):
            r = ring_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
            c = col_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
            e = esc_i[ty * P:(ty + 1) * P, tx * P:(tx + 1) * P].ravel()
            if not e.any():
                continue
            r0 = max(0, min(nr - DR, int(np.median(r[e])) - DR // 2))
            cm = np.angle(np.exp(1j * (c[e] + 0.5) * 2 * np.pi / nc)
                          .mean()) % (2 * np.pi)
            c0 = (int(cm / (2 * np.pi) * nc) - DC // 2) % nc
            cov = (r >= r0) & (r < r0 + DR) & (((c - c0) % nc) < DC) & e
            ptr = base_aux[r[cov] * nc + c[cov]]
            ptr = ptr[ptr > 0]
            tot_ovf += len(ptr)
            if len(ptr) == 0:
                spans.append(0)
                continue
            lo = ptr.min()
            spans.append(int(ptr.max() - lo + 1))
            cap1024 += int((ptr < lo + 1024).sum())
            cap2048 += int((ptr < lo + 2048).sum())
            cap4096 += int((ptr < lo + 4096).sum())
            octsum.append(octs[ptr].mean())
    spans = np.asarray(spans)
    print(f"P={P} DR={DR} DC={DC}: tiles={len(spans)} "
          f"ovf rays(covered)={tot_ovf}")
    print(f"ovf-ptr span p50/p90/p99/max: {np.percentile(spans, 50):.0f}/"
          f"{np.percentile(spans, 90):.0f}/{np.percentile(spans, 99):.0f}/"
          f"{spans.max()}")
    for nm, cap in (("1024", cap1024), ("2048", cap2048), ("4096", cap4096)):
        print(f"OVW={nm}: captures {cap / max(1, tot_ovf):.4f} of ovf rays")
    if octsum:
        print(f"mean used-octets over tile ovf rows: {np.mean(octsum):.2f}")


if __name__ == "__main__":
    main()

"""Pallas TPU kernel for the march *adjoint* (reverse-mode gradients).

The autodiff backward of the checkpointed-scan march streams the full ray
state through HBM on every step of both the replayed forward and the reverse
sweep, and cannot early-exit. This kernel keeps everything in VMEM:

  Phase A  forward replay from the inputs, checkpointing the (pos, vel,
           alpha, status) state every ``seg_len`` steps into a VMEM buffer,
           with whole-tile early exit (segments after every ray terminates
           are identity for the adjoint and are skipped exactly);
  Phase B  for each segment, newest first: re-run the ``seg_len`` primal
           steps from the checkpoint storing each pre-step state, then apply
           the hand-derived step VJP (ops/march_vjp.step_vjp — validated
           against jax.grad of the XLA march) in reverse order.

Per-ray parameter partials (coef/disk) accumulate as vectors and reduce to
per-tile scalars once at the end; the h² = |pos₀×vel₀|² chain closes inside
the kernel. HBM traffic: inputs + cotangents in, gradients out — nothing
per-step.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blackstar_tpu.ops.march_pallas import (
    LANES,
    pack_scalars,
    _S_DISK_B,
    _S_DISK_G,
    _S_DISK_R,
    _S_H,
    _S_INNER,
    _S_INNER2,
    _S_MASS,
    _S_OPACITY,
    _S_OUTER,
    _S_OUTER2,
    _S_SAFE,
)
from blackstar_tpu.ops.march_vjp import (
    AdjointCarry,
    Dot3,
    StepConsts,
    alpha_shade,
    step_primal,
    step_vjp,
)

ADJ_BLOCK_ROWS = 16  # 2048 rays/tile (best measured; ~2.5 MB VMEM scratch)
ADJ_SEG_LEN = 16  # steps per checkpoint segment
# Store RK4 stage positions during the segment replay (+9 planes ≈ +1.2 MB
# VMEM at the default tile) so the VJP sweep skips its stage recompute.
# True is the measured v5e winner (r3, scripts/sweep_adjoint.py): 112.8 ms
# fwd+bwd @1080p vs 116.2 recompute — bitwise identical, gated.
ADJ_STORE_STAGES = True
# Measured v5e @1080p, 601-step cap (r4 sweep, K-in-dispatch): fwd+bwd
# 106.4 ms (19.5 Mrays/s; bwd ≈ 76.4 ms) at the (16, 16) default, best
# across rows∈{8,16,32} × seg∈{8,16,32} × store_stages. History: the r3
# sweep measured 112.8 (bwd 82.7) and established the reverse sweep is
# compute-bound on the VJP math itself (removing ALL primal RK4 recompute
# via store_stages moved bwd only 86.2 → 82.7); the r4 fused-stage
# closed-form rk4_vjp (see its docstring — collapses the u-chain
# bookkeeping, drops the per-stage divide) bought a further 82.7 → 76.4.
# The remaining reverse cost is ~3.05× the 24.9 ms forward: four
# symmetric-Jacobian applications + the cotangent chain is ~2.2× the
# forward flops by count, and the reverse carry (18 planes vs the
# forward's 13) adds register pressure the scheduler pays for — the
# 25 Mrays/s fwd+bwd stretch would need either a reverse formulation
# with fewer than 4 J-applications per step (none is known for an exact
# discrete RK4 adjoint) or f32→bf16 cotangents (breaks the 1e-9 grad
# gates). Recorded as the r4 ceiling argument.

# Lane layout of the per-tile scalar-partials output row.
G_MASS = 0
G_INNER = 1
G_OUTER = 2
G_OPACITY = 3
G_RGB0 = 4
G_RGB1 = 5
G_RGB2 = 6
G_POS0X = 7
G_POS0Y = 8
G_POS0Z = 9
N_SCALAR_GRADS = 10


def _adjoint_kernel(
    scal_ref,  # SMEM (11,) f32 — same layout as the forward kernel
    cap_ref,  # SMEM (1,) i32
    p0_ref,  # SMEM (3,) f32
    vx_ref, vy_ref, vz_ref,  # VMEM (R,128) initial directions
    cvx_ref, cvy_ref, cvz_ref,  # VMEM cotangents of the final velocity
    car_ref, cag_ref, cab_ref, caa_ref,  # VMEM cotangents of acc RGBA
    gvx_ref, gvy_ref, gvz_ref,  # VMEM out: d/d(vel0) planes
    gs_ref,  # VMEM out (1, 8, LANES) block: scalar partials in sublane 0
    # (8-sublane minimum tile; the wrapper sums the zero-padded sublanes)
    ck_px, ck_py, ck_pz, ck_vx, ck_vy, ck_vz, ck_aa, ck_st,  # scratch ckpts
    sb_px, sb_py, sb_pz, sb_vx, sb_vy, sb_vz, sb_aa, sb_st,  # scratch segbuf
    *sb_q,  # 9 scratch stage buffers (q2/q3/q4 xyz) iff store_stages
    disk_on: bool,
    seg_len: int,
    n_seg_max: int,
    defer_shade: bool,
    store_stages: bool,
):
    h = scal_ref[_S_H]
    mass = scal_ref[_S_MASS]

    p0x, p0y, p0z = p0_ref[0], p0_ref[1], p0_ref[2]
    vx, vy, vz = vx_ref[:], vy_ref[:], vz_ref[:]
    shape = vx.shape
    cap = cap_ref[0]

    # h² = |p0×v|² and the per-ray RHS coefficient (Raytracer.hs:73,124).
    cx = p0y * vz - p0z * vy
    cy = p0z * vx - p0x * vz
    cz = p0x * vy - p0y * vx
    h2 = cx * cx + cy * cy + cz * cz
    consts = StepConsts(
        h=h,
        coef=-1.5 * mass * h2,
        rs2=mass * mass,
        safe=scal_ref[_S_SAFE],
        in2=scal_ref[_S_INNER2],
        out2=scal_ref[_S_OUTER2],
        mid=0.5 * (scal_ref[_S_INNER2] + scal_ref[_S_OUTER2]),
        inner=scal_ref[_S_INNER],
        outer=scal_ref[_S_OUTER],
        opacity=scal_ref[_S_OPACITY],
        rgb0=scal_ref[_S_DISK_R],
        rgb1=scal_ref[_S_DISK_G],
        rgb2=scal_ref[_S_DISK_B],
    )

    # ---- Phase A: forward replay with VMEM checkpoints ----------------------
    # Initial state round-trips through the checkpoint buffers so every
    # loop-carried value has a concrete (non-replicated) vector layout.
    ck_px[0] = jnp.full(shape, p0x)
    ck_py[0] = jnp.full(shape, p0y)
    ck_pz[0] = jnp.full(shape, p0z)
    ck_vx[0] = vx
    ck_vy[0] = vy
    ck_vz[0] = vz
    ck_aa[0] = jnp.zeros(shape, jnp.float32)
    ck_st[0] = jnp.zeros(shape, jnp.int32)

    def a_cond(carry):
        seg, _, _, _, _, _, _, _, status = carry
        return jnp.logical_and(
            jnp.logical_and(seg < n_seg_max, seg * seg_len < cap),
            jnp.any(status == 0),
        )

    defer = disk_on and defer_shade

    def a_body(carry):
        seg, px, py, pz, wx, wy, wz, aa, status = carry
        p = Dot3(px, py, pz)
        v = Dot3(wx, wy, wz)
        # Deferred disk shading (same scheme as the forward kernel): record
        # crossing inputs per substep, apply them in order behind one
        # segment-level cond iff any lane is a candidate. Bit-identical.
        stash = []
        for j in range(seg_len):
            valid = seg * seg_len + j < cap
            if defer:
                p, v, aa, status, st = step_primal(
                    p, v, aa, status, consts, valid, disk_on=True,
                    defer_shade=True,
                )
                stash.append(st)
            else:
                p, v, aa, status = step_primal(p, v, aa, status, consts, valid,
                                               disk_on=disk_on)
        if defer:
            any_c = stash[0][0]
            for st in stash[1:]:
                any_c = any_c | st[0]

            def apply_shades(a):
                for st in stash:
                    a = alpha_shade(*st, a, consts)
                return a

            aa = jax.lax.cond(jnp.any(any_c), apply_shades, lambda a: a, aa)
        seg = seg + 1
        ck_px[seg] = p.x
        ck_py[seg] = p.y
        ck_pz[seg] = p.z
        ck_vx[seg] = v.x
        ck_vy[seg] = v.y
        ck_vz[seg] = v.z
        ck_aa[seg] = aa
        ck_st[seg] = status
        return (seg, p.x, p.y, p.z, v.x, v.y, v.z, aa, status)

    init_a = (
        jnp.int32(0),
        ck_px[0], ck_py[0], ck_pz[0],
        ck_vx[0], ck_vy[0], ck_vz[0],
        ck_aa[0], ck_st[0],
    )
    t_segs = jax.lax.while_loop(a_cond, a_body, init_a)[0]

    # ---- Phase B: reverse sweep ---------------------------------------------
    # Concrete-layout zero for the freshly-initialised cotangent carries.
    gvx_ref[:] = jnp.zeros(shape, jnp.float32)
    zero_c = gvx_ref[:]

    def b_cond(carry):
        return carry[0] > 0

    def b_body(carry):
        (seg, pbx, pby, pbz, vbx, vby, vbz,
         arb, agb, abb, aab, cfb, ib, ob, opb, r0b, r1b, r2b) = carry
        seg = seg - 1
        p = Dot3(ck_px[seg], ck_py[seg], ck_pz[seg])
        v = Dot3(ck_vx[seg], ck_vy[seg], ck_vz[seg])
        aa = ck_aa[seg]
        status = ck_st[seg]
        # Replay the segment, storing every pre-step state. With deferral
        # the alpha stays segment-constant through the replay (crossings are
        # recorded, not applied), so the sb_aa stores are provisional; the
        # fix-up cond below rewrites them with the true evolution iff any
        # lane crossed in this segment. With ``store_stages`` the RK4 stage
        # positions are stored too, so the VJP sweep below runs zero primal
        # RK4 recomputation.
        stash = []
        for j in range(seg_len):
            sb_px[j] = p.x
            sb_py[j] = p.y
            sb_pz[j] = p.z
            sb_vx[j] = v.x
            sb_vy[j] = v.y
            sb_vz[j] = v.z
            sb_aa[j] = aa
            sb_st[j] = status
            valid = seg * seg_len + j < cap
            out = step_primal(
                p, v, aa, status, consts, valid,
                disk_on=True if defer else disk_on,
                defer_shade=defer,
                return_stages=store_stages,
            )
            if store_stages:
                *out, (q2, q3, q4) = out
                for b, stage in zip((sb_q[0:3], sb_q[3:6], sb_q[6:9]),
                                    (q2, q3, q4)):
                    b[0][j], b[1][j], b[2][j] = stage.x, stage.y, stage.z
            if defer:
                p, v, aa, status, st = out
                stash.append(st)
            else:
                p, v, aa, status = out
        if defer:
            any_c = stash[0][0]
            for st in stash[1:]:
                any_c = any_c | st[0]
            has_cross = jnp.any(any_c)

            def fix_aa(a):
                for j, st in enumerate(stash):
                    sb_aa[j] = a
                    a = alpha_shade(*st, a, consts)
                return a

            jax.lax.cond(has_cross, fix_aa, lambda a: a, ck_aa[seg])

        carry_adj = AdjointCarry(
            pbar=Dot3(pbx, pby, pbz),
            vbar=Dot3(vbx, vby, vbz),
            arbar=arb, agbar=agb, abbar=abb, aabar=aab,
            coef_bar=cfb,
            inner_bar=ib, outer_bar=ob, opacity_bar=opb,
            rgb0_bar=r0b, rgb1_bar=r1b, rgb2_bar=r2b,
        )

        # The step's frozen post-state IS the next step's pre-state (and the
        # segment's last post-state is the replay's final p), so the VJP
        # sweep never re-runs the primal RK4 — frozen-lane divergence from
        # the true post-state is masked inside step_vjp (see its docstring).
        p_end = p

        def run_vjp(with_disk):
            def run(ca):
                for j in range(seg_len - 1, -1, -1):
                    pre_p = Dot3(sb_px[j], sb_py[j], sb_pz[j])
                    pre_v = Dot3(sb_vx[j], sb_vy[j], sb_vz[j])
                    post_p = (
                        Dot3(sb_px[j + 1], sb_py[j + 1], sb_pz[j + 1])
                        if j + 1 < seg_len else p_end
                    )
                    stages = (
                        tuple(Dot3(sb_q[k][j], sb_q[k + 1][j], sb_q[k + 2][j])
                              for k in (0, 3, 6))
                        if store_stages else None
                    )
                    valid = seg * seg_len + j < cap
                    ca = step_vjp(
                        pre_p, pre_v, sb_aa[j], sb_st[j], consts, valid, ca,
                        disk_on=with_disk, post_p=post_p, stages=stages,
                    )
                return ca
            return run

        if defer:
            # No candidate in the segment ⇒ every disk-VJP contribution is
            # exactly zero ⇒ the no-disk sweep is bitwise equivalent (and
            # skips the sin/cos/div/sqrt chains of the blend VJP).
            carry_adj = jax.lax.cond(
                has_cross, run_vjp(True), run_vjp(False), carry_adj
            )
        else:
            carry_adj = run_vjp(disk_on)(carry_adj)
        ca = carry_adj
        return (seg, ca.pbar.x, ca.pbar.y, ca.pbar.z,
                ca.vbar.x, ca.vbar.y, ca.vbar.z,
                ca.arbar, ca.agbar, ca.abbar, ca.aabar, ca.coef_bar,
                ca.inner_bar, ca.outer_bar, ca.opacity_bar,
                ca.rgb0_bar, ca.rgb1_bar, ca.rgb2_bar)

    init_b = (
        t_segs,
        zero_c, zero_c, zero_c,  # p̄
        cvx_ref[:], cvy_ref[:], cvz_ref[:],  # v̄ seeded from the vel cotangent
        car_ref[:], cag_ref[:], cab_ref[:], caa_ref[:],
        zero_c,  # c̄oef
        zero_c, zero_c, zero_c,  # inner/outer/opacity partials
        zero_c, zero_c, zero_c,  # rgb partials
    )
    final = jax.lax.while_loop(b_cond, b_body, init_b)
    (_, pbx, pby, pbz, vbx, vby, vbz,
     _, _, _, _, cfb, ib, ob, opb, r0b, r1b, r2b) = final

    # ---- close the h² chain and write outputs -------------------------------
    h2_bar = -1.5 * mass * cfb
    # v̄0 += 2·h̄2·(c×p0);  p̄0 += 2·h̄2·(v0×c)   [c = p0×v0]
    gvx_ref[:] = vbx + 2.0 * h2_bar * (cy * p0z - cz * p0y)
    gvy_ref[:] = vby + 2.0 * h2_bar * (cz * p0x - cx * p0z)
    gvz_ref[:] = vbz + 2.0 * h2_bar * (cx * p0y - cy * p0x)

    p0bx = pbx + 2.0 * h2_bar * (vy * cz - vz * cy)
    p0by = pby + 2.0 * h2_bar * (vz * cx - vx * cz)
    p0bz = pbz + 2.0 * h2_bar * (vx * cy - vy * cx)

    scalars = [
        (G_MASS, jnp.sum(-1.5 * h2 * cfb)),
        (G_INNER, jnp.sum(ib)),
        (G_OUTER, jnp.sum(ob)),
        (G_OPACITY, jnp.sum(opb)),
        (G_RGB0, jnp.sum(r0b)),
        (G_RGB1, jnp.sum(r1b)),
        (G_RGB2, jnp.sum(r2b)),
        (G_POS0X, jnp.sum(p0bx)),
        (G_POS0Y, jnp.sum(p0by)),
        (G_POS0Z, jnp.sum(p0bz)),
    ]
    # (8, 128) block (hardware minimum tile); scalars live in sublane 0.
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    row = jnp.zeros((8, LANES), jnp.float32)
    for idx, val in scalars:
        row = jnp.where((sub == 0) & (lane == idx), val, row)
    gs_ref[0] = row


def march_adjoint_pallas(
    pos0: jnp.ndarray,  # (3,)
    vel0,  # (N, 3) or tuple of three (N,) planes
    cot_acc: jnp.ndarray,  # (N, 4)
    cot_vel: jnp.ndarray,  # (N, 3)
    *,
    step_size: float,
    max_steps: int,
    mass: jnp.ndarray,
    safe_distance: jnp.ndarray,
    disk_on: bool,
    disk_inner: jnp.ndarray,
    disk_outer: jnp.ndarray,
    disk_opacity: jnp.ndarray,
    disk_rgb: jnp.ndarray,
    block_rows: int = ADJ_BLOCK_ROWS,
    seg_len: int = ADJ_SEG_LEN,
    defer_shade: bool = True,
    store_stages: bool = ADJ_STORE_STAGES,
    interpret: bool = False,
):
    """Gradients of the march outputs w.r.t. every differentiable input.

    Returns ``(pos0̄ (3,), vel0̄, mass̄, inner̄, outer̄, opacitȳ,
    rgb̄ (3,))`` — exactly what reverse-mode AD of the scan march computes
    (see tests/test_march_adjoint.py for the equivalence gate). ``vel0̄``
    mirrors the input structure: an (N, 3) array, or three flat planes
    when ``vel0`` arrived as component planes (no interleave round-trip).

    ``defer_shade`` (bitwise-identical, verified on hardware) skips the
    blend math/VJP for crossing-free segments behind per-segment conds.
    ``store_stages`` (bitwise-identical) trades +9 segment-buffer planes of
    VMEM for skipping the RK4 stage recompute inside the VJP sweep — with
    it and the stored post-states the reverse sweep runs no primal RK4 at
    all (the replay's is the only one).
    """
    f32 = jnp.float32
    if isinstance(vel0, (tuple, list)):
        comps = [v.astype(f32) for v in vel0]
        n = comps[0].shape[0]
    else:
        vel0 = vel0.astype(f32)
        n = vel0.shape[0]
        comps = [vel0[:, 0], vel0[:, 1], vel0[:, 2]]
    cots = [
        cot_vel[:, 0], cot_vel[:, 1], cot_vel[:, 2],
        cot_acc[:, 0], cot_acc[:, 1], cot_acc[:, 2], cot_acc[:, 3],
    ]
    cots = [c.astype(f32) for c in cots]

    tile = block_rows * LANES
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        comps = [
            jnp.concatenate([c, jnp.broadcast_to(c[:1], (n_pad - n,))])
            for c in comps
        ]
        # Padding rays carry zero cotangent: they contribute nothing.
        cots = [
            jnp.concatenate([c, jnp.zeros((n_pad - n,), f32)]) for c in cots
        ]
    rows = n_pad // LANES
    grid = rows // block_rows
    planes = [c.reshape(rows, LANES) for c in comps + cots]

    scal = pack_scalars(
        step_size, mass, safe_distance, disk_inner, disk_outer,
        disk_opacity, disk_rgb,
    )
    cap = jnp.array([max_steps], jnp.int32)
    p0 = jnp.asarray(pos0, f32).reshape(3)

    n_seg_max = -(-max_steps // seg_len)
    vmem_spec = pl.BlockSpec(
        (block_rows, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    row_spec = pl.BlockSpec(
        (1, 8, LANES), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    plane_shape = jax.ShapeDtypeStruct((rows, LANES), f32)
    ck = lambda dt=jnp.float32: pltpu.VMEM(
        (n_seg_max + 1, block_rows, LANES), dt
    )
    sb = lambda dt=jnp.float32: pltpu.VMEM((seg_len, block_rows, LANES), dt)

    outs = pl.pallas_call(
        functools.partial(
            _adjoint_kernel, disk_on=disk_on, seg_len=seg_len,
            n_seg_max=n_seg_max, defer_shade=defer_shade,
            store_stages=store_stages,
        ),
        grid=(grid,),
        in_specs=[smem_spec] * 3 + [vmem_spec] * 10,
        out_specs=[vmem_spec] * 3 + [row_spec],
        out_shape=[plane_shape] * 3 + [jax.ShapeDtypeStruct((grid, 8, LANES), f32)],
        scratch_shapes=[ck() for _ in range(7)] + [ck(jnp.int32)]
        + [sb() for _ in range(7)] + [sb(jnp.int32)]
        + ([sb() for _ in range(9)] if store_stages else []),
        interpret=interpret,
    )(scal, cap, p0, *planes)

    gvx, gvy, gvz, gs = outs
    if isinstance(vel0, (tuple, list)):
        # Component-planes input -> component-planes gradient: stacking to
        # (N, 3) only for the caller to deinterleave again would cost a
        # ~2 GB/s strided round-trip on the training hot path.
        vel0_bar = tuple(g.reshape(-1)[:n] for g in (gvx, gvy, gvz))
    else:
        vel0_bar = jnp.stack(
            [gvx.reshape(-1), gvy.reshape(-1), gvz.reshape(-1)], axis=-1
        )[:n]
    partials = jnp.sum(gs, axis=(0, 1))  # reduce per-tile rows (+ sublane pad)
    pos0_bar = partials[G_POS0X:G_POS0Z + 1]
    return (
        pos0_bar,
        vel0_bar,
        partials[G_MASS],
        partials[G_INNER],
        partials[G_OUTER],
        partials[G_OPACITY],
        partials[G_RGB0:G_RGB2 + 1],
    )

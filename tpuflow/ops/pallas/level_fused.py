"""Fused per-level kernel: derivatives + relaxation + add + median (Pallas).

One kernel invocation executes, for one pyramid level, everything between
the backward registration and the next level's prolongation:

    motion-tensor constants  (reference: solve_2d.cu:311-321, 798-884)
    outer x (phi/ksi + inner Jacobi sweeps)  (solve_2d.cu:176-230)
    u += du  (add_2d)
    mirror ghost maintenance + window median  (median_2d.cu:87-299)

Why: the pyramid-depth sweep (tools/profile_levels.py, BASELINE.md) shows
the pipeline pays a serial per-level floor — dozens of small XLA kernels
x launch/DMA latency per level across ~47 levels — that dwarfs most
components' own compute. Fusing the level's whole post-warp tail into ONE
Mosaic kernel removes those round trips: fx/fy/ft and the grad/log tensor
never touch HBM, the median runs on the VMEM-resident iterate, and a level
becomes resample matmuls + warp + this kernel.

Everything here is STATIC (valid extent, scalars, schedule): the kernel
serves the unrolled pipeline, where per-level scalars are trace-time
constants. The relaxation core is the verified structure of
``relax_bucket._relax_bucket_full`` (combined T-iterate, per-outer pw/sumH
and ksi-tensor hoists, once-per-outer ghost maintenance, prologue-shift
reuse for sweep 0, double-outer unroll) with SMEM scalars replaced by
Python constants; interpret-mode tests pin this kernel against the XLA
component chain (level_constants + _relax_dyn + add + maintain + median).

Numerics notes:
  * the add preserves the XLA path's op order ``u + (T - u)`` (NOT ``T``:
    the subtract-then-add rounds differently at 1 ulp);
  * the median is the same Batcher network as ops/median.py on the same
    mirror-maintained ghosts, windows built with roll+edge-fix shifts;
  * derivative/tensor math is term-for-term level_constants.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.median import _batcher_pairs
from tpuflow.ops.pallas.relax_bucket import VMEM_BUDGET_BYTES, VMEM_LIMIT_BYTES

F = np.float32


def _ghost_r(cfg: FlowConfig) -> int:
    """Mirror-ghost radius the median tail needs (bucketed.py level step)."""
    r = cfg.median_radius - (cfg.median_radius % 2 == 0)
    return max(2, (r - 1) // 2)


def level_fused_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """VMEM gate for the fused level tail at a (possibly trimmed) bucket.

    Working set: 6 I/O fields + 3 derivative + (0|5) tensor + 11 relax
    scratch, plus the median's radius^2 live windows and ~16 sweep
    transients.
    """
    if hb % 8 != 0 or wb % 128 != 0:
        return False
    r = cfg.median_radius - (cfg.median_radius % 2 == 0)
    n_tensor = 0 if cfg.data_constancy == DataConstancy.GREY else 5
    n = 6 + 3 + n_tensor + 11 + max(r * r, 16)
    return n * hb * wb * 4 <= VMEM_BUDGET_BYTES


def level_fused(
    f0_l: jax.Array,
    f1_w: jax.Array,
    u: jax.Array,
    v: jax.Array,
    sc,                     # LevelScalars (host dataclass) — STATIC values
    cfg: FlowConfig,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(u_new, v_new) after relaxation + add + median at the bucket shape.

    Inputs are the maintained level fields (f0_l, f1_w mirror1; u, v
    mirror2). Outputs carry the median-filtered summed flow on the valid
    region; ghost/bucket values beyond it are unspecified (the caller
    re-embeds into the top bucket and the next level's resample weights
    ignore them).
    """
    hb, wb = u.shape
    (cw, ch, _, _, d2x, d2y, d4x, d4y, axv, ayv) = (
        int(sc[0]), int(sc[1]), 0, 0,
        float(sc[4]), float(sc[5]), float(sc[6]), float(sc[7]),
        float(sc[8]), float(sc[9]),
    )
    hx_1, hy_1 = float(sc[18]), float(sc[19])
    grey = cfg.data_constancy == DataConstancy.GREY
    log_c = cfg.data_constancy == DataConstancy.LOG_DERIVATIVES
    inner = cfg.inner_iterations_count
    n_outer = cfg.outer_iterations_count
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))
    radius = cfg.median_radius - (cfg.median_radius % 2 == 0)
    r2 = radius // 2 if radius > 1 else 0
    gr = _ghost_r(cfg)
    n_tensor = 0 if grey else 5

    def kernel(*refs):
        (f0_ref, f1_ref, u_ref, v_ref, uo_ref, vo_ref) = refs[:6]
        (fx_ref, fy_ref, ft_ref) = refs[6:9]
        tensor_refs = refs[9:9 + n_tensor]
        (tub_ref, tvb_ref,
         pwxp_ref, pwxm_ref, pwyp_ref, pwym_ref,
         a12_ref, a13_ref, a23_ref, dnu_ref, dnv_ref) = refs[9 + n_tensor:]

        ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)

        # ---- shift helpers (identical semantics to relax_bucket) ----
        def sh(a):
            """center, x+1, x-1, y+1, y-1 with bucket-edge mirror."""
            xp = jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)
            xm = jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)
            yp = jnp.concatenate([a[1:, :], a[-2:-1, :]], axis=0)
            ym = jnp.concatenate([a[1:2, :], a[:-1, :]], axis=0)
            return a, xp, xm, yp, ym

        def sh_edge(a):
            """x+1, x-1, y+1, y-1 with replicate boundary (solver_ops)."""
            xp = jnp.concatenate([a[:, 1:], a[:, -1:]], axis=1)
            xm = jnp.concatenate([a[:, :1], a[:, :-1]], axis=1)
            yp = jnp.concatenate([a[1:, :], a[-1:, :]], axis=0)
            ym = jnp.concatenate([a[:1, :], a[:-1, :]], axis=0)
            return xp, xm, yp, ym

        def maintain1(ref):
            val = ref[:]
            val = jnp.where(ys == ch, pltpu.roll(val, 2, 0), val)
            ref[:] = jnp.where(xs == cw, pltpu.roll(val, 2, 1), val)

        # ---- phase A: motion-tensor constants (level_constants) ----
        f0_c, f0_xp, f0_xm, f0_yp, f0_ym = sh(f0_ref[:])
        f1_c, f1_xp, f1_xm, f1_yp, f1_ym = sh(f1_ref[:])
        fx_ref[:] = (f0_xp - f0_xm + f1_xp - f1_xm) / d4x
        fy_ref[:] = (f0_yp - f0_ym + f1_yp - f1_ym) / d4y
        ft_ref[:] = f1_c - f0_c

        if not grey:
            if log_c:
                l0 = jnp.log1p(f0_ref[:])
                l1 = jnp.log1p(f1_ref[:])
                l0_c, l0_xp, l0_xm, l0_yp, l0_ym = sh(l0)
                l1_c, l1_xp, l1_xm, l1_yp, l1_ym = sh(l1)
                gx = (l0_xp - l0_xm + l1_xp - l1_xm) / d4x
                gy = (l0_yp - l0_ym + l1_yp - l1_ym) / d4y
                gt = l1_c - l0_c
            else:
                gx, gy, gt = fx_ref[:], fy_ref[:], ft_ref[:]

            def replicate1(a):
                a = jnp.where(ys == ch, pltpu.roll(a, 1, 0), a)
                return jnp.where(xs == cw, pltpu.roll(a, 1, 1), a)

            gx = replicate1(gx)
            gy = replicate1(gy)
            gt = replicate1(gt)
            gx_xp, gx_xm, gx_yp, gx_ym = sh_edge(gx)
            gy_xp, gy_xm, gy_yp, gy_ym = sh_edge(gy)
            gt_xp, gt_xm, gt_yp, gt_ym = sh_edge(gt)
            fxx = (gx_xp - gx_xm) * hx_1
            fxy = (gx_yp - gx_ym) * hy_1
            fyy = (gy_yp - gy_ym) * hy_1
            fxt = (gt_xp - gt_xm) * hx_1
            fyt = (gt_yp - gt_ym) * hy_1
            tensor_refs[0][:] = fxx * fxx + fxy * fxy  # J11
            tensor_refs[1][:] = fxy * fxy + fyy * fyy  # J22
            tensor_refs[2][:] = fxx * fxy + fxy * fyy  # J12
            tensor_refs[3][:] = fxx * fxt + fxy * fyt  # J13
            tensor_refs[4][:] = fxy * fxt + fyy * fyt  # J23

        # ---- phase B: relaxation (relax_bucket._relax_bucket_full) ----
        uo_ref[:] = u_ref[:]
        vo_ref[:] = v_ref[:]

        def sweep_from_shifts(tu_sh, tv_sh, dst_tu, dst_tv):
            stu, stu_xp, stu_xm, stu_yp, stu_ym = tu_sh
            stv, stv_xp, stv_xm, stv_yp, stv_ym = tv_sh
            u_c = u_ref[:]
            v_c = v_ref[:]
            sumU = (
                pwxp_ref[:] * (stu_xp - u_c)
                + pwxm_ref[:] * (stu_xm - u_c)
                + pwyp_ref[:] * (stu_yp - u_c)
                + pwym_ref[:] * (stu_ym - u_c)
            )
            sumV = (
                pwxp_ref[:] * (stv_xp - v_c)
                + pwxm_ref[:] * (stv_xm - v_c)
                + pwyp_ref[:] * (stv_yp - v_c)
                + pwym_ref[:] * (stv_ym - v_c)
            )
            sdv_c = stv - v_c
            new_du = (-a13_ref[:] - a12_ref[:] * sdv_c + sumU) / dnu_ref[:]
            new_dv = (-a23_ref[:] - a12_ref[:] * new_du + sumV) / dnv_ref[:]
            dst_tu[:] = u_c + new_du
            dst_tv[:] = v_c + new_dv

        def prologue(src_tu_ref, src_tv_ref):
            tu_sh = sh(src_tu_ref[:])
            tv_sh = sh(src_tv_ref[:])
            tu, tu_xp, tu_xm, tu_yp, tu_ym = tu_sh
            tv, tv_xp, tv_xm, tv_yp, tv_ym = tv_sh
            dux = (tu_xp - tu_xm) / d2x
            duy = (tu_yp - tu_ym) / d2y
            dvx = (tv_xp - tv_xm) / d2x
            dvy = (tv_yp - tv_ym) / d2y
            grad2 = dux * dux + duy * duy + dvx * dvx + dvy * dvy + e_s2
            phi = 1.0 / (2.0 * jnp.sqrt(grad2))
            phi = jnp.where(ys == ch, pltpu.roll(phi, 2, 0), phi)
            phi = jnp.where(xs == cw, pltpu.roll(phi, 2, 1), phi)

            phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = sh(phi)
            xp_w = jnp.where(xs < cw - 1, axv, 0.0)
            xm_w = jnp.where(xs > 0, axv, 0.0)
            yp_w = jnp.where(ys < ch - 1, ayv, 0.0)
            ym_w = jnp.where(ys > 0, ayv, 0.0)
            pwxp_ref[:] = (phi_xp_n + phi_c) * 0.5 * xp_w
            pwxm_ref[:] = (phi_xm_n + phi_c) * 0.5 * xm_w
            pwyp_ref[:] = (phi_yp_n + phi_c) * 0.5 * yp_w
            pwym_ref[:] = (phi_ym_n + phi_c) * 0.5 * ym_w
            sumH = pwxp_ref[:] + pwxm_ref[:] + pwyp_ref[:] + pwym_ref[:]

            du_c = tu - u_ref[:]
            dv_c = tv - v_ref[:]
            fxc = fx_ref[:]
            fyc = fy_ref[:]
            ftc = ft_ref[:]
            sq = (
                (fxc * fxc * du_c + fxc * fyc * dv_c + fxc * ftc) * du_c
                + (fxc * fyc * du_c + fyc * fyc * dv_c + fyc * ftc) * dv_c
                + (fxc * ftc * du_c + fyc * ftc * dv_c + ftc * ftc)
            )
            ksi = 1.0 / (2.0 * jnp.sqrt(jnp.maximum(sq, 0.0) + e_d2))
            if grey:
                J11, J22 = fxc * fxc, fyc * fyc
                J12, J13, J23 = fxc * fyc, fxc * ftc, fyc * ftc
            else:
                J11 = tensor_refs[0][:]
                J22 = tensor_refs[1][:]
                J12 = tensor_refs[2][:]
                J13 = tensor_refs[3][:]
                J23 = tensor_refs[4][:]
            a12_ref[:] = ksi * J12
            a13_ref[:] = ksi * J13
            a23_ref[:] = ksi * J23
            dnu_ref[:] = ksi * J11 + sumH
            dnv_ref[:] = ksi * J22 + sumH
            return tu_sh, tv_sh

        def outer_pass(src_tu_ref, src_tv_ref, alt_tu_ref, alt_tv_ref):
            maintain1(src_tu_ref)
            maintain1(src_tv_ref)
            tu_sh, tv_sh = prologue(src_tu_ref, src_tv_ref)
            sweep_from_shifts(tu_sh, tv_sh, alt_tu_ref, alt_tv_ref)
            for j in range(1, inner):
                if j % 2 == 1:
                    src_tu, src_tv = alt_tu_ref, alt_tv_ref
                    dst_tu, dst_tv = src_tu_ref, src_tv_ref
                else:
                    src_tu, src_tv = src_tu_ref, src_tv_ref
                    dst_tu, dst_tv = alt_tu_ref, alt_tv_ref
                sweep_from_shifts(sh(src_tu[:]), sh(src_tv[:]), dst_tu, dst_tv)

        flips = inner % 2 == 1

        def outer_pair(_, carry):
            outer_pass(uo_ref, vo_ref, tub_ref, tvb_ref)
            if flips:
                outer_pass(tub_ref, tvb_ref, uo_ref, vo_ref)
            else:
                outer_pass(uo_ref, vo_ref, tub_ref, tvb_ref)
            return carry

        if flips:
            jax.lax.fori_loop(0, n_outer // 2, outer_pair, 0)
            if n_outer % 2 == 1:
                outer_pass(uo_ref, vo_ref, tub_ref, tvb_ref)
                uo_ref[:] = tub_ref[:]
                vo_ref[:] = tvb_ref[:]
        else:

            def outer_single(_, carry):
                outer_pass(uo_ref, vo_ref, tub_ref, tvb_ref)
                return carry

            jax.lax.fori_loop(0, n_outer, outer_single, 0)

        # ---- phase C: add (XLA op order: u + (T - u)) + median ----
        def summed(t_ref, base_ref):
            b = base_ref[:]
            return b + (t_ref[:] - b)

        def maintain_gr(t):
            for k in range(gr):
                t = jnp.where(ys == ch + k, pltpu.roll(t, 2 + 2 * k, 0), t)
            for k in range(gr):
                t = jnp.where(xs == cw + k, pltpu.roll(t, 2 + 2 * k, 1), t)
            return t

        def roll_s(t, k, axis):
            """pltpu.roll with a signed shift (roll by -k == size - k)."""
            size = wb if axis else hb
            return pltpu.roll(t, k % size, axis)

        def shift_d(t, d, axis):
            """Read index i+d along axis with 'reflect' at index 0 (the
            jnp.pad(mode="reflect") rule the XLA median uses); the far
            bucket edge wraps, polluting only ghost outputs."""
            if d == 0:
                return t
            if d > 0:
                return roll_s(t, -d, axis)
            d = -d
            idx = xs if axis else ys
            out = pltpu.roll(t, d, axis)
            for i in range(d):
                # row/col i reads index d - i = roll by -(d - 2i)
                out = jnp.where(idx == i, roll_s(t, -(d - 2 * i), axis), out)
            return out

        def run_median(t):
            if r2 == 0:
                return t
            cols = [shift_d(t, dx, 1) for dx in range(-r2, r2 + 1)]
            windows = [
                shift_d(c, dy, 0)
                for c in cols
                for dy in range(-r2, r2 + 1)
            ]
            # ops/median.py window order is (iy, ix); ordering is
            # irrelevant to a sorting network's median anyway.
            vals = windows
            for a, b in _batcher_pairs(radius * radius):
                lo = jnp.minimum(vals[a], vals[b])
                hi = jnp.maximum(vals[a], vals[b])
                vals[a], vals[b] = lo, hi
            return vals[(radius * radius) // 2]

        su = maintain_gr(summed(uo_ref, u_ref))
        sv = maintain_gr(summed(vo_ref, v_ref))
        uo_ref[:] = run_median(su)
        vo_ref[:] = run_median(sv)

    field = lambda: pltpu.VMEM((hb, wb), jnp.float32)  # noqa: E731
    total = n_outer * (inner + 1)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[field() for _ in range(3 + n_tensor + 11)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=(60 * total + 40 * radius * radius) * hb * wb,
            bytes_accessed=6 * 4 * hb * wb,
            transcendentals=2 * hb * wb * n_outer,
        ),
        interpret=interpret,
    )(f0_l, f1_w, u, v)

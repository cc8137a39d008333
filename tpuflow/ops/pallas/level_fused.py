"""Fused per-level kernels: the level tail — and the WHOLE level — as one
Pallas program.

Two entry points share one kernel body:

  * ``level_fused`` (tail variant): derivatives + relaxation + add +
    median on already-maintained, already-warped inputs. Kept as the
    fallback when the whole-level variant's VMEM gate fails (1080p-class
    buckets) and as the parity anchor for tests.
  * ``level_fused_whole`` (whole-level variant): additionally absorbs the
    mirror ghost maintenance of the resampled fields and the backward
    registration (the warp fast path's masked shift-sum,
    solver.bucketed.warp_dyn), so a pyramid level becomes
    ``batched resample matmuls -> ONE Mosaic kernel``. Inputs arrive as
    one (4, hb, wb) stack [f0_l, f1_l, u, v] straight from the resample
    matmuls (unmaintained); the caller guarantees the warp fast path
    applies (it computes the exact |displacement| <= D predicate in XLA
    and routes outlier levels to an XLA fallback branch).

One kernel invocation executes, for one pyramid level, everything between
the resample matmuls and the next level's prolongation:

    mirror ghost maintenance            (whole variant only)
    backward warp, shift-sum fast path  (whole variant only;
                                         reference: registration_2d.cu:48-72)
    motion-tensor constants  (reference: solve_2d.cu:311-321, 798-884)
    outer x (phi/ksi + inner Jacobi sweeps)  (solve_2d.cu:176-230)
    u += du  (add_2d)
    mirror ghost maintenance + window median  (median_2d.cu:87-299)

Why: the pyramid-depth sweep (tools/profile_levels.py, BASELINE.md) shows
the pipeline pays a serial per-level floor — dozens of small XLA kernels
x launch/DMA latency per level across ~47 levels — that dwarfs most
components' own compute. Fusing a level's whole post-resample body into
ONE Mosaic kernel removes those round trips: ghosts, the warped frame,
fx/fy/ft and the grad/log tensor never touch HBM, and the median runs on
the VMEM-resident iterate.

Everything here is STATIC (valid extent, scalars, schedule): the kernels
serve the unrolled pipeline, where per-level scalars are trace-time
constants. The relaxation core is the verified structure of
``relax_bucket._relax_bucket_full`` (combined T-iterate, per-outer pw/sumH
and ksi-tensor hoists, once-per-outer ghost maintenance, prologue-shift
reuse for sweep 0, double-outer unroll) with SMEM scalars replaced by
Python constants; interpret-mode tests pin these kernels against the XLA
component chain (maintain + warp_dyn + level_constants + _relax_dyn +
add + maintain + median).

Numerics notes:
  * the add preserves the XLA path's op order ``u + (T - u)`` (NOT ``T``:
    the subtract-then-add rounds differently at 1 ulp);
  * the median is the same Batcher network as ops/median.py on the same
    mirror-maintained ghosts, windows built with roll+edge-fix shifts;
  * derivative/tensor math is term-for-term level_constants;
  * the in-kernel warp reproduces warp_dyn's fast path term-for-term;
    its rolls may wrap at the bucket edge where the XLA path reads edge
    padding, but every wrapped read is multiplied by an exactly-zero
    displacement mask (true reads stay within the trimmed bucket because
    valid targets satisfy x0+1 <= cw <= wb-2), so values agree.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.median import _network_median
from tpuflow.ops.pallas.relax_bucket import VMEM_BUDGET_BYTES, VMEM_LIMIT_BYTES
from tpuflow.ops.sweep_core import sweep_update_T

F = np.float32

# DEFAULT fast-path half-window; must match solver.bucketed.WARP_MAX_DISP
# (equality pinned by a test). The traced value comes from
# utils.envcache.warp_max_disp (TPUFLOW_WARP_DISP override) in BOTH
# modules, so the in-kernel shift-sum window and the XLA warp/predicate
# always agree.
WARP_MAX_DISP = 4


def _ghost_r(cfg: FlowConfig) -> int:
    """Mirror-ghost radius the median tail needs (bucketed.py level step)."""
    r = cfg.median_radius - (cfg.median_radius % 2 == 0)
    return max(2, (r - 1) // 2)


def _n_fields(cfg: FlowConfig, whole: bool) -> int:
    """VMEM working-set estimate in bucket-sized f32 fields."""
    r = cfg.median_radius - (cfg.median_radius % 2 == 0)
    n_tensor = 0 if cfg.data_constancy == DataConstancy.GREY else 5
    n = 6 + 3 + n_tensor + 11 + max(r * r, 16)
    if whole:
        # (4,hb,wb) input stack + 4 maintained scratch + warp transients
        # (rolled rows + mask/weight fields the scheduler keeps live).
        n += 4 + 4 + 18
    return n


def level_fused_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Gate for the fused level TAIL at a (possibly trimmed) bucket:
    alignment + VMEM + inner >= 1 (the unrolled sweep structure always
    executes sweep 0; a legal inner=0 config must stay on XLA so all
    platforms compute the reference's zero sweeps)."""
    if cfg.inner_iterations_count < 1:
        return False
    if hb % 8 != 0 or wb % 128 != 0:
        return False
    return _n_fields(cfg, whole=False) * hb * wb * 4 <= VMEM_BUDGET_BYTES


def level_fused_whole_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Gate for the WHOLE-level kernel at a trimmed bucket (alignment +
    VMEM + inner >= 1, see level_fused_supported)."""
    if cfg.inner_iterations_count < 1:
        return False
    if hb % 8 != 0 or wb % 128 != 0:
        return False
    return _n_fields(cfg, whole=True) * hb * wb * 4 <= VMEM_BUDGET_BYTES


def _consts(sc, cfg: FlowConfig, hb: int, wb: int) -> SimpleNamespace:
    """Static per-level constants (LevelScalars tree -> Python floats)."""
    radius = cfg.median_radius - (cfg.median_radius % 2 == 0)
    need = max(2, _ghost_r(cfg))
    # Ghost room: the mirror maintenance writes rows [ch, ch+need) and
    # cols [cw, cw+need); without this room the `ys == ch` selects never
    # fire and the kernel silently computes wrong boundary values.
    assert int(sc[1]) + need <= hb and int(sc[0]) + need <= wb, (
        f"bucket ({hb},{wb}) lacks ghost room for valid "
        f"({int(sc[1])},{int(sc[0])}) + {need}"
    )
    return SimpleNamespace(
        hb=hb, wb=wb,
        cw=int(sc[0]), ch=int(sc[1]),
        inv_hx=float(sc[2]), inv_hy=float(sc[3]),
        d2x=float(sc[4]), d2y=float(sc[5]),
        d4x=float(sc[6]), d4y=float(sc[7]),
        axv=float(sc[8]), ayv=float(sc[9]),
        wlim=float(sc[10]), hlim=float(sc[11]),
        hx_1=float(sc[18]), hy_1=float(sc[19]),
        grey=cfg.data_constancy == DataConstancy.GREY,
        log_c=cfg.data_constancy == DataConstancy.LOG_DERIVATIVES,
        inner=cfg.inner_iterations_count,
        n_outer=cfg.outer_iterations_count,
        e_s2=float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness)),
        e_d2=float(F(cfg.equation_data) * F(cfg.equation_data)),
        radius=radius,
        r2=radius // 2 if radius > 1 else 0,
        gr=_ghost_r(cfg),
        n_tensor=0 if cfg.data_constancy == DataConstancy.GREY else 5,
    )


def _roll_s(t, k, axis):
    """pltpu.roll with a signed shift (roll by -k == size - k)."""
    return pltpu.roll(t, k % t.shape[axis], axis)


def _mirror_gr(t, ys, xs, ch, cw, gr):
    """Value-level mirror ghost maintenance of radius gr (row ch+k :=
    row ch-2-k, then the same for columns — matching the XLA
    maintain_mirror's row-then-column order so the ghost corner is the
    2D reflection)."""
    for k in range(gr):
        t = jnp.where(ys == ch + k, pltpu.roll(t, 2 + 2 * k, 0), t)
    for k in range(gr):
        t = jnp.where(xs == cw + k, pltpu.roll(t, 2 + 2 * k, 1), t)
    return t


def _warp_shift_sum(c, f0m, f1m, um, vm, ys, xs):
    """Backward bilinear warp, fast path: masked sum over static shifts.

    Term-for-term the XLA fast path in solver.bucketed.warp_dyn
    (reference math: registration_2d.cu:48-72 incl. the out-of-bounds /
    NaN -> copy-frame_0 rule). Shifts use wrapping rolls instead of edge
    padding; wrapped reads are only ever multiplied by an exactly-zero
    mask (see module docstring).

    """
    from tpuflow.utils.envcache import warp_max_disp

    D = warp_max_disp()
    xs_f = xs.astype(jnp.float32)
    ys_f = ys.astype(jnp.float32)
    x_f = xs_f + um * c.inv_hx
    y_f = ys_f + vm * c.inv_hy

    invalid = (
        (x_f < 0.0)
        | (x_f > c.wlim)
        | (y_f < 0.0)
        | (y_f > c.hlim)
        | jnp.isnan(x_f)
        | jnp.isnan(y_f)
        | (xs_f > c.wlim)
        | (ys_f > c.hlim)
    )
    safe_x = jnp.where(invalid, xs_f, x_f)
    safe_y = jnp.where(invalid, ys_f, y_f)
    x0 = jnp.floor(safe_x).astype(jnp.int32)
    y0 = jnp.floor(safe_y).astype(jnp.int32)
    dx = safe_x - x0.astype(jnp.float32)
    dy = safe_y - y0.astype(jnp.float32)
    dxq = x0 - xs
    dyq = y0 - ys

    one = jnp.float32(1.0)
    w00 = (one - dx) * (one - dy)
    w01 = dx * (one - dy)
    w10 = (one - dx) * dy
    w11 = dx * dy

    mx = {d: (dxq == d).astype(jnp.float32) for d in range(-D, D + 1)}
    my = {e: (dyq == e).astype(jnp.float32) for e in range(-D, D + 1)}
    zeros = jnp.zeros_like(f0m)
    P = {
        d: w00 * mx.get(d, zeros) + w01 * mx.get(d - 1, zeros)
        for d in range(-D, D + 2)
    }
    Q = {
        d: w10 * mx.get(d, zeros) + w11 * mx.get(d - 1, zeros)
        for d in range(-D, D + 2)
    }
    out = zeros
    for e in range(-D, D + 2):
        f_row = _roll_s(f1m, -e, 0)
        r_c = zeros
        s_c = zeros
        for d in range(-D, D + 2):
            f_cd = _roll_s(f_row, -d, 1)
            r_c = r_c + P[d] * f_cd
            s_c = s_c + Q[d] * f_cd
        out = out + my.get(e, zeros) * r_c + my.get(e - 1, zeros) * s_c
    return jnp.where(invalid, f0m, out)


def _tail_body(c, f0_ref, f1_ref, u_ref, v_ref, uo_ref, vo_ref,
               tensor_refs, work_refs, ys, xs):
    """Derivatives + relaxation + add + median on maintained refs.

    f0_ref/f1_ref: mirror1-maintained level frame / warped frame.
    u_ref/v_ref:   mirror2-maintained flow. uo_ref/vo_ref: results
    (median-filtered summed flow on the valid region; bucket values
    beyond it unspecified).
    """
    hb, wb = c.hb, c.wb
    cw, ch = c.cw, c.ch
    inner, n_outer = c.inner, c.n_outer
    (fx_ref, fy_ref, ft_ref, tub_ref, tvb_ref,
     pwxp_ref, pwxm_ref, pwyp_ref, pwym_ref,
     a12_ref, a13_ref, a23_ref, dnu_ref, dnv_ref) = work_refs

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
    fx_ref[:] = (f0_xp - f0_xm + f1_xp - f1_xm) / c.d4x
    fy_ref[:] = (f0_yp - f0_ym + f1_yp - f1_ym) / c.d4y
    ft_ref[:] = f1_c - f0_c

    if not c.grey:
        if c.log_c:
            l0 = jnp.log1p(f0_ref[:])
            l1 = jnp.log1p(f1_ref[:])
            l0_c, l0_xp, l0_xm, l0_yp, l0_ym = sh(l0)
            l1_c, l1_xp, l1_xm, l1_yp, l1_ym = sh(l1)
            gx = (l0_xp - l0_xm + l1_xp - l1_xm) / c.d4x
            gy = (l0_yp - l0_ym + l1_yp - l1_ym) / c.d4y
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
        fxx = (gx_xp - gx_xm) * c.hx_1
        fxy = (gx_yp - gx_ym) * c.hy_1
        fyy = (gy_yp - gy_ym) * c.hy_1
        fxt = (gt_xp - gt_xm) * c.hx_1
        fyt = (gt_yp - gt_ym) * c.hy_1
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
        new_du, new_dv = sweep_update_T(
            (stu_xp, stu_xm, stu_yp, stu_ym),
            (stv_xp, stv_xm, stv_yp, stv_ym),
            u_c, v_c, stv - v_c,
            (pwxp_ref[:], pwxm_ref[:], pwyp_ref[:], pwym_ref[:]),
            a12_ref[:], a13_ref[:], a23_ref[:], dnu_ref[:], dnv_ref[:],
        )
        dst_tu[:] = u_c + new_du
        dst_tv[:] = v_c + new_dv

    def prologue(src_tu_ref, src_tv_ref):
        tu_sh = sh(src_tu_ref[:])
        tv_sh = sh(src_tv_ref[:])
        tu, tu_xp, tu_xm, tu_yp, tu_ym = tu_sh
        tv, tv_xp, tv_xm, tv_yp, tv_ym = tv_sh
        dux = (tu_xp - tu_xm) / c.d2x
        duy = (tu_yp - tu_ym) / c.d2y
        dvx = (tv_xp - tv_xm) / c.d2x
        dvy = (tv_yp - tv_ym) / c.d2y
        grad2 = dux * dux + duy * duy + dvx * dvx + dvy * dvy + c.e_s2
        phi = 1.0 / (2.0 * jnp.sqrt(grad2))
        phi = jnp.where(ys == ch, pltpu.roll(phi, 2, 0), phi)
        phi = jnp.where(xs == cw, pltpu.roll(phi, 2, 1), phi)

        phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = sh(phi)
        xp_w = jnp.where(xs < cw - 1, c.axv, 0.0)
        xm_w = jnp.where(xs > 0, c.axv, 0.0)
        yp_w = jnp.where(ys < ch - 1, c.ayv, 0.0)
        ym_w = jnp.where(ys > 0, c.ayv, 0.0)
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
        ksi = 1.0 / (2.0 * jnp.sqrt(jnp.maximum(sq, 0.0) + c.e_d2))
        if c.grey:
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
        # Only reached when flips (odd inner): each pass swaps the buffer
        # roles, so a PAIR of passes lands the iterate back in uo/vo.
        outer_pass(uo_ref, vo_ref, tub_ref, tvb_ref)
        outer_pass(tub_ref, tvb_ref, uo_ref, vo_ref)
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

    def shift_d(t, d, axis):
        """Read index i+d along axis with 'reflect' at index 0 (the
        jnp.pad(mode="reflect") rule the XLA median uses); the far
        bucket edge wraps, polluting only ghost outputs."""
        if d == 0:
            return t
        if d > 0:
            return _roll_s(t, -d, axis)
        d = -d
        idx = xs if axis else ys
        out = pltpu.roll(t, d, axis)
        for i in range(d):
            # row/col i reads index d - i = roll by -(d - 2i)
            out = jnp.where(idx == i, _roll_s(t, -(d - 2 * i), axis), out)
        return out

    def run_median(t):
        if c.r2 == 0:
            return t
        cols = [shift_d(t, dx, 1) for dx in range(-c.r2, c.r2 + 1)]
        windows = [
            shift_d(col, dy, 0)
            for col in cols
            for dy in range(-c.r2, c.r2 + 1)
        ]
        # ops/median.py window order is (iy, ix); ordering is
        # irrelevant to a sorting network's median anyway.
        return _network_median(windows, c.radius * c.radius)

    su = _mirror_gr(summed(uo_ref, u_ref), ys, xs, ch, cw, c.gr)
    sv = _mirror_gr(summed(vo_ref, v_ref), ys, xs, ch, cw, c.gr)
    uo_ref[:] = run_median(su)
    vo_ref[:] = run_median(sv)


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
    c = _consts(sc, cfg, hb, wb)
    total = c.n_outer * (c.inner + 1)

    def kernel(*refs):
        f0_ref, f1_ref, u_ref, v_ref, uo_ref, vo_ref = refs[:6]
        tensor_refs = refs[6:6 + c.n_tensor]
        work_refs = refs[6 + c.n_tensor:]
        ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
        _tail_body(c, f0_ref, f1_ref, u_ref, v_ref, uo_ref, vo_ref,
                   tensor_refs, work_refs, ys, xs)

    field = lambda: pltpu.VMEM((hb, wb), jnp.float32)  # noqa: E731
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
        scratch_shapes=[field() for _ in range(c.n_tensor + 14)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=(60 * total + 40 * c.radius * c.radius) * hb * wb,
            bytes_accessed=6 * 4 * hb * wb,
            transcendentals=2 * hb * wb * c.n_outer,
        ),
        interpret=interpret,
    )(f0_l, f1_w, u, v)


def level_fused_whole(
    resampled: jax.Array,   # (4, hb, wb): f0_l, f1_l, u, v — UNMAINTAINED
    sc,                     # LevelScalars (host dataclass) — STATIC values
    cfg: FlowConfig,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """The whole level body after the resample matmuls as ONE kernel:
    ghost maintenance + backward warp (fast path) + derivatives +
    relaxation + add + median.

    The caller must route levels with any |displacement| > WARP_MAX_DISP
    to the XLA fallback (solver.bucketed computes the exact predicate);
    this kernel's shift-sum warp masks such pixels to zero contributions.
    """
    _, hb, wb = resampled.shape
    c = _consts(sc, cfg, hb, wb)
    total = c.n_outer * (c.inner + 1)

    def kernel(*refs):
        res_ref = refs[0]
        uo_ref, vo_ref = refs[1], refs[2]
        f0_ref, f1_ref, u_ref, v_ref = refs[3:7]
        tensor_refs = refs[7:7 + c.n_tensor]
        work_refs = refs[7 + c.n_tensor:]
        ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)

        # Phase 0: ghost maintenance of the resampled fields
        # (bucketed: maintain_mirror1 frames, maintain_mirror2 flow).
        f0_ref[:] = _mirror_gr(res_ref[0], ys, xs, c.ch, c.cw, 1)
        f1m = _mirror_gr(res_ref[1], ys, xs, c.ch, c.cw, 1)
        u_ref[:] = _mirror_gr(res_ref[2], ys, xs, c.ch, c.cw, 2)
        v_ref[:] = _mirror_gr(res_ref[3], ys, xs, c.ch, c.cw, 2)

        # Phase 0b: backward registration + mirror1 of the warped frame.
        f1w = _warp_shift_sum(c, f0_ref[:], f1m, u_ref[:], v_ref[:], ys, xs)
        f1_ref[:] = _mirror_gr(f1w, ys, xs, c.ch, c.cw, 1)

        _tail_body(c, f0_ref, f1_ref, u_ref, v_ref, uo_ref, vo_ref,
                   tensor_refs, work_refs, ys, xs)

    field = lambda: pltpu.VMEM((hb, wb), jnp.float32)  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[field() for _ in range(4 + c.n_tensor + 14)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=(60 * total + 40 * c.radius * c.radius + 400) * hb * wb,
            bytes_accessed=7 * 4 * hb * wb,
            transcendentals=2 * hb * wb * c.n_outer,
        ),
        interpret=interpret,
    )(resampled)


"""Bucketed coarse-to-fine engine: one compiled program per bucket shape.

The per-shape engine (tpuflow.solver.level) compiles ~46 XLA programs for
the default schedule — one per pyramid level shape. On remote-compile
backends each compile request carries ~60 s of fixed cost, so cold start is
minutes. This engine quantizes level shapes to BUCKETS and passes the valid
extent plus every h-derived constant as runtime scalars, so the default
584x388 schedule needs only ~10 programs (plus presmooth/pad), and any
workload reuses programs across levels and across nearby image sizes.

Design:
  * bucket dims: Wb = ceil((cw+8)/128)*128, Hb = ceil((ch+8)/64)*64 — lane
    padding is free (tiles are 128 wide anyway) and the +8 slack guarantees
    room for ghost mirror rows/cols;
  * mirror boundary at the VALID edge is provided by ghost maintenance:
    after every field update, rows [ch, ch+2) := mirror rows and cols
    [cw, cw+2) := mirror cols (radius 2 covers the median window), so the
    static concat shifts of tpuflow.ops.solver_ops produce reference-exact
    values inside the valid region;
  * box-resample weight matrices are computed ON DEVICE from iota
    arithmetic (tpuflow.ops.resample.box_weights_dyn — bit-exact vs the
    host transliteration of the reference fractions), so the resample
    stays two MXU matmuls with no per-level recompilation or uploads;
  * the flow field is carried between levels at the TOP bucket shape, so a
    program's signature depends only on its own bucket;
  * consecutive same-bucket levels run as ONE dispatch (`lax.scan` over
    their stacked scalars), and a vmapped variant batches independent
    frame pairs for streaming throughput.

Numerics inside the valid region are identical to the per-shape engine
(same expression order, host-precomputed float32 constants passed as
scalars); tests pin bucketed vs per-shape on full pipelines.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.gaussian import gaussian_smooth
from tpuflow.ops.median import median
from tpuflow.ops.resample import box_weights_dyn, resample_banded
from tpuflow.ops.solver_ops import (
    compute_phi_ksi_dyn,
    edge_weights_dyn,
)
from tpuflow.ops.sweep_core import sweep_update_T
from tpuflow.pyramid import level_schedule

ROW_Q, COL_Q, SLACK = 64, 128, 8


def bucket_dims(cw: int, ch: int) -> Tuple[int, int]:
    """(Hb, Wb) bucket for a (cw, ch) level."""
    hb = -(-(ch + SLACK) // ROW_Q) * ROW_Q
    wb = -(-(cw + SLACK) // COL_Q) * COL_Q
    return hb, wb


def maintain_mirror(a: jax.Array, cw, ch, r: int) -> jax.Array:
    """Write mirror ghost rows [ch, ch+r) and cols [cw, cw+r).

    Row ch+k := row ch-2-k (the reference mirror index 2h-y-2); then the
    same for columns, so the ghost corner is the 2D reflection. Requires
    ch+r <= Hb and cw+r <= Wb (bucket SLACK=8) and ch, cw >= r+1
    (guaranteed: levels have min dim 4 and r <= 3). Radius ceil((side-1)/2)
    covers a median window of the given side; stencil ops only need
    `maintain_mirror1`.
    """
    hb, wb = a.shape
    rows = jax.lax.dynamic_slice(a, (ch - r - 1, 0), (r, wb))[::-1, :]
    a = jax.lax.dynamic_update_slice(a, rows, (ch, 0))
    cols = jax.lax.dynamic_slice(a, (0, cw - r - 1), (hb, r))[:, ::-1]
    a = jax.lax.dynamic_update_slice(a, cols, (0, cw))
    return a


def maintain_mirror2(a: jax.Array, cw, ch) -> jax.Array:
    """Radius-2 ghost maintenance (covers the default radius-5 median)."""
    return maintain_mirror(a, cw, ch, 2)


def maintain_mirror1(a: jax.Array, cw, ch) -> jax.Array:
    """Radius-1 ghost maintenance (row ch := row ch-2, col cw := col cw-2)
    — all the radius-1 stencils need, at half the update cost."""
    hb, wb = a.shape
    row = jax.lax.dynamic_slice(a, (ch - 2, 0), (1, wb))
    a = jax.lax.dynamic_update_slice(a, row, (ch, 0))
    col = jax.lax.dynamic_slice(a, (0, cw - 2), (hb, 1))
    a = jax.lax.dynamic_update_slice(a, col, (0, cw))
    return a


def maintain_replicate1(a: jax.Array, cw, ch) -> jax.Array:
    """Radius-1 REPLICATE ghost maintenance (row ch := row ch-1, col cw :=
    col cw-1) — the boundary rule of the gradient/log derivative fields
    (reference: solve_2d.cu:813-841 replicates at tile borders)."""
    hb, wb = a.shape
    row = jax.lax.dynamic_slice(a, (ch - 1, 0), (1, wb))
    a = jax.lax.dynamic_update_slice(a, row, (ch, 0))
    col = jax.lax.dynamic_slice(a, (0, cw - 1), (hb, 1))
    a = jax.lax.dynamic_update_slice(a, col, (0, cw))
    return a


@dataclasses.dataclass(frozen=True)
class LevelScalars:
    """Host-precomputed per-level scalars, float32-rounded exactly like the
    per-shape engine's baked constants (parity)."""

    cw: np.int32
    ch: np.int32
    inv_hx: np.float32
    inv_hy: np.float32
    div2hx: np.float32
    div2hy: np.float32
    div4hx: np.float32
    div4hy: np.float32
    alpha_hx2: np.float32
    alpha_hy2: np.float32
    wlim: np.float32  # cw - 1 as float (warp bounds)
    hlim: np.float32
    cwf: np.float32  # resample target sizes (float)
    chf: np.float32
    w0f: np.float32  # full-res frame sizes (resample source)
    h0f: np.float32
    prev_cwf: np.float32  # previous level's valid flow extent
    prev_chf: np.float32
    # float32(1/(2h)) rounded from float64, NOT the f32 reciprocal of the
    # f32-rounded 2h — keeps the bucketed grad/log tensor bit-matched to
    # the per-shape engine's baked constants (solver_ops._second_order_tensor).
    hx_1: np.float32
    hy_1: np.float32

    @staticmethod
    def make(
        cw: int, ch: int, hx: float, hy: float, alpha: float,
        w0: int, h0: int, prev_cw: int, prev_ch: int,
    ) -> "LevelScalars":
        F = np.float32
        return LevelScalars(
            cw=np.int32(cw),
            ch=np.int32(ch),
            inv_hx=F(1.0) / F(hx),
            inv_hy=F(1.0) / F(hy),
            div2hx=F(2.0 * hx),
            div2hy=F(2.0 * hy),
            div4hx=F(4.0 * hx),
            div4hy=F(4.0 * hy),
            alpha_hx2=F(float(alpha) / (float(hx) * float(hx))),
            alpha_hy2=F(float(alpha) / (float(hy) * float(hy))),
            wlim=F(cw - 1),
            hlim=F(ch - 1),
            cwf=F(cw),
            chf=F(ch),
            w0f=F(w0),
            h0f=F(h0),
            prev_cwf=F(prev_cw),
            prev_chf=F(prev_ch),
            hx_1=F(1.0 / (2.0 * hx)),
            hy_1=F(1.0 / (2.0 * hy)),
        )

    def tree(self):
        return tuple(getattr(self, f.name) for f in dataclasses.fields(self))


# Fast-path half-window: displacements within +-D level pixels use the
# vectorized masked shift-sum; larger motions fall back to a gather.
# Trace-time env override TPUFLOW_WARP_DISP (default 4) for workloads
# near the cliff — see utils.envcache.warp_max_disp. WARP_MAX_DISP is
# kept as the module-level DEFAULT for introspection/tests.
WARP_MAX_DISP = 4


def _warp_coords(u, v, inv_hx, inv_hy, wlim, hlim):
    """Shared warp coordinate fields (reference: registration_2d.cu:48-55).

    Returns (invalid, x0, y0, dxq, dyq, w00, w01, w10, w11): the
    out-of-bounds/NaN mask, integer base coords, integer shift fields
    (zero at invalid pixels), and bilinear weights.
    """
    hb, wb = u.shape
    xs = jax.lax.broadcasted_iota(jnp.float32, (hb, wb), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (hb, wb), 0)
    x_f = xs + u * inv_hx
    y_f = ys + v * inv_hy

    invalid = (
        (x_f < 0.0)
        | (x_f > wlim)
        | (y_f < 0.0)
        | (y_f > hlim)
        | jnp.isnan(x_f)
        | jnp.isnan(y_f)
        | (xs > wlim)  # ghost region: copy f0 (discarded anyway)
        | (ys > hlim)
    )

    safe_x = jnp.where(invalid, xs, x_f)
    safe_y = jnp.where(invalid, ys, y_f)
    x0 = jnp.floor(safe_x).astype(jnp.int32)
    y0 = jnp.floor(safe_y).astype(jnp.int32)
    dx = safe_x - x0.astype(jnp.float32)
    dy = safe_y - y0.astype(jnp.float32)

    # Integer shift fields (0 for invalid pixels: safe_* snapped to iota).
    dxq = x0 - xs.astype(jnp.int32)
    dyq = y0 - ys.astype(jnp.int32)

    one = jnp.float32(1.0)
    w00 = (one - dx) * (one - dy)
    w01 = dx * (one - dy)
    w10 = (one - dx) * dy
    w11 = dx * dy
    return invalid, x0, y0, dxq, dyq, w00, w01, w10, w11


def warp_small_pred(u, v, inv_hx, inv_hy, wlim, hlim, D: int | None = None):
    """True iff every displacement fits the warp fast path's +-D window —
    the exact predicate warp_dyn's internal cond uses, computable from the
    UNMAINTAINED resampled flow (ghost pixels are invalid -> dxq = 0)."""
    from tpuflow.utils.envcache import warp_max_disp

    _, _, _, dxq, dyq, *_ = _warp_coords(u, v, inv_hx, inv_hy, wlim, hlim)
    D = warp_max_disp() if D is None else D
    return (jnp.max(jnp.abs(dxq)) <= D) & (jnp.max(jnp.abs(dyq)) <= D)


def _gather_taps(f1, x0, y0, w00, w01, w10, w11, cw, ch):
    """4-tap bilinear gather with the reference's +1-neighbor clamps
    (registration_2d.cu:56-71) — the ONE implementation both warp_dyn's
    slow branch and warp_gather use (they must stay bit-identical)."""
    hb, wb = f1.shape
    x1 = jnp.minimum(cw - 1, x0 + 1)
    y1 = jnp.minimum(ch - 1, y0 + 1)
    flat = f1.reshape(-1)

    def at(yy, xx):
        return jnp.take(flat, yy * wb + xx, axis=0)

    return (
        w00 * at(y0, x0)
        + w01 * at(y0, x1)
        + w10 * at(y1, x0)
        + w11 * at(y1, x1)
    )


def warp_gather(f0, f1, u, v, cw, ch, inv_hx, inv_hy, wlim, hlim):
    """Exact gather warp (warp_dyn's slow path, without the fast branch) —
    the fallback for levels whose displacements exceed the fast window."""
    invalid, x0, y0, _, _, w00, w01, w10, w11 = _warp_coords(
        u, v, inv_hx, inv_hy, wlim, hlim
    )
    value = _gather_taps(f1, x0, y0, w00, w01, w10, w11, cw, ch)
    return jnp.where(invalid, f0, value)


def warp_dyn(f0, f1, u, v, cw, ch, inv_hx, inv_hy, wlim, hlim):
    """Bilinear backward warp with traced valid extent
    (reference: registration_2d.cu:48-72).

    General gathers cost ~4 ns/element on the TPU scalar path (~5 ms per
    584x388 warp); displacements after coarse-to-fine prolongation are
    almost always a few pixels, so the default path expresses the warp as a
    masked sum over (2D+2)^2 static shifts of f1 — pure VPU work — with a
    separable factorization that keeps it to ~(2D+2)^2 FMAs/pixel. A
    runtime `lax.cond` falls back to the exact gather when any displacement
    exceeds the window.

    Note the reference's edge clamp (x1 = min(w-1, x0+1)) only differs from
    x0+1 where the corresponding bilinear weight is exactly zero (x_f >
    w-1 is "invalid" and copies frame_0), so unclamped taps are exact.

    Adaptive tiers (round 4, replacing the manual-knob cliff): the cond
    first tries the +-D window (D = TPUFLOW_WARP_DISP, default 4), then
    a +-2D widened shift-sum (~4x the VPU masked adds, still ~100x below
    the scalar gather), and only displacements beyond 2D take the exact
    gather. Clamping outliers into the window was rejected — it would
    silently deviate from the reference's exact warp
    (registration_2d.cu:48-72) on violent-motion inputs — so every tier
    is value-exact and the tiers differ only in cost. Per-level tier
    telemetry: compute_flow_warp_report / the warp_stats pipeline.
    """
    from tpuflow.utils.envcache import warp_max_disp

    hb, wb = f0.shape
    invalid, x0, y0, dxq, dyq, w00, w01, w10, w11 = _warp_coords(
        u, v, inv_hx, inv_hy, wlim, hlim
    )

    D = warp_max_disp()

    def fast_path_for(D):
        def fast_path(_):
            return _warp_fast_shiftsum(f1, dxq, dyq, w00, w01, w10, w11, D)

        return fast_path

    def slow_path(_):
        return _gather_taps(f1, x0, y0, w00, w01, w10, w11, cw, ch)

    def within(D):
        return (jnp.max(jnp.abs(dxq)) <= D) & (jnp.max(jnp.abs(dyq)) <= D)

    # Adaptive tier: +-D shift-sum, +-2D widened shift-sum (still far
    # cheaper than the scalar gather at 2D <= 8), then the exact gather.
    # All three branches are value-exact (the wide tier differs from the
    # gather only in the 4-tap summation ASSOCIATION, a <=1-ulp effect).
    value = jax.lax.cond(
        within(D),
        fast_path_for(D),
        lambda _: jax.lax.cond(
            within(2 * D), fast_path_for(2 * D), slow_path, 0),
        0,
    )
    return jnp.where(invalid, f0, value)


def _warp_fast_shiftsum(f1, dxq, dyq, w00, w01, w10, w11, D: int):
    """Masked shift-sum warp body at half-window D (warp_dyn's fast
    path, factored so the adaptive tiers and the slow-tail wide branch
    share one implementation)."""
    hb, wb = f1.shape
    pad = D + 1
    fpad = jnp.pad(f1, pad, mode="edge")

    def shifted(c, d):
        return fpad[pad + c : pad + c + hb, pad + d : pad + d + wb]

    mx = {d: (dxq == d).astype(jnp.float32) for d in range(-D, D + 1)}
    my = {c: (dyq == c).astype(jnp.float32) for c in range(-D, D + 1)}
    zeros = jnp.zeros_like(f1)

    # Separable accumulation: P_d pairs the x-weights with the column
    # masks, R_c/S_c contract over columns, the final sum over rows.
    P = {
        d: w00 * mx.get(d, zeros) + w01 * mx.get(d - 1, zeros)
        for d in range(-D, D + 2)
    }
    Q = {
        d: w10 * mx.get(d, zeros) + w11 * mx.get(d - 1, zeros)
        for d in range(-D, D + 2)
    }
    out = zeros
    for c in range(-D, D + 2):
        r_c = zeros
        s_c = zeros
        for d in range(-D, D + 2):
            f_cd = shifted(c, d)
            r_c = r_c + P[d] * f_cd
            s_c = s_c + Q[d] * f_cd
        out = out + my.get(c, zeros) * r_c + my.get(c - 1, zeros) * s_c
    return out


def _pallas_relax_wanted(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Use a Pallas relaxation kernel when on TPU and any variant's gate
    admits the bucket: the T-iterate kernels (relax_bucket — full or
    chunked), or the du-iterate family (relax_du — chunked for
    1080p-class, HBM-streamed for 4K-class, i.e. any aligned size)."""
    import os

    from tpuflow.utils.envcache import pallas_disabled

    if pallas_disabled():
        return False
    from tpuflow.ops.pallas.relax_bucket import relax_bucket_supported
    from tpuflow.ops.pallas.relax_du import relax_du_supported

    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        platform = "cpu"
    if platform != "tpu":
        return False
    if os.environ.get("TPUFLOW_DU_ITERATE", "1") == "0":
        return relax_bucket_supported(hb, wb, cfg)
    return relax_bucket_supported(hb, wb, cfg) or relax_du_supported(hb, wb, cfg)


def level_constants(f0_l, f1_w, sc, cfg: FlowConfig):
    """Per-level motion-tensor constants at bucket shape.

    Returns (fx, fy, ft, (J11, J22, J12, J13, J23)):
      * fx, fy, ft — the GREY first derivatives, frame-averaged /4h
        (reference: solve_2d.cu:311-321). Always computed: ksi comes from
        the grey motion tensor even for the gradient/log solvers
        (reference quirk: cuda_operation_solve_2d.cpp:84).
      * J* — the motion tensor the solve update uses: grey products, or
        the second-order tensor from (log-)derivative fields with
        REPLICATE boundary (reference: solve_2d.cu:798-884; log uses
        log(1+I), :508-524).
    """
    from tpuflow.ops.solver_ops import _shifts

    (cw, ch, _, _, _, _, div4hx, div4hy, _, _) = sc[:10]

    def first_derivs(a, b):
        a_c, a_xp, a_xm, a_yp, a_ym = _shifts(a)
        b_c, b_xp, b_xm, b_yp, b_ym = _shifts(b)
        fx = (a_xp - a_xm + b_xp - b_xm) / div4hx
        fy = (a_yp - a_ym + b_yp - b_ym) / div4hy
        ft = b_c - a_c
        return fx, fy, ft

    fx, fy, ft = first_derivs(f0_l, f1_w)

    if cfg.data_constancy == DataConstancy.GREY:
        J = (fx * fx, fy * fy, fx * fy, fx * ft, fy * ft)
        return fx, fy, ft, J

    from tpuflow.ops.solver_ops import _shifts_edge

    if cfg.data_constancy == DataConstancy.LOG_DERIVATIVES:
        gx, gy, gt = first_derivs(jnp.log1p(f0_l), jnp.log1p(f1_w))
    else:
        gx, gy, gt = fx, fy, ft
    # Replicate ghosts so the concat edge shifts see the reference's
    # boundary rule at the valid edge.
    gx = maintain_replicate1(gx, cw, ch)
    gy = maintain_replicate1(gy, cw, ch)
    gt = maintain_replicate1(gt, cw, ch)
    hx_1, hy_1 = sc[18], sc[19]  # host-rounded float32(1/(2h))
    gx_xp, gx_xm, gx_yp, gx_ym = _shifts_edge(gx)
    gy_xp, gy_xm, gy_yp, gy_ym = _shifts_edge(gy)
    gt_xp, gt_xm, gt_yp, gt_ym = _shifts_edge(gt)
    fxx = (gx_xp - gx_xm) * hx_1
    fxy = (gx_yp - gx_ym) * hy_1
    fyy = (gy_yp - gy_ym) * hy_1
    fxt = (gt_xp - gt_xm) * hx_1
    fyt = (gt_yp - gt_ym) * hy_1
    J11 = fxx * fxx + fxy * fxy
    J22 = fxy * fxy + fyy * fyy
    J12 = fxx * fxy + fxy * fyy
    J13 = fxx * fxt + fxy * fyt
    J23 = fxy * fxt + fyy * fyt
    return fx, fy, ft, (J11, J22, J12, J13, J23)


def _relax_dyn(f0_l, f1_w, u, v, sc, cfg: FlowConfig, use_pallas=None):
    """outer x inner relaxation on bucket arrays with ghost maintenance.

    Loop-invariant work is hoisted explicitly (XLA's while-loop LICM cannot
    be relied on):
      * the motion tensor and free-boundary weights are per-LEVEL constants
        — computed once (the reference recomputes them in every kernel
        launch, solve_2d.cu:311-329);
      * the half-point-diffusivity x edge-weight products, sumH, and the
        ksi-scaled tensor terms are per-OUTER constants — computed once
        after each phi/ksi update;
      * each sweep then only shifts the combined iterate T = flow + d
        ((u_xp + du_xp) == T_xp exactly) and applies the point updates.

    All hoists are value-exact except folding ksi into the tensor terms
    (ksi*(-J13 - J12*dv) -> -a13 - a12*dv), a 1-ulp-level reassociation.
    """
    from tpuflow.ops.solver_ops import _shifts

    (cw, ch, _, _, div2hx, div2hy, div4hx, div4hy, a_hx2, a_hy2) = sc[:10]

    fx, fy, ft, (J11, J22, J12, J13, J23) = level_constants(f0_l, f1_w, sc, cfg)

    if use_pallas is None:
        use_pallas = _pallas_relax_wanted(*u.shape, cfg)
    if use_pallas:
        from tpuflow.ops.pallas.relax_bucket import fits_full, relax_bucket_fused

        tensor = (
            None
            if cfg.data_constancy == DataConstancy.GREY
            else (J11, J22, J12, J13, J23)
        )
        hb, wb = u.shape
        # Static trim (unrolled pipeline: cw/ch are trace-time constants):
        # the kernel only ever reads rows/cols up to the valid extent plus
        # one mirror-ghost line, so run it on the 8/128-aligned sub-bucket
        # and zero-pad the increment back. Valid-region numerics are
        # bit-identical (every in-kernel consumer of the dropped region is
        # weight-masked or beyond the ghost line); the bucket quantizes
        # rows to 64, so mid levels save 10-40% of the sweep area.
        if isinstance(ch, (int, np.integer)) and isinstance(cw, (int, np.integer)):
            hb_eff = min(hb, -(-(int(ch) + 2) // 8) * 8)
            wb_eff = min(wb, -(-(int(cw) + 2) // 128) * 128)
        else:
            hb_eff, wb_eff = hb, wb
        if (hb_eff, wb_eff) != (hb, wb) and fits_full(hb_eff, wb_eff, cfg):
            trim = lambda a: a[:hb_eff, :wb_eff]  # noqa: E731
            args = [trim(a) for a in (fx, fy, ft, u, v)]
            tensor_t = None if tensor is None else tuple(trim(a) for a in tensor)
            du_t, dv_t = relax_bucket_fused(
                *args, sc, cfg, tensor=tensor_t, force_mode="full"
            )
            zero = jnp.zeros((hb, wb), jnp.float32)
            return (
                zero.at[:hb_eff, :wb_eff].set(du_t),
                zero.at[:hb_eff, :wb_eff].set(dv_t),
            )
        if fits_full(hb, wb, cfg):
            return relax_bucket_fused(fx, fy, ft, u, v, sc, cfg, tensor=tensor,
                                      force_mode="full")
        # Beyond the full variant's VMEM gate: the du-iterate family —
        # chunked (9 persistent fields, largest-fitting chunk height) for
        # 1080p-class buckets, HBM-streamed for 4K-class (the measured
        # order: du-chunked ~3-7% over T-chunked at 1080p; streamed
        # ~1.2-1.45x over the old XLA fallback at 4K; BASELINE.md).
        # TPUFLOW_DU_ITERATE=0 reverts to the T-iterate chunked kernel.
        import os

        from tpuflow.ops.pallas.relax_bucket import relax_bucket_supported
        from tpuflow.ops.pallas.relax_du import (
            fits_du_chunked, relax_du_fused, streamed_supported,
        )

        if os.environ.get("TPUFLOW_DU_ITERATE", "1") != "0":
            if fits_du_chunked(hb, wb, cfg):
                return relax_du_fused(fx, fy, ft, u, v, sc, cfg,
                                      tensor=tensor, force_mode="chunked")
            if not relax_bucket_supported(hb, wb, cfg) and streamed_supported(
                    hb, wb, cfg):
                return relax_du_fused(fx, fy, ft, u, v, sc, cfg,
                                      tensor=tensor, force_mode="streamed")
        return relax_bucket_fused(fx, fy, ft, u, v, sc, cfg, tensor=tensor)

    F = np.float32
    e_s2 = F(cfg.equation_smoothness) * F(cfg.equation_smoothness)
    e_d2 = F(cfg.equation_data) * F(cfg.equation_data)
    xp_w, xm_w, yp_w, ym_w = edge_weights_dyn(u.shape, cw, ch, a_hx2, a_hy2)

    du0 = jnp.zeros_like(u)
    dv0 = jnp.zeros_like(v)

    def outer_step(carry, _):
        du, dv = carry
        phi, ksi = compute_phi_ksi_dyn(
            f0_l, f1_w, u, v, du, dv, div2hx, div2hy, div4hx, div4hy, e_s2, e_d2
        )
        phi = maintain_mirror1(phi, cw, ch)

        # ---- per-outer constants ----
        phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = _shifts(phi)
        pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
        pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
        pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
        pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
        sumH = pw_xp + pw_xm + pw_yp + pw_ym
        a12 = ksi * J12
        a13 = ksi * J13
        a23 = ksi * J23
        denom_u = ksi * J11 + sumH
        denom_v = ksi * J22 + sumH
        u_c = u
        v_c = v

        def inner_step(carry2, _):
            du_i, dv_i = carry2
            tu = u + du_i
            tv = v + dv_i
            _, tu_xp, tu_xm, tu_yp, tu_ym = _shifts(tu)
            _, tv_xp, tv_xm, tv_yp, tv_ym = _shifts(tv)
            new_du, new_dv = sweep_update_T(
                (tu_xp, tu_xm, tu_yp, tu_ym), (tv_xp, tv_xm, tv_yp, tv_ym),
                u_c, v_c, dv_i, (pw_xp, pw_xm, pw_yp, pw_ym),
                a12, a13, a23, denom_u, denom_v,
            )
            new_du = maintain_mirror1(new_du, cw, ch)
            new_dv = maintain_mirror1(new_dv, cw, ch)
            return (new_du, new_dv), None

        (du, dv), _ = jax.lax.scan(
            inner_step, (du, dv), None, length=cfg.inner_iterations_count
        )
        return (du, dv), None

    (du, dv), _ = jax.lax.scan(
        outer_step, (du0, dv0), None, length=cfg.outer_iterations_count
    )
    return du, dv


def _resample_top(x, out_bucket_hw, out_hw_f, in_hw_f, _prec):
    """(..., H0b, W0b) -> (..., hb, wb) box resample, choosing the
    block-banded form per axis when that axis's contraction dim is large
    (the box matrix carries ~ceil(in/out)+1 nonzeros per row, so dense
    1080p-class matmuls burn >99% of their MXU passes on zeros). Static
    valid sizes required for the blocked form; X then Y (reference
    sequencing, cuda_operation_resample_2d.cpp:99-106). Values match the
    dense bucketed matmuls (excluded entries are exact zeros)."""
    from tpuflow.ops.resample import (
        BLOCK_BANDED_MIN_K, resample_cols_blocked, resample_rows_blocked,
    )

    hb, wb = out_bucket_hw
    h0b, w0b = x.shape[-2:]
    chf, cwf = out_hw_f
    ihf, iwf = in_hw_f
    if w0b >= BLOCK_BANDED_MIN_K:
        t = resample_cols_blocked(x, wb, int(cwf), int(iwf))
    else:
        t = jnp.matmul(x, box_weights_dyn(wb, w0b, cwf, iwf).T,
                       precision=_prec)
    if h0b >= BLOCK_BANDED_MIN_K:
        return resample_rows_blocked(t, hb, int(chf), int(ihf))
    return jnp.matmul(box_weights_dyn(hb, h0b, chf, ihf), t,
                      precision=_prec)


def bucketed_level_step(
    f0s, f1s,            # (H0b, W0b) bucket-padded full-res smoothed frames
    u_prev, v_prev,      # (H0b, W0b) flow carried at the top bucket
    scalars,             # LevelScalars.tree()
    bucket: Tuple[int, int],
    top_bucket: Tuple[int, int],
    cfg: FlowConfig,
    use_pallas=None,
    relax_fn=None,   # override: (f0_l, f1_w, u, v, scalars, cfg) -> (du, dv)
    return_tier: bool = False,
):
    """One pyramid level at a bucket shape; returns flow at the top bucket
    (+ the warp-tier telemetry scalar when return_tier — see
    bucketed_level_step_trim)."""
    import os

    (cw, ch, inv_hx, inv_hy, _d2x, _d2y, _d4x, _d4y, _ax, _ay, wlim, hlim,
     cwf, chf, w0f, h0f, prev_cwf, prev_chf) = scalars[:18]
    hb, wb = bucket
    h0b, w0b = top_bucket
    # Profiling-only ablations (comma-separated TPUFLOW_ABLATE values:
    # nowarp, nomedian, norelax, fakerelax, noresample, nomaintain):
    # produce WRONG flow, used exclusively to attribute pipeline time by
    # config-differencing in ONE session (tools/profile_ablate.py). Read
    # at trace time. CAUTION: norelax makes zeros propagate through the
    # whole pyramid, so XLA constant-folds every level away — it measures
    # the empty program, NOT "pipeline minus relax"; use fakerelax (keeps
    # data flowing through every other component) for that.
    ablate = set(filter(None, os.environ.get("TPUFLOW_ABLATE", "").split(",")))

    import jax.lax as lax

    # Resample-matmul precision (trace-time env probe): f32 matmuls on TPU
    # are bf16 multi-pass emulations — HIGHEST=6 passes, HIGH=3, DEFAULT=1.
    # Used by tools/profile_ablate.py to attribute matmul cost; HIGHEST is
    # the production default (exact reference fractions need f32 accumulate).
    _prec = {
        "highest": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }[os.environ.get("TPUFLOW_MM_PRECISION", "highest")]

    # TPUFLOW_BANDED_RESAMPLE=1: resample via banded gathers instead of the
    # dense matmuls (box matrices are >95% zeros). RECORDED NEGATIVE
    # RESULT, default OFF: XLA lowers the per-row dynamic gathers to a
    # scalar path on TPU (~37 ms ADDED per pair, both gather axes and the
    # transpose+row-gather variant; measured 2026-08-17, BASELINE.md),
    # while the dense HIGHEST matmuls cost only ~1.3 ms total
    # (tools/profile_ablate.py 6/3/1-pass fit). Kept (with parity tests)
    # because the banded map is the right formulation if a fast gather/
    # dynamic-slice lowering ever appears.
    _scal = (int, float, np.integer, np.floating)
    banded = (
        os.environ.get("TPUFLOW_BANDED_RESAMPLE", "0") == "1"
        and all(isinstance(s, _scal)
                for s in (chf, cwf, h0f, w0f, prev_chf, prev_cwf))
    )
    from tpuflow.ops.resample import BLOCK_BANDED_MIN_K

    blocked = (
        not banded
        and all(isinstance(s, _scal)
                for s in (chf, cwf, h0f, w0f, prev_chf, prev_cwf))
        and max(h0b, w0b) >= BLOCK_BANDED_MIN_K
    )
    fin_identity = (
        all(isinstance(s, _scal) for s in (chf, cwf, h0f, w0f))
        and (int(chf), int(cwf)) == (int(h0f), int(w0f))
        and bucket == top_bucket
    )
    if not banded and not blocked and not fin_identity:
        # Box-resample weights computed on device (exact reference
        # fractions, tpuflow.ops.resample.box_weights_dyn) — no per-level
        # uploads.
        wy_f = box_weights_dyn(hb, h0b, chf, h0f)
        wx_f = box_weights_dyn(wb, w0b, cwf, w0f)
        wy_u = box_weights_dyn(hb, h0b, chf, prev_chf)
        wx_u = box_weights_dyn(wb, w0b, cwf, prev_cwf)

    # Frames, ALWAYS from full-res smoothed (reference: optical_flow_2d.cpp:283-304).
    if "noresample" in ablate:
        # Probe: slices instead of the box-weight matmuls (WRONG values,
        # right shapes, data still flows).
        f0_l, f1_l = f0s[:hb, :wb], f1s[:hb, :wb]
        u, v = u_prev[:hb, :wb], v_prev[:hb, :wb]
    elif banded:
        out_hw = (int(chf), int(cwf))
        f0_l = resample_banded(f0s, bucket, out_hw, (int(h0f), int(w0f)))
        f1_l = resample_banded(f1s, bucket, out_hw, (int(h0f), int(w0f)))
        u = resample_banded(u_prev, bucket, out_hw,
                            (int(prev_chf), int(prev_cwf)))
        v = resample_banded(v_prev, bucket, out_hw,
                            (int(prev_chf), int(prev_cwf)))
    elif fin_identity:
        # Finest level: the frame "resample" is the identity map — the
        # dense path would still burn 4 full-size HIGHEST matmuls whose
        # only effect is zeroing the ghost region. Mask instead (exact).
        keep = (
            (np.arange(hb) < int(chf)).astype(np.float32)[:, None]
            * (np.arange(wb) < int(cwf)).astype(np.float32)[None, :]
        )
        f0_l = f0s * keep
        f1_l = f1s * keep
        if (
            all(isinstance(s, _scal) for s in (prev_chf, prev_cwf))
            and max(h0b, w0b) >= BLOCK_BANDED_MIN_K
        ):
            uv = _resample_top(jnp.stack([u_prev, v_prev]), bucket,
                               (chf, cwf), (prev_chf, prev_cwf), _prec)
            u, v = uv[0], uv[1]
        else:
            wy_u = box_weights_dyn(hb, h0b, chf, prev_chf)
            wx_u = box_weights_dyn(wb, w0b, cwf, prev_cwf)
            u = jnp.matmul(wy_u, jnp.matmul(u_prev, wx_u.T, precision=_prec),
                           precision=_prec)
            v = jnp.matmul(wy_u, jnp.matmul(v_prev, wx_u.T, precision=_prec),
                           precision=_prec)
    elif blocked:
        # 1080p-class levels: block-banded resamples (static sizes).
        fl = _resample_top(jnp.stack([f0s, f1s]), bucket,
                           (chf, cwf), (h0f, w0f), _prec)
        f0_l, f1_l = fl[0], fl[1]
        uv = _resample_top(jnp.stack([u_prev, v_prev]), bucket,
                           (chf, cwf), (prev_chf, prev_cwf), _prec)
        u, v = uv[0], uv[1]
    else:
        f0_l = jnp.matmul(wy_f, jnp.matmul(f0s, wx_f.T, precision=_prec),
                          precision=_prec)
        f1_l = jnp.matmul(wy_f, jnp.matmul(f1s, wx_f.T, precision=_prec),
                          precision=_prec)
        u = jnp.matmul(wy_u, jnp.matmul(u_prev, wx_u.T, precision=_prec),
                       precision=_prec)
        v = jnp.matmul(wy_u, jnp.matmul(v_prev, wx_u.T, precision=_prec),
                       precision=_prec)
    if "nomaintain" in ablate:
        pass  # probe: skip level-step ghost upkeep (WRONG values)
    else:
        f0_l = maintain_mirror1(f0_l, cw, ch)
        f1_l = maintain_mirror1(f1_l, cw, ch)
        u = maintain_mirror2(u, cw, ch)
        v = maintain_mirror2(v, cw, ch)

    # Backward registration (:343-363).
    if "nowarp" in ablate:
        f1_w = f1_l
    else:
        f1_w = warp_dyn(f0_l, f1_l, u, v, cw, ch, inv_hx, inv_hy, wlim, hlim)
        f1_w = maintain_mirror1(f1_w, cw, ch)

    if return_tier:
        from tpuflow.utils.envcache import warp_max_disp as _wmd2

        _p1 = warp_small_pred(u, v, inv_hx, inv_hy, wlim, hlim)
        _p2 = warp_small_pred(u, v, inv_hx, inv_hy, wlim, hlim,
                              D=2 * _wmd2())
        _tier = jnp.where(_p1, jnp.int32(0), jnp.where(_p2, 1, 2))

        def _ret(uo, vo):
            return uo, vo, _tier
    else:
        def _ret(uo, vo):
            return uo, vo

    # Fused level tail: derivatives + relaxation + add + median as ONE
    # Pallas kernel on the trimmed sub-bucket (ops/pallas/level_fused.py)
    # — removes the per-level XLA kernel glue the pyramid-depth sweep
    # attributed most of the non-relax time to. Static (unrolled) levels
    # on TPU only; TPUFLOW_FUSED_LEVEL=0 opts out.
    if (
        not ablate
        and relax_fn is None
        and use_pallas is not False
        and os.environ.get("TPUFLOW_FUSED_LEVEL", "1") != "0"
        and isinstance(ch, (int, np.integer))
        and isinstance(cw, (int, np.integer))
        and all(isinstance(s, (int, float, np.integer, np.floating))
                for s in scalars[:20])
        and _pallas_relax_wanted(hb, wb, cfg)
    ):
        from tpuflow.ops.pallas.level_fused import (
            level_fused, level_fused_supported,
        )

        hb_eff, wb_eff = _trim_eff(bucket, scalars, cfg)
        if level_fused_supported(hb_eff, wb_eff, cfg):
            trim = lambda a: a[:hb_eff, :wb_eff]  # noqa: E731
            u_t, v_t = level_fused(
                trim(f0_l), trim(f1_w), trim(u), trim(v), scalars, cfg
            )
            u_out = jnp.zeros((h0b, w0b), jnp.float32)
            v_out = jnp.zeros((h0b, w0b), jnp.float32)
            return _ret(
                u_out.at[:hb_eff, :wb_eff].set(u_t),
                v_out.at[:hb_eff, :wb_eff].set(v_t),
            )

    if "norelax" in ablate:
        du, dv = jnp.zeros_like(u), jnp.zeros_like(v)
    elif "fakerelax" in ablate:
        # Probe: relax replaced by a trivial consumer of the level
        # constants (WRONG flow, nonzero so nothing constant-folds; keeps
        # derivatives/warp/medians/resampling alive downstream).
        fx_p, fy_p, ft_p, _ = level_constants(f0_l, f1_w, scalars, cfg)
        du, dv = 1e-7 * (fx_p + ft_p), 1e-7 * (fy_p + ft_p)
    elif relax_fn is not None:
        du, dv = relax_fn(f0_l, f1_w, u, v, scalars, cfg)
    else:
        du, dv = _relax_dyn(f0_l, f1_w, u, v, scalars, cfg, use_pallas=use_pallas)

    u = u + du
    v = v + dv
    # The median reads a (side-1)//2-radius window: refresh that many ghost
    # rows/cols of the summed flow (du carries only radius-1 ghosts from
    # the sweeps). radius 3 for the side-7 window; SLACK=8 leaves room.
    if "nomedian" not in ablate:
        ghost_r = max(2, (cfg.median_radius - 1) // 2)
        u = maintain_mirror(u, cw, ch, ghost_r)
        v = maintain_mirror(v, cw, ch, ghost_r)
        u = median(u, cfg.median_radius)
        v = median(v, cfg.median_radius)

    # Re-embed into the top bucket for the next level.
    u_out = jnp.zeros((h0b, w0b), jnp.float32).at[:hb, :wb].set(u)
    v_out = jnp.zeros((h0b, w0b), jnp.float32).at[:hb, :wb].set(v)
    return _ret(u_out, v_out)


def _whole_level_eligible(scalars, bucket, cfg: FlowConfig):
    """(hb_eff, wb_eff) when the whole-level Pallas path applies, else None.

    Static-only (unrolled pipeline): requires trace-time scalars, a TPU
    backend, no profiling probes, and the trimmed working set fitting
    VMEM (level_fused_whole_supported). TPUFLOW_WHOLE_LEVEL=0 opts out.
    """
    import os

    from tpuflow.utils.envcache import pallas_disabled

    mode = os.environ.get("TPUFLOW_WHOLE_LEVEL", "1")
    if (
        mode == "0"
        or os.environ.get("TPUFLOW_FUSED_LEVEL", "1") == "0"
        or pallas_disabled()
        or os.environ.get("TPUFLOW_ABLATE", "")
        or os.environ.get("TPUFLOW_BANDED_RESAMPLE", "0") == "1"
    ):
        # NOTE (round 5): non-highest TPUFLOW_MM_PRECISION no longer
        # disables the whole-level path — the kernel itself contains no
        # matmuls (the resample chains feeding it are plain XLA and take
        # the precision directly), and the old coupling biased the
        # precision A/B by ~16 ms/pair of lost coarse-tail kernels
        # (tools/ab_mm_1080p.py; the ablation probes that motivated the
        # coupling pin their own envs).
        return None
    if not all(isinstance(s, (int, float, np.integer, np.floating))
               for s in scalars[:20]):
        return None
    if mode != "interpret":
        # "interpret" (tests): run the whole-level kernel in Pallas
        # interpret mode on any backend, so the CPU suite can drive the
        # production trimmed-carry wiring end-to-end.
        try:
            platform = jax.devices()[0].platform
        except Exception:  # pragma: no cover
            platform = "cpu"
        if platform != "tpu":
            return None
    from tpuflow.ops.pallas.level_fused import level_fused_whole_supported

    hb_eff, wb_eff = _trim_eff(bucket, scalars, cfg)
    if not level_fused_whole_supported(hb_eff, wb_eff, cfg):
        return None
    return hb_eff, wb_eff


def _trim_eff(bucket, scalars, cfg: FlowConfig) -> Tuple[int, int]:
    """The 8/128-aligned valid+ghost sub-bucket (trimmed carry shape)."""
    from tpuflow.ops.pallas.level_fused import _ghost_r

    cw, ch = int(scalars[0]), int(scalars[1])
    hb, wb = bucket
    need = max(2, _ghost_r(cfg))
    return (
        min(hb, -(-(ch + need) // 8) * 8),
        min(wb, -(-(cw + need) // 128) * 128),
    )


def _resample_trim(f0s2, u_t, v_t, scalars, eff, top_bucket,
                   is_finest_identity: bool):
    """(4, hb_eff, wb_eff) stack [f0_l, f1_l, u, v] for one level: frames
    box-resampled from the full-res smoothed stack (reference:
    optical_flow_2d.cpp:283-304 — always from full res, never cascaded),
    flow prolongated from the previous level's trimmed carry. Both pairs
    share weight matrices, so each resamples as ONE batched matmul chain.
    """
    import jax.lax as lax

    (_cw, _ch, _ihx, _ihy, _d2x, _d2y, _d4x, _d4y, _ax, _ay, _wl, _hl,
     cwf, chf, w0f, h0f, prev_cwf, prev_chf) = scalars[:18]
    hb_eff, wb_eff = eff
    h0b, w0b = top_bucket
    prev_hb, prev_wb = u_t.shape
    _prec = lax.Precision.HIGHEST

    if is_finest_identity:
        keep = (
            (np.arange(hb_eff) < int(chf)).astype(np.float32)[:, None]
            * (np.arange(wb_eff) < int(cwf)).astype(np.float32)[None, :]
        )
        fl = f0s2[:, :hb_eff, :wb_eff] * keep
    else:
        # Block-banded form for big contractions (1080p-class frames):
        # the box matrix has ~3 nonzeros/row, so the dense matmul wastes
        # >99% of its MXU passes there. X first, then Y (reference
        # sequencing, cuda_operation_resample_2d.cpp:99-106).
        from tpuflow.ops.resample import (
            BLOCK_BANDED_MIN_K, resample_cols_blocked, resample_rows_blocked,
        )

        if w0b >= BLOCK_BANDED_MIN_K:
            t = resample_cols_blocked(f0s2, wb_eff, int(cwf), int(w0f))
        else:
            wx_f = box_weights_dyn(wb_eff, w0b, cwf, w0f)
            t = jnp.matmul(f0s2, wx_f.T, precision=_prec)
        if h0b >= BLOCK_BANDED_MIN_K:
            fl = resample_rows_blocked(t, hb_eff, int(chf), int(h0f))
        else:
            wy_f = box_weights_dyn(hb_eff, h0b, chf, h0f)
            fl = jnp.matmul(wy_f, t, precision=_prec)
    wy_u = box_weights_dyn(hb_eff, prev_hb, chf, prev_chf)
    wx_u = box_weights_dyn(wb_eff, prev_wb, cwf, prev_cwf)
    uv = jnp.stack([u_t, v_t])
    uv = jnp.matmul(wy_u, jnp.matmul(uv, wx_u.T, precision=_prec),
                    precision=_prec)
    return jnp.concatenate([fl, uv], axis=0)


def bucketed_level_step_trim(
    f0s2,                # (2, H0b, W0b) stacked smoothed frames
    u_t, v_t,            # previous level's flow at ITS trimmed bucket
    scalars,             # LevelScalars.tree() — STATIC values (unrolled)
    eff: Tuple[int, int],    # this level's trimmed bucket (hb_eff, wb_eff)
    top_bucket: Tuple[int, int],
    is_finest_identity: bool,
    cfg: FlowConfig,
    *,
    interpret: bool = False,
    return_tier: bool = False,
):
    """One pyramid level as ``batched resample matmuls -> ONE Mosaic
    kernel`` with flow carried at TRIMMED bucket shapes between levels
    (no top-bucket embed: the next level's prolongation weights read only
    columns/rows below the previous valid extent, so trimming is exact).

    The kernel absorbs ghost maintenance, the backward warp (fast path),
    derivatives, relaxation, add and median (ops/pallas/level_fused.py
    ``level_fused_whole``). Levels whose displacements exceed the warp
    fast window take an XLA fallback branch (exact predicate, the same
    one warp_dyn's internal cond uses) built from the compile-cheap scan
    relaxation — correctness on violent-motion inputs is preserved at
    XLA speed, which only ever costs on those rare levels.

    Returns (u, v) at ``eff`` (+ the warp tier when return_tier: 0 =
    in-kernel +-D shift-sum, 1 = widened +-2D shift-sum in the XLA tail,
    2 = exact gather — the slow-path telemetry of
    compute_flow_warp_report).
    """
    from tpuflow.ops.pallas.level_fused import level_fused_whole
    from tpuflow.utils.envcache import warp_max_disp

    (cw, ch, inv_hx, inv_hy) = scalars[:4]
    wlim, hlim = scalars[10], scalars[11]
    res = _resample_trim(f0s2, u_t, v_t, scalars, eff, top_bucket,
                         is_finest_identity)

    pred = warp_small_pred(res[2], res[3], inv_hx, inv_hy, wlim, hlim)

    def fast(res):
        return level_fused_whole(res, scalars, cfg, interpret=interpret)

    def slow(res):
        return _level_slow_tail(res, scalars, cfg)

    out = jax.lax.cond(pred, fast, slow, res)
    if not return_tier:
        return out
    pred2 = warp_small_pred(res[2], res[3], inv_hx, inv_hy, wlim, hlim,
                            D=2 * warp_max_disp())
    tier = jnp.where(pred, jnp.int32(0), jnp.where(pred2, 1, 2))
    return out[0], out[1], tier


def _level_slow_tail(res, scalars, cfg: FlowConfig):
    """XLA level tail on the (4, hb, wb) resampled stack: gather warp +
    scan relaxation + median. The compile-cheap exact branch for levels
    whose displacements exceed the warp fast window (equivalent to those
    levels taking warp_dyn's gather path)."""
    (cw, ch, inv_hx, inv_hy) = scalars[:4]
    wlim, hlim = scalars[10], scalars[11]
    f0_l = maintain_mirror1(res[0], cw, ch)
    f1_l = maintain_mirror1(res[1], cw, ch)
    u = maintain_mirror2(res[2], cw, ch)
    v = maintain_mirror2(res[3], cw, ch)
    # Tiered warp (round 4): this branch fires when displacements exceed
    # the kernel's +-D window; most such levels still fit +-2D, where the
    # widened shift-sum (value-exact) beats the scalar gather ~100x.
    from tpuflow.utils.envcache import warp_max_disp as _wmd

    invalid, x0, y0, dxq, dyq, w00, w01, w10, w11 = _warp_coords(
        u, v, inv_hx, inv_hy, wlim, hlim)
    D2 = 2 * _wmd()
    wide_ok = (jnp.max(jnp.abs(dxq)) <= D2) & (jnp.max(jnp.abs(dyq)) <= D2)
    warped = jax.lax.cond(
        wide_ok,
        lambda _: _warp_fast_shiftsum(f1_l, dxq, dyq, w00, w01, w10, w11, D2),
        lambda _: _gather_taps(f1_l, x0, y0, w00, w01, w10, w11, cw, ch),
        0,
    )
    f1_w = maintain_mirror1(jnp.where(invalid, f0_l, warped), cw, ch)
    du, dv = _relax_dyn(f0_l, f1_w, u, v, scalars, cfg, use_pallas=False)
    uu, vv = u + du, v + dv
    ghost_r = max(2, (cfg.median_radius - 1) // 2)
    uu = maintain_mirror(uu, cw, ch, ghost_r)
    vv = maintain_mirror(vv, cw, ch, ghost_r)
    return median(uu, cfg.median_radius), median(vv, cfg.median_radius)


# Env-fingerprinted builder cache (shared with the per-shape engine):
# flipping a trace-time TPUFLOW_* flag can never return a stale program.
from tpuflow.utils.envcache import (  # noqa: E402
    TRACE_ENV_FLAGS as _TRACE_ENV_FLAGS,
    env_cached as _env_cached,
    trace_env_fingerprint as _trace_env_fingerprint,
)


@_env_cached(maxsize=256)
def compiled_bucketed_level(bucket: Tuple[int, int], top_bucket: Tuple[int, int],
                            cfg: FlowConfig, *, _env=None):
    @jax.jit
    def run(f0s, f1s, u_prev, v_prev, scalars):
        return bucketed_level_step(
            f0s, f1s, u_prev, v_prev, scalars, bucket, top_bucket, cfg,
        )

    return run


@_env_cached(maxsize=256)
def compiled_bucketed_group(bucket: Tuple[int, int], top_bucket: Tuple[int, int],
                            n_levels: int, cfg: FlowConfig, *, _env=None):
    """All consecutive levels sharing one bucket as ONE dispatch: a
    `lax.scan` over their stacked per-level scalars."""

    @jax.jit
    def run(f0s, f1s, u_prev, v_prev, stacked_scalars):
        def body(carry, sc):
            u, v = carry
            u, v = bucketed_level_step(
                f0s, f1s, u, v, sc, bucket, top_bucket, cfg
            )
            return (u, v), None

        (u, v), _ = jax.lax.scan(body, (u_prev, v_prev), stacked_scalars,
                                 length=n_levels)
        return u, v

    return run


@_env_cached(maxsize=64)
def _compiled_smooth_pad(sigma: float, orig_shape: Tuple[int, int],
                         top_bucket: Tuple[int, int], *, _env=None):
    h0, w0 = orig_shape
    h0b, w0b = top_bucket

    @jax.jit
    def run(a):
        s = gaussian_smooth(a, sigma)
        return jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(s)

    return run


def compiled_full_pipeline(orig_shape: Tuple[int, int], cfg: FlowConfig,
                           unroll: bool = None):
    """The ENTIRE solve — presmooth + every bucket group — as ONE XLA
    program (one compile request, one dispatch per pair).

    On remote-compile backends each compile request costs ~60 s of fixed
    overhead with little server-side parallelism, so one program cold-starts
    several times faster than ~10 group programs. Per-level scalars are
    baked in as constants (the cache key is the workload shape + config +
    the TPUFLOW_* trace-time env flags).

    unroll: unroll the per-group level scans into straight-line code —
    the per-level scalars become XLA literals, so the on-device resample
    weight-matrix construction, boundary masks, and ghost-maintenance
    indices all constant-fold away. Measured ~10% faster per pair
    (23.1 vs 25.5 ms) at ~2.3x the one-time compile cost (BASELINE.md);
    the persistent compilation cache makes that a per-machine cost, so
    unrolling is the DEFAULT (opt out with TPUFLOW_UNROLL=0 when
    iterating on the pipeline code itself).
    """
    import os

    if unroll is None:
        unroll = os.environ.get("TPUFLOW_UNROLL", "1") != "0"
    return _compiled_full_pipeline(orig_shape, cfg, unroll)


# Kept for the profiling tools that call .cache_clear() between builds.
compiled_full_pipeline.cache_clear = lambda: _compiled_full_pipeline.cache_clear()  # noqa: E731,E501


def make_pipeline_fn(orig_shape: Tuple[int, int], cfg: FlowConfig,
                     unroll: bool, warp_stats: bool = False):
    """The single-pair whole-pipeline body as a pure (f0, f1) -> (u, v)
    function (unjitted). `_compiled_full_pipeline` jits it directly;
    `compiled_full_pipeline_dp` shard_maps it over a 'data' mesh axis so
    every chip runs THIS engine (Pallas kernels included) on its own
    pairs — frame pairs are independent (reference contract: one pair per
    run, src/main.cpp:175-178), so data parallelism needs no partitioning
    of the per-pair program at all."""
    import os

    h0, w0 = orig_shape
    specs = level_schedule(w0, h0, cfg.warp_levels_count, cfg.warp_scale_factor)
    top_bucket = bucket_dims(specs[-1].width, specs[-1].height)
    h0b, w0b = top_bucket
    groups = _level_groups(specs, w0, h0, cfg)
    # Profiling-only: TPUFLOW_ABLATE=nosmooth drops the presmooth convs
    # (WRONG values; attributes their cost by config-differencing).
    nosmooth = "nosmooth" in os.environ.get("TPUFLOW_ABLATE", "").split(",")

    def run(f0, f1):
        f0s = f0 if nosmooth else gaussian_smooth(f0, cfg.gaussian_sigma)
        f0s = jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(f0s)
        f1s = f1 if nosmooth else gaussian_smooth(f1, cfg.gaussian_sigma)
        f1s = jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(f1s)

        if unroll:
            # Trimmed-carry unrolled pipeline: flow travels between levels
            # at each level's 8/128-aligned valid+ghost sub-bucket (the
            # prolongation weights read only rows/cols below the previous
            # valid extent, so trimming is exact) — no per-level top-bucket
            # embed. Whole-level-kernel levels run as 2 batched resample
            # matmul chains + ONE Mosaic kernel; ineligible levels (CPU,
            # probes, VMEM-gated 1080p-class buckets) fall back to the
            # classic step via an embed/trim pair at the boundary.
            f0s2 = jnp.stack([f0s, f1s])
            u_t = jnp.zeros((8, 128), jnp.float32)
            v_t = jnp.zeros_like(u_t)

            tiers = []
            for bucket, stacked in groups:
                for i in range(stacked[0].shape[0]):
                    sc = tuple(col[i] for col in stacked)
                    eff = _whole_level_eligible(sc, bucket, cfg)
                    if eff is not None:
                        fin = (
                            (int(sc[13]), int(sc[12]))
                            == (int(sc[15]), int(sc[14]))
                            and bucket == top_bucket
                        )
                        out = bucketed_level_step_trim(
                            f0s2, u_t, v_t, sc, eff, top_bucket, fin, cfg,
                            interpret=os.environ.get(
                                "TPUFLOW_WHOLE_LEVEL", "1") == "interpret",
                            return_tier=warp_stats,
                        )
                        u_t, v_t = out[0], out[1]
                        if warp_stats:
                            tiers.append(out[2])
                    else:
                        eff2 = _trim_eff(bucket, sc, cfg)
                        u_prev = jnp.zeros((h0b, w0b), jnp.float32).at[
                            : u_t.shape[0], : u_t.shape[1]
                        ].set(u_t)
                        v_prev = jnp.zeros((h0b, w0b), jnp.float32).at[
                            : v_t.shape[0], : v_t.shape[1]
                        ].set(v_t)
                        out = bucketed_level_step(
                            f0s, f1s, u_prev, v_prev, sc, bucket,
                            top_bucket, cfg, return_tier=warp_stats,
                        )
                        uu, vv = out[0], out[1]
                        if warp_stats:
                            tiers.append(out[2])
                        u_t = uu[: eff2[0], : eff2[1]]
                        v_t = vv[: eff2[0], : eff2[1]]
            if warp_stats:
                return u_t[:h0, :w0], v_t[:h0, :w0], jnp.stack(tiers)
            return u_t[:h0, :w0], v_t[:h0, :w0]

        u = jnp.zeros((h0b, w0b), jnp.float32)
        v = jnp.zeros_like(u)
        all_tiers = []
        for bucket, stacked in groups:

            def body(carry, sc, bucket=bucket):
                out = bucketed_level_step(
                    f0s, f1s, carry[0], carry[1], sc, bucket, top_bucket,
                    cfg, return_tier=warp_stats,
                )
                return (out[0], out[1]), (out[2] if warp_stats else None)

            (u, v), ys = jax.lax.scan(
                body, (u, v), stacked, length=stacked[0].shape[0]
            )
            if warp_stats:
                all_tiers.append(ys)
        if warp_stats:
            return u[:h0, :w0], v[:h0, :w0], jnp.concatenate(all_tiers)
        return u[:h0, :w0], v[:h0, :w0]

    return run


@_env_cached(maxsize=64)
def _compiled_full_pipeline(orig_shape: Tuple[int, int], cfg: FlowConfig,
                            unroll: bool, *, _env=None):
    return jax.jit(make_pipeline_fn(orig_shape, cfg, unroll))


@_env_cached(maxsize=16)
def _compiled_pipeline_warp_stats(orig_shape: Tuple[int, int],
                                  cfg: FlowConfig, unroll: bool, *,
                                  _env=None):
    return jax.jit(make_pipeline_fn(orig_shape, cfg, unroll,
                                    warp_stats=True))


def compute_flow_warp_report(frame_0, frame_1, cfg: FlowConfig = None):
    """Solve + per-level warp-tier telemetry (round-3 verdict weak #4:
    the warp fast/slow cliff was a traced cond nothing could observe).

    Returns (u, v, report) where report is a dict:
      tiers  — (n_levels,) int array, coarsest level first: 0 = +-D
               masked shift-sum (fast path / in-kernel), 1 = widened
               +-2D shift-sum (the adaptive middle tier), 2 = exact
               scalar gather (true violent motion beyond +-2D);
      levels — matching (width, height) per level;
      n_wide / n_gather — counts, for one-line logging.

    A separate compiled program from the production pipeline (same math
    plus the tier outputs), so production dispatch stays two-output.
    """
    import os

    cfg = cfg or FlowConfig()
    f0 = jnp.asarray(frame_0, dtype=jnp.float32)
    f1 = jnp.asarray(frame_1, dtype=jnp.float32)
    unroll = os.environ.get("TPUFLOW_UNROLL", "1") != "0"
    u, v, tiers = _compiled_pipeline_warp_stats(f0.shape, cfg, unroll)(f0, f1)
    tiers = np.asarray(tiers)
    specs = level_schedule(f0.shape[1], f0.shape[0], cfg.warp_levels_count,
                           cfg.warp_scale_factor)
    report = {
        "tiers": tiers,
        "levels": [(s.width, s.height) for s in specs],
        "n_wide": int((tiers == 1).sum()),
        "n_gather": int((tiers == 2).sum()),
    }
    return u, v, report


def compute_flow_bucketed_async(frame_0, frame_1, cfg: FlowConfig = None,
                                *, single_dispatch: bool = True,
                                group_traces=None):
    """Full coarse-to-fine solve via bucketed programs; returns DEVICE
    arrays at the original (H, W).

    single_dispatch=True (default) runs the whole pyramid as one program;
    False dispatches one program per bucket group (useful when iterating on
    a single bucket's code, or to share group programs across workload
    shapes).

    group_traces: optional list; when given, forces grouped dispatch and
    appends one (bucket, n_levels, seconds) record per group (host-fenced —
    a profiling mode, not the fast path).
    """
    import time

    cfg = cfg or FlowConfig()
    f0 = jnp.asarray(frame_0, dtype=jnp.float32)
    f1 = jnp.asarray(frame_1, dtype=jnp.float32)
    h0, w0 = f0.shape

    if group_traces is not None:
        single_dispatch = False

    if single_dispatch:
        try:
            return compiled_full_pipeline((h0, w0), cfg)(f0, f1)
        except Exception as e:  # noqa: BLE001 — filtered below
            # VMEM-gate safety net (round-2 verdict weak #5): the Pallas
            # gates (_n_fields / fits_full / fits_du_*) are calibrated
            # field-count heuristics for the CURRENT Mosaic scheduler; a
            # toolchain update could overflow the scoped-VMEM budget and
            # turn a headline bucket into a compile failure. Retry the
            # whole pipeline on the pure-XLA engine (slow but always
            # compiles) rather than failing the solve; any other error
            # re-raises untouched.
            msg = str(e)
            if not ("vmem" in msg.lower() or "Mosaic" in msg):
                raise
            import warnings

            from tpuflow.utils import envcache

            if envcache.pallas_disabled():
                raise  # already on the fallback: a real failure
            warnings.warn(
                "tpuflow: Pallas kernel exceeded the VMEM budget at "
                f"({h0}, {w0}) — the gate calibration no longer matches "
                "this toolchain. Falling back to the XLA engine for this "
                "process; re-calibrate the gates (relax_bucket/relax_du/"
                f"level_fused). Compiler said: {msg[:200]}",
                RuntimeWarning, stacklevel=2,
            )
            envcache.disable_pallas_runtime()
            # latch flip changes the trace fingerprint -> fresh program.
            return compiled_full_pipeline((h0, w0), cfg)(f0, f1)

    specs = level_schedule(w0, h0, cfg.warp_levels_count, cfg.warp_scale_factor)
    top_bucket = bucket_dims(specs[-1].width, specs[-1].height)
    h0b, w0b = top_bucket

    smooth = _compiled_smooth_pad(cfg.gaussian_sigma, (h0, w0), top_bucket)
    f0s = smooth(f0)
    f1s = smooth(f1)

    u = jnp.zeros((h0b, w0b), jnp.float32)
    v = jnp.zeros_like(u)

    for bucket, stacked in _level_groups(specs, w0, h0, cfg):
        t0 = time.perf_counter() if group_traces is not None else 0.0
        step = compiled_bucketed_group(bucket, top_bucket, stacked[0].shape[0], cfg)
        u, v = step(f0s, f1s, u, v, stacked)
        if group_traces is not None:
            np.asarray(u)  # host fence (async backends)
            group_traces.append((bucket, int(stacked[0].shape[0]),
                                 time.perf_counter() - t0))

    return u[:h0, :w0], v[:h0, :w0]


def _level_groups(specs, w0: int, h0: int, cfg: FlowConfig):
    """Consecutive same-bucket levels with their stacked scalar trees."""
    groups = []
    prev_cw, prev_ch = specs[0].width, specs[0].height  # first level: identity
    for spec in specs:
        cw, ch = spec.width, spec.height
        bucket = bucket_dims(cw, ch)
        sc = LevelScalars.make(
            cw, ch, spec.hx, spec.hy, cfg.equation_alpha, w0, h0, prev_cw, prev_ch
        )
        if groups and groups[-1][0] == bucket:
            groups[-1][1].append(sc)
        else:
            groups.append((bucket, [sc]))
        prev_cw, prev_ch = cw, ch
    return [
        (bucket, tuple(np.stack(col) for col in zip(*(sc.tree() for sc in scs))))
        for bucket, scs in groups
    ]


@_env_cached(maxsize=64)
def compiled_full_pipeline_batched(orig_shape: Tuple[int, int], batch: int,
                                   cfg: FlowConfig, use_pallas: bool = None,
                                   *, _env=None):
    """vmapped single-dispatch whole-pipeline program for (B, H, W) stacks.

    use_pallas: vmap lifts the Pallas relaxation kernel to a grid axis
    (one sequential kernel instance per pair). Defaults to the platform
    gate like the single-pair path; pass False to force the XLA
    relaxation (the GSPMD-sharded paths need that).
    """
    h0, w0 = orig_shape
    specs = level_schedule(w0, h0, cfg.warp_levels_count, cfg.warp_scale_factor)
    top_bucket = bucket_dims(specs[-1].width, specs[-1].height)
    h0b, w0b = top_bucket
    groups = _level_groups(specs, w0, h0, cfg)

    def single(f0, f1):
        f0s = gaussian_smooth(f0, cfg.gaussian_sigma)
        f0s = jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(f0s)
        f1s = gaussian_smooth(f1, cfg.gaussian_sigma)
        f1s = jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(f1s)
        u = jnp.zeros((h0b, w0b), jnp.float32)
        v = jnp.zeros_like(u)
        for bucket, stacked in groups:
            def body(carry, sc, bucket=bucket):
                uu, vv = bucketed_level_step(
                    f0s, f1s, carry[0], carry[1], sc, bucket, top_bucket, cfg,
                    use_pallas=use_pallas,
                )
                return (uu, vv), None

            (u, v), _ = jax.lax.scan(body, (u, v), stacked,
                                     length=stacked[0].shape[0])
        return u[:h0, :w0], v[:h0, :w0]

    return jax.jit(jax.vmap(single))


@_env_cached(maxsize=32)
def compiled_full_pipeline_dp(orig_shape: Tuple[int, int], b_local: int,
                              mesh, data_axis: str, cfg: FlowConfig,
                              *, _env=None):
    """Data-parallel whole-pipeline program: `shard_map` over ``data_axis``
    whose per-shard body is the FULL single-pair engine — Pallas kernels
    included — run over the shard's ``b_local`` pairs sequentially
    (single-stream chaining, the measured throughput mode on one chip;
    batching the per-chip program was 4-5x slower, BASELINE.md).

    Frame pairs are independent (reference: one pair per run,
    src/main.cpp:175-178), so the per-shard program needs ZERO cross-shard
    collectives and GSPMD never has to partition the Pallas custom calls —
    the constraint that used to force the vmapped batch path onto the
    ~2.5x-slower XLA relaxation engine on DP meshes. A jaxpr-level test
    pins both properties (Mosaic kernels present, no collectives).
    """
    import os

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    unroll = os.environ.get("TPUFLOW_UNROLL", "1") != "0"
    single = make_pipeline_fn(orig_shape, cfg, unroll)

    def local_fn(f0_l, f1_l):
        # (b_local, H, W) local pairs; unrolled Python loop — XLA overlaps
        # the chain like the async single-pair dispatch stream does.
        outs = [single(f0_l[i], f1_l[i]) for i in range(b_local)]
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
        )

    spec = P(data_axis, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    return jax.jit(fn)


@_env_cached(maxsize=64)
def compiled_full_pipeline_sharded(orig_shape: Tuple[int, int], mesh,
                                   y_axis: str, cfg: FlowConfig,
                                   halo: str = "explicit", *, _env=None):
    """Single-dispatch pipeline with rows sharded over the mesh's spatial
    axis — the SURVEY §2.7 spatial domain decomposition.

    Every bucket dimension is a multiple of 64 rows, so row sharding
    divides evenly for any power-of-two axis size.

    halo="explicit" (default): the relaxation — ~95% of per-level work —
    runs as a shard_map with ONE ppermute exchange of an
    (inner_iterations+1)-row halo per outer iteration and redundant
    in-halo computation (tpuflow.parallel.halo); buckets too small for a
    halo block replicate on the XLA path. Resample/warp/median stay GSPMD.

    halo="gspmd": everything left to GSPMD, which partitions each stencil
    shift separately (~30 1-row collective-permutes per outer iteration —
    the latency-bound baseline the explicit path exists to beat).

    halo="kernel": the speed-of-light variant — buckets admitted by
    kernel_halo_applicable run the WHOLE per-shard relaxation as one
    Pallas kernel with in-kernel ring-RDMA halo exchange
    (tpuflow.parallel.halo_kernel): iterates stay VMEM-resident across
    all outer x inner passes and only the 2-field halo rides ICI per
    outer, with no XLA collective round trip. Buckets outside its gate
    fall back to the explicit ppermute block, then to replication.

    halo="auto": cost-based per-level routing (parallel.model.plan_level)
    — each bucket runs the cheapest of {replicate, explicit@k, kernel@k}
    under the analytic ICI model, where k is the k-outer halo-fusion
    factor (one exchange per k fused outer iterations; valid-region
    numerics are k- and path-invariant, pinned bitwise by
    tests/test_halo*.py). Round 3 sharded every admissible level, which
    priced mid-pyramid levels above their replicated cost; the router
    is what lifts the projected 1080p n=4 efficiency from 72% to ~89%
    (BASELINE.md round 4). Replicated-planned buckets carry a
    fully-replicated sharding constraint so GSPMD compiles them without
    per-shift collectives.

    All explicit/kernel modes honor TPUFLOW_HALO_K as a fixed fusion
    factor (default 1); "auto" chooses k per level.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    h0, w0 = orig_shape
    specs = level_schedule(w0, h0, cfg.warp_levels_count, cfg.warp_scale_factor)
    top_bucket = bucket_dims(specs[-1].width, specs[-1].height)
    h0b, w0b = top_bucket
    groups = _level_groups(specs, w0, h0, cfg)
    n_y = mesh.shape[y_axis]
    row_sharding = NamedSharding(mesh, P(y_axis, None))
    repl_sharding = NamedSharding(mesh, P(None, None))

    plans = {}
    if halo == "auto":
        from tpuflow.parallel.model import plan_level

        for bucket, _ in groups:
            plans[bucket] = plan_level(bucket[0], bucket[1], cfg, n_y)

    def constrain(a, hb, bucket=None):
        if bucket is not None and plans.get(bucket, ("",))[0] == "replicated":
            # auto-planned replication: pin the carry replicated so
            # GSPMD compiles the level without per-shift collectives.
            return jax.lax.with_sharding_constraint(a, repl_sharding)
        if hb % n_y == 0 and hb // n_y >= 16:
            return jax.lax.with_sharding_constraint(a, row_sharding)
        return a  # tiny buckets: replicate (GSPMD's choice)

    def relax_for(bucket):
        if halo not in ("explicit", "kernel", "auto"):
            return None
        from tpuflow.parallel.halo import halo_applicable, relax_sharded

        if halo == "auto":
            path, kk, _ = plans[bucket]
            if path == "replicated":
                return None
            if path == "kernel":
                from tpuflow.parallel.halo_kernel import relax_sharded_kernel

                def akfn(f0_l, f1_w, uu, vv, sc, cfg_, kk=kk):
                    return relax_sharded_kernel(
                        f0_l, f1_w, uu, vv, sc, cfg_, mesh, y_axis,
                        k_outer=kk)

                return akfn

            def aefn(f0_l, f1_w, uu, vv, sc, cfg_, kk=kk):
                return relax_sharded(
                    f0_l, f1_w, uu, vv, sc, cfg_, mesh, y_axis, k_outer=kk)

            return aefn

        if halo == "kernel":
            from tpuflow.parallel.halo_kernel import (
                kernel_halo_applicable, relax_sharded_kernel,
            )

            if kernel_halo_applicable(bucket[0], bucket[1], n_y, cfg):
                def kfn(f0_l, f1_w, uu, vv, sc, cfg_):
                    return relax_sharded_kernel(
                        f0_l, f1_w, uu, vv, sc, cfg_, mesh, y_axis)

                return kfn

        if not halo_applicable(bucket[0], n_y, cfg):
            return None

        def fn(f0_l, f1_w, uu, vv, sc, cfg_):
            return relax_sharded(f0_l, f1_w, uu, vv, sc, cfg_, mesh, y_axis)

        return fn

    @jax.jit
    def run(f0, f1):
        f0s = gaussian_smooth(f0, cfg.gaussian_sigma)
        f0s = jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(f0s)
        f1s = gaussian_smooth(f1, cfg.gaussian_sigma)
        f1s = jnp.zeros((h0b, w0b), jnp.float32).at[:h0, :w0].set(f1s)
        f0s = constrain(f0s, h0b)
        f1s = constrain(f1s, h0b)
        u = jnp.zeros((h0b, w0b), jnp.float32)
        v = jnp.zeros_like(u)
        for bucket, stacked in groups:
            relax_fn = relax_for(bucket)

            def body(carry, sc, bucket=bucket, relax_fn=relax_fn):
                # use_pallas=False on the XLA fallback: the full-array VMEM
                # kernel would defeat GSPMD row sharding.
                uu, vv = bucketed_level_step(
                    f0s, f1s, carry[0], carry[1], sc, bucket, top_bucket, cfg,
                    use_pallas=False, relax_fn=relax_fn,
                )
                return (constrain(uu, h0b, bucket),
                        constrain(vv, h0b, bucket)), None

            (u, v), _ = jax.lax.scan(
                body, (u, v), stacked, length=stacked[0].shape[0]
            )
        return u[:h0, :w0], v[:h0, :w0]

    return run


def compute_flow_bucketed_sharded(frame_0, frame_1, cfg: FlowConfig = None,
                                  mesh=None, y_axis: str = "y",
                                  halo: str = "explicit"):
    """Single frame pair with image rows sharded over the mesh (for frames
    too large for one chip, BASELINE configs[3]). Returns DEVICE arrays.

    halo: "explicit" (shard_map + one widened ppermute exchange per outer,
    the default), "kernel" (in-kernel ring-RDMA Pallas relaxation,
    tpuflow.parallel.halo_kernel), "auto" (cost-based per-level routing
    over {replicate, explicit@k, kernel@k} via parallel.model.plan_level)
    or "gspmd" (compiler-partitioned stencils)."""
    from tpuflow.parallel.mesh import make_mesh

    cfg = cfg or FlowConfig()
    mesh = mesh or make_mesh()
    f0 = jnp.asarray(frame_0, dtype=jnp.float32)
    f1 = jnp.asarray(frame_1, dtype=jnp.float32)
    run = compiled_full_pipeline_sharded(f0.shape, mesh, y_axis, cfg, halo)
    return run(f0, f1)


def compute_flow_bucketed_batch(frames_0, frames_1, cfg: FlowConfig = None,
                                mesh=None, data_axis: str = "data",
                                dp: str = "shard_map"):
    """Solve a (B, H, W) stack of independent frame pairs.

    The streaming-throughput entry point: batching amortizes the per-pass
    dispatch floor that dominates the ~28 tiny coarse levels. Returns
    DEVICE arrays (B, H, W).

    With ``mesh``, pairs are data-parallel over the mesh's ``data_axis``.
    Frame pairs are independent (reference contract: one pair per run,
    src/main.cpp:175-178), so the default ``dp="shard_map"`` runs the
    FULL single-pair engine — Pallas kernels included — per shard via
    `compiled_full_pipeline_dp` (N x the headline single-chip engine; the
    batch is padded to an axis-size multiple by repeating the last pair
    and trimmed after; output sharding is P(data_axis) on the caller's
    mesh, so global/multi-host arrays keep their shard layout). For pure
    DP put every device on ``data_axis`` — other mesh axes replicate the
    work. ``dp="gspmd"`` keeps the legacy vmapped program whose batch
    axis GSPMD shards over ``data_axis`` — that path must force the XLA
    relaxation (GSPMD cannot partition the Pallas custom call), so it
    runs ~2.5x slower per chip; it remains as the A/B baseline.
    """
    cfg = cfg or FlowConfig()
    f0 = jnp.asarray(frames_0, dtype=jnp.float32)
    f1 = jnp.asarray(frames_1, dtype=jnp.float32)
    if f0.ndim != 3 or f0.shape != f1.shape:
        raise ValueError(f"expected (B, H, W) stacks, got {f0.shape} {f1.shape}")
    b, h0, w0 = f0.shape

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # Pad the batch to an axis-size multiple by repeating the last
        # pair (trimmed after): both DP modes shard the batch axis.
        n = mesh.shape[data_axis]
        b_pad = -(-b // n) * n
        if b_pad != b:
            f0 = jnp.concatenate(
                [f0, jnp.broadcast_to(f0[-1:], (b_pad - b, h0, w0))], axis=0)
            f1 = jnp.concatenate(
                [f1, jnp.broadcast_to(f1[-1:], (b_pad - b, h0, w0))], axis=0)
        sharding = NamedSharding(mesh, P(data_axis, None, None))
        f0 = jax.device_put(f0, sharding)
        f1 = jax.device_put(f1, sharding)
        if dp == "shard_map":
            run = compiled_full_pipeline_dp((h0, w0), b_pad // n, mesh,
                                            data_axis, cfg)
        else:
            # Legacy vmapped program: GSPMD shards the batch axis but
            # cannot partition the Pallas custom call -> XLA relaxation.
            run = compiled_full_pipeline_batched((h0, w0), b_pad, cfg,
                                                 use_pallas=False)
        u, v = run(f0, f1)
        return (u, v) if b_pad == b else (u[:b], v[:b])

    # One program, one dispatch (the whole pyramid vmapped over the batch).
    run = compiled_full_pipeline_batched((h0, w0), b, cfg)
    return run(f0, f1)


_WARMED: set = set()


def warmup_bucketed(orig_shape: Tuple[int, int], cfg: FlowConfig,
                    max_workers: int = 16, *, grouped: bool = False) -> float:
    """Compile the solver for a workload shape before timing/serving.

    Warms by CALLING with zero arguments: `.lower().compile()` does not
    populate the jit dispatch cache, so an AOT-only warmup still pays the
    full compile on the first real call (observed on the remote-compile
    backend: 16 s "warmup" followed by a 510 s first run).

    Default warms the single-dispatch whole-pipeline program (ONE compile
    request — remote compile services serialize requests at ~60 s each,
    so fewer programs beat concurrent warmup). ``grouped=True`` also warms
    the per-bucket group programs. Idempotent per (shape, cfg, grouped).
    """
    import time
    from concurrent.futures import ThreadPoolExecutor

    key = (orig_shape, cfg, grouped, _trace_env_fingerprint())
    if key in _WARMED:
        return 0.0
    t0 = time.perf_counter()
    h0, w0 = orig_shape
    zeros_frame = jnp.zeros((h0, w0), jnp.float32)
    # Fence with device_get: jax.block_until_ready returns early through
    # tunneled dispatch paths, so it would let the first timed run eat the
    # compile+execute tail (CLAUDE.md).
    np.asarray(compiled_full_pipeline(orig_shape, cfg)(zeros_frame, zeros_frame)[0])

    if grouped:
        specs = level_schedule(w0, h0, cfg.warp_levels_count, cfg.warp_scale_factor)
        top_bucket = bucket_dims(specs[-1].width, specs[-1].height)
        h0b, w0b = top_bucket
        groups = _level_groups(specs, w0, h0, cfg)
        zeros = jnp.zeros((h0b, w0b), jnp.float32)

        def compile_group(group):
            bucket, stacked = group
            fn = compiled_bucketed_group(bucket, top_bucket, stacked[0].shape[0], cfg)
            np.asarray(fn(zeros, zeros, zeros, zeros, stacked)[0])

        with ThreadPoolExecutor(max_workers=max_workers) as ex:
            list(ex.map(compile_group, groups))
        smooth = _compiled_smooth_pad(cfg.gaussian_sigma, (h0, w0), top_bucket)
        np.asarray(smooth(zeros_frame))
    # Record success only AFTER everything compiled+ran: a transient
    # remote-compile/tunnel failure must not mark the key warmed (the
    # retry would return 0.0 and the first timed run would eat the
    # compile).
    _WARMED.add(key)
    return time.perf_counter() - t0

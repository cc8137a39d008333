"""du-iterate relaxation kernels (Pallas TPU): fewer persistent fields.

The verified production kernels (ops/pallas/relax_bucket.py) iterate on
the combined field T = flow + d. That made every sweep touch only two
shifted fields, but it drags u, v through the kernel (T's init, the
per-sweep ``T - u`` recentering, the final subtraction) and keeps 12-16
persistent full-bucket fields live. This module implements the du/dv
ITERATE reformulation (CLAUDE.md round-3 lever #1; math contract:
reference src/kernels/solve_2d.cu:349-367):

  * ksi's inputs are the iterate directly (du_c, dv_c — no recentering);
  * the smoothness sum splits exactly:
        sumU = sum_i pw_i (T_i - u_c) = sum_i pw_i du_i + cu,
        cu   = sum_i pw_i (u_i - u_c)   — a per-OUTER constant,
    folded with the data terms into bu = -ksi*J13 + cu (bv likewise), so
    a sweep reads ONLY: du/dv shifts, pw_xp/pw_yp (the xm/ym halves are
    derived by shift — exact off-boundary because float addition is
    commutative: pw_ym[y] = (phi[y-1]+phi[y])/2 * w = pw_yp[y-1] for
    0 < y < ch, and the boundary rows are weight-masked to zero), and
    the five per-outer term fields a12, bu, bv, dnu, dnv;
  * u, v are consumed ONLY by the per-outer prologue (phi gradient + cu),
    so the chunked/streamed variants stream them from HBM once per outer
    instead of keeping them VMEM-resident;
  * ghost rule: mirror-maintaining the du/dv ghosts composes with the
    mirror-maintained u, v inputs, so T's ghost stays exact (mirror is a
    permutation: ghost(u)+ghost(du) = mirror(u)+mirror(du) = mirror(T)).

Accepted reassociations vs tpuflow.solver.bucketed._relax_dyn (both
1-ulp-class, EPE-bounded by the parity tests, like the T-iterate's
documented ones): splitting sum_i pw_i (T_i - u_c) into
sum_i pw_i du_i + cu, and folding -a13 + cu into one field. The phi
gradient is computed from SEPARATE u and du shifts — bit-identical to
compute_phi_ksi_dyn (closer than the T-iterate kernels, which pay a
reassociation there).

Variants:
  * "full"    — everything VMEM (buckets passing fits_du_full): the
    probe for the VMEM-traffic floor hypothesis — 13 per-sweep field
    touches vs the T-iterate full variant's 15;
  * "chunked" — du/dv + the seven per-outer fields VMEM-resident
    (9 persistent fields vs the T-iterate chunked variant's 12), u, v
    and the level constants streamed from HBM per outer; sweeps run IN
    PLACE over 64-row chunks with a saved-halo-row stash instead of
    ping-pong buffers. Admits 1080p-class fine buckets with headroom.
  * "streamed" — 4K-class: every field HBM-resident; VMEM holds only
    double-buffered chunk windows (the reference's contract is anything
    fitting device memory, optical_flow_2d.cpp:84-140).

Scalars (valid extent + h-derived float32 constants) arrive in SMEM so
one compiled kernel serves every level of a bucket. Interpret-mode tests
pin all variants against _relax_dyn on the valid region.

MAINTENANCE NOTE: the per-pixel update is the SHARED core
(tpuflow.ops.sweep_core.sweep_update_du); the PROLOGUE expressions
mirror solver.bucketed._relax_dyn term-for-term (modulo the documented
folds) — prologue changes must be mirrored there and in
ops/pallas/relax_bucket/level_fused, and the parity-matrix tests re-run.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.sweep_core import sweep_update_du
from tpuflow.ops.pallas.relax_bucket import (
    VMEM_BUDGET_BYTES,
    VMEM_LIMIT_BYTES,
    n_const_fields,
)


def _field_bytes(hb: int, wb: int) -> int:
    return hb * wb * 4


def fits_du_full(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Unchunked du-iterate working set: 13 persistent fields (4 iterate
    ping-pong + 2 pw + 5 terms + u, v inputs) + constants + ~16 live
    transients per pass."""
    if cfg.inner_iterations_count < 1:
        return False
    if hb % 8 != 0 or wb % 128 != 0:
        return False
    n = 13 + n_const_fields(cfg) + 16
    return n * _field_bytes(hb, wb) <= VMEM_BUDGET_BYTES


def _chunk_fits(hb: int, wb: int, cfg: FlowConfig, c: int) -> bool:
    # Two staging slots under TPUFLOW_CHUNK_PRO_DB (read here at trace
    # time so the chunk height honestly shrinks with the extra buffers).
    n_ps = 2 if os.environ.get("TPUFLOW_CHUNK_PRO_DB", "1") != "0" else 1
    chunk_rows = (
        n_ps * 2 * (c + 16)                   # u, v slab buffers
        + n_ps * n_const_fields(cfg) * c      # streamed constants
        + 20 * (c + 8)                        # live chunk transients
    )                                         # (incl. k-sweep wavefront)
    need = 9 * _field_bytes(hb, wb) + chunk_rows * wb * 4
    return need <= VMEM_BUDGET_BYTES


def du_chunk_rows(hb: int, wb: int, cfg: FlowConfig) -> Optional[int]:
    """Largest chunk height that fits: the 9-persistent-field trim buys
    room for bigger chunks than the T-iterate's 64, amortizing the
    chunk-loop/slab-assembly overhead (measured: the du-vs-T field trim
    alone moved 1080p only ~2.5%; the overhead is per-chunk, so fewer,
    larger chunks are the lever). Non-dividing heights run a static
    remainder chunk (hb is a 64-multiple, so the remainder is too)."""
    for c in (512, 256, 128, 64):
        if c <= hb and _chunk_fits(hb, wb, cfg, c):
            return c
    return None


def fits_du_chunked(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Chunked variant: 9 persistent fields + chunk windows."""
    if cfg.inner_iterations_count < 1:
        return False
    if hb % 8 != 0 or wb % 128 != 0:
        return False
    return du_chunk_rows(hb, wb, cfg) is not None


def _stream_window_fits(wb: int, cfg: FlowConfig, c: int) -> bool:
    window_rows = (
        2 * 2 * (c + 16)                  # du, dv in-slabs x 2 slots
        + 2 * 2 * c                       # out chunks x 2 slots
        + 2 * 4 * (c + 16)                # prologue staging x 2 slots
        + 2 * 7 * c                       # term staging x 2 slots
        + 2 * 6 * (c + 8) + 2 * (c + 16)  # sweep term windows x 2 slots
        + 2 * n_const_fields(cfg) * c     # streamed constants x 2 slots
        + 33                              # seam stashes (lstash/pstash/pwrow)
        + 24 * (c + 8)                    # transients (k-sweep wavefront)
    )
    return window_rows * wb * 4 <= VMEM_BUDGET_BYTES


def streamed_chunk_rows(hb: int, wb: int, cfg: FlowConfig) -> Optional[int]:
    """Largest dividing chunk height whose double-buffered windows fit
    (the streamed pipeline's slot logic needs equal chunks, so only
    dividing heights qualify; every bucket height is a 64-multiple)."""
    for c in (256, 128, 64):
        if hb % c == 0 and _stream_window_fits(wb, cfg, c):
            return c
    return None


def streamed_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Streamed variant: only chunk windows live in VMEM, so the gate is
    alignment plus the window budget (double-buffered slabs for 11
    streamed fields + transients)."""
    if cfg.inner_iterations_count < 1:
        return False
    if wb % 128 != 0:
        return False
    return streamed_chunk_rows(hb, wb, cfg) is not None


def relax_du_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    return (
        fits_du_full(hb, wb, cfg)
        or fits_du_chunked(hb, wb, cfg)
        or streamed_supported(hb, wb, cfg)
    )


def _shift_xp(a):
    return jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)


def _shift_xm(a):
    return jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)


def _derive_pw_xm(pw_xp, xs):
    """pw_xm[x] = pw_xp[x-1] off-boundary; x = 0 is weight-masked to 0.
    Bit-exact at valid pixels: (phi[x-1]+phi[x]) == (phi[x]+phi[x-1])."""
    shifted = jnp.concatenate([pw_xp[:, :1], pw_xp[:, :-1]], axis=1)
    return jnp.where(xs == 0, jnp.float32(0.0), shifted)


def _derive_pw_ym_full(pw_yp, ys):
    """Full-field twin of _derive_pw_xm along rows."""
    shifted = jnp.concatenate([pw_yp[:1, :], pw_yp[:-1, :]], axis=0)
    return jnp.where(ys == 0, jnp.float32(0.0), shifted)


def relax_du_fused(
    fx: jax.Array,
    fy: jax.Array,
    ft: jax.Array,
    u: jax.Array,
    v: jax.Array,
    scalars,             # LevelScalars.tree() entries (static or traced 0-d)
    cfg: FlowConfig,
    *,
    tensor: Optional[tuple] = None,  # (J11, J22, J12, J13, J23) grad/log
    interpret: bool = False,
    force_mode: Optional[str] = None,  # "full" | "chunked" | "streamed"
    pw_mode: str = "derive",           # full variant only (A/B probe)
) -> Tuple[jax.Array, jax.Array]:
    """(du, dv) after the full outer x inner relaxation; bucket-shaped
    inputs (u, v mirror-maintained by the caller, like _relax_dyn's)."""
    hb, wb = u.shape
    if force_mode is not None:
        mode = force_mode
    elif fits_du_full(hb, wb, cfg):
        mode = "full"
    elif fits_du_chunked(hb, wb, cfg):
        mode = "chunked"
    else:
        mode = "streamed"
    if mode == "full":
        return _relax_du_full(fx, fy, ft, u, v, scalars, cfg, tensor=tensor,
                              interpret=interpret, pw_mode=pw_mode)
    if mode == "chunked":
        return _relax_du_chunked(fx, fy, ft, u, v, scalars, cfg,
                                 tensor=tensor, interpret=interpret)
    return _relax_du_streamed(fx, fy, ft, u, v, scalars, cfg, tensor=tensor,
                              interpret=interpret)


def _smem_args(scalars):
    (cw, ch, _, _, div2hx, div2hy, _, _, a_hx2, a_hy2) = scalars[:10]
    smem_i = [jnp.asarray(x, jnp.int32).reshape(1, 1) for x in (cw, ch)]
    smem_f = [
        jnp.asarray(x, jnp.float32).reshape(1, 1)
        for x in (div2hx, div2hy, a_hx2, a_hy2)
    ]
    return smem_i, smem_f


def _relax_du_full(
    fx, fy, ft, u, v, scalars, cfg: FlowConfig, *,
    tensor: Optional[tuple] = None, interpret: bool = False,
    pw_mode: str = "derive",  # "derive" (2 pw fields) | "four" (A/B probe)
) -> Tuple[jax.Array, jax.Array]:
    """Unchunked du-iterate variant: the field-trim probe for the
    VMEM-traffic floor claim (BASELINE.md).

    Per-sweep field touches: du/dv shifts (2) + pw_xp/pw_yp (2, with the
    xm/ym halves derived by shift) + a12, bu, bv, dnu, dnv (5) + 2 writes
    = 11 reads + 2 shifts + 2 writes, vs the T-iterate full variant's 13
    reads + 2 writes. If the sweep is VMEM-traffic-bound as measured
    (shiftonly probe 86%), this should run ~1.15x faster per pass.
    """
    hb, wb = u.shape
    grey = cfg.data_constancy == DataConstancy.GREY
    if not grey:
        assert tensor is not None and len(tensor) == 5
    consts = (fx, fy, ft) if grey else (fx, fy, ft, *tensor)
    n_const = len(consts)
    inner = cfg.inner_iterations_count
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))
    smem_i, smem_f = _smem_args(scalars)

    def kernel(*refs):
        (cw_ref, ch_ref, d2x_ref, d2y_ref, ax_ref, ay_ref,
         u_ref, v_ref) = refs[:8]
        const_refs = refs[8:8 + n_const]
        (du_ref, dv_ref,
         dub_ref, dvb_ref,
         pwxp_ref, pwyp_ref, pwxm_ref, pwym_ref,
         a12_ref, bu_ref, bv_ref, dnu_ref, dnv_ref) = refs[8 + n_const:]
        cwv = cw_ref[0, 0]
        chv = ch_ref[0, 0]
        d2x = d2x_ref[0, 0]
        d2y = d2y_ref[0, 0]
        axv = ax_ref[0, 0]
        ayv = ay_ref[0, 0]

        ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
        xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)

        def maintain1(ref):
            val = ref[:]
            rolled_r = pltpu.roll(val, 2, 0)
            val = jnp.where(ys == chv, rolled_r, val)
            rolled_c = pltpu.roll(val, 2, 1)
            ref[:] = jnp.where(xs == cwv, rolled_c, val)

        def sh(a):
            """center, x+1, x-1, y+1, y-1 with bucket-edge mirror (the
            `_shifts` semantics of the XLA path)."""
            xp = jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)
            xm = jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)
            yp = jnp.concatenate([a[1:, :], a[-2:-1, :]], axis=0)
            ym = jnp.concatenate([a[1:2, :], a[:-1, :]], axis=0)
            return a, xp, xm, yp, ym

        du_ref[:] = jnp.zeros((hb, wb), jnp.float32)
        dv_ref[:] = jnp.zeros((hb, wb), jnp.float32)

        def sweep_from_shifts(du_sh, dv_sh, dst_du, dst_dv):
            sdu_c, sdu_xp, sdu_xm, sdu_yp, sdu_ym = du_sh
            sdv_c, sdv_xp, sdv_xm, sdv_yp, sdv_ym = dv_sh
            pw_xp = pwxp_ref[:]
            pw_yp = pwyp_ref[:]
            if pw_mode == "four":
                pw_xm = pwxm_ref[:]
                pw_ym = pwym_ref[:]
            else:
                pw_xm = _derive_pw_xm(pw_xp, xs)
                pw_ym = _derive_pw_ym_full(pw_yp, ys)
            new_du, new_dv = sweep_update_du(
                (sdu_xp, sdu_xm, sdu_yp, sdu_ym),
                (sdv_xp, sdv_xm, sdv_yp, sdv_ym),
                sdv_c, (pw_xp, pw_xm, pw_yp, pw_ym),
                a12_ref[:], bu_ref[:], bv_ref[:], dnu_ref[:], dnv_ref[:],
            )
            dst_du[:] = new_du
            dst_dv[:] = new_dv

        def prologue(src_du_ref, src_dv_ref):
            du_sh = sh(src_du_ref[:])
            dv_sh = sh(src_dv_ref[:])
            du_c, du_xp, du_xm, du_yp, du_ym = du_sh
            dv_c, dv_xp, dv_xm, dv_yp, dv_ym = dv_sh
            u_c, u_xp, u_xm, u_yp, u_ym = sh(u_ref[:])
            v_c, v_xp, v_xm, v_yp, v_ym = sh(v_ref[:])
            # phi: SEPARATE u/du shifts — bit-identical to
            # compute_phi_ksi_dyn (solve_2d.cu:141-162).
            dux = (u_xp - u_xm + du_xp - du_xm) / d2x
            duy = (u_yp - u_ym + du_yp - du_ym) / d2y
            dvx = (v_xp - v_xm + dv_xp - dv_xm) / d2x
            dvy = (v_yp - v_ym + dv_yp - dv_ym) / d2y
            phi = 1.0 / (
                2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx
                               + dvy * dvy + e_s2)
            )
            # No ghost maintenance of phi: its only consumers are the pw
            # products, whose free-boundary weights vanish at the valid
            # edge, so ghost phi never reaches a valid pixel (same
            # argument as the chunked T-iterate kernel).
            phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = sh(phi)
            xp_w = jnp.where(xs < cwv - 1, axv, 0.0)
            xm_w = jnp.where(xs > 0, axv, 0.0)
            yp_w = jnp.where((ys < chv - 1), ayv, 0.0)
            ym_w = jnp.where(ys > 0, ayv, 0.0)
            pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
            pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
            pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
            pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
            pwxp_ref[:] = pw_xp
            pwyp_ref[:] = pw_yp
            if pw_mode == "four":
                pwxm_ref[:] = pw_xm
                pwym_ref[:] = pw_ym
            sumH = pw_xp + pw_xm + pw_yp + pw_ym

            fxc = const_refs[0][:]
            fyc = const_refs[1][:]
            ftc = const_refs[2][:]
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
                J11 = const_refs[3][:]
                J22 = const_refs[4][:]
                J12 = const_refs[5][:]
                J13 = const_refs[6][:]
                J23 = const_refs[7][:]
            cu = (
                pw_xp * (u_xp - u_c) + pw_xm * (u_xm - u_c)
                + pw_yp * (u_yp - u_c) + pw_ym * (u_ym - u_c)
            )
            cv = (
                pw_xp * (v_xp - v_c) + pw_xm * (v_xm - v_c)
                + pw_yp * (v_yp - v_c) + pw_ym * (v_ym - v_c)
            )
            a12_ref[:] = ksi * J12
            bu_ref[:] = -(ksi * J13) + cu
            bv_ref[:] = -(ksi * J23) + cv
            dnu_ref[:] = ksi * J11 + sumH
            dnv_ref[:] = ksi * J22 + sumH
            return du_sh, dv_sh

        def outer_pass(src_du, src_dv, alt_du, alt_dv):
            maintain1(src_du)
            maintain1(src_dv)
            du_sh, dv_sh = prologue(src_du, src_dv)
            sweep_from_shifts(du_sh, dv_sh, alt_du, alt_dv)  # reuse shifts
            for j in range(1, inner):
                if j % 2 == 1:
                    s_du, s_dv, d_du, d_dv = alt_du, alt_dv, src_du, src_dv
                else:
                    s_du, s_dv, d_du, d_dv = src_du, src_dv, alt_du, alt_dv
                sweep_from_shifts(sh(s_du[:]), sh(s_dv[:]), d_du, d_dv)

        flips = inner % 2 == 1
        n_outer = cfg.outer_iterations_count

        if flips:

            def outer_pair(_, carry):
                outer_pass(du_ref, dv_ref, dub_ref, dvb_ref)
                outer_pass(dub_ref, dvb_ref, du_ref, dv_ref)
                return carry

            jax.lax.fori_loop(0, n_outer // 2, outer_pair, 0)
            if n_outer % 2 == 1:
                outer_pass(du_ref, dv_ref, dub_ref, dvb_ref)
                du_ref[:] = dub_ref[:]
                dv_ref[:] = dvb_ref[:]
        else:

            def outer_single(_, carry):
                outer_pass(du_ref, dv_ref, dub_ref, dvb_ref)
                return carry

            jax.lax.fori_loop(0, n_outer, outer_single, 0)

    field = lambda: pltpu.VMEM((hb, wb), jnp.float32)  # noqa: E731
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    total = cfg.outer_iterations_count * (inner + 1)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
        ),
        in_specs=(
            [smem()] * 6
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * (2 + n_const)
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[field() for _ in range(11)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=55 * hb * wb * total,
            bytes_accessed=(6 + n_const) * 4 * hb * wb,
            transcendentals=2 * hb * wb * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(*smem_i, *smem_f, u, v, *consts)


def _relax_du_chunked(
    fx, fy, ft, u, v, scalars, cfg: FlowConfig, *,
    tensor: Optional[tuple] = None, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked du-iterate variant for buckets whose full working set
    exceeds VMEM (1080p-class fine levels).

    Persistent VMEM: du, dv (the outputs, iterated IN PLACE) + pw_xp,
    pw_yp, a12, bu, bv, dnu, dnv — 9 fields vs the T-iterate chunked
    variant's 12. u, v and the level constants live in HBM and stream
    through chunk windows once per OUTER (the prologue is their only
    consumer). Sweeps run in place over row chunks top-to-bottom: the
    Jacobi read of the already-overwritten row s-1 comes from a saved
    stash of each chunk's original last row, so no ping-pong buffers are
    needed at all. The chunk height is the largest that fits VMEM
    (du_chunk_rows): the 9-field trim's real payoff is FEWER, LARGER
    chunks — the chunk-loop/slab-assembly overhead is per-chunk, and the
    field trim alone measured only ~2.5% at 1080p.
    """
    hb, wb = u.shape
    grey = cfg.data_constancy == DataConstancy.GREY
    if not grey:
        assert tensor is not None and len(tensor) == 5
    consts = (fx, fy, ft) if grey else (fx, fy, ft, *tensor)
    n_const = len(consts)
    C = du_chunk_rows(hb, wb, cfg)
    assert C is not None, (hb, wb)
    n_full, rem = hb // C, hb % C
    inner = cfg.inner_iterations_count
    # k-sweep wavefront (round 5): kk fused sweeps per chunk pass
    # amortize the per-sweep slab assembly + pw/term slicing the
    # round-4 C-probes identified as the 1080p chunked-sweep tax.
    # kk <= 8: the input slab's bottom block covers the k-row wavefront.
    ksweep = int(os.environ.get("TPUFLOW_CHUNK_KSWEEP", "5"))
    ksweep = max(1, min(ksweep, 8, inner))
    # Double-buffered u/v/const staging (A/B knob; see prologue_at).
    pro_db = os.environ.get("TPUFLOW_CHUNK_PRO_DB", "1") != "0"
    n_ps = 2 if pro_db else 1
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))
    smem_i, smem_f = _smem_args(scalars)

    def kernel(*refs):
        (cw_ref, ch_ref, d2x_ref, d2y_ref, ax_ref, ay_ref,
         u_hbm, v_hbm) = refs[:8]
        const_refs = refs[8:8 + n_const]     # HBM
        (du_ref, dv_ref,                     # outputs, iterated in place
         pwxp_ref, pwyp_ref,
         a12_ref, bu_ref, bv_ref, dnu_ref, dnv_ref,
         ubuf, vbuf, cbuf, stash, sem) = refs[8 + n_const:]
        cwv = cw_ref[0, 0]
        chv = ch_ref[0, 0]
        d2x = d2x_ref[0, 0]
        d2y = d2y_ref[0, 0]
        axv = ax_ref[0, 0]
        ayv = ay_ref[0, 0]

        def maintain1(ref):
            ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
            val = ref[:]
            rolled_r = pltpu.roll(val, 2, 0)
            val = jnp.where(ys == chv, rolled_r, val)
            rolled_c = pltpu.roll(val, 2, 1)
            ref[:] = jnp.where(xs == cwv, rolled_c, val)

        def starts(s, cc):
            top_start = pl.multiple_of(jnp.maximum(s - 8, 0), 8)
            bot_start = pl.multiple_of(jnp.minimum(s + cc, hb - 8), 8)
            return top_start, bot_start

        def slab4(ref, i, s, cc, top_start, bot_start):
            """(cc+4, wb): virtual rows [s-2, s+cc+2) of a VMEM field,
            with full-field `_shifts` mirror at the global top
            (vr -2 -> 2, vr -1 -> 1) and finite don't-care rows past the
            bucket bottom."""
            top_block = ref[pl.ds(top_start, 8), :]
            r0 = jnp.where(i == 0, top_block[2:3, :], top_block[6:7, :])
            r1 = jnp.where(i == 0, top_block[1:2, :], top_block[7:8, :])
            mid = ref[pl.ds(s, cc), :]
            bot_block = ref[pl.ds(bot_start, 8), :]
            return jnp.concatenate(
                [r0, r1, mid, bot_block[0:1, :], bot_block[1:2, :]], axis=0
            )

        def slab4_buf(buf, i, cc):
            """Same row map over a staging buffer holding
            [top 8-block, mid cc rows, bottom 8-block]."""
            r0 = jnp.where(i == 0, buf[2:3, :], buf[6:7, :])
            r1 = jnp.where(i == 0, buf[1:2, :], buf[7:8, :])
            return jnp.concatenate(
                [r0, r1, buf[8:8 + cc, :],
                 buf[8 + cc:9 + cc, :], buf[9 + cc:10 + cc, :]],
                axis=0,
            )

        def sh4(slab):
            """center/x+1/x-1/y+1/y-1 on rows [s-1, s+cc+1) of a
            (cc+4, wb) slab — (cc+2, wb) each, matching the full-field
            `_shifts` inside the bucket."""
            c = slab[1:-1, :]
            return c, _shift_xp(c), _shift_xm(c), slab[2:, :], slab[:-2, :]

        def chunk_coords(s, rows):
            gys = jax.lax.broadcasted_iota(jnp.int32, (rows, wb), 0) + s
            gxs = jax.lax.broadcasted_iota(jnp.int32, (rows, wb), 1)
            return gys, gxs

        def prologue_in_dmas(slot, s, cc):
            top_start, bot_start = starts(s, cc)
            return [
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(top_start, 8), :], ubuf.at[slot, 0:8, :],
                    sem.at[slot, 0]),
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(s, cc), :], ubuf.at[slot, 8:8 + cc, :],
                    sem.at[slot, 1]),
                pltpu.make_async_copy(
                    u_hbm.at[pl.ds(bot_start, 8), :],
                    ubuf.at[slot, 8 + cc:16 + cc, :], sem.at[slot, 2]),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(top_start, 8), :], vbuf.at[slot, 0:8, :],
                    sem.at[slot, 3]),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(s, cc), :], vbuf.at[slot, 8:8 + cc, :],
                    sem.at[slot, 4]),
                pltpu.make_async_copy(
                    v_hbm.at[pl.ds(bot_start, 8), :],
                    vbuf.at[slot, 8 + cc:16 + cc, :], sem.at[slot, 5]),
            ] + [
                pltpu.make_async_copy(
                    const_refs[k].at[pl.ds(s, cc), :],
                    cbuf.at[slot, k, 0:cc, :], sem.at[slot, 6 + k])
                for k in range(n_const)
            ]

        def prologue_at(i, s, cc, slot=0):
            """phi/pw/terms for rows [s, s+cc) — cc is static per call
            site (the main fori body uses C; the remainder chunk rem).

            With TPUFLOW_CHUNK_PRO_DB=1 the u/v/const staging is
            double-buffered: this chunk's copies were started by the
            previous chunk (or the pre-loop kick) and the next chunk's
            start here, flying under the phi/ksi/term compute. DEFAULT
            ON (round-5 A/B at the 1080p bucket: 1.10x then 1.46x
            reproduced, order-rotated interleaved; the two-slot staging
            still fits C=128 — 113.5 MB of the 117.4 MB budget);
            TPUFLOW_CHUNK_PRO_DB=0 reverts to the round-4 single-slot
            layout (start, overlap only the du/dv slab work, wait)."""
            top_start, bot_start = starts(s, cc)
            if pro_db:
                for cp in prologue_in_dmas(slot, s, cc):
                    cp.wait()

                @pl.when(i + 1 < n_full)
                def _():
                    s_n = pl.multiple_of((i + 1) * C, 8)
                    for cp in prologue_in_dmas((i + 1) % n_ps, s_n, C):
                        cp.start()
                if rem:
                    @pl.when(i + 1 == n_full)
                    def _():
                        for cp in prologue_in_dmas((i + 1) % n_ps,
                                                   n_full * C, rem):
                            cp.start()
            else:
                copies = prologue_in_dmas(slot, s, cc)
                for cp in copies:
                    cp.start()

            # du/dv slabs from VMEM (overlapping the in-flight DMAs in
            # the single-slot mode).
            du_s = slab4(du_ref, i, s, cc, top_start, bot_start)
            dv_s = slab4(dv_ref, i, s, cc, top_start, bot_start)
            du_c4, du_xp, du_xm, du_yp, du_ym = sh4(du_s)
            dv_c4, dv_xp, dv_xm, dv_yp, dv_ym = sh4(dv_s)

            if not pro_db:
                for cp in copies:
                    cp.wait()
            u_s = slab4_buf(ubuf[slot], i, cc)
            v_s = slab4_buf(vbuf[slot], i, cc)
            u_c4, u_xp, u_xm, u_yp, u_ym = sh4(u_s)
            v_c4, v_xp, v_xm, v_yp, v_ym = sh4(v_s)

            # phi on rows [s-1, s+cc] — separate u/du shifts, exactly
            # compute_phi_ksi_dyn (solve_2d.cu:141-162).
            dux = (u_xp - u_xm + du_xp - du_xm) / d2x
            duy = (u_yp - u_ym + du_yp - du_ym) / d2y
            dvx = (v_xp - v_xm + dv_xp - dv_xm) / d2x
            dvy = (v_yp - v_ym + dv_yp - dv_ym) / d2y
            phi_pad = 1.0 / (
                2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx
                               + dvy * dvy + e_s2)
            )

            phi_c = phi_pad[1:-1, :]
            phi_xp_n = _shift_xp(phi_c)
            phi_xm_n = _shift_xm(phi_c)
            phi_yp_n = phi_pad[2:, :]
            phi_ym_n = phi_pad[:-2, :]
            gys, gxs = chunk_coords(s, cc)
            xp_w = jnp.where(gxs < cwv - 1, axv, 0.0)
            xm_w = jnp.where(gxs > 0, axv, 0.0)
            yp_w = jnp.where(gys < chv - 1, ayv, 0.0)
            ym_w = jnp.where(gys > 0, ayv, 0.0)
            pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
            pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
            pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
            pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
            ds = pl.ds(s, cc)
            pwxp_ref[ds, :] = pw_xp
            pwyp_ref[ds, :] = pw_yp
            sumH = pw_xp + pw_xm + pw_yp + pw_ym

            du_c = du_s[2:2 + cc, :]
            dv_c = dv_s[2:2 + cc, :]
            fxc, fyc, ftc = (cbuf[slot, 0, 0:cc, :],
                             cbuf[slot, 1, 0:cc, :],
                             cbuf[slot, 2, 0:cc, :])
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
                J11, J22, J12, J13, J23 = (
                    cbuf[slot, 3, 0:cc, :], cbuf[slot, 4, 0:cc, :],
                    cbuf[slot, 5, 0:cc, :], cbuf[slot, 6, 0:cc, :],
                    cbuf[slot, 7, 0:cc, :]
                )
            u_c = u_s[2:2 + cc, :]
            v_c = v_s[2:2 + cc, :]
            cu = (
                pw_xp * (u_xp[1:-1, :] - u_c) + pw_xm * (u_xm[1:-1, :] - u_c)
                + pw_yp * (u_s[3:3 + cc, :] - u_c)
                + pw_ym * (u_s[1:1 + cc, :] - u_c)
            )
            cv = (
                pw_xp * (v_xp[1:-1, :] - v_c) + pw_xm * (v_xm[1:-1, :] - v_c)
                + pw_yp * (v_s[3:3 + cc, :] - v_c)
                + pw_ym * (v_s[1:1 + cc, :] - v_c)
            )
            a12_ref[ds, :] = ksi * J12
            bu_ref[ds, :] = -(ksi * J13) + cu
            bv_ref[ds, :] = -(ksi * J23) + cv
            dnu_ref[ds, :] = ksi * J11 + sumH
            dnv_ref[ds, :] = ksi * J22 + sumH

        def sweep_at(i, s, cc, kk):
            """kk fused Jacobi sweeps over chunk [s, s+cc) in one pass
            (trapezoid wavefront, round 5): level j in 1..kk computes
            rows [s, s+cc+kk-j), the extra rows feeding level j+1 with
            exact values; the per-sweep slab assembly and pw/term reads
            that the round-4 C-probes identified as the 1080p tax are
            paid ONCE per kk sweeps. Cross-chunk state: `stash` carries
            each level's value at row s+cc-1 (chunk i+1's top halos,
            levels 0..kk-1). kk=1 is the round-4 behavior. Bottom rows
            past the bucket read the duplicated bottom-block rows —
            finite garbage whose only path into a real row is the
            masked yp weight of the last valid row (the round-4
            don't-care argument)."""
            top_start, bot_start = starts(s, cc)

            # Rows [s, s+cc+kk) of a full-field ref: mid + bottom block
            # (a plain [s, s+cc+kk) slice would run past the bucket at
    	    # the last chunk; the block's duplicated rows are the usual
            # masked don't-cares).
            def in_rows(ref):
                mid = ref[pl.ds(s, cc), :]
                bot = ref[pl.ds(bot_start, 8), :][0:kk, :]
                return jnp.concatenate([mid, bot], axis=0)

            prev_du = [stash[0, j:j + 1, :] for j in range(kk)]
            prev_dv = [stash[1, j:j + 1, :] for j in range(kk)]
            top_p = pwyp_ref[pl.ds(top_start, 8), :]
            top_p = jnp.where(i == 0, top_p[0:1, :], top_p[7:8, :])
            # Term slabs assembled once per pass (amortized over the kk
            # levels, which slice [0:m] from them).
            pwxp_s = in_rows(pwxp_ref)
            pwyp_s = in_rows(pwyp_ref)
            a12_s = in_rows(a12_ref)
            bu_s = in_rows(bu_ref)
            bv_s = in_rows(bv_ref)
            dnu_s = in_rows(dnu_ref)
            dnv_s = in_rows(dnv_ref)

            in_du = in_rows(du_ref)
            in_dv = in_rows(dv_ref)
            new_stash_du = [in_du[cc - 1:cc, :]]
            new_stash_dv = [in_dv[cc - 1:cc, :]]
            cur_du = jnp.concatenate(
                [jnp.where(i == 0, in_du[1:2, :], prev_du[0]), in_du], axis=0)
            cur_dv = jnp.concatenate(
                [jnp.where(i == 0, in_dv[1:2, :], prev_dv[0]), in_dv], axis=0)
            new_du = new_dv = None
            for j in range(1, kk + 1):
                m = cc + kk - j
                du_c = cur_du[1:1 + m, :]
                dv_c = cur_dv[1:1 + m, :]
                gys, gxs = chunk_coords(s, m)
                pw_xp = pwxp_s[0:m, :]
                pw_xm = _derive_pw_xm(pw_xp, gxs)
                pw_yp = pwyp_s[0:m, :]
                pw_ym = jnp.where(
                    gys == 0, jnp.float32(0.0),
                    jnp.concatenate([top_p, pw_yp[:-1, :]], axis=0),
                )
                new_du, new_dv = sweep_update_du(
                    (_shift_xp(du_c), _shift_xm(du_c),
                     cur_du[2:2 + m, :], cur_du[0:m, :]),
                    (_shift_xp(dv_c), _shift_xm(dv_c),
                     cur_dv[2:2 + m, :], cur_dv[0:m, :]),
                    dv_c, (pw_xp, pw_xm, pw_yp, pw_ym), a12_s[0:m, :],
                    bu_s[0:m, :], bv_s[0:m, :], dnu_s[0:m, :],
                    dnv_s[0:m, :],
                )
                if j < kk:
                    new_stash_du.append(new_du[cc - 1:cc, :])
                    new_stash_dv.append(new_dv[cc - 1:cc, :])
                    cur_du = jnp.concatenate(
                        [jnp.where(i == 0, new_du[1:2, :], prev_du[j]),
                         new_du], axis=0)
                    cur_dv = jnp.concatenate(
                        [jnp.where(i == 0, new_dv[1:2, :], prev_dv[j]),
                         new_dv], axis=0)

            ds = pl.ds(s, cc)
            du_ref[ds, :] = new_du[0:cc, :]
            dv_ref[ds, :] = new_dv[0:cc, :]
            for j in range(kk):
                stash[0, j:j + 1, :] = new_stash_du[j]
                stash[1, j:j + 1, :] = new_stash_dv[j]

        def prologue_chunk(i, carry):
            prologue_at(i, pl.multiple_of(i * C, 8), C,
                        i % n_ps if pro_db else 0)
            return carry

        def make_sweep_chunk(kk):
            def sweep_chunk_k(i, carry):
                sweep_at(i, pl.multiple_of(i * C, 8), C, kk)
                return carry

            return sweep_chunk_k

        du_ref[:] = jnp.zeros((hb, wb), jnp.float32)
        dv_ref[:] = jnp.zeros((hb, wb), jnp.float32)

        rem_s = inner
        passes = []
        while rem_s > 0:
            passes.append(min(ksweep, rem_s))
            rem_s -= passes[-1]
        chunk_fns = {kk: make_sweep_chunk(kk) for kk in set(passes)}

        def outer_body(_, carry):
            maintain1(du_ref)
            maintain1(dv_ref)
            if pro_db:
                for cp in prologue_in_dmas(0, 0, C):
                    cp.start()
            jax.lax.fori_loop(0, n_full, prologue_chunk, 0)
            if rem:
                prologue_at(n_full, n_full * C, rem,
                            n_full % n_ps if pro_db else 0)
            for kk in passes:
                jax.lax.fori_loop(0, n_full, chunk_fns[kk], 0)
                if rem:
                    sweep_at(n_full, n_full * C, rem, kk)
            return carry

        jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body, 0)

    field = lambda: pltpu.VMEM((hb, wb), jnp.float32)  # noqa: E731
    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    total = cfg.outer_iterations_count * (inner + 1)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
        ),
        in_specs=(
            [smem()] * 6
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 + n_const)
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[field() for _ in range(7)]
        + [
            pltpu.VMEM((n_ps, C + 16, wb), jnp.float32),   # ubuf
            pltpu.VMEM((n_ps, C + 16, wb), jnp.float32),   # vbuf
            pltpu.VMEM((n_ps, n_const, C, wb), jnp.float32),
            pltpu.VMEM((2, 8, wb), jnp.float32),         # stash (per-level)
            pltpu.SemaphoreType.DMA((n_ps, 6 + n_const)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=55 * hb * wb * total,
            bytes_accessed=(
                (4 + (2 + n_const) * cfg.outer_iterations_count)
                * 4 * hb * wb
            ),
            transcendentals=2 * hb * wb * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(*smem_i, *smem_f, u, v, *consts)


def _relax_du_streamed(
    fx, fy, ft, u, v, scalars, cfg: FlowConfig, *,
    tensor: Optional[tuple] = None, interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """HBM-resident du-iterate variant: the any-size kernel (4K-class
    fine buckets, reference contract optical_flow_2d.cpp:84-140).

    EVERY field lives in HBM — the iterate (in place, stash-halo like the
    chunked variant), the seven per-outer term fields (auxiliary kernel
    outputs the caller discards), u, v and the constants. VMEM holds only
    chunk windows: the prologue stages one chunk at a time (1 of inner+1
    passes); the sweeps double-buffer their input slabs and output
    chunks, so chunk i+1's loads overlap chunk i's compute and chunk i's
    writeback overlaps chunk i+1 (the guide's two-slot DMA pipeline).

    The iterate's valid-edge mirror ghosts cannot be maintained in place
    in HBM (a dynamic-row DMA), so the prologue applies them VIRTUALLY
    during slab assembly: the slab is read 2 rows wider at the top and
    the mirror rows are substituted by a roll+select before use — the
    only consumer of unmasked ghost values is the phi gradient, exactly
    as in the other variants.

    FUSED SWEEP 0 (round-5; TPUFLOW_STREAM_FUSE0=0 reverts): the first
    of the inner sweeps runs INSIDE the prologue chunk loop — its term
    fields are still in the staging buffer (tbuf) and the pre-sweep
    du/dv chunk is already staged (pbuf), so the whole first sweep costs
    ZERO extra HBM reads, eliminating one full sweep's input streams
    (du, dv + 7 term fields = 9 of the ~69 field-streams each outer
    iteration moves; the sweeps run at 65-69% of the HBM roofline, so
    stream count is wall-clock — BASELINE.md round-4 accounting).
    Jacobi needs PRE-sweep neighbor values, and the fused sweep
    overwrites chunk i in place before chunk i+1's prologue runs, so two
    small VMEM stashes carry the pre-sweep state across the chunk seam:
    an 8-row stash per iterate field (chunk i+1's prologue top block —
    replacing its HBM top-block DMA) and one pw_yp row (chunk i+1's
    pw_ym derivation). Bit-identical to the unfused sequence: same
    update expression (sweep_update_du), same operand values (DMA
    round-trips are bit-preserving), same boundary selects.
    """
    hb, wb = u.shape
    grey = cfg.data_constancy == DataConstancy.GREY
    if not grey:
        assert tensor is not None and len(tensor) == 5
    consts = (fx, fy, ft) if grey else (fx, fy, ft, *tensor)
    n_const = len(consts)
    C = streamed_chunk_rows(hb, wb, cfg)
    assert C is not None, (hb, wb)
    n_chunks = hb // C
    inner = cfg.inner_iterations_count
    # Fused sweep 0 in the prologue loop: measured 0.88x at the 4K
    # bucket (the prologue loop has no DMA/compute overlap, so the added
    # sweep compute costs full price while the saved streams were
    # already pipelined) — kept as an A/B knob, default OFF.
    fuse0 = os.environ.get("TPUFLOW_STREAM_FUSE0", "0") == "1"
    # k-SWEEP fusion (round 5): run min(ksweep, remaining) Jacobi sweeps
    # per streaming pass with a k-row wavefront (trapezoid) — the
    # iterate DMA already reads an 8-row bottom block, so every k <= 8
    # sweeps share ONE read of the iterate and the 7 term fields,
    # cutting per-outer HBM traffic from 15 + inner*11.5 to
    # ~15 + ceil(inner/k)*12 field passes. Each level-j row uses exactly
    # the level-(j-1) values the sequential sweeps would (redundant
    # k-row recompute at chunk seams, stash for the top halo rows) —
    # the same value-exact scheme as the sharded k-outer halo fusion
    # (parallel/halo.py).
    #
    # MEASURED NEGATIVE at the 4K bucket (round 5, order-rotated
    # interleaved K-slope, 8 rounds): ksweep=5 is 1.54x SLOWER than the
    # sequential layout (97.8 vs 63.5 ms/level) — the level is NOT
    # HBM-traffic-bound in practice (the sequential rate implies an
    # apparent ~1.6 TB/s stream, above the 866 GB/s chained-add anchor,
    # i.e. the DMA engine overlaps read+write streams beyond the naive
    # pass-count model), so collapsing 5 pipelined sweeps into one
    # compute-serial wavefront pass trades hidden DMA for exposed
    # compute. Default 1 (the round-4 behavior); the knob remains for
    # re-testing on other hardware.
    ksweep = int(os.environ.get("TPUFLOW_STREAM_KSWEEP", "1"))
    ksweep = max(1, min(ksweep, 8, inner))
    if fuse0:
        ksweep = 1  # the two fusions' stashes are not composed
    pro_db = os.environ.get("TPUFLOW_STREAM_PRO_DB", "1") != "0"
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))
    smem_i, smem_f = _smem_args(scalars)
    du0 = jnp.zeros((hb, wb), jnp.float32)
    dv0 = jnp.zeros((hb, wb), jnp.float32)

    def kernel(*refs):
        (cw_ref, ch_ref, d2x_ref, d2y_ref, ax_ref, ay_ref,
         u_hbm, v_hbm, _du0, _dv0) = refs[:10]
        const_refs = refs[10:10 + n_const]                # HBM
        (du_hbm, dv_hbm,                                  # outputs (aliased
         pwxp_hbm, pwyp_hbm,                              #  to du0/dv0)
         a12_hbm, bu_hbm, bv_hbm, dnu_hbm, dnv_hbm) = refs[10 + n_const:
                                                           19 + n_const]
        (pbuf, cbuf, tbuf, sbuf, pwybuf, tin, obuf, lstash,
         pstash, pwrow,
         sem_pin, sem_pout, sem_sin, sem_sout) = refs[19 + n_const:]
        term_hbm = (pwxp_hbm, pwyp_hbm, a12_hbm, bu_hbm, bv_hbm,
                    dnu_hbm, dnv_hbm)
        cwv = cw_ref[0, 0]
        chv = ch_ref[0, 0]
        d2x = d2x_ref[0, 0]
        d2y = d2y_ref[0, 0]
        axv = ax_ref[0, 0]
        ayv = ay_ref[0, 0]

        def starts(s):
            top_start = pl.multiple_of(jnp.maximum(s - 8, 0), 8)
            bot_start = pl.multiple_of(jnp.minimum(s + C, hb - 8), 8)
            return top_start, bot_start

        def chunk_coords(s, rows, base=0):
            gys = (
                jax.lax.broadcasted_iota(jnp.int32, (rows, wb), 0) + s + base
            )
            gxs = jax.lax.broadcasted_iota(jnp.int32, (rows, wb), 1)
            return gys, gxs

        # ---- prologue: one staged chunk at a time --------------------
        def slab6_maintained(buf, i, s):
            """Virtual rows [s-4, s+C+2) of the iterate from its
            (C+16) staging buffer, with the valid-edge mirror ghosts
            substituted (row chv := chv-2, col cwv := cwv-2). Two extra
            top rows guarantee the roll's source row is in-slab wherever
            the row-select can fire; rows 0-1 are dropped after."""
            rows = []
            for k, vr_off in enumerate((-4, -3, -2, -1)):
                idx_mirror = -vr_off          # vr -k -> row k
                idx_real = 8 + vr_off         # top block holds [s-8, s)
                rows.append(jnp.where(i == 0, buf[idx_mirror:idx_mirror + 1, :],
                                      buf[idx_real:idx_real + 1, :]))
            slab = jnp.concatenate(
                rows + [buf[8:8 + C, :], buf[8 + C:9 + C, :],
                        buf[9 + C:10 + C, :]], axis=0
            )
            gys, gxs = chunk_coords(s, C + 6, base=-4)
            slab = jnp.where(gys == chv, pltpu.roll(slab, 2, 0), slab)
            slab = jnp.where(gxs == cwv, pltpu.roll(slab, 2, 1), slab)
            return slab[2:, :]                # (C+4, wb), vr s-2..

        def slab6_fused(buf, st, i, s):
            """slab6_maintained with the pre-sweep top rows read from the
            VMEM stash (the fused sweep 0 already overwrote chunk i-1 in
            HBM, so its top-block DMA would see POST-sweep rows); chunk 0
            takes its mirror rows from the mid section instead of the
            (skipped) top block."""
            rows = []
            for vr_off in (-4, -3, -2, -1):
                m = 8 + (-vr_off)          # mirror: global row -vr_off
                r = 8 + vr_off             # stash holds [s-8, s)
                rows.append(jnp.where(i == 0, buf[m:m + 1, :],
                                      st[r:r + 1, :]))
            slab = jnp.concatenate(
                rows + [buf[8:8 + C, :], buf[8 + C:9 + C, :],
                        buf[9 + C:10 + C, :]], axis=0
            )
            gys, gxs = chunk_coords(s, C + 6, base=-4)
            slab = jnp.where(gys == chv, pltpu.roll(slab, 2, 0), slab)
            slab = jnp.where(gxs == cwv, pltpu.roll(slab, 2, 1), slab)
            return slab[2:, :]                # (C+4, wb), vr s-2..

        def slab4_buf(buf, i):
            r0 = jnp.where(i == 0, buf[2:3, :], buf[6:7, :])
            r1 = jnp.where(i == 0, buf[1:2, :], buf[7:8, :])
            return jnp.concatenate(
                [r0, r1, buf[8:8 + C, :],
                 buf[8 + C:9 + C, :], buf[9 + C:10 + C, :]],
                axis=0,
            )

        def sh4(slab):
            c = slab[1:-1, :]
            return c, _shift_xp(c), _shift_xm(c), slab[2:, :], slab[:-2, :]

        def term_out_dmas(slot, s):
            return [
                pltpu.make_async_copy(
                    tbuf.at[slot, k], term_hbm[k].at[pl.ds(s, C), :],
                    sem_pout.at[slot, k])
                for k in range(7)
            ]

        def prologue_in_dmas(slot, i, s):
            top_start, bot_start = starts(s)
            srcs = (u_hbm, v_hbm, du_hbm, dv_hbm)
            copies = []
            for k, src in enumerate(srcs):
                if not (fuse0 and k >= 2):
                    # Fused mode replaces the iterate top blocks with the
                    # pre-sweep VMEM stash (HBM already holds post-sweep
                    # rows there).
                    copies.append(pltpu.make_async_copy(
                        src.at[pl.ds(top_start, 8), :],
                        pbuf.at[slot, k, 0:8, :], sem_pin.at[slot, 3 * k]))
                copies += [
                    pltpu.make_async_copy(
                        src.at[pl.ds(s, C), :],
                        pbuf.at[slot, k, 8:8 + C, :],
                        sem_pin.at[slot, 3 * k + 1]),
                    pltpu.make_async_copy(
                        src.at[pl.ds(bot_start, 8), :],
                        pbuf.at[slot, k, 8 + C:16 + C, :],
                        sem_pin.at[slot, 3 * k + 2]),
                ]
            copies += [
                pltpu.make_async_copy(
                    const_refs[k].at[pl.ds(s, C), :], cbuf.at[slot, k],
                    sem_pin.at[slot, 12 + k])
                for k in range(n_const)
            ]
            return copies

        def prologue_chunk(i, carry):
            s = pl.multiple_of(i * C, C)
            slot = i % 2
            # Double-buffered input staging (round 5): chunk i's copies
            # were started by chunk i-1 (or the pre-loop kick); start
            # chunk i+1's into the other slot so its DMA flies under
            # this chunk's phi/ksi/term compute — the prologue was the
            # only serial DMA->compute section left in the kernel.
            # TPUFLOW_STREAM_PRO_DB=0 reverts to inline start+wait (A/B).
            if not pro_db:
                for cp in prologue_in_dmas(slot, i, s):
                    cp.start()
            for cp in prologue_in_dmas(slot, i, s):
                cp.wait()

            if pro_db:
                @pl.when(i + 1 < n_chunks)
                def _():
                    s_n = pl.multiple_of((i + 1) * C, C)
                    for cp in prologue_in_dmas((i + 1) % 2, i + 1, s_n):
                        cp.start()

            u_s = slab4_buf(pbuf[slot, 0], i)
            v_s = slab4_buf(pbuf[slot, 1], i)
            if fuse0:
                du_s = slab6_fused(pbuf[slot, 2], pstash[0], i, s)
                dv_s = slab6_fused(pbuf[slot, 3], pstash[1], i, s)
            else:
                du_s = slab6_maintained(pbuf[slot, 2], i, s)
                dv_s = slab6_maintained(pbuf[slot, 3], i, s)
            u_c4, u_xp, u_xm, u_yp, u_ym = sh4(u_s)
            v_c4, v_xp, v_xm, v_yp, v_ym = sh4(v_s)
            du_c4, du_xp, du_xm, du_yp, du_ym = sh4(du_s)
            dv_c4, dv_xp, dv_xm, dv_yp, dv_ym = sh4(dv_s)

            dux = (u_xp - u_xm + du_xp - du_xm) / d2x
            duy = (u_yp - u_ym + du_yp - du_ym) / d2y
            dvx = (v_xp - v_xm + dv_xp - dv_xm) / d2x
            dvy = (v_yp - v_ym + dv_yp - dv_ym) / d2y
            phi_pad = 1.0 / (
                2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx
                               + dvy * dvy + e_s2)
            )
            phi_c = phi_pad[1:-1, :]
            phi_xp_n = _shift_xp(phi_c)
            phi_xm_n = _shift_xm(phi_c)
            phi_yp_n = phi_pad[2:, :]
            phi_ym_n = phi_pad[:-2, :]
            gys, gxs = chunk_coords(s, C)
            xp_w = jnp.where(gxs < cwv - 1, axv, 0.0)
            xm_w = jnp.where(gxs > 0, axv, 0.0)
            yp_w = jnp.where(gys < chv - 1, ayv, 0.0)
            ym_w = jnp.where(gys > 0, ayv, 0.0)
            pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
            pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
            pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
            pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
            sumH = pw_xp + pw_xm + pw_yp + pw_ym

            du_c = du_s[2:2 + C, :]
            dv_c = dv_s[2:2 + C, :]
            fxc, fyc, ftc = cbuf[slot, 0], cbuf[slot, 1], cbuf[slot, 2]
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
                J11, J22, J12, J13, J23 = (
                    cbuf[slot, 3], cbuf[slot, 4], cbuf[slot, 5],
                    cbuf[slot, 6], cbuf[slot, 7]
                )
            u_c = u_s[2:2 + C, :]
            v_c = v_s[2:2 + C, :]
            cu = (
                pw_xp * (u_xp[1:-1, :] - u_c) + pw_xm * (u_xm[1:-1, :] - u_c)
                + pw_yp * (u_s[3:3 + C, :] - u_c)
                + pw_ym * (u_s[1:1 + C, :] - u_c)
            )
            cv = (
                pw_xp * (v_xp[1:-1, :] - v_c) + pw_xm * (v_xm[1:-1, :] - v_c)
                + pw_yp * (v_s[3:3 + C, :] - v_c)
                + pw_ym * (v_s[1:1 + C, :] - v_c)
            )
            # Wait for this slot's previous term writeback (chunk i-2)
            # before overwriting the staging buffer.
            @pl.when(i >= 2)
            def _():
                for cp in term_out_dmas(slot, (i - 2) * C):
                    cp.wait()

            tbuf[slot, 0] = pw_xp
            tbuf[slot, 1] = pw_yp
            tbuf[slot, 2] = ksi * J12
            tbuf[slot, 3] = -(ksi * J13) + cu
            tbuf[slot, 4] = -(ksi * J23) + cv
            tbuf[slot, 5] = ksi * J11 + sumH
            tbuf[slot, 6] = ksi * J22 + sumH
            for cp in term_out_dmas(slot, s):
                cp.start()

            if fuse0:
                # ---- fused sweep 0: zero extra HBM reads -------------
                # Pre-sweep iterate slab (C+2 rows) from the staged
                # chunk; top halo row s-1 from the stash (chunk i-1's
                # pre-sweep last row), exactly sweep_chunk's slab2.
                mid_du = pbuf[slot, 2, 8:8 + C, :]
                mid_dv = pbuf[slot, 3, 8:8 + C, :]
                top_du = jnp.where(i == 0, mid_du[1:2, :], pstash[0, 7:8, :])
                top_dv = jnp.where(i == 0, mid_dv[1:2, :], pstash[1, 7:8, :])
                du_sl = jnp.concatenate(
                    [top_du, mid_du, pbuf[slot, 2, 8 + C:9 + C, :]], axis=0)
                dv_sl = jnp.concatenate(
                    [top_dv, mid_dv, pbuf[slot, 3, 8 + C:9 + C, :]], axis=0)
                du_cc = du_sl[1:-1, :]
                dv_cc = dv_sl[1:-1, :]
                spw_xp = tbuf[slot, 0]
                spw_xm = _derive_pw_xm(spw_xp, gxs)
                spw_yp = tbuf[slot, 1]
                # pw_yp row s-1 from the 1-row stash; row 0 is masked.
                spw_ym = jnp.where(
                    gys == 0, jnp.float32(0.0),
                    jnp.concatenate([pwrow[0:1, :], spw_yp[:-1, :]], axis=0),
                )
                new_du, new_dv = sweep_update_du(
                    (_shift_xp(du_cc), _shift_xm(du_cc),
                     du_sl[2:, :], du_sl[:-2, :]),
                    (_shift_xp(dv_cc), _shift_xm(dv_cc),
                     dv_sl[2:, :], dv_sl[:-2, :]),
                    dv_cc, (spw_xp, spw_xm, spw_yp, spw_ym),
                    tbuf[slot, 2], tbuf[slot, 3], tbuf[slot, 4],
                    tbuf[slot, 5], tbuf[slot, 6],
                )

                @pl.when(i >= 2)
                def _():
                    for cp in sweep_out_dmas(slot, (i - 2) * C):
                        cp.wait()

                obuf[slot, 0] = new_du
                obuf[slot, 1] = new_dv
                for cp in sweep_out_dmas(slot, s):
                    cp.start()
                # Pre-sweep state for chunk i+1's prologue top block and
                # its sweep/pw_ym halo rows (pbuf still holds pre-sweep
                # values; chunk i+1's DMAs only start after this body).
                pstash[0] = pbuf[slot, 2, C:C + 8, :]
                pstash[1] = pbuf[slot, 3, C:C + 8, :]
                pwrow[0:1, :] = spw_yp[C - 1:C, :]
            return carry

        # ---- sweeps: double-buffered in/out chunk pipeline -----------
        # The in-DMAs read C + 8 rows of the iterate and the term fields
        # (mid chunk + an aligned bottom block): the 8 extra rows feed
        # the k-sweep wavefront (levels j < k extend k - j rows past the
        # chunk); at k = 1 only 1 extra row is consumed (the Jacobi
        # bottom halo), exactly the round-4 layout.
        def sweep_in_dmas(slot, i, s):
            top_start, bot_start = starts(s)
            dmas = []
            for k, src in enumerate((du_hbm, dv_hbm)):
                dmas += [
                    pltpu.make_async_copy(
                        src.at[pl.ds(s, C), :],
                        sbuf.at[slot, k, 0:C, :], sem_sin.at[slot, 2 * k]),
                    pltpu.make_async_copy(
                        src.at[pl.ds(bot_start, 8), :],
                        sbuf.at[slot, k, C:C + 8, :],
                        sem_sin.at[slot, 2 * k + 1]),
                ]
            dmas += [
                pltpu.make_async_copy(
                    pwyp_hbm.at[pl.ds(top_start, 8), :],
                    pwybuf.at[slot, 0:8, :], sem_sin.at[slot, 4]),
                pltpu.make_async_copy(
                    pwyp_hbm.at[pl.ds(s, C), :],
                    pwybuf.at[slot, 8:8 + C, :], sem_sin.at[slot, 5]),
                pltpu.make_async_copy(
                    pwyp_hbm.at[pl.ds(bot_start, 8), :],
                    pwybuf.at[slot, 8 + C:16 + C, :], sem_sin.at[slot, 6]),
            ]
            others = (pwxp_hbm, a12_hbm, bu_hbm, bv_hbm, dnu_hbm, dnv_hbm)
            for k in range(6):
                dmas += [
                    pltpu.make_async_copy(
                        others[k].at[pl.ds(s, C), :],
                        tin.at[slot, k, 0:C, :], sem_sin.at[slot, 7 + 2 * k]),
                    pltpu.make_async_copy(
                        others[k].at[pl.ds(bot_start, 8), :],
                        tin.at[slot, k, C:C + 8, :],
                        sem_sin.at[slot, 8 + 2 * k]),
                ]
            return dmas

        def sweep_out_dmas(slot, s):
            return [
                pltpu.make_async_copy(
                    obuf.at[slot, 0], du_hbm.at[pl.ds(s, C), :],
                    sem_sout.at[slot, 0]),
                pltpu.make_async_copy(
                    obuf.at[slot, 1], dv_hbm.at[pl.ds(s, C), :],
                    sem_sout.at[slot, 1]),
            ]

        def make_sweep_chunk(kk):
            """Chunk body applying kk Jacobi sweeps in one streaming
            pass (trapezoid wavefront): level j in 1..kk computes rows
            [s, s + C + kk - j); the extra rows feed level j+1 in-VMEM
            so the seam values chunk i+1 would need are recomputed
            there instead (value-exact redundant compute, as in the
            sharded k-outer halo fusion). Cross-chunk state: lstash
            holds each level's value at row s+C-1 (chunk i+1's top
            halo, one row per level 0..kk-1).

            Bottom-bucket note: for the last chunk the extended rows
            past hb read the duplicated bottom-block rows — finite
            garbage whose only path into a real row is the yp term of
            row hb-1, whose weight the valid-edge mask zeroes (the same
            argument that makes the round-4 single-sweep bottom row a
            don't-care)."""
            M = [C + kk - j for j in range(kk + 1)]  # input, level 1..kk

            def sweep_chunk_k(i, carry):
                s = pl.multiple_of(i * C, C)
                slot = i % 2
                for cp in sweep_in_dmas(slot, i, s):
                    cp.wait()

                @pl.when(i + 1 < n_chunks)
                def _():
                    s_n = pl.multiple_of((i + 1) * C, C)
                    for cp in sweep_in_dmas((i + 1) % 2, i + 1, s_n):
                        cp.start()

                # Previous chunk's per-level seam rows (loaded before
                # this chunk overwrites them).
                prev_du = [lstash[0, j:j + 1, :] for j in range(kk)]
                prev_dv = [lstash[1, j:j + 1, :] for j in range(kk)]
                pwy = pwybuf[slot]
                top_p = jnp.where(i == 0, pwy[0:1, :], pwy[7:8, :])

                in_du = sbuf[slot, 0, 0:M[0], :]
                in_dv = sbuf[slot, 1, 0:M[0], :]
                new_stash_du = [in_du[C - 1:C, :]]
                new_stash_dv = [in_dv[C - 1:C, :]]
                # cur_*: level-(j-1) values for rows [s-1, s+M[j-1]).
                cur_du = jnp.concatenate(
                    [jnp.where(i == 0, in_du[1:2, :], prev_du[0]), in_du],
                    axis=0)
                cur_dv = jnp.concatenate(
                    [jnp.where(i == 0, in_dv[1:2, :], prev_dv[0]), in_dv],
                    axis=0)
                new_du = new_dv = None
                for j in range(1, kk + 1):
                    m = M[j]
                    du_c = cur_du[1:1 + m, :]
                    dv_c = cur_dv[1:1 + m, :]
                    gys, gxs = chunk_coords(s, m)
                    pw_xp = tin[slot, 0, 0:m, :]
                    pw_xm = _derive_pw_xm(pw_xp, gxs)
                    pw_yp = pwy[8:8 + m, :]
                    pw_ym = jnp.where(
                        gys == 0, jnp.float32(0.0),
                        jnp.concatenate([top_p, pwy[8:8 + m - 1, :]],
                                        axis=0),
                    )
                    new_du, new_dv = sweep_update_du(
                        (_shift_xp(du_c), _shift_xm(du_c),
                         cur_du[2:2 + m, :], cur_du[0:m, :]),
                        (_shift_xp(dv_c), _shift_xm(dv_c),
                         cur_dv[2:2 + m, :], cur_dv[0:m, :]),
                        dv_c, (pw_xp, pw_xm, pw_yp, pw_ym),
                        tin[slot, 1, 0:m, :], tin[slot, 2, 0:m, :],
                        tin[slot, 3, 0:m, :], tin[slot, 4, 0:m, :],
                        tin[slot, 5, 0:m, :],
                    )
                    if j < kk:
                        new_stash_du.append(new_du[C - 1:C, :])
                        new_stash_dv.append(new_dv[C - 1:C, :])
                        cur_du = jnp.concatenate(
                            [jnp.where(i == 0, new_du[1:2, :], prev_du[j]),
                             new_du], axis=0)
                        cur_dv = jnp.concatenate(
                            [jnp.where(i == 0, new_dv[1:2, :], prev_dv[j]),
                             new_dv], axis=0)

                @pl.when(i >= 2)
                def _():
                    for cp in sweep_out_dmas(slot, (i - 2) * C):
                        cp.wait()

                obuf[slot, 0] = new_du
                obuf[slot, 1] = new_dv
                for cp in sweep_out_dmas(slot, s):
                    cp.start()
                for j in range(kk):
                    lstash[0, j:j + 1, :] = new_stash_du[j]
                    lstash[1, j:j + 1, :] = new_stash_dv[j]
                return carry

            return sweep_chunk_k

        # Pass schedule: ceil(remaining / ksweep) streaming passes of
        # min(ksweep, remaining) fused sweeps each.
        rem = inner - (1 if fuse0 else 0)
        passes = []
        while rem > 0:
            passes.append(min(ksweep, rem))
            rem -= passes[-1]
        chunk_fns = {kk: make_sweep_chunk(kk) for kk in set(passes)}

        def outer_body(o, carry):
            if pro_db:
                # Prime chunk 0's staging (the serial path starts its
                # own copies inline — starting here too would signal
                # each semaphore twice per wait).
                for cp in prologue_in_dmas(0, 0, 0):
                    cp.start()
            jax.lax.fori_loop(0, n_chunks, prologue_chunk, 0)
            # Barrier: both slots' trailing term writebacks must land
            # before the sweeps read the term fields.
            for tail in range(max(0, n_chunks - 2), n_chunks):
                for cp in term_out_dmas(tail % 2, tail * C):
                    cp.wait()
            if fuse0:
                # Barrier: the fused sweep 0's trailing iterate
                # writebacks before sweep 1's (or the next outer's
                # prologue) reads.
                for tail in range(max(0, n_chunks - 2), n_chunks):
                    for cp in sweep_out_dmas(tail % 2, tail * C):
                        cp.wait()
            for kk in passes:
                for cp in sweep_in_dmas(0, 0, 0):
                    cp.start()
                jax.lax.fori_loop(0, n_chunks, chunk_fns[kk], 0)
                # Barrier: trailing iterate writebacks before the next
                # pass's (or prologue's) reads.
                for tail in range(max(0, n_chunks - 2), n_chunks):
                    for cp in sweep_out_dmas(tail % 2, tail * C):
                        cp.wait()
            return carry

        jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body, 0)

    smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    any_spec = lambda: pl.BlockSpec(memory_space=pl.ANY)  # noqa: E731
    total = cfg.outer_iterations_count * (inner + 1)
    out = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((hb, wb), jnp.float32) for _ in range(9)
        ),
        in_specs=([smem()] * 6 + [any_spec()] * (4 + n_const)),
        out_specs=tuple(any_spec() for _ in range(9)),
        # du/dv iterate in place over the zero-initialized aliases.
        input_output_aliases={8: 0, 9: 1},
        scratch_shapes=[
            pltpu.VMEM((2, 4, C + 16, wb), jnp.float32),  # pbuf
            pltpu.VMEM((2, n_const, C, wb), jnp.float32),  # cbuf
            pltpu.VMEM((2, 7, C, wb), jnp.float32),       # tbuf
            pltpu.VMEM((2, 2, C + 8, wb), jnp.float32),   # sbuf
            pltpu.VMEM((2, C + 16, wb), jnp.float32),     # pwybuf
            pltpu.VMEM((2, 6, C + 8, wb), jnp.float32),   # tin
            pltpu.VMEM((2, 2, C, wb), jnp.float32),       # obuf
            pltpu.VMEM((2, 8, wb), jnp.float32),              # lstash
            pltpu.VMEM((2, 8, wb), jnp.float32),              # pstash
            pltpu.VMEM((1, wb), jnp.float32),                 # pwrow
            pltpu.SemaphoreType.DMA((2, 12 + n_const)),       # sem_pin
            pltpu.SemaphoreType.DMA((2, 7)),                  # sem_pout
            pltpu.SemaphoreType.DMA((2, 20)),                 # sem_sin
            pltpu.SemaphoreType.DMA((2, 2)),                  # sem_sout
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES,
            has_side_effects=True,
        ),
        cost_estimate=pl.CostEstimate(
            flops=55 * hb * wb * total,
            bytes_accessed=11 * 4 * hb * wb * total,
            transcendentals=2 * hb * wb * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(*smem_i, *smem_f, u, v, du0, dv0, *consts)
    if os.environ.get("TPUFLOW_DEBUG_STREAM_ALL") == "1":  # test-only probe
        return out
    return out[0], out[1]

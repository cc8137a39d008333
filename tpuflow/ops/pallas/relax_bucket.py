"""VMEM-resident relaxation kernel for BUCKET shapes (Pallas TPU).

One kernel invocation executes the whole ``outer x (phi/ksi + inner
sweeps)`` relaxation of a pyramid level on a bucket-padded field with a
traced valid extent — the bucketed-engine counterpart of the reference's
outer*inner separate kernel launches with per-sweep host syncs
(reference: cuda_operation_solve_2d.cpp:238-300). One launch replaces the
XLA path's ~240 fused stencil passes per level, every iterate stays in
VMEM between sweeps, and all three data constancies run here (round 1
was grey-only): the second-order tensor for GRADIENT/LOG_DERIVATIVES
(solve_2d.cu:867-884) arrives as per-level constant fields exactly like
the grey derivatives.

Shared structure (both variants):
  * **Combined iterate** ``T = flow + d``: the sweeps only ever read
    ``u_xp + du_xp`` together (reference: solve_2d.cu:349-359), so the
    kernel carries Tu = u + du, Tv = v + dv — two neighbor-shifted fields
    per sweep instead of five (u, v, du, dv, phi); u, v are read at
    centers only.
  * **Per-outer hoists**: the ksi-scaled tensor products and (in the
    full variant) the masked half-point diffusivities pw_* are constants
    within an outer iteration (phi/ksi update once per outer,
    solve_2d.cu:195-196) — computed once per outer into VMEM fields.
  * **Ghost maintenance once per outer**: mirror ghosts at the traced
    valid edge are only OBSERVED by the phi gradient pass; every sweep
    consumption of neighbor values is multiplied by the free-boundary
    weights (solve_2d.cu:333-340), which vanish exactly at the valid
    edge.

Variants (see relax_bucket_fused): "full" — straight full-field VPU code,
no chunking, constants VMEM-resident (v5e has 128 MB of VMEM; the 16 MB
"limit" round 1 designed against was only Mosaic's default
vmem_limit_bytes); "chunked" — 64-row chunk loops with slab assembly and
HBM-streamed constants for buckets whose full working set exceeds VMEM
(1080p fine levels). Chunk loops are single `fori_loop`s whose dynamic
slices are provably 8-aligned; ghost maintenance uses full-field
roll+select (pltpu.roll is a native relayout), avoiding unaligned
dynamic stores.

Measured and REJECTED alternatives (BASELINE.md): a stacked-[Tu;Tv]
variant halving the per-sweep shift OP count was no faster (Mosaic cost
tracks data volume, not op count, at these sizes); vmapping this kernel
for batches is 4-5x slower per pair than single-stream chaining.

Scalars (valid extent + h-derived float32 constants) arrive in SMEM.
Numerics match tpuflow.solver.bucketed._relax_dyn term by term (the same
hoisted formulation, modulo the documented T-iterate reassociation);
interpret-mode tests pin them together.

MAINTENANCE NOTE: the per-pixel update itself is the SHARED core
(tpuflow.ops.sweep_core.sweep_update_T) — change the math there, once.
ops/pallas/level_fused.py still embeds a copy of the "full" variant's
relaxation STRUCTURE (buffer roles, hoists, ping-pong; SMEM scalars
replaced by Python constants) as its phase B — structural changes here
must be mirrored there, and the interpret-mode parity tests of both
files re-run.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.sweep_core import sweep_update_T

CHUNK = 64
# 12 persistent (hb, wb) fields: u, v, Tu, Tv, TuB, TvB, phi and the five
# hoisted per-outer tensor fields; plus chunk transients and the constant
# stream buffers. The Mosaic VMEM request is sized per call below.
#
# TPU v5e has 128 MB of VMEM (measured on this chip: 117 MB of Pallas
# scratch compiles and runs; round 1 assumed a 16 MB ceiling, which is
# only Mosaic's DEFAULT vmem_limit_bytes). The budget below leaves ~20 MB
# for chunk transients, which is what lets 1080p fine levels stay in the
# kernel instead of falling back to XLA.
PERSISTENT_ARRAYS = 12
VMEM_BUDGET_BYTES = 112 * 1024 * 1024  # 117 MB measured OK; leave headroom
VMEM_LIMIT_BYTES = 127 * 1024 * 1024


def _field_bytes(hb: int, wb: int) -> int:
    return hb * wb * 4  # bucket dims are already tile-aligned


def n_const_fields(cfg: FlowConfig) -> int:
    return 3 if cfg.data_constancy == DataConstancy.GREY else 8


def relax_bucket_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """All three data constancies are supported; the gates are bucket
    alignment, the VMEM working set, and inner_iterations_count >= 1
    (the kernels' unrolled sweep structure always executes sweep 0, so a
    legal inner=0 config — zero sweeps in the reference and on the XLA
    scan path — must stay on XLA everywhere for platform-identical
    numerics)."""
    if cfg.inner_iterations_count < 1:
        return False
    if hb % CHUNK != 0 or wb % 128 != 0:
        return False
    need = (
        PERSISTENT_ARRAYS * _field_bytes(hb, wb)
        + n_const_fields(cfg) * CHUNK * wb * 4
    )
    return need <= VMEM_BUDGET_BYTES


def fits_full(hb: int, wb: int, cfg: FlowConfig) -> bool:
    """Whether the UNCHUNKED variant fits: 15 persistent fields (6 iterate
    + 4 half-point diffusivity weights + 5 tensor/denominator hoists),
    VMEM-resident constants, and ~16 live full-field transients per pass."""
    n = 15 + n_const_fields(cfg) + 16
    return n * _field_bytes(hb, wb) <= VMEM_BUDGET_BYTES


def _shift_xp(a):
    return jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)


def _shift_xm(a):
    return jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)


def relax_bucket_fused(
    fx: jax.Array,
    fy: jax.Array,
    ft: jax.Array,
    u: jax.Array,
    v: jax.Array,
    scalars,             # LevelScalars.tree() entries (traced 0-d)
    cfg: FlowConfig,
    *,
    tensor: Optional[tuple] = None,  # (J11, J22, J12, J13, J23) for grad/log
    interpret: bool = False,
    force_mode: Optional[str] = None,  # "full" | "chunked" (tests/benchmarks)
    shift_mode: Optional[str] = None,  # "concat" | "roll" (full variant only)
    _ablate: Optional[str] = None,     # timing probes (bench only)
    loop_sweeps: bool = False,         # fori-looped sweeps (smaller code)
) -> Tuple[jax.Array, jax.Array]:
    """(du, dv) after the full relaxation; all inputs at bucket shape.

    Takes the PRE-COMPUTED grey first derivatives fx, fy, ft (per-level
    constants, reference: solve_2d.cu:311-321) — always the GREY ones,
    because ksi is computed from the grey motion tensor even for the
    gradient/log solvers (reference quirk: cuda_operation_solve_2d.cpp:84)
    — plus, for GRADIENT/LOG_DERIVATIVES, the second-order tensor fields
    the solve update uses (solve_2d.cu:867-884).

    Two Mosaic variants behind one interface, picked by working-set size:
      * "full" — no chunking at all: every pass is straight full-field
        VPU code (shifts are whole-array concats), constants VMEM-resident,
        half-point diffusivity weights hoisted per outer. Fastest; needs
        ~31-36 fields of VMEM.
      * "chunked" — 64-row chunk loop with slab assembly and HBM-streamed
        constants for buckets whose full-variant working set exceeds VMEM
        (e.g. 1080p fine levels at 8.9 MB/field).
    """
    hb, wb = u.shape
    mode = force_mode or ("full" if fits_full(hb, wb, cfg) else "chunked")
    if mode == "full":
        return _relax_bucket_full(
            fx, fy, ft, u, v, scalars, cfg, tensor=tensor, interpret=interpret,
            shift_mode=shift_mode, _ablate=_ablate, loop_sweeps=loop_sweeps,
        )
    return _relax_bucket_chunked(
        fx, fy, ft, u, v, scalars, cfg, tensor=tensor, interpret=interpret
    )


def _relax_bucket_chunked(
    fx: jax.Array,
    fy: jax.Array,
    ft: jax.Array,
    u: jax.Array,
    v: jax.Array,
    scalars,
    cfg: FlowConfig,
    *,
    tensor: Optional[tuple] = None,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked variant: 64-row chunk loops, HBM-streamed constants."""
    (cw, ch, _, _, div2hx, div2hy, _, _, a_hx2, a_hy2) = scalars[:10]
    hb, wb = u.shape
    assert fx.shape == (hb, wb)
    grey = cfg.data_constancy == DataConstancy.GREY
    if not grey:
        assert tensor is not None and len(tensor) == 5
    consts = (fx, fy, ft) if grey else (fx, fy, ft, *tensor)
    n_const = len(consts)
    n_chunks = hb // CHUNK
    inner = cfg.inner_iterations_count
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))

    # Scalars enter SMEM as (1, 1) arrays.
    smem_i = [jnp.asarray(x, jnp.int32).reshape(1, 1) for x in (cw, ch)]
    smem_f = [
        jnp.asarray(x, jnp.float32).reshape(1, 1)
        for x in (div2hx, div2hy, a_hx2, a_hy2)
    ]

    def kernel(*refs):
        (cw_ref, ch_ref, d2x_ref, d2y_ref, ax_ref, ay_ref, u_ref, v_ref) = refs[:8]
        const_refs = refs[8:8 + n_const]      # HBM
        (du_ref, dv_ref,                      # outputs; hold Tu, Tv in-loop
         tub_ref, tvb_ref, phi_ref,
         a12_ref, a13_ref, a23_ref, b11_ref, b22_ref,
         cbuf, sem) = refs[8 + n_const:]
        cwv = cw_ref[0, 0]
        chv = ch_ref[0, 0]
        d2x = d2x_ref[0, 0]
        d2y = d2y_ref[0, 0]
        axv = ax_ref[0, 0]
        ayv = ay_ref[0, 0]

        def maintain1(ref):
            """Full-field radius-1 mirror ghost maintenance IN PLACE:
            row chv := row chv-2, col cwv := col cwv-2."""
            ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
            val = ref[:]
            rolled_r = pltpu.roll(val, 2, 0)   # row r holds old row r-2
            val = jnp.where(ys == chv, rolled_r, val)
            rolled_c = pltpu.roll(val, 2, 1)
            ref[:] = jnp.where(xs == cwv, rolled_c, val)

        def slab(ref, i, s):
            """(CHUNK+2, wb) rows [s-1, s+CHUNK] with top mirror halo."""
            top_start = pl.multiple_of(jnp.maximum(s - 8, 0), 8)
            top_block = ref[pl.ds(top_start, 8), :]
            top = jnp.where(i == 0, top_block[1:2, :], top_block[7:8, :])
            bot_start = pl.multiple_of(jnp.minimum(s + CHUNK, hb - 8), 8)
            bot = ref[pl.ds(bot_start, 8), :][0:1, :]
            # For the last chunk `bot` is an arbitrary finite ghost row —
            # outputs there are ghost and never feed valid pixels (the
            # free-boundary weights vanish at the valid edge).
            return jnp.concatenate([top, ref[pl.ds(s, CHUNK), :], bot], axis=0)

        def shifts(ref, i, s):
            sl = slab(ref, i, s)
            c = sl[1:-1, :]
            return c, _shift_xp(c), _shift_xm(c), sl[2:, :], sl[:-2, :]

        def chunk_masks(s):
            """Free-boundary alpha/h^2 weights at the traced valid extent
            (reference: solve_2d.cu:333-340)."""
            ys = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, wb), 0) + s
            xs = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, wb), 1)
            xp_w = jnp.where(xs < cwv - 1, axv, 0.0)
            xm_w = jnp.where(xs > 0, axv, 0.0)
            yp_w = jnp.where(ys < chv - 1, ayv, 0.0)
            ym_w = jnp.where(ys > 0, ayv, 0.0)
            return xp_w, xm_w, yp_w, ym_w

        def prologue_chunk(i, carry):
            """phi + ksi-scaled tensor hoists for one 64-row chunk."""
            s = pl.multiple_of(i * CHUNK, CHUNK)
            copies = [
                pltpu.make_async_copy(
                    const_refs[k].at[pl.ds(s, CHUNK), :], cbuf.at[k], sem.at[k]
                )
                for k in range(n_const)
            ]
            for c in copies:
                c.start()
            tu_c, tu_xp, tu_xm, tu_yp, tu_ym = shifts(du_ref, i, s)
            tv_c, tv_xp, tv_xm, tv_yp, tv_ym = shifts(dv_ref, i, s)
            dux = (tu_xp - tu_xm) / d2x
            duy = (tu_yp - tu_ym) / d2y
            dvx = (tv_xp - tv_xm) / d2x
            dvy = (tv_yp - tv_ym) / d2y
            phi_ref[pl.ds(s, CHUNK), :] = 1.0 / (
                2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx + dvy * dvy + e_s2)
            )
            du_c = tu_c - u_ref[pl.ds(s, CHUNK), :]
            dv_c = tv_c - v_ref[pl.ds(s, CHUNK), :]
            for c in copies:
                c.wait()
            fxc, fyc, ftc = cbuf[0], cbuf[1], cbuf[2]
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
                    cbuf[3], cbuf[4], cbuf[5], cbuf[6], cbuf[7]
                )
            ds = pl.ds(s, CHUNK)
            a12_ref[ds, :] = ksi * J12
            a13_ref[ds, :] = ksi * J13
            a23_ref[ds, :] = ksi * J23
            b11_ref[ds, :] = ksi * J11
            b22_ref[ds, :] = ksi * J22
            return carry

        def make_sweep_chunk(src_tu, src_tv, dst_tu, dst_tv):
            def sweep_chunk(i, carry):
                s = pl.multiple_of(i * CHUNK, CHUNK)
                ds = pl.ds(s, CHUNK)
                phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = shifts(phi_ref, i, s)
                xp_w, xm_w, yp_w, ym_w = chunk_masks(s)
                pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
                pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
                pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
                pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
                sumH = pw_xp + pw_xm + pw_yp + pw_ym

                u_c = u_ref[ds, :]
                v_c = v_ref[ds, :]
                tu_c, tu_xp, tu_xm, tu_yp, tu_ym = shifts(src_tu, i, s)
                tv_c, tv_xp, tv_xm, tv_yp, tv_ym = shifts(src_tv, i, s)
                # Same association as the hoisted XLA path (the shared
                # sweep core); denominators b + sumH; dv* uses the fresh
                # du* (reference: solve_2d.cu:361-367).
                new_du, new_dv = sweep_update_T(
                    (tu_xp, tu_xm, tu_yp, tu_ym),
                    (tv_xp, tv_xm, tv_yp, tv_ym),
                    u_c, v_c, tv_c - v_c, (pw_xp, pw_xm, pw_yp, pw_ym),
                    a12_ref[ds, :], a13_ref[ds, :], a23_ref[ds, :],
                    b11_ref[ds, :] + sumH, b22_ref[ds, :] + sumH,
                )
                dst_tu[ds, :] = u_c + new_du
                dst_tv[ds, :] = v_c + new_dv
                return carry

            return sweep_chunk

        # Tu = u + 0, Tv = v + 0 (du/dv zero-init, reference
        # cuda_operation_solve_2d.cpp:229-232).
        du_ref[:] = u_ref[:]
        dv_ref[:] = v_ref[:]

        def outer_body(_, carry):
            # Mirror ghosts at the valid edge for the phi gradient pass —
            # the only consumer of unmasked neighbor values.
            maintain1(du_ref)
            maintain1(dv_ref)
            jax.lax.fori_loop(0, n_chunks, prologue_chunk, 0)
            for j in range(inner):
                if j % 2 == 0:
                    bufs = (du_ref, dv_ref, tub_ref, tvb_ref)
                else:
                    bufs = (tub_ref, tvb_ref, du_ref, dv_ref)
                jax.lax.fori_loop(0, n_chunks, make_sweep_chunk(*bufs), 0)
            if inner % 2 == 1:
                du_ref[:] = tub_ref[:]
                dv_ref[:] = tvb_ref[:]
            return carry

        jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body, 0)
        du_ref[:] = du_ref[:] - u_ref[:]
        dv_ref[:] = dv_ref[:] - v_ref[:]

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
            + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            + [pl.BlockSpec(memory_space=pl.ANY)] * n_const
        ),
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[field() for _ in range(8)]
        + [
            pltpu.VMEM((n_const, CHUNK, wb), jnp.float32),
            pltpu.SemaphoreType.DMA((n_const,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT_BYTES),
        cost_estimate=pl.CostEstimate(
            flops=70 * hb * wb * total,
            bytes_accessed=(6 + n_const * cfg.outer_iterations_count) * 4 * hb * wb,
            transcendentals=2 * hb * wb * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(*smem_i, *smem_f, u, v, *consts)


def _relax_bucket_full(
    fx: jax.Array,
    fy: jax.Array,
    ft: jax.Array,
    u: jax.Array,
    v: jax.Array,
    scalars,
    cfg: FlowConfig,
    *,
    tensor: Optional[tuple] = None,
    interpret: bool = False,
    shift_mode: Optional[str] = None,
    _ablate: Optional[str] = None,  # WRONG-MATH timing probes (bench only)
    loop_sweeps: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Unchunked variant: every pass is straight full-field VPU code.

    The 64-row chunk machinery (slab assembly, aligned halo reads,
    streamed constants) existed to keep transients under what round 1
    believed was a 16 MB VMEM ceiling; v5e actually has 128 MB, so for
    buckets up to ~3 MB/field the whole working set — iterates, hoisted
    per-outer fields, constants, and per-pass transients — fits VMEM with
    no chunk loop at all. Stencil shifts are whole-array concats (the
    same `_shifts` semantics as the XLA path, with bucket-edge mirror);
    the valid-edge mirror comes from the once-per-outer ghost
    maintenance, exactly like the chunked variant.

    Additional hoist over the chunked variant: the masked half-point
    diffusivities pw_* (reference: solve_2d.cu:343-346 with the
    free-boundary weights :333-340) are per-outer constants — stored in
    four VMEM fields so each sweep touches ONLY the two iterate fields
    plus center reads.
    """
    import os

    (cw, ch, _, _, div2hx, div2hy, _, _, a_hx2, a_hy2) = scalars[:10]
    hb, wb = u.shape
    assert fx.shape == (hb, wb)
    grey = cfg.data_constancy == DataConstancy.GREY
    if not grey:
        assert tensor is not None and len(tensor) == 5
    consts = (fx, fy, ft) if grey else (fx, fy, ft, *tensor)
    n_const = len(consts)
    inner = cfg.inner_iterations_count
    if shift_mode is None:
        shift_mode = os.environ.get("TPUFLOW_KERNEL_SHIFT", "concat")
    assert shift_mode in ("concat", "roll"), shift_mode
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))

    smem_i = [jnp.asarray(x, jnp.int32).reshape(1, 1) for x in (cw, ch)]
    smem_f = [
        jnp.asarray(x, jnp.float32).reshape(1, 1)
        for x in (div2hx, div2hy, a_hx2, a_hy2)
    ]

    def kernel(*refs):
        (cw_ref, ch_ref, d2x_ref, d2y_ref, ax_ref, ay_ref, u_ref, v_ref) = refs[:8]
        const_refs = refs[8:8 + n_const]      # VMEM-resident
        (du_ref, dv_ref,                      # outputs; hold Tu, Tv in-loop
         tub_ref, tvb_ref,
         pwxp_ref, pwxm_ref, pwyp_ref, pwym_ref,
         a12_ref, a13_ref, a23_ref, dnu_ref, dnv_ref) = refs[8 + n_const:]
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

        def sh_concat(a):
            """center, x+1, x-1, y+1, y-1 with bucket-edge mirror — the
            exact `_shifts` semantics of the XLA path."""
            xp = jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)
            xm = jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)
            yp = jnp.concatenate([a[1:, :], a[-2:-1, :]], axis=0)
            ym = jnp.concatenate([a[1:2, :], a[:-1, :]], axis=0)
            return a, xp, xm, yp, ym

        def sh_roll_raw(a):
            """Shifts as native circular rolls, NO edge handling: the
            wrapped row/column lands only where every consumer is masked
            (sweeps multiply neighbor values by the free-boundary weights,
            which are 0 at row/col 0 and at the valid edge; wrapped values
            are finite, and 0 * finite == 0 exactly)."""
            xp = pltpu.roll(a, wb - 1, 1)  # out[x] = a[x+1] (wrap at wb-1)
            xm = pltpu.roll(a, 1, 1)
            yp = pltpu.roll(a, hb - 1, 0)
            ym = pltpu.roll(a, 1, 0)
            return a, xp, xm, yp, ym

        def sh_roll_fix(a):
            """Rolls + mirror fix at row/col 0 (reference x<0 -> -x, i.e.
            xm[0] = a[1] = xp[0]) — required only where shifted values are
            consumed UNMASKED: the phi gradient pass. Values at the far
            bucket edge stay wrapped (ghost region, never consumed)."""
            c, xp, xm, yp, ym = sh_roll_raw(a)
            xm = jnp.where(xs == 0, xp, xm)
            ym = jnp.where(ys == 0, yp, ym)
            return c, xp, xm, yp, ym

        if shift_mode == "roll":
            sh, sh_sweep = sh_roll_fix, sh_roll_raw
        else:
            sh = sh_sweep = sh_concat

        if _ablate in ("noxshift", "noyshift"):
            # Timing probes: drop one shift direction (WRONG results).
            def _ab(f):
                def g(a):
                    c, xp, xm, yp, ym = f(a)
                    if _ablate == "noxshift":
                        return c, c, c, yp, ym
                    return c, xp, xm, c, c

                return g

            sh, sh_sweep = _ab(sh), _ab(sh_sweep)

        du_ref[:] = u_ref[:]
        dv_ref[:] = v_ref[:]

        def sweep_from_shifts(tu_sh, tv_sh, dst_tu, dst_tv):
            """One Jacobi sweep given the source iterate's shift tuples."""
            stu, stu_xp, stu_xm, stu_yp, stu_ym = tu_sh
            stv, stv_xp, stv_xm, stv_yp, stv_ym = tv_sh
            if _ablate == "shiftonly":
                # Timing probe: shifts + writes with no field reads/math.
                dst_tu[:] = stu_xp + stu_xm + stu_yp + stu_ym
                dst_tv[:] = stv_xp + stv_xm + stv_yp + stv_ym
                return
            u_c = u_ref[:]
            v_c = v_ref[:]
            # _ablate == "recip": denominator RECIPROCALS hoisted per
            # outer (divide -> multiply; ~1-ulp reassociation; bench A/B).
            new_du, new_dv = sweep_update_T(
                (stu_xp, stu_xm, stu_yp, stu_ym),
                (stv_xp, stv_xm, stv_yp, stv_ym),
                u_c, v_c, stv - v_c,
                (pwxp_ref[:], pwxm_ref[:], pwyp_ref[:], pwym_ref[:]),
                a12_ref[:], a13_ref[:], a23_ref[:], dnu_ref[:], dnv_ref[:],
                recip=_ablate == "recip",
            )
            dst_tu[:] = u_c + new_du
            dst_tv[:] = v_c + new_dv

        def prologue(src_tu_ref, src_tv_ref):
            """phi + pw hoists + ksi-scaled tensor hoists for one outer
            iteration; returns the iterate's shift tuples for reuse by
            sweep 0 (the iterate is unchanged between the phi pass and the
            first sweep)."""
            tu_sh = sh(src_tu_ref[:])
            tv_sh = sh(src_tv_ref[:])
            tu, tu_xp, tu_xm, tu_yp, tu_ym = tu_sh
            tv, tv_xp, tv_xm, tv_yp, tv_ym = tv_sh
            dux = (tu_xp - tu_xm) / d2x
            duy = (tu_yp - tu_ym) / d2y
            dvx = (tv_xp - tv_xm) / d2x
            dvy = (tv_yp - tv_ym) / d2y
            grad2 = dux * dux + duy * duy + dvx * dvx + dvy * dvy + e_s2
            if _ablate == "notrans":
                phi = grad2  # probe: drop sqrt+reciprocal (WRONG results)
            else:
                phi = 1.0 / (2.0 * jnp.sqrt(grad2))
            phi = jnp.where(ys == chv, pltpu.roll(phi, 2, 0), phi)
            phi = jnp.where(xs == cwv, pltpu.roll(phi, 2, 1), phi)

            # pw consumers are weight-masked at row/col 0, so raw shifts
            # suffice for phi here (phi's own gradient above used `sh`).
            phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = sh_sweep(phi)
            xp_w = jnp.where(xs < cwv - 1, axv, 0.0)
            xm_w = jnp.where(xs > 0, axv, 0.0)
            yp_w = jnp.where(ys < chv - 1, ayv, 0.0)
            ym_w = jnp.where(ys > 0, ayv, 0.0)
            if _ablate == "nophipw":
                # probe: half-point average dropped (WRONG results)
                pwxp_ref[:] = phi_c * xp_w
                pwxm_ref[:] = phi_c * xm_w
                pwyp_ref[:] = phi_c * yp_w
                pwym_ref[:] = phi_c * ym_w
            else:
                pwxp_ref[:] = (phi_xp_n + phi_c) * 0.5 * xp_w
                pwxm_ref[:] = (phi_xm_n + phi_c) * 0.5 * xm_w
                pwyp_ref[:] = (phi_yp_n + phi_c) * 0.5 * yp_w
                pwym_ref[:] = (phi_ym_n + phi_c) * 0.5 * ym_w
            sumH = pwxp_ref[:] + pwxm_ref[:] + pwyp_ref[:] + pwym_ref[:]

            du_c = tu - u_ref[:]
            dv_c = tv - v_ref[:]
            fxc = const_refs[0][:]
            fyc = const_refs[1][:]
            ftc = const_refs[2][:]
            if _ablate == "noksi":
                ksi = du_c + dv_c  # probe: drop data term (WRONG results)
            else:
                sq = (
                    (fxc * fxc * du_c + fxc * fyc * dv_c + fxc * ftc) * du_c
                    + (fxc * fyc * du_c + fyc * fyc * dv_c + fyc * ftc) * dv_c
                    + (fxc * ftc * du_c + fyc * ftc * dv_c + ftc * ftc)
                )
                if _ablate == "notrans":
                    ksi = jnp.maximum(sq, 0.0) + e_d2
                else:
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
            a12_ref[:] = ksi * J12
            a13_ref[:] = ksi * J13
            a23_ref[:] = ksi * J23
            if _ablate == "recip":
                dnu_ref[:] = 1.0 / (ksi * J11 + sumH)
                dnv_ref[:] = 1.0 / (ksi * J22 + sumH)
            else:
                dnu_ref[:] = ksi * J11 + sumH
                dnv_ref[:] = ksi * J22 + sumH
            return tu_sh, tv_sh

        def outer_pass(src_tu_ref, src_tv_ref, alt_tu_ref, alt_tv_ref):
            """One outer iteration: iterate arrives in (src_*); after
            `inner` sweeps it lives in (alt_*) when inner is odd, else back
            in (src_*)."""
            if _ablate == "sweeponly":
                # Timing probe: outer = 1+inner sweeps on stale hoists
                # (WRONG results; isolates total prologue cost).
                tu_sh0 = sh(src_tu_ref[:])
                tv_sh0 = sh(src_tv_ref[:])
                sweep_from_shifts(tu_sh0, tv_sh0, alt_tu_ref, alt_tv_ref)
                for j in range(1, inner + 1):
                    if j % 2 == 1:
                        src_tu, src_tv = alt_tu_ref, alt_tv_ref
                        dst_tu, dst_tv = src_tu_ref, src_tv_ref
                    else:
                        src_tu, src_tv = src_tu_ref, src_tv_ref
                        dst_tu, dst_tv = alt_tu_ref, alt_tv_ref
                    sweep_from_shifts(
                        sh_sweep(src_tu[:]), sh_sweep(src_tv[:]), dst_tu, dst_tv
                    )
                return
            if _ablate != "nomaintain":
                maintain1(src_tu_ref)
                maintain1(src_tv_ref)
            tu_sh, tv_sh = prologue(src_tu_ref, src_tv_ref)

            # ---- sweeps: only the two iterate fields get shifted ----
            # Sweep 0 reuses the prologue's shift set verbatim (the iterate
            # is unchanged between the phi pass and the first sweep), saving
            # 8 shifted-field materializations per outer iteration.
            sweep_from_shifts(tu_sh, tv_sh, alt_tu_ref, alt_tv_ref)
            for j in range(1, inner):
                if j % 2 == 1:
                    src_tu, src_tv = alt_tu_ref, alt_tv_ref
                    dst_tu, dst_tv = src_tu_ref, src_tv_ref
                else:
                    src_tu, src_tv = src_tu_ref, src_tv_ref
                    dst_tu, dst_tv = alt_tu_ref, alt_tv_ref
                sweep_from_shifts(
                    sh_sweep(src_tu[:]), sh_sweep(src_tv[:]), dst_tu, dst_tv
                )

        if loop_sweeps:
            # Compact-code variant: fori-looped sweep PAIRS with fixed
            # buffer roles (same op sequence as the unrolled path, plus a
            # per-outer copy-back when the sweep count is even after the
            # reused-shift sweep 0). ~4x less kernel code; used to probe
            # whether per-launch cost tracks code size.
            rem = inner - 1
            rem_pairs, tail = rem // 2, rem % 2

            def pair_body(_, c):
                sweep_from_shifts(
                    sh_sweep(tub_ref[:]), sh_sweep(tvb_ref[:]), du_ref, dv_ref
                )
                sweep_from_shifts(
                    sh_sweep(du_ref[:]), sh_sweep(dv_ref[:]), tub_ref, tvb_ref
                )
                return c

            def outer_body_loop(_, c):
                maintain1(du_ref)
                maintain1(dv_ref)
                tu_sh, tv_sh = prologue(du_ref, dv_ref)
                sweep_from_shifts(tu_sh, tv_sh, tub_ref, tvb_ref)  # sweep 0
                if rem_pairs:
                    jax.lax.fori_loop(0, rem_pairs, pair_body, 0)
                if tail:
                    sweep_from_shifts(
                        sh_sweep(tub_ref[:]), sh_sweep(tvb_ref[:]),
                        du_ref, dv_ref,
                    )
                else:
                    du_ref[:] = tub_ref[:]
                    dv_ref[:] = tvb_ref[:]
                return c

            jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body_loop, 0)
            du_ref[:] = du_ref[:] - u_ref[:]
            dv_ref[:] = dv_ref[:] - v_ref[:]
            return

        # The iterate alternates buffers across outers when inner is odd;
        # unroll TWO outer passes per loop iteration with swapped roles
        # instead of copying back — the ping-pong becomes free.
        flips = inner % 2 == 1
        n_outer = cfg.outer_iterations_count

        def outer_pair(_, carry):
            # Only reached when flips (odd inner): each pass swaps the
            # buffer roles, so a PAIR of passes lands the iterate back in
            # du/dv. NOTE: this structure is mirrored in
            # level_fused._tail_body — change both together.
            outer_pass(du_ref, dv_ref, tub_ref, tvb_ref)
            outer_pass(tub_ref, tvb_ref, du_ref, dv_ref)
            return carry

        if flips:
            jax.lax.fori_loop(0, n_outer // 2, outer_pair, 0)
            if n_outer % 2 == 1:
                outer_pass(du_ref, dv_ref, tub_ref, tvb_ref)
                du_ref[:] = tub_ref[:]
                dv_ref[:] = tvb_ref[:]
        else:

            def outer_single(_, carry):
                outer_pass(du_ref, dv_ref, tub_ref, tvb_ref)
                return carry

            jax.lax.fori_loop(0, n_outer, outer_single, 0)

        du_ref[:] = du_ref[:] - u_ref[:]
        dv_ref[:] = dv_ref[:] - v_ref[:]

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
            flops=60 * hb * wb * total,
            bytes_accessed=(6 + n_const) * 4 * hb * wb,
            transcendentals=2 * hb * wb * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(*smem_i, *smem_f, u, v, *consts)

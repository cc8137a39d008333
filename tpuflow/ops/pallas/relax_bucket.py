"""VMEM-resident relaxation kernel for BUCKET shapes (Pallas TPU).

One kernel invocation executes the whole ``outer x (phi/ksi + inner
sweeps)`` relaxation of a pyramid level on a bucket-padded field with a
traced valid extent — the bucketed-engine counterpart of
tpuflow.ops.pallas.relax. One launch replaces the XLA path's ~240 fused
stencil passes per level, and every field stays in VMEM between sweeps.

Bucket regularity makes the kernel Mosaic-friendly where the static-shape
version was not:
  * bucket heights are multiples of CHUNK=64 rows, so the chunk loop is a
    single `fori_loop` whose dynamic slices are provably 8-aligned
    (chunk s = 64*i; halo rows come from aligned 8-row block reads with a
    where-select for the mirrored top edge);
  * ghost mirror maintenance at the traced valid edge uses full-field
    roll+select (pltpu.roll is a native relayout), avoiding unaligned
    dynamic stores.

Scalars (valid extent + h-derived float32 constants) arrive in SMEM.
Grey constancy; gradient/log levels use the XLA path.

Numerics match tpuflow.solver.bucketed._relax_dyn term by term (the same
hoisted formulation); interpret-mode tests pin them together.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.config import DataConstancy, FlowConfig

CHUNK = 64
# 10 persistent fields + chunk transients + full-field maintenance temps.
VMEM_BUDGET_BYTES = 13 * 1024 * 1024
PERSISTENT_ARRAYS = 11


def _field_bytes(hb: int, wb: int) -> int:
    return hb * wb * 4  # bucket dims are already tile-aligned


def relax_bucket_supported(hb: int, wb: int, cfg: FlowConfig) -> bool:
    if cfg.data_constancy != DataConstancy.GREY:
        return False
    if hb % CHUNK != 0 or wb % 128 != 0:
        return False
    return PERSISTENT_ARRAYS * _field_bytes(hb, wb) <= VMEM_BUDGET_BYTES


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
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """(du, dv) after the full relaxation; all inputs at bucket shape.

    Takes the PRE-COMPUTED first derivatives fx, fy, ft (per-level
    constants, reference: solve_2d.cu:311-321) instead of the frames: the
    motion tensor is only ever read at the chunk CENTER, so hoisting the
    derivative computation out of the kernel removes two halo-slab
    assemblies and the tensor arithmetic from every phi/sweep pass with
    bit-identical values.
    """
    (cw, ch, _, _, div2hx, div2hy, div4hx, div4hy, a_hx2, a_hy2) = scalars[:10]
    hb, wb = u.shape
    assert fx.shape == (hb, wb)
    n_chunks = hb // CHUNK
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))

    # Scalars enter SMEM as (1, 1) arrays.
    smem_i = [jnp.asarray(x, jnp.int32).reshape(1, 1) for x in (cw, ch)]
    smem_f = [
        jnp.asarray(x, jnp.float32).reshape(1, 1)
        for x in (div2hx, div2hy, div4hx, div4hy, a_hx2, a_hy2)
    ]

    def kernel(
        cw_ref, ch_ref, d2x_ref, d2y_ref, d4x_ref, d4y_ref, ax_ref, ay_ref,
        fx_ref, fy_ref, ft_ref, u_ref, v_ref,
        du_ref, dv_ref,                      # outputs == iterate "A"
        dub_ref, dvb_ref, phi_ref, ksi_ref,  # scratch "B" + phi/ksi
    ):
        cwv = cw_ref[0, 0]
        chv = ch_ref[0, 0]
        d2x = d2x_ref[0, 0]
        d2y = d2y_ref[0, 0]
        d4x = d4x_ref[0, 0]
        d4y = d4y_ref[0, 0]
        axv = ax_ref[0, 0]
        ayv = ay_ref[0, 0]

        def maintain1(val):
            """Full-field radius-1 mirror ghost maintenance on a VALUE:
            row chv := row chv-2, col cwv := col cwv-2."""
            ys = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (hb, wb), 1)
            rolled_r = pltpu.roll(val, 2, 0)   # row r holds old row r-2
            val = jnp.where(ys == chv, rolled_r, val)
            rolled_c = pltpu.roll(val, 2, 1)
            return jnp.where(xs == cwv, rolled_c, val)

        def slab(ref, i, s):
            """(CHUNK+2, wb) rows [s-1, s+CHUNK] with top mirror halo."""
            top_start = pl.multiple_of(jnp.maximum(s - 8, 0), 8)
            top_block = ref[pl.ds(top_start, 8), :]
            top = jnp.where(i == 0, top_block[1:2, :], top_block[7:8, :])
            bot_start = pl.multiple_of(jnp.minimum(s + CHUNK, hb - 8), 8)
            bot = ref[pl.ds(bot_start, 8), :][0:1, :]
            # For the last chunk `bot` is an arbitrary finite ghost row —
            # outputs there are ghost and the next maintenance rewrites the
            # boundary row, so only finiteness matters.
            return jnp.concatenate([top, ref[pl.ds(s, CHUNK), :], bot], axis=0)

        def shifts(ref, i, s):
            sl = slab(ref, i, s)
            c = sl[1:-1, :]
            return c, _shift_xp(c), _shift_xm(c), sl[2:, :], sl[:-2, :]

        def chunk_masks(s):
            ys = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, wb), 0) + s
            xs = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, wb), 1)
            xp_w = jnp.where(xs < cwv - 1, axv, 0.0)
            xm_w = jnp.where(xs > 0, axv, 0.0)
            yp_w = jnp.where(ys < chv - 1, ayv, 0.0)
            ym_w = jnp.where(ys > 0, ayv, 0.0)
            return xp_w, xm_w, yp_w, ym_w

        def grey_derivs(i, s):
            del i
            return (
                fx_ref[pl.ds(s, CHUNK), :],
                fy_ref[pl.ds(s, CHUNK), :],
                ft_ref[pl.ds(s, CHUNK), :],
            )

        def phi_chunk(i, carry):
            s = pl.multiple_of(i * CHUNK, CHUNK)
            u_c, u_xp, u_xm, u_yp, u_ym = shifts(u_ref, i, s)
            du_c, du_xp, du_xm, du_yp, du_ym = shifts(du_ref, i, s)
            dux = (u_xp - u_xm + du_xp - du_xm) / d2x
            duy = (u_yp - u_ym + du_yp - du_ym) / d2y
            v_c, v_xp, v_xm, v_yp, v_ym = shifts(v_ref, i, s)
            dv_c, dv_xp, dv_xm, dv_yp, dv_ym = shifts(dv_ref, i, s)
            dvx = (v_xp - v_xm + dv_xp - dv_xm) / d2x
            dvy = (v_yp - v_ym + dv_yp - dv_ym) / d2y
            phi_ref[pl.ds(s, CHUNK), :] = 1.0 / (
                2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx + dvy * dvy + e_s2)
            )
            fx, fy, ft = grey_derivs(i, s)
            sq = (
                (fx * fx * du_c + fx * fy * dv_c + fx * ft) * du_c
                + (fx * fy * du_c + fy * fy * dv_c + fy * ft) * dv_c
                + (fx * ft * du_c + fy * ft * dv_c + ft * ft)
            )
            ksi_ref[pl.ds(s, CHUNK), :] = 1.0 / (
                2.0 * jnp.sqrt(jnp.maximum(sq, 0.0) + e_d2)
            )
            return carry

        def make_sweep_chunk(src_du, src_dv, dst_du, dst_dv):
            def sweep_chunk(i, carry):
                s = pl.multiple_of(i * CHUNK, CHUNK)
                phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = shifts(phi_ref, i, s)
                xp_w, xm_w, yp_w, ym_w = chunk_masks(s)
                pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
                pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
                pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
                pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
                sumH = pw_xp + pw_xm + pw_yp + pw_ym

                u_c, u_xp, u_xm, u_yp, u_ym = shifts(u_ref, i, s)
                du_c, du_xp, du_xm, du_yp, du_ym = shifts(src_du, i, s)
                sumU = (
                    pw_xp * (u_xp + du_xp - u_c)
                    + pw_xm * (u_xm + du_xm - u_c)
                    + pw_yp * (u_yp + du_yp - u_c)
                    + pw_ym * (u_ym + du_ym - u_c)
                )
                v_c, v_xp, v_xm, v_yp, v_ym = shifts(v_ref, i, s)
                dv_c, dv_xp, dv_xm, dv_yp, dv_ym = shifts(src_dv, i, s)
                sumV = (
                    pw_xp * (v_xp + dv_xp - v_c)
                    + pw_xm * (v_xm + dv_xm - v_c)
                    + pw_yp * (v_yp + dv_yp - v_c)
                    + pw_ym * (v_ym + dv_ym - v_c)
                )

                fx, fy, ft = grey_derivs(i, s)
                ksi_c = ksi_ref[pl.ds(s, CHUNK), :]
                # Same association as the hoisted XLA path
                # (tpuflow.solver.bucketed._relax_dyn): -a13 - a12*dv + sumU.
                a12 = ksi_c * (fx * fy)
                new_du = (-(ksi_c * (fx * ft)) - a12 * dv_c + sumU) / (
                    ksi_c * (fx * fx) + sumH
                )
                new_dv = (-(ksi_c * (fy * ft)) - a12 * new_du + sumV) / (
                    ksi_c * (fy * fy) + sumH
                )
                dst_du[pl.ds(s, CHUNK), :] = new_du
                dst_dv[pl.ds(s, CHUNK), :] = new_dv
                return carry

            return sweep_chunk

        du_ref[:] = jnp.zeros((hb, wb), jnp.float32)
        dv_ref[:] = jnp.zeros((hb, wb), jnp.float32)

        def outer_body(_, carry):
            jax.lax.fori_loop(0, n_chunks, phi_chunk, 0)
            phi_ref[:] = maintain1(phi_ref[:])
            for j in range(cfg.inner_iterations_count):
                if j % 2 == 0:
                    bufs = (du_ref, dv_ref, dub_ref, dvb_ref)
                else:
                    bufs = (dub_ref, dvb_ref, du_ref, dv_ref)
                jax.lax.fori_loop(0, n_chunks, make_sweep_chunk(*bufs), 0)
                bufs[2][:] = maintain1(bufs[2][:])
                bufs[3][:] = maintain1(bufs[3][:])
            if cfg.inner_iterations_count % 2 == 1:
                du_ref[:] = dub_ref[:]
                dv_ref[:] = dvb_ref[:]
            return carry

        jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body, 0)

    field = lambda: pltpu.VMEM((hb, wb), jnp.float32)  # noqa: E731
    smem = lambda dt: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
    total = cfg.outer_iterations_count * (cfg.inner_iterations_count + 1)
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
            jax.ShapeDtypeStruct((hb, wb), jnp.float32),
        ),
        in_specs=[smem(None)] * 8 + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[field(), field(), field(), field()],
        cost_estimate=pl.CostEstimate(
            flops=80 * hb * wb * total,
            bytes_accessed=6 * 4 * hb * wb,
            transcendentals=2 * hb * wb * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(*smem_i, *smem_f, fx, fy, ft, u, v)

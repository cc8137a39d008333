"""Fused VMEM-resident relaxation kernel (Pallas TPU).

One kernel invocation executes the whole lagged-nonlinearity relaxation for
a pyramid level: ``outer x (phi/ksi update + inner Jacobi sweeps)``
(reference: src/cuda_operations/2d/cuda_operation_solve_2d.cpp:238-300,
src/kernels/solve_2d.cu). All persistent fields live in VMEM for the
duration — the relaxation touches HBM exactly once per input field (DMA in)
and once per output (DMA out), instead of the XLA path's per-sweep
materializations.

Memory/alignment design, driven by three Mosaic constraints discovered the
hard way: (1) a naive vectorized transliteration holds ~37 field-sized
temporaries live and blows the ~16 MB/core VMEM budget at 584x388; (2)
statically-unrolled chunk loops leave ~10 MB of stack because stack slots
are not reused across unrolled bodies; (3) dynamic sublane offsets must be
provably 8-aligned.

  * 10 persistent VMEM fields: f0, f1, u, v (DMA'd from HBM), the
    double-buffered iterate du/dv "A"/"B" (the reference's ping-pong
    buffers, reference: cuda_operation_solve_2d.cpp:288-289), and phi/ksi;
  * each pass processes row chunks: a static HEAD chunk (mirror top halo),
    a `fori_loop` over INTERIOR chunks — each reads one aligned
    (CH+16)-row block at ``i*CH - 8`` and statically subslices its
    (CH+2)-row halo slab — and a static TAIL chunk (mirror bottom halo),
    so only 3 chunk bodies exist in the program and transients stay
    chunk-sized;
  * halo semantics equal the CUDA shared-memory halo tiles with mirror
    boundary (reference: solve_2d.cu:74-134).

Numerics follow tpuflow.ops.solver_ops / the reference kernels expression
by expression; interpret-mode tests pin this kernel to the XLA path.

Applicability: `relax_supported` gates on the 10-field working set fitting
VMEM; larger levels fall back to the XLA path in tpuflow.solver.level.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuflow.config import DataConstancy, FlowConfig

# 10 persistent field-sized arrays + chunk-sized transients, with headroom
# under the ~16 MB/core VMEM budget.
VMEM_BUDGET_BYTES = 13 * 1024 * 1024
PERSISTENT_ARRAYS = 10
CHUNK_ROWS = 64


def _padded_bytes(h: int, w: int) -> int:
    """float32 VMEM footprint of one (h, w) field, padded to (8, 128) tiles."""
    pad_h = -(-h // 8) * 8
    pad_w = -(-w // 128) * 128
    return pad_h * pad_w * 4


def relax_supported(h: int, w: int, cfg: FlowConfig) -> bool:
    if cfg.data_constancy != DataConstancy.GREY:
        # The gradient/log variants stage extra derivative fields; their
        # chunked kernel lands with a later revision — XLA path for now.
        return False
    if h < 4 or w < 4:
        return False
    return PERSISTENT_ARRAYS * _padded_bytes(h, w) <= VMEM_BUDGET_BYTES


def _shift_xp(a):
    """x+1 with mirror boundary (2w-x-2)."""
    return jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)


def _shift_xm(a):
    """x-1 with mirror boundary (-x)."""
    return jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)


def relax_fused(
    f0: jax.Array,
    f1: jax.Array,
    u: jax.Array,
    v: jax.Array,
    hx: float,
    hy: float,
    cfg: FlowConfig,
    *,
    interpret: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """du, dv after the full outer x inner relaxation, as one TPU kernel.

    Grey constancy only (see relax_supported).
    """
    h, w = u.shape
    # Python-float literals, rounded through float32 exactly like the XLA
    # path's jnp.float32(...) constants, folded into the kernel trace.
    F = np.float32
    e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
    e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))
    div2hx = float(F(2.0 * hx))
    div2hy = float(F(2.0 * hy))
    div4hx = float(F(4.0 * hx))
    div4hy = float(F(4.0 * hy))
    alpha_hx2 = float(F(float(cfg.equation_alpha) / (float(hx) * float(hx))))
    alpha_hy2 = float(F(float(cfg.equation_alpha) / (float(hy) * float(hy))))

    CH = CHUNK_ROWS
    # Chunk plan: head [0, head_end); interior i in [1, m): [i*CH, (i+1)*CH);
    # tail [m*CH, h). Interior blocks read rows [i*CH-8, i*CH+CH+8), which
    # requires (i+1)*CH + 8 <= h, i.e. i < m with m = (h-8)//CH.
    if h > CH + 8:
        m = (h - 8) // CH
        head = (0, CH)
        interior = (1, m) if m > 1 else None
        tail = (m * CH, h)
    else:
        m = 0
        head = (0, h)
        interior = None
        tail = None

    def x_edge_masks(rows: int):
        ids = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
        return (
            jnp.where(ids < w - 1, alpha_hx2, 0.0),
            jnp.where(ids > 0, alpha_hx2, 0.0),
        )

    def y_edge_masks(rows: int, s):
        ids = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0) + s
        return (
            jnp.where(ids < h - 1, alpha_hy2, 0.0),
            jnp.where(ids > 0, alpha_hy2, 0.0),
        )

    def static_slab(ref, s: int, e: int):
        """(e-s+2, w) slab with mirror halo rows, static indices."""
        top = ref[1:2, :] if s == 0 else ref[s - 1 : s, :]
        bot = ref[h - 2 : h - 1, :] if e == h else ref[e : e + 1, :]
        return jnp.concatenate([top, ref[s:e, :], bot], axis=0)

    def kernel(
        f0_ref, f1_ref, u_ref, v_ref,            # inputs (VMEM)
        du_ref, dv_ref,                          # outputs == iterate "A"
        dub_ref, dvb_ref, phi_ref, ksi_ref,      # scratch: "B" + phi/ksi
    ):
        def phi_ksi_body(get_slab, put, rows, y_off):
            """phi/ksi for one chunk from the iterate in A
            (reference: solve_2d.cu:43-198)."""

            def shifts(ref):
                sl = get_slab(ref)
                c = sl[1:-1, :]
                return c, _shift_xp(c), _shift_xm(c), sl[2:, :], sl[:-2, :]

            u_c, u_xp, u_xm, u_yp, u_ym = shifts(u_ref)
            du_c, du_xp, du_xm, du_yp, du_ym = shifts(du_ref)
            dux = (u_xp - u_xm + du_xp - du_xm) / div2hx
            duy = (u_yp - u_ym + du_yp - du_ym) / div2hy
            v_c, v_xp, v_xm, v_yp, v_ym = shifts(v_ref)
            dv_c, dv_xp, dv_xm, dv_yp, dv_ym = shifts(dv_ref)
            dvx = (v_xp - v_xm + dv_xp - dv_xm) / div2hx
            dvy = (v_yp - v_ym + dv_yp - dv_ym) / div2hy
            put(
                phi_ref,
                1.0 / (2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx + dvy * dvy + e_s2)),
            )

            a_c, a_xp, a_xm, a_yp, a_ym = shifts(f0_ref)
            b_c, b_xp, b_xm, b_yp, b_ym = shifts(f1_ref)
            fx = (a_xp - a_xm + b_xp - b_xm) / div4hx
            fy = (a_yp - a_ym + b_yp - b_ym) / div4hy
            ft = b_c - a_c
            sq = (
                (fx * fx * du_c + fx * fy * dv_c + fx * ft) * du_c
                + (fx * fy * du_c + fy * fy * dv_c + fy * ft) * dv_c
                + (fx * ft * du_c + fy * ft * dv_c + ft * ft)
            )
            put(ksi_ref, 1.0 / (2.0 * jnp.sqrt(jnp.maximum(sq, 0.0) + e_d2)))

        def sweep_body(src_du, src_dv, dst_du, dst_dv, get_slab, get_rows, put, rows, y_off):
            """One Jacobi sweep chunk src -> dst
            (reference: solve_2d.cu:200-377)."""

            def shifts(ref):
                sl = get_slab(ref)
                c = sl[1:-1, :]
                return c, _shift_xp(c), _shift_xm(c), sl[2:, :], sl[:-2, :]

            phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = shifts(phi_ref)
            phi_xp = (phi_xp_n + phi_c) * 0.5
            phi_xm = (phi_xm_n + phi_c) * 0.5
            phi_yp = (phi_yp_n + phi_c) * 0.5
            phi_ym = (phi_ym_n + phi_c) * 0.5
            xp_w, xm_w = x_edge_masks(rows)
            yp_w, ym_w = y_edge_masks(rows, y_off)

            sumH = xp_w * phi_xp + xm_w * phi_xm + yp_w * phi_yp + ym_w * phi_ym

            u_c, u_xp, u_xm, u_yp, u_ym = shifts(u_ref)
            du_c, du_xp, du_xm, du_yp, du_ym = shifts(src_du)
            sumU = (
                phi_xp * xp_w * (u_xp + du_xp - u_c)
                + phi_xm * xm_w * (u_xm + du_xm - u_c)
                + phi_yp * yp_w * (u_yp + du_yp - u_c)
                + phi_ym * ym_w * (u_ym + du_ym - u_c)
            )
            v_c, v_xp, v_xm, v_yp, v_ym = shifts(v_ref)
            dv_c, dv_xp, dv_xm, dv_yp, dv_ym = shifts(src_dv)
            sumV = (
                phi_xp * xp_w * (v_xp + dv_xp - v_c)
                + phi_xm * xm_w * (v_xm + dv_xm - v_c)
                + phi_yp * yp_w * (v_yp + dv_yp - v_c)
                + phi_ym * ym_w * (v_ym + dv_ym - v_c)
            )

            a_c, a_xp, a_xm, a_yp, a_ym = shifts(f0_ref)
            b_c, b_xp, b_xm, b_yp, b_ym = shifts(f1_ref)
            fx = (a_xp - a_xm + b_xp - b_xm) / div4hx
            fy = (a_yp - a_ym + b_yp - b_ym) / div4hy
            ft = b_c - a_c

            ksi_c = get_rows(ksi_ref)
            # du* then dv* with the fresh du* — the sequential 2x2
            # intra-pixel coupling (reference: solve_2d.cu:361-367).
            new_du = (ksi_c * (-(fx * ft) - (fx * fy) * dv_c) + sumU) / (
                ksi_c * (fx * fx) + sumH
            )
            new_dv = (ksi_c * (-(fy * ft) - (fx * fy) * new_du) + sumV) / (
                ksi_c * (fy * fy) + sumH
            )
            put(dst_du, new_du)
            put(dst_dv, new_dv)

        # --- Chunk plumbing: static head/tail + aligned dynamic interior ---

        def run_pass(fn):
            """fn(get_slab, get_rows, put, rows, y_off) over all chunks."""
            for (s, e) in [c for c in (head, tail) if c is not None]:
                rows = e - s

                def get_slab(ref, s=s, e=e):
                    return static_slab(ref, s, e)

                def get_rows(ref, s=s, e=e):
                    return ref[s:e, :]

                def put(ref, val, s=s, e=e):
                    ref[s:e, :] = val

                fn(get_slab, get_rows, put, rows, s)

            if interior is not None:

                def body(i, carry):
                    sb = pl.multiple_of(i * CH - 8, 8)
                    s = pl.multiple_of(i * CH, CH)

                    def get_slab(ref):
                        block = ref[pl.ds(sb, CH + 16), :]
                        return block[7 : CH + 9, :]

                    def get_rows(ref):
                        return ref[pl.ds(s, CH), :]

                    def put(ref, val):
                        ref[pl.ds(s, CH), :] = val

                    fn(get_slab, get_rows, put, CH, s)
                    return carry

                jax.lax.fori_loop(interior[0], interior[1], body, 0)

        du_ref[:] = jnp.zeros((h, w), jnp.float32)
        dv_ref[:] = jnp.zeros((h, w), jnp.float32)

        def outer_body(_, carry):
            def phi_pass(get_slab, get_rows, put, rows, y_off):
                phi_ksi_body(get_slab, put, rows, y_off)

            run_pass(phi_pass)
            # Unrolled inner sweeps alternating A->B->A so refs are static.
            for j in range(cfg.inner_iterations_count):
                if j % 2 == 0:
                    bufs = (du_ref, dv_ref, dub_ref, dvb_ref)
                else:
                    bufs = (dub_ref, dvb_ref, du_ref, dv_ref)

                def sweep_pass(get_slab, get_rows, put, rows, y_off, bufs=bufs):
                    sweep_body(*bufs, get_slab, get_rows, put, rows, y_off)

                run_pass(sweep_pass)
            if cfg.inner_iterations_count % 2 == 1:
                # State must be back in A at the outer boundary.
                du_ref[:] = dub_ref[:]
                dv_ref[:] = dvb_ref[:]
            return carry

        jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body, 0)

    flops_sweep = 80 * h * w
    total_sweeps = cfg.outer_iterations_count * (cfg.inner_iterations_count + 1)
    field = lambda: pltpu.VMEM((h, w), jnp.float32)  # noqa: E731
    return pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.float32),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            field(), field(),                    # du/dv "B"
            field(), field(),                    # phi, ksi
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops_sweep * total_sweeps,
            bytes_accessed=6 * 4 * h * w,
            transcendentals=2 * h * w * cfg.outer_iterations_count,
        ),
        interpret=interpret,
    )(f0, f1, u, v)

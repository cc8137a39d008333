"""Speed-of-light spatial sharding: Pallas relaxation with IN-KERNEL
ring-RDMA halo exchange (the successor design named in halo.py:40-44).

The explicit shard_map path (tpuflow.parallel.halo) exchanges one widened
(inner+1)-row halo per outer iteration via `ppermute` and runs the local
block in XLA — the right cost point when the exchange must round-trip
through a collective anyway. This module moves the WHOLE per-shard
relaxation into one Pallas kernel per shard, with the halo exchange
itself running in-kernel via `pltpu.make_async_remote_copy` ring RDMA:

  * per-LEVEL constants (u, v, fx, fy, ft [, J*]) exchange their
    (inner+1)-row halos ONCE at kernel start;
  * per OUTER iteration only the du/dv iterate halos move — two fields,
    one message per direction per neighbor, riding ICI directly from
    VMEM with no XLA collective round trip;
  * every iterate stays VMEM-resident across all outer x (1+inner)
    passes — the same property that makes the unsharded kernel fast,
    which the XLA local block gives up (round-2 verdict item #5);
  * neighbor synchronization is the standard local barrier (REGULAR
    semaphore signaled to both ring neighbors) between the compute of
    one outer and the sends of the next, so a send can never land in a
    halo a neighbor is still reading (or overwrite one mid-maintenance).

The ring is CLOSED (shard n-1 wraps to shard 0) so the semaphore
accounting is uniform; the wrapped messages land in the global-edge
halos, which are immediately overwritten by the boundary fill (zeros +
the adjacent mirror row — the same semantics as halo._exchange's cut
ring). Boundary math matches tpuflow.parallel.halo: free-boundary
weights at GLOBAL coordinates, valid-edge mirror maintenance as a
where-select on global row index, redundant halo compute whose margin
the masks keep out of valid pixels (stencil contract:
reference src/kernels/solve_2d.cu:343-359).

The relaxation core is the du-iterate formulation (ops/pallas/relax_du):
only du/dv need the per-outer exchange, u/v are consumed once per outer
by the prologue, and the per-outer cu/cv folds keep the sweep reads to
the iterate + five term fields. Numerics vs the unsharded engine are
bounded by the same parity tests as the other kernels (1-ulp-class
reassociations amplified by the lagged nonlinearity).

Validated end-to-end on the 8-virtual-device CPU mesh in Pallas
interpret mode (`pltpu.InterpretParams` executes the remote copies and
semaphores across the mesh); on real multi-chip hardware the same code
lowers to Mosaic with ICI RDMA. tools/report_scaling.py drives it.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.pallas.relax_bucket import VMEM_BUDGET_BYTES, VMEM_LIMIT_BYTES
from tpuflow.ops.pallas.relax_du import _derive_pw_xm
from tpuflow.ops.sweep_core import sweep_update_du
from tpuflow.solver.bucketed import level_constants

# collective_id namespace for this kernel family (arbitrary, must be
# consistent across the shards of one launch).
_COLLECTIVE_ID = 11


def _halo_rows(cfg: FlowConfig, k_outer: int = 1) -> int:
    """Exchange width: k_outer*(inner+1) rows of true dependence (one
    exchange feeds k_outer fused outer iterations, parallel/halo.py
    semantics), rounded up to the 8-sublane tile so every padded-buffer
    offset stays tile-aligned (the extra rows just widen the
    redundant-compute margin)."""
    return -(-(k_outer * (cfg.inner_iterations_count + 1)) // 8) * 8


def kernel_halo_applicable(hb: int, wb: int, n_y: int, cfg: FlowConfig,
                           k_outer: int | None = None) -> bool:
    """Same shard-size rules as halo.halo_applicable plus the VMEM gate
    for the padded per-shard working set (~27 padded fields)."""
    from tpuflow.utils.envcache import halo_k_outer

    k = k_outer if k_outer is not None else halo_k_outer()
    if cfg.inner_iterations_count < 1:
        return False
    halo = _halo_rows(cfg, k)
    if hb % n_y != 0 or wb % 128 != 0:
        return False
    s_rows = hb // n_y
    if s_rows % 8 != 0 or s_rows < max(halo, 16):
        return False
    n_cf = 5 if cfg.data_constancy == DataConstancy.GREY else 10
    pad_rows = s_rows + 2 * halo
    n_fields = n_cf + 4 + 7 + 16  # consts + iterate + terms + transients
    return n_fields * pad_rows * wb * 4 <= VMEM_BUDGET_BYTES


def relax_sharded_kernel(
    f0_l, f1_w, u, v, sc, cfg: FlowConfig, mesh, y_axis: str = "y",
    k_outer: int | None = None, *, interpret: bool | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Drop-in twin of halo.relax_sharded: outer x inner relaxation on
    bucket arrays with rows sharded over ``y_axis``, halo exchange via
    in-kernel ring RDMA. Returns (du, dv) at bucket shape.

    k_outer > 1 (default: envcache.halo_k_outer()) fuses k outer
    iterations per RDMA exchange with a k*(inner+1)-row halo and
    redundant in-margin recompute — identical valid-region numerics for
    any k (see parallel.halo.relax_sharded). The in-block upkeep is the
    unchanged per-outer maintain1 + top_fill (which re-imposes the
    global-top mirror row without an exchange).

    interpret=None auto-selects: Mosaic on a TPU mesh, Pallas interpret
    mode (which executes the remote copies + semaphores across the
    virtual devices) elsewhere."""
    from jax import shard_map

    from tpuflow.utils.envcache import halo_k_outer

    if interpret is None:
        interpret = mesh.devices.flat[0].platform != "tpu"

    k_fuse = k_outer if k_outer is not None else halo_k_outer()
    (cw, ch, _, _, div2hx, div2hy, _, _, a_hx2, a_hy2) = sc[:10]
    hb, wb = u.shape
    n_y = mesh.shape[y_axis]
    halo = _halo_rows(cfg, k_fuse)
    s_rows = hb // n_y
    grey = cfg.data_constancy == DataConstancy.GREY

    fx, fy, ft, (J11, J22, J12, J13, J23) = level_constants(f0_l, f1_w, sc, cfg)
    consts = (u, v, fx, fy, ft) if grey else (
        u, v, fx, fy, ft, J11, J22, J12, J13, J23)
    n_cf = len(consts)

    smem_i = [jnp.asarray(x, jnp.int32).reshape(1, 1) for x in (cw, ch)]
    smem_f = [
        jnp.asarray(x, jnp.float32).reshape(1, 1)
        for x in (div2hx, div2hy, a_hx2, a_hy2)
    ]

    def local_fn(*local_consts):
        return _pallas_shard(local_consts)

    def _pallas_shard(local_consts):
        pad_rows = s_rows + 2 * halo
        F = np.float32
        e_s2 = float(F(cfg.equation_smoothness) * F(cfg.equation_smoothness))
        e_d2 = float(F(cfg.equation_data) * F(cfg.equation_data))
        inner = cfg.inner_iterations_count

        def kernel(*refs):
            (cw_ref, ch_ref, d2x_ref, d2y_ref, ax_ref, ay_ref) = refs[:6]
            in_refs = refs[6:6 + n_cf]
            du_out, dv_out = refs[6 + n_cf:8 + n_cf]
            scr = refs[8 + n_cf:]
            cpad = scr[:n_cf]                      # padded consts
            (dup, dvp, dubp, dvbp,
             pwxp_ref, pwyp_ref,
             a12_ref, bu_ref, bv_ref, dnu_ref, dnv_ref,
             bar_sem, csend, crecv, isend, irecv) = scr[n_cf:]
            cwv = cw_ref[0, 0]
            chv = ch_ref[0, 0]
            d2x = d2x_ref[0, 0]
            d2y = d2y_ref[0, 0]
            axv = ax_ref[0, 0]
            ayv = ay_ref[0, 0]

            my = jax.lax.axis_index(y_axis)
            nxt = jax.lax.rem(my + 1, n_y)
            prv = jax.lax.rem(my + n_y - 1, n_y)
            # MESH-type device ids as {y_axis: idx} dicts: the lowering
            # fills every OTHER mesh axis with this device's own
            # coordinate (LOGICAL raises NotImplementedError for >1
            # named axis), so the same kernel runs on a pure-sp 1-D
            # mesh and on a dp x sp 2-D mesh unchanged.
            nxt_id = {y_axis: nxt}
            prv_id = {y_axis: prv}
            start = my * s_rows                    # global row of local row 0
            is_top = my == 0
            is_bot = my == n_y - 1

            ys = jax.lax.broadcasted_iota(jnp.int32, (pad_rows, wb), 0)
            xs = jax.lax.broadcasted_iota(jnp.int32, (pad_rows, wb), 1)
            gys = ys + start - halo                # global row per padded row

            def barrier():
                """Local barrier with both ring neighbors."""
                pltpu.semaphore_signal(
                    bar_sem, inc=1, device_id=nxt_id,
                    device_id_type=pltpu.DeviceIdType.MESH)
                pltpu.semaphore_signal(
                    bar_sem, inc=1, device_id=prv_id,
                    device_id_type=pltpu.DeviceIdType.MESH)
                pltpu.semaphore_wait(bar_sem, 2)

            def exchange(bufs, send_sems, recv_sems):
                """Closed-ring halo exchange for a list of padded
                buffers: my bottom local rows -> next shard's TOP halo,
                my top local rows -> prev shard's BOTTOM halo."""
                rdmas = []
                for k, buf in enumerate(bufs):
                    rdmas.append(pltpu.make_async_remote_copy(
                        src_ref=buf.at[pl.ds(s_rows, halo), :],     # local bottom
                        dst_ref=buf.at[0:halo, :],                  # their top halo
                        send_sem=send_sems.at[0, k],
                        recv_sem=recv_sems.at[0, k],
                        device_id=nxt_id,
                        device_id_type=pltpu.DeviceIdType.MESH))
                    rdmas.append(pltpu.make_async_remote_copy(
                        src_ref=buf.at[pl.ds(halo, halo), :],       # local top
                        dst_ref=buf.at[pl.ds(halo + s_rows, halo), :],
                        send_sem=send_sems.at[1, k],
                        recv_sem=recv_sems.at[1, k],
                        device_id=prv_id,
                        device_id_type=pltpu.DeviceIdType.MESH))
                for r in rdmas:
                    r.start()
                for r in rdmas:
                    r.wait()

            def top_fill(buf, mirror: bool):
                """Overwrite the global-top shard's top halo (the closed
                ring delivered wrapped rows there): zeros, plus the
                adjacent mirror row when the consumer is the phi
                gradient's T (halo._exchange's top_fill semantics)."""
                val = buf[0:halo, :]
                zer = jnp.zeros_like(val)
                if mirror:
                    # adjacent halo row := local row 1 (global mirror of
                    # row -1); only that row is consumed unmasked.
                    adj = buf[halo + 1:halo + 2, :]
                    zer = jnp.concatenate([zer[:-1, :], adj], axis=0)
                buf[0:halo, :] = jnp.where(is_top, zer, val)

            # ---- init: interiors + deterministic edge halos ----------
            for k in range(n_cf):
                cpad[k][0:halo, :] = jnp.zeros((halo, wb), jnp.float32)
                cpad[k][pl.ds(halo, s_rows), :] = in_refs[k][:]
                cpad[k][pl.ds(halo + s_rows, halo), :] = (
                    jnp.zeros((halo, wb), jnp.float32))
            barrier()                      # halo regions ready everywhere
            exchange(cpad, csend, crecv)
            top_fill(cpad[0], True)        # u: adjacent mirror row
            top_fill(cpad[1], True)        # v
            for k in range(2, n_cf):
                top_fill(cpad[k], False)

            dup[:] = jnp.zeros((pad_rows, wb), jnp.float32)
            dvp[:] = jnp.zeros((pad_rows, wb), jnp.float32)

            def sh(a):
                xp = jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)
                xm = jnp.concatenate([a[:, 1:2], a[:, :-1]], axis=1)
                yp = jnp.concatenate([a[1:, :], a[-2:-1, :]], axis=0)
                ym = jnp.concatenate([a[1:2, :], a[:-1, :]], axis=0)
                return a, xp, xm, yp, ym

            def maintain1(ref):
                """Valid-edge mirror via GLOBAL row index (fires only on
                the shard(s) whose padded rows cover the ghost line)."""
                val = ref[:]
                val = jnp.where(gys == chv, pltpu.roll(val, 2, 0), val)
                ref[:] = jnp.where(xs == cwv, pltpu.roll(val, 2, 1), val)

            u_pad = cpad[0]
            v_pad = cpad[1]

            def prologue():
                du_sh = sh(dup[:])
                dv_sh = sh(dvp[:])
                du_c, du_xp, du_xm, du_yp, du_ym = du_sh
                dv_c, dv_xp, dv_xm, dv_yp, dv_ym = dv_sh
                u_c, u_xp, u_xm, u_yp, u_ym = sh(u_pad[:])
                v_c, v_xp, v_xm, v_yp, v_ym = sh(v_pad[:])
                dux = (u_xp - u_xm + du_xp - du_xm) / d2x
                duy = (u_yp - u_ym + du_yp - du_ym) / d2y
                dvx = (v_xp - v_xm + dv_xp - dv_xm) / d2x
                dvy = (v_yp - v_ym + dv_yp - dv_ym) / d2y
                phi = 1.0 / (
                    2.0 * jnp.sqrt(dux * dux + duy * duy + dvx * dvx
                                   + dvy * dvy + e_s2)
                )
                phi_c, phi_xp_n, phi_xm_n, phi_yp_n, phi_ym_n = sh(phi)
                xp_w = jnp.where(xs < cwv - 1, axv, 0.0)
                xm_w = jnp.where(xs > 0, axv, 0.0)
                yp_w = jnp.where((gys < chv - 1) & (gys >= 0), ayv, 0.0)
                ym_w = jnp.where(gys > 0, ayv, 0.0)
                pw_xp = (phi_xp_n + phi_c) * 0.5 * xp_w
                pw_xm = (phi_xm_n + phi_c) * 0.5 * xm_w
                pw_yp = (phi_yp_n + phi_c) * 0.5 * yp_w
                pw_ym = (phi_ym_n + phi_c) * 0.5 * ym_w
                pwxp_ref[:] = pw_xp
                pwyp_ref[:] = pw_yp
                sumH = pw_xp + pw_xm + pw_yp + pw_ym

                fxc = cpad[2][:]
                fyc = cpad[3][:]
                ftc = cpad[4][:]
                sq = (
                    (fxc * fxc * du_c + fxc * fyc * dv_c + fxc * ftc) * du_c
                    + (fxc * fyc * du_c + fyc * fyc * dv_c + fyc * ftc) * dv_c
                    + (fxc * ftc * du_c + fyc * ftc * dv_c + ftc * ftc)
                )
                ksi = 1.0 / (2.0 * jnp.sqrt(jnp.maximum(sq, 0.0) + e_d2))
                if grey:
                    J11l, J22l = fxc * fxc, fyc * fyc
                    J12l, J13l, J23l = fxc * fyc, fxc * ftc, fyc * ftc
                else:
                    J11l, J22l = cpad[5][:], cpad[6][:]
                    J12l, J13l, J23l = cpad[7][:], cpad[8][:], cpad[9][:]
                cu = (
                    pw_xp * (u_xp - u_c) + pw_xm * (u_xm - u_c)
                    + pw_yp * (u_yp - u_c) + pw_ym * (u_ym - u_c)
                )
                cv = (
                    pw_xp * (v_xp - v_c) + pw_xm * (v_xm - v_c)
                    + pw_yp * (v_yp - v_c) + pw_ym * (v_ym - v_c)
                )
                a12_ref[:] = ksi * J12l
                bu_ref[:] = -(ksi * J13l) + cu
                bv_ref[:] = -(ksi * J23l) + cv
                dnu_ref[:] = ksi * J11l + sumH
                dnv_ref[:] = ksi * J22l + sumH
                return du_sh, dv_sh

            def sweep(du_sh, dv_sh, dst_du, dst_dv):
                sdu_c, sdu_xp, sdu_xm, sdu_yp, sdu_ym = du_sh
                sdv_c, sdv_xp, sdv_xm, sdv_yp, sdv_ym = dv_sh
                pw_xp = pwxp_ref[:]
                pw_yp = pwyp_ref[:]
                pw_xm = _derive_pw_xm(pw_xp, xs)
                pw_ym = jnp.where(
                    gys == 0, jnp.float32(0.0),
                    jnp.concatenate([pw_yp[:1, :], pw_yp[:-1, :]], axis=0))
                new_du, new_dv = sweep_update_du(
                    (sdu_xp, sdu_xm, sdu_yp, sdu_ym),
                    (sdv_xp, sdv_xm, sdv_yp, sdv_ym),
                    sdv_c, (pw_xp, pw_xm, pw_yp, pw_ym),
                    a12_ref[:], bu_ref[:], bv_ref[:], dnu_ref[:], dnv_ref[:],
                )
                dst_du[:] = new_du
                dst_dv[:] = new_dv

            def outer_body(i, carry):
                maintain1(dup)
                maintain1(dvp)

                @pl.when(jax.lax.rem(i, k_fuse) == 0)
                def _exchange_block():
                    # Once per k_fuse fused outers (uniform predicate:
                    # i and k_fuse agree across shards, so the barrier
                    # and DMA counts stay consistent ring-wide).
                    barrier()              # neighbors done reading halos
                    exchange([dup, dvp], isend, irecv)

                # Per-outer boundary upkeep (exchange or not): zeros +
                # the adjacent mirror row in the global-top halo.
                top_fill(dup, True)
                top_fill(dvp, True)
                du_sh, dv_sh = prologue()
                sweep(du_sh, dv_sh, dubp, dvbp)
                for j in range(1, inner):
                    if j % 2 == 1:
                        src = (dubp, dvbp)
                        dst = (dup, dvp)
                    else:
                        src = (dup, dvp)
                        dst = (dubp, dvbp)
                    sweep(sh(src[0][:]), sh(src[1][:]), *dst)
                if inner % 2 == 1:
                    dup[:] = dubp[:]
                    dvp[:] = dvbp[:]
                return carry

            jax.lax.fori_loop(0, cfg.outer_iterations_count, outer_body, 0)
            du_out[:] = dup[pl.ds(halo, s_rows), :]
            dv_out[:] = dvp[pl.ds(halo, s_rows), :]

        pfield = lambda: pltpu.VMEM((pad_rows, wb), jnp.float32)  # noqa: E731
        smem = lambda: pl.BlockSpec(memory_space=pltpu.SMEM)  # noqa: E731
        return pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((s_rows, wb), jnp.float32),
                jax.ShapeDtypeStruct((s_rows, wb), jnp.float32),
            ),
            in_specs=(
                [smem()] * 6
                + [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_cf
            ),
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pfield() for _ in range(n_cf + 11)]
            + [
                pltpu.SemaphoreType.REGULAR,          # barrier
                pltpu.SemaphoreType.DMA((2, n_cf)),   # const send
                pltpu.SemaphoreType.DMA((2, n_cf)),   # const recv
                pltpu.SemaphoreType.DMA((2, 2)),      # iterate send
                pltpu.SemaphoreType.DMA((2, 2)),      # iterate recv
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=VMEM_LIMIT_BYTES,
                collective_id=_COLLECTIVE_ID,
                has_side_effects=True,
            ),
            interpret=pltpu.InterpretParams() if interpret else False,
        )(*smem_i, *smem_f, *local_consts)

    spec = P(y_axis, None)
    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec,) * n_cf,
        out_specs=(spec, spec),
        check_vma=False,
    )
    return sharded(*consts)

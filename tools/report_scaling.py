#!/usr/bin/env python
"""Scaling report: Mpix/s at 1 chip vs N chips (dp and sp), one JSON line.

The BASELINE.md target is >=80% linear Mpix/s scaling 1 chip -> N. No
multi-chip hardware exists in the build environment (everything
distributed is validated on the 8-virtual-device CPU mesh), so this tool
is the READY-TO-RUN harness for when it does: point it at a real slice
and it prints the table the target asks for.

  dp  — throughput scaling: a batch of B = N independent frame pairs,
        one per chip ('data' axis), vs N sequential single-chip solves.
  sp  — latency scaling: ONE pair with image rows sharded over 'y'
        (explicit ring-halo relaxation), vs the single-chip solve.

Usage:  python tools/report_scaling.py [N]
        (defaults to all visible devices; runs on CPU with
        XLA_FLAGS=--xla_force_host_platform_device_count=8 for a smoke
        test, but CPU numbers are not meaningful for the target)

        python tools/report_scaling.py --project [fine_ms w h]
        No hardware needed: prints the ANALYTIC sp projection
        (tpuflow.parallel.model — per-level collective volume x ICI
        cost over the real applicability gates) for the rub default
        breakdown and, with args, an arbitrary frame size whose fine
        levels cost fine_ms total on one chip. This is the estimate the
        >=80% target is judged against until a real slice exists.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuflow.config import FlowConfig  # noqa: E402
from tpuflow.io import read_raw_u8  # noqa: E402


def fence(x):
    return np.asarray(x)


def time_best(fn, reps=4, k=8):
    """Per-call seconds via the K-SLOPE with arm-order rotation — NOT
    divide-by-K, which leaves (fence + result download)/K in every number
    (the CLAUDE.md measurement trap that fired three times; round-4
    code-review caught this tool still using it)."""
    assert k >= 2, f"K-slope needs two distinct chain lengths (k={k})"
    k_lo, k_hi = max(1, k // 4), k
    ts = {k_lo: [], k_hi: []}
    for r in range(reps):
        order = (k_lo, k_hi) if r % 2 == 0 else (k_hi, k_lo)
        for kk in order:
            t0 = time.perf_counter()
            out = None
            for _ in range(kk):
                out = fn()
            fence(out[0])
            ts[kk].append(time.perf_counter() - t0)
    med = {kk: sorted(v)[len(v) // 2] for kk, v in ts.items()}
    return (med[k_hi] - med[k_lo]) / (k_hi - k_lo)


def project():
    from tpuflow.config import FlowConfig
    from tpuflow.parallel.model import (
        best_k,
        project_schedule,
        project_schedule_auto,
        project_schedule_hybrid,
        project_sensitivity,
        rub_default_levels,
    )

    cfg = FlowConfig()
    pos = [a for a in sys.argv[2:] if not a.startswith("-")]
    cases = [("rub", rub_default_levels())]
    if pos:
        fine_ms, w, h = float(pos[0]), int(pos[1]), int(pos[2])
        cases.append((
            f"{w}x{h}",
            rub_default_levels(fine_ms_total=fine_ms, w=w, h=h),
        ))
    out = []
    for name, levels in cases:
        for n_y in (2, 4, 8):
            for path in ("explicit", "kernel"):
                row = project_schedule(levels, cfg, n_y, path)   # k=1
                row["case"] = name
                out.append(row)
                row = best_k(levels, cfg, n_y, path)             # best fixed k
                row["case"] = name
                row["path"] = f"{path}+best_k"
                out.append(row)
            row = project_schedule_auto(levels, cfg, n_y)        # per-level router
            row["case"] = name
            out.append(row)
            row = project_schedule_hybrid(levels, cfg, n_y)      # dp x sp hybrid
            row["case"] = name
            out.append(row)
            row = project_sensitivity(levels, cfg, n_y)          # ICI-knob bound
            row["case"] = name
            row["path"] = "sensitivity"
            out.append(row)
    print(json.dumps(out, indent=1))


def main():
    if "--project" in sys.argv:
        project()
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else len(jax.devices())
    devices = jax.devices()[:n]
    platform = devices[0].platform

    from tpuflow.parallel import make_mesh
    from tpuflow.solver.bucketed import (
        compute_flow_bucketed_async,
        compute_flow_bucketed_batch,
        compute_flow_bucketed_sharded,
    )

    f0 = read_raw_u8(os.path.join("/root/reference/data", "rub1.raw"), 584, 388)
    f1 = read_raw_u8(os.path.join("/root/reference/data", "rub2.raw"), 584, 388)
    h, w = f0.shape
    mpix = h * w / 1e6
    cfg = FlowConfig()

    # 1 chip, single stream.
    fa = jnp.asarray(f0)
    fb = jnp.asarray(f1)
    fence(compute_flow_bucketed_async(fa, fb, cfg)[0])  # warm
    t1 = time_best(lambda: compute_flow_bucketed_async(fa, fb, cfg))
    chip1 = mpix / t1

    report = {
        "platform": platform,
        "n_devices": n,
        "mpix_s_1chip": round(chip1, 3),
    }

    if n > 1:
        # dp: one pair per chip.
        mesh = make_mesh((n, 1), devices=devices)
        F0 = jnp.broadcast_to(fa, (n, h, w))
        F1 = jnp.broadcast_to(fb, (n, h, w))
        fence(compute_flow_bucketed_batch(F0, F1, cfg, mesh=mesh)[0])
        td = time_best(
            lambda: compute_flow_bucketed_batch(F0, F1, cfg, mesh=mesh), k=4
        )
        report["mpix_s_dp"] = round(n * mpix / td, 3)
        report["dp_efficiency"] = round(n * mpix / td / (n * chip1), 3)

        # sp: rows of one pair over 'y' (explicit ring halo).
        mesh_y = make_mesh((1, n), devices=devices)
        fence(compute_flow_bucketed_sharded(
            fa, fb, cfg, mesh=mesh_y, halo="explicit")[0])
        ts = time_best(
            lambda: compute_flow_bucketed_sharded(
                fa, fb, cfg, mesh=mesh_y, halo="explicit"), k=4
        )
        report["mpix_s_sp"] = round(mpix / ts, 3)
        report["sp_speedup"] = round(t1 / ts, 3)

        # sp, in-kernel ring-RDMA halo (parallel/halo_kernel).
        fence(compute_flow_bucketed_sharded(
            fa, fb, cfg, mesh=mesh_y, halo="kernel")[0])
        tk = time_best(
            lambda: compute_flow_bucketed_sharded(
                fa, fb, cfg, mesh=mesh_y, halo="kernel"), k=4
        )
        report["mpix_s_sp_kernel"] = round(mpix / tk, 3)
        report["sp_kernel_speedup"] = round(t1 / tk, 3)

        # sp, cost-based per-level router (replicate/explicit@k/kernel@k).
        fence(compute_flow_bucketed_sharded(
            fa, fb, cfg, mesh=mesh_y, halo="auto")[0])
        ta = time_best(
            lambda: compute_flow_bucketed_sharded(
                fa, fb, cfg, mesh=mesh_y, halo="auto"), k=4
        )
        report["mpix_s_sp_auto"] = round(mpix / ta, 3)
        report["sp_auto_speedup"] = round(t1 / ta, 3)

        # dp x sp hybrid: B = n pairs, coarse tails data-parallel then
        # fine levels row-sharded pair-by-pair (parallel/hybrid.py).
        from tpuflow.parallel.hybrid import compute_flow_bucketed_hybrid

        mesh_h = make_mesh((1, n), devices=devices)
        Fh0 = jnp.broadcast_to(fa, (n, h, w))
        Fh1 = jnp.broadcast_to(fb, (n, h, w))
        fence(compute_flow_bucketed_hybrid(Fh0, Fh1, cfg, mesh=mesh_h)[0])
        th = time_best(
            lambda: compute_flow_bucketed_hybrid(Fh0, Fh1, cfg, mesh=mesh_h),
            k=4,
        )
        report["mpix_s_hybrid"] = round(n * mpix / th, 3)
        report["hybrid_efficiency"] = round(n * mpix / th / (n * chip1), 3)

    print(json.dumps(report))


if __name__ == "__main__":
    main()

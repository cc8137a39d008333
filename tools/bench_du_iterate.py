#!/usr/bin/env python
"""On-chip A/B: du-iterate kernels vs the production T-iterate kernels.

Round-3 probe for the VMEM-traffic floor claim (BASELINE.md): the
du-iterate sweep touches 11 fields + 2 derived shifts per pass vs the
T-iterate full variant's 13 reads — if the sweep is traffic-bound as
measured (shiftonly probe 86%), the full-variant A/B should show ~1.1x;
the chunked A/B at the 1080p fine bucket tests lever #1's expected ~1.3x.

Method (CLAUDE.md measurement rules): in-jit chains of K_lo and K_hi
relaxations (fed back via u + 0.001*du to defeat CSE), one fence each;
the per-level time is the K-SLOPE of the round-median totals, which
cancels the fence exactly. The original version of this tool divided a
single fenced total by K=8 — that left ~6 ms of fence in every per-call
number and inflated the recorded rub-fine values ~7x (the fence trap,
third occurrence; true T-full cost is ~1.0 ms/level, not 6.9).
Interleaved rounds A/B/A/B against pool drift.

Usage: python tools/bench_du_iterate.py [rub|1080p|4k] [K_lo K_hi rounds]
"""

import os
import sys
import time

from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpuflow.config import FlowConfig  # noqa: E402
from tpuflow.solver.bucketed import (  # noqa: E402
    LevelScalars, level_constants, maintain_mirror1, maintain_mirror2,
    _relax_dyn,
)
from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused  # noqa: E402
from tpuflow.ops.pallas.relax_du import relax_du_fused  # noqa: E402


def make_case(name):
    if name == "rub":
        # rub finest-level trimmed bucket.
        hb, wb, cw, ch = 392, 640, 584, 388
        modes = [("T-full", "T", "full"), ("du-full", "du", "full"),
                 ("du-full-pw4", "du4", "full")]
    elif name == "1080p":
        hb, wb, cw, ch = 1088, 2048, 1920, 1080
        modes = [("T-chunked", "T", "chunked"), ("du-chunked", "du", "chunked")]
    elif name == "4k":
        hb, wb, cw, ch = 2176, 3968, 3840, 2160
        modes = [("xla", "xla", None), ("du-streamed", "du", "streamed")]
    else:
        raise SystemExit(f"unknown case {name}")
    return hb, wb, cw, ch, modes


def main():
    case = sys.argv[1] if len(sys.argv) > 1 else "rub"
    k_lo = int(sys.argv[2]) if len(sys.argv) > 2 else (1 if case == "4k" else 4)
    k_hi = int(sys.argv[3]) if len(sys.argv) > 3 else (3 if case == "4k" else 16)
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 6
    hb, wb, cw, ch, modes = make_case(case)
    cfg = FlowConfig()  # full default 40x5 schedule
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, cfg.equation_alpha,
                           cw, ch, cw, ch).tree()

    rng = np.random.default_rng(0)
    f0 = rng.random((hb, wb), np.float32) * 200
    f1 = rng.random((hb, wb), np.float32) * 200
    u0 = (rng.random((hb, wb), np.float32) - 0.5) * 2
    v0 = (rng.random((hb, wb), np.float32) - 0.5) * 2
    f0 = jnp.asarray(np.asarray(maintain_mirror1(f0, cw, ch)))
    f1 = jnp.asarray(np.asarray(maintain_mirror1(f1, cw, ch)))
    u0 = jnp.asarray(np.asarray(maintain_mirror2(u0, cw, ch)))
    v0 = jnp.asarray(np.asarray(maintain_mirror2(v0, cw, ch)))

    fx, fy, ft, J = level_constants(f0, f1, sc, cfg)
    tensor = None if cfg.data_constancy.name == "GREY" else J

    from functools import partial

    def chain(kind, mode):
        def relax(u, v):
            if kind == "T":
                return relax_bucket_fused(fx, fy, ft, u, v, sc, cfg,
                                          tensor=tensor, force_mode=mode)
            if kind == "du":
                return relax_du_fused(fx, fy, ft, u, v, sc, cfg,
                                      tensor=tensor, force_mode=mode)
            if kind == "du4":
                return relax_du_fused(fx, fy, ft, u, v, sc, cfg,
                                      tensor=tensor, force_mode=mode,
                                      pw_mode="four")
            return _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)

        @partial(jax.jit, static_argnums=2)
        def run(u, v, k):
            for _ in range(k):
                du, dv = relax(u, v)
                u = u + 0.001 * du
                v = v + 0.001 * dv
            return u, v

        return run

    fns = {label: chain(kind, mode) for label, kind, mode in modes}
    # Warm up (compile both K programs) + value sanity.
    vals = {}
    for label, fn in fns.items():
        t0 = time.time()
        uo, vo = fn(u0, v0, k_lo)
        np.asarray(uo)
        uo, vo = fn(u0, v0, k_hi)
        vals[label] = (np.asarray(uo), np.asarray(vo))
        print(f"{label}: compile+first {time.time()-t0:.1f}s", flush=True)
    labels = list(fns)
    d = np.hypot(vals[labels[0]][0][:ch, :cw] - vals[labels[1]][0][:ch, :cw],
                 vals[labels[0]][1][:ch, :cw] - vals[labels[1]][1][:ch, :cw])
    print(f"A-vs-B valid diff: max {d.max():.2e} mean {d.mean():.2e}",
          flush=True)

    # ORDER ROTATION (measurement trap #4, BASELINE.md): with a fixed
    # arm order, the arm measured FIRST in each round came out ~1.28x
    # slower in two A/Bs whose arms were bit-identical code — a pool
    # scheduling transient at round start, not a property of either arm.
    # Rotating which arm leads each round spreads the transient evenly.
    times = {label: {k_lo: [], k_hi: []} for label in fns}
    order = list(fns)
    for r in range(rounds):
        rot = order[r % len(order):] + order[:r % len(order)]
        for label in rot:
            for k in (k_lo, k_hi):
                t0 = time.perf_counter()
                uo, vo = fns[label](u0, v0, k)
                np.asarray(uo)
                times[label][k].append(time.perf_counter() - t0)
    print(f"\ncase={case} K={k_lo}/{k_hi} rounds={rounds} "
          f"(per-level = one full {cfg.outer_iterations_count}x"
          f"{cfg.inner_iterations_count} relaxation at ({hb},{wb}), "
          f"fence-free K-slope)")
    for label, ts in times.items():
        med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
        lo = {k: min(v) for k, v in ts.items()}
        s_med = (med[k_hi] - med[k_lo]) / (k_hi - k_lo)
        s_min = (lo[k_hi] - lo[k_lo]) / (k_hi - k_lo)
        print(f"  {label:12s} slope(median) {s_med*1000:8.2f} ms  "
              f"slope(min) {s_min*1000:8.2f} ms")


if __name__ == "__main__":
    main()

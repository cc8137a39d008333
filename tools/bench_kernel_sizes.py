#!/usr/bin/env python
"""Per-pass efficiency of the fused level kernel vs bucket size, ONE
session.

The pyramid-depth sweep implies mid levels run at ~65% of VPU f32 peak
but the finest level at only ~20% — this tool times the tail kernel
(full 40x(1+5) schedule) at a ladder of trimmed bucket sizes and prints
us/pass and achieved ops/s to locate the cliff (VMEM pressure?
sublane-tile count? pool noise?).

Usage: python tools/bench_kernel_sizes.py [sizes like 392x640 ...]

CAVEAT (round 3): this probe divides a fenced total by K, which
leaves (fence + result-download)/K of tunnel artifact in every
number and a first-arm pool transient in fixed-order A/Bs
(CLAUDE.md measurement traps #3/#4). Its historical absolutes are
inflated; treat ratios as order-biased. For new measurements use
the K-slope + order rotation pattern (tools/bench_du_iterate.py).
"""

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
from tpuflow.solver.bucketed import (  # noqa: E402
    LevelScalars,
    maintain_mirror1,
    maintain_mirror2,
)

SIZES = [(392, 640), (384, 640), (352, 640), (320, 512), (264, 512),
         (192, 384), (128, 256), (64, 128)]
K = 24
OPS_PER_PX_PASS = 35  # rough sweep ALU count, for the efficiency column


def build(hb, wb, cfg):
    import tpuflow.ops.pallas.level_fused as LF

    ch, cw = hb - 4, wb - 56
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, cw, ch, cw, ch)

    @jax.jit
    def run(f0, f1, u, v):
        uu, vv = u, v
        for _ in range(K):
            uu, vv = LF.level_fused(f0, f1, uu, vv, sc.tree(), cfg)
            uu = 0.5 * uu
            vv = 0.5 * vv
        return uu, vv

    return run, ch, cw


def main():
    cfg = FlowConfig()
    total_passes = cfg.outer_iterations_count * (cfg.inner_iterations_count + 1)
    rng = np.random.default_rng(0)
    sizes = SIZES
    if len(sys.argv) > 1:
        sizes = [tuple(int(x) for x in s.split("x")) for s in sys.argv[1:]]

    for hb, wb in sizes:
        fn, ch, cw = build(hb, wb, cfg)
        f0 = np.zeros((hb, wb), np.float32)
        f1 = np.zeros((hb, wb), np.float32)
        f0[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 200.0
        f1[:ch, :cw] = f0[:ch, :cw] + rng.standard_normal(
            (ch, cw)).astype(np.float32)
        u = np.zeros((hb, wb), np.float32)
        v = np.zeros((hb, wb), np.float32)
        args = (
            jnp.asarray(np.asarray(maintain_mirror1(jnp.asarray(f0), cw, ch))),
            jnp.asarray(np.asarray(maintain_mirror1(jnp.asarray(f1), cw, ch))),
            jnp.asarray(np.asarray(maintain_mirror2(jnp.asarray(u), cw, ch))),
            jnp.asarray(np.asarray(maintain_mirror2(jnp.asarray(v), cw, ch))),
        )
        out = fn(*args)
        np.asarray(out[0])  # warm + fence
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / K)
        us_pass = best * 1e6 / total_passes
        tops = hb * wb * OPS_PER_PX_PASS / (us_pass * 1e-6) / 1e12
        print(
            f"({hb:4d},{wb:4d}) {hb*wb/1e3:7.1f} Kpx: "
            f"{best*1e3:8.3f} ms/level  {us_pass:7.2f} us/pass  "
            f"~{tops:5.2f} Tops/s",
            flush=True,
        )


if __name__ == "__main__":
    main()

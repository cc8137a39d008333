#!/usr/bin/env python
"""A/B the sweep-denominator formulation (divide vs hoisted reciprocal)
on the fused level kernel at the fine trimmed bucket, ONE session.

Times K-chained calls of level_fused (tail variant, full 40x(1+5)
schedule) with TPUFLOW_SWEEP_RECIP toggled at trace time, and reports
ms/level plus the max flow diff between the two results.

Usage: python tools/bench_sweep_recip.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/tpuflow_jit_cache")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/tpuflow_jit_cache")
except Exception:
    pass

from tpuflow.config import FlowConfig  # noqa: E402
from tpuflow.solver.bucketed import (  # noqa: E402
    LevelScalars,
    maintain_mirror1,
    maintain_mirror2,
)

HB, WB = 392, 640
CH, CW = 388, 584
K = 24


def build(recip: bool, cfg):
    import tpuflow.ops.pallas.level_fused as LF

    os.environ["TPUFLOW_SWEEP_RECIP"] = "1" if recip else "0"
    sc = LevelScalars.make(CW, CH, 1.0, 1.0, 35.0, CW, CH, CW, CH)

    @jax.jit
    def run(f0, f1, u, v):
        uu, vv = u, v
        for _ in range(K):
            uu, vv = LF.level_fused(f0, f1, uu, vv, sc.tree(), cfg)
            uu = 0.5 * uu  # keep the chain from diverging
            vv = 0.5 * vv
        return uu, vv

    return run


def main():
    cfg = FlowConfig()
    rng = np.random.default_rng(0)
    f0 = np.zeros((HB, WB), np.float32)
    f1 = np.zeros((HB, WB), np.float32)
    f0[:CH, :CW] = rng.random((CH, CW), dtype=np.float32) * 200.0
    f1[:CH, :CW] = f0[:CH, :CW] + rng.standard_normal((CH, CW)).astype(np.float32)
    u = np.zeros((HB, WB), np.float32)
    v = np.zeros((HB, WB), np.float32)
    f0 = np.asarray(maintain_mirror1(jnp.asarray(f0), CW, CH))
    f1 = np.asarray(maintain_mirror1(jnp.asarray(f1), CW, CH))
    u = np.asarray(maintain_mirror2(jnp.asarray(u), CW, CH))
    v = np.asarray(maintain_mirror2(jnp.asarray(v), CW, CH))
    args = tuple(jnp.asarray(a) for a in (f0, f1, u, v))

    results = {}
    times = {}
    for name, recip in [("div", False), ("recip", True)]:
        fn = build(recip, cfg)
        out = fn(*args)
        results[name] = (np.asarray(out[0]), np.asarray(out[1]))  # warm+fence
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            out = fn(*args)
            np.asarray(out[0])
            best = min(best, (time.perf_counter() - t0) / K)
        times[name] = best * 1e3
        print(f"{name:6s}: {times[name]:7.3f} ms/level", flush=True)

    d = max(
        np.abs(results["div"][0] - results["recip"][0])[:CH, :CW].max(),
        np.abs(results["div"][1] - results["recip"][1])[:CH, :CW].max(),
    )
    print(f"max |flow diff| after {K} chained levels: {d:.3e}")
    print(f"speedup: {times['div'] / times['recip']:.3f}x")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Decompose pipeline time vs pyramid depth, all in ONE session.

The component probes (tools/profile_ablate.py) attribute only ~half the
relax-free pipeline time; this tool attacks the residual by timing the
REAL pipeline (correct math) at several warp_levels_count settings. The
marginal cost of the dropped levels is pure "coarse level" cost (their
buckets are tiny, so compute is negligible -> the slope measures the
per-level fixed overhead: XLA thunk glue, Pallas launch, relayouts), and
the intercept is the fine-level + fixed-program cost. Also times the
nosmooth ablation (presmooth conv attribution).

Usage: python tools/profile_levels.py
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
from tpuflow.io import read_raw_u8  # noqa: E402
from tpuflow.pyramid import max_warp_level  # noqa: E402


def build(cfg, ablate=""):
    import tpuflow.solver.bucketed as B

    os.environ["TPUFLOW_ABLATE"] = ablate
    B.compiled_full_pipeline.cache_clear()
    B._WARMED.clear()
    return B.compiled_full_pipeline((388, 584), cfg)


def main():
    f0 = read_raw_u8("/root/reference/data/rub1.raw", 584, 388)
    f1 = read_raw_u8("/root/reference/data/rub2.raw", 584, 388)
    f0, f1 = jnp.asarray(f0), jnp.asarray(f1)

    nmax = min(FlowConfig().warp_levels_count,
               max_warp_level(584, 388, FlowConfig().warp_scale_factor))
    counts = [nmax, 30, 20, 10, 5, 1]
    variants = {f"L{n}": (FlowConfig(warp_levels_count=n), "")
                for n in counts}
    variants["nosmooth"] = (FlowConfig(), "nosmooth")

    runs = {}
    for name, (cfg, ablate) in variants.items():
        fn = build(cfg, ablate)
        u, v = fn(f0, f1)
        np.asarray(u)
        runs[name] = fn
        print(f"{name}: warmed", flush=True)
    os.environ.pop("TPUFLOW_ABLATE", None)

    # Fence-free K-slope with per-round arm-order rotation (CLAUDE.md
    # measurement traps #3/#4: divide-by-K leaves (fence+download)/K in
    # every number, and the first arm of a fixed-order round pays a
    # ~1.28x pool transient).
    K_LO, K_HI, ROUNDS = 8, 32, 6
    ts = {name: {K_LO: [], K_HI: []} for name in runs}
    order = list(runs)
    for r in range(ROUNDS):
        rot = order[r % len(order):] + order[:r % len(order)]
        for name in rot:
            for k in (K_LO, K_HI):
                t0 = time.perf_counter()
                for _ in range(k):
                    u, v = runs[name](f0, f1)
                np.asarray(u)
                ts[name][k].append(time.perf_counter() - t0)
    times = {}
    for name in runs:
        med = {k: sorted(v)[len(v) // 2] for k, v in ts[name].items()}
        times[name] = (med[K_HI] - med[K_LO]) / (K_HI - K_LO)

    for name in variants:
        print(f"{name:9s}: {times[name] * 1e3:6.2f} ms/pair")
    tmax = times[f"L{nmax}"]
    for n in counts[1:]:
        dt = (tmax - times[f"L{n}"]) * 1e3
        print(f"levels {n}..{nmax - 1} ({nmax - n} coarse levels): "
              f"{dt:.2f} ms -> {dt / (nmax - n) * 1e3:.0f} us/level")
    print(f"presmooth: {(tmax - times['nosmooth']) * 1e3:.2f} ms")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Attribute pipeline time by ablation, all in ONE session.

Compiles the full-default pipeline plus nowarp/nomedian/norelax ablated
variants (TPUFLOW_ABLATE, trace-time flags that produce WRONG flow) and
times them back-to-back with K-chained fences, so the differences are
clean of pool drift. ~4 compiles on first run (persistent cache after).

Usage: python tools/profile_ablate.py
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
from tpuflow.io import read_raw_u8  # noqa: E402


def build(ablate: str):
    # compiled_full_pipeline caches per (shape, cfg) — bust the cache per
    # ablation by building fresh (the env var is read at trace time).

    import tpuflow.solver.bucketed as B

    os.environ["TPUFLOW_ABLATE"] = ablate
    B.compiled_full_pipeline.cache_clear()
    B._WARMED.clear()
    return B.compiled_full_pipeline((388, 584), FlowConfig())


def main():
    f0 = read_raw_u8("/root/reference/data/rub1.raw", 584, 388)
    f1 = read_raw_u8("/root/reference/data/rub2.raw", 584, 388)
    f0, f1 = jnp.asarray(f0), jnp.asarray(f1)

    runs = {}
    for ablate in ("", "nowarp", "nomedian", "norelax"):
        fn = build(ablate)
        u, v = fn(f0, f1)
        np.asarray(u)
        runs[ablate or "full"] = fn
    os.environ.pop("TPUFLOW_ABLATE", None)

    K = 32
    times = {}
    for _ in range(4):  # interleave rounds so drift hits all variants
        for name, fn in runs.items():
            t0 = time.perf_counter()
            for _ in range(K):
                u, v = fn(f0, f1)
            np.asarray(u)
            times[name] = min(times.get(name, 9e9), (time.perf_counter() - t0) / K)

    full = times["full"] * 1e3
    print(f"full:      {full:.1f} ms/pair")
    for name in ("norelax", "nowarp", "nomedian"):
        t = times[name] * 1e3
        print(f"{name:9s}: {t:.1f} ms  -> component ~{full - t:.1f} ms")


if __name__ == "__main__":
    main()

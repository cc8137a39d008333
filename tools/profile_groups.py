#!/usr/bin/env python
"""Per-bucket-group timing of the full pipeline on the real chip.

Uses the grouped-dispatch engine (one program per bucket group, host fence
after each group) — coarser than an op profiler but the only reliable
on-device breakdown through the axon tunnel (see CLAUDE.md: per-call
dispatch floor ~1.4 ms, fences ~64 ms; each group record carries one
fence, so compare groups RELATIVELY and prefer minima over runs).

Usage: python tools/profile_groups.py  (first run pays ~10 compiles)
"""

import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


from tpuflow.config import FlowConfig  # noqa: E402
from tpuflow.io import read_raw_u8  # noqa: E402
from tpuflow.solver.bucketed import (  # noqa: E402
    compute_flow_bucketed_async,
    warmup_bucketed,
)


def main():
    f0 = read_raw_u8("/root/reference/data/rub1.raw", 584, 388)
    f1 = read_raw_u8("/root/reference/data/rub2.raw", 584, 388)
    f0, f1 = jnp.asarray(f0), jnp.asarray(f1)
    cfg = FlowConfig()
    warmup_bucketed((388, 584), cfg, grouped=True)

    records = {}
    for _ in range(6):
        gt = []
        compute_flow_bucketed_async(f0, f1, cfg, group_traces=gt)
        for (hb, wb), n, secs in gt:
            key = (hb, wb, n)
            records[key] = min(records.get(key, 9e9), secs)
    total = 0.0
    for (hb, wb, n), secs in records.items():
        total += secs
        print(f"bucket ({hb:4d},{wb:4d}) x{n:2d} levels: {secs * 1e3:7.2f} ms"
              f"  ({secs * 1e3 / n:6.2f} ms/level)")
    print(f"sum of group minima: {total * 1e3:.1f} ms (each record includes a fence)")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""A/B: k-sweep-fused streamed kernel (TPUFLOW_STREAM_KSWEEP) at the 4K
fine bucket.

Round-5 lever: k sweeps per streaming pass share ONE read of the
iterate and the 7 term fields (trapezoid wavefront, value-exact), so
per-outer HBM traffic at inner=5 drops from 15 + 5*11.5 = 72.5 to
~15 + 12.4 field passes — bound 43 ms/level vs the measured 134 ms at
ksweep=1 (86% of its 72.5-pass bound, this session). Methodology:
K-slope of round-medians, arm-order rotated, arms alternated per round
(CLAUDE.md traps #3/#4).

Usage: python tools/ab_stream_ksweep.py [k_lo k_hi rounds] [--inner N]
                                        [--ks 1,5] [--case 4k|1080p]
(--case 1080p times the CHUNKED variant at (1088, 2048) with
TPUFLOW_CHUNK_KSWEEP — the 1080p slab-amortization lever)
Prints one JSON line: {"case": f"{case}-{mode}-ksweep", "ms": {k: ...},
                       "speedup_vs_1": ...}
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()

import numpy as np  # noqa: E402

HB4K, WB4K = 2176, 3968


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    k_lo, k_hi, rounds = (int(pos[0]), int(pos[1]), int(pos[2])) \
        if len(pos) >= 3 else (1, 3, 6)
    inner = 5
    if "--inner" in sys.argv:
        inner = int(sys.argv[sys.argv.index("--inner") + 1])
    ks = [1, 5]
    if "--ks" in sys.argv:
        ks = [int(x) for x in sys.argv[sys.argv.index("--ks") + 1].split(",")]
    case = "4k"
    if "--case" in sys.argv:
        case = sys.argv[sys.argv.index("--case") + 1]
    hb, wb, mode, env = {
        "4k": (HB4K, WB4K, "streamed", "TPUFLOW_STREAM_KSWEEP"),
        "1080p": (1088, 2048, "chunked", "TPUFLOW_CHUNK_KSWEEP"),
    }[case]

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from roofline_big import level_chain

    arms = {}
    for ksw in ks:
        os.environ[env] = str(ksw)
        t0 = time.time()
        fn, uv = level_chain(hb, wb, inner, mode)
        np.asarray(fn(uv, k_lo)[0])
        np.asarray(fn(uv, k_hi)[0])
        print(f"# ksweep={ksw}: compiled+warm in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        arms[ksw] = (fn, uv)

    ts = {ksw: {k_lo: [], k_hi: []} for ksw in ks}
    for r in range(rounds):
        arm_order = ks if r % 2 == 0 else ks[::-1]
        k_order = (k_lo, k_hi) if (r // 2) % 2 == 0 else (k_hi, k_lo)
        for ksw in arm_order:
            fn, uv = arms[ksw]
            for k in k_order:
                t0 = time.perf_counter()
                np.asarray(fn(uv, k)[0])
                ts[ksw][k].append(time.perf_counter() - t0)
        print(f"# round {r} done", file=sys.stderr, flush=True)

    res = {}
    for ksw in ks:
        med = {k: sorted(v)[len(v) // 2] for k, v in ts[ksw].items()}
        res[ksw] = (med[k_hi] - med[k_lo]) / (k_hi - k_lo)

    # SANITY BOUND (round-5 protocol): a level slope below the level's
    # own DMA traffic at an optimistic 2 TB/s is physically impossible
    # — the pool has entered the nonstationary state where K-slopes
    # stop meaning anything (observed: "19 ms" for a 40x(1+5)-pass 4K
    # level). Flag it so no conclusion is drawn from the run.
    field_b = hb * wb * 4
    outer = 40
    passes_per_outer = 15 + 12.4 * -(-inner // max(ks))  # coarse lower bound
    floor_s = outer * passes_per_outer * field_b / 2e12
    suspect = any(t < floor_s for t in res.values())
    print(json.dumps({
        "case": f"{case}-{mode}-ksweep",
        "inner": inner,
        "ms": {str(ksw): round(t * 1e3, 3) for ksw, t in res.items()},
        "speedup_vs_first": round(res[ks[0]] / res[ks[-1]], 4),
        "dma_floor_ms": round(floor_s * 1e3, 2),
        "suspect": suspect,
        "k": [k_lo, k_hi],
        "rounds": rounds,
    }), flush=True)
    if suspect:
        print("# WARNING: slope below the DMA floor — pool state "
              "nonstationary, DISCARD this run", file=sys.stderr)


if __name__ == "__main__":
    main()

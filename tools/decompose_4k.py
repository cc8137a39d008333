#!/usr/bin/env python
"""Same-session 4K streamed-level decomposition: prologue vs sweep vs
their HBM-traffic bounds, all anchored in ONE session.

Round-5 lesson (BASELINE.md): the pooled chip's bandwidth anchor swung
419 vs 866 GB/s across sessions of one day, and the round-4 "65-69% of
the HBM bound" accounting mixed cross-session absolutes. This tool
measures everything inside one session:

  1. HBM chained-add anchor (GB/s) — the session's bandwidth state.
  2. Streamed level at inner = 1, 2, 5 (production config: ksweep from
     env, pro-db on), K-slope timed with rotation.
  3. Decomposition: per-sweep S = (lvl5 - lvl2) / (40*3);
     per-outer fixed P = lvl1/40 - S (prologue + chunk-loop machinery).
  4. Each component vs ITS traffic bound at the measured anchor:
     sweep streams 11.5 field passes, the prologue 15 (both counted
     from the kernel's DMA schedule at C=64). A component well ABOVE
     100% of its bound is bandwidth-limited only if the naive pass
     model held — the round-5 A/Bs showed it overcounts, so read the
     ratios as consistency checks, not gospel.

Usage: python tools/decompose_4k.py [k_lo k_hi rounds]
Prints progress + ONE JSON line.
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

HB, WB = 2176, 3968
FIELD_B = HB * WB * 4
SWEEP_PASSES = 11.5
PRO_PASSES = 15.0


def slope(fn, uv, k_lo, k_hi, rounds):
    ts = {k_lo: [], k_hi: []}
    for r in range(rounds):
        for k in ((k_lo, k_hi) if r % 2 == 0 else (k_hi, k_lo)):
            t0 = time.perf_counter()
            np.asarray(fn(uv, k)[0])
            ts[k].append(time.perf_counter() - t0)
    med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
    return (med[k_hi] - med[k_lo]) / (k_hi - k_lo)


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    k_lo, k_hi, rounds = (int(pos[0]), int(pos[1]), int(pos[2])) \
        if len(pos) >= 3 else (2, 6, 6)

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from roofline_big import hbm_stream_rate, level_chain

    gbs, _ = hbm_stream_rate(k_lo, k_hi, max(3, rounds - 2))
    print(f"# session HBM anchor: {gbs:.0f} GB/s", file=sys.stderr,
          flush=True)

    lvl = {}
    for inner in (1, 2, 5):
        t0 = time.time()
        fn, uv = level_chain(HB, WB, inner, "streamed")
        np.asarray(fn(uv, k_lo)[0])
        np.asarray(fn(uv, k_hi)[0])
        print(f"# inner={inner}: compiled+warm {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        lvl[inner] = slope(fn, uv, k_lo, k_hi, rounds)
        print(f"# level inner={inner}: {lvl[inner]*1e3:.2f} ms",
              file=sys.stderr, flush=True)

    S = (lvl[5] - lvl[2]) / (40 * 3)
    P = lvl[1] / 40 - S
    sweep_bound = SWEEP_PASSES * FIELD_B / (gbs * 1e9)
    pro_bound = PRO_PASSES * FIELD_B / (gbs * 1e9)
    # Sanity (round-5 protocol): non-monotone levels or any level below
    # its own DMA traffic at an optimistic 2 TB/s mean the pool state is
    # nonstationary — flag the run as unusable instead of reporting
    # physically impossible decompositions.
    floors = {i: 40 * (PRO_PASSES + i * SWEEP_PASSES) * FIELD_B / 2e12
              for i in lvl}
    suspect = (not (lvl[1] <= lvl[2] <= lvl[5])
               or any(lvl[i] < floors[i] for i in lvl)
               or gbs <= 0)
    print(json.dumps({
        "suspect": suspect,
        "case": "4k-stream-decompose",
        "hbm_anchor_gbs": round(gbs, 1),
        "level_ms": {str(i): round(t * 1e3, 3) for i, t in lvl.items()},
        "per_sweep_us": round(S * 1e6, 2),
        "per_outer_fixed_us": round(P * 1e6, 2),
        "sweep_traffic_bound_us": round(sweep_bound * 1e6, 2),
        "prologue_traffic_bound_us": round(pro_bound * 1e6, 2),
        "sweep_pct_of_bound": round(100 * sweep_bound / S, 1) if S > 0 else None,
        "prologue_pct_of_bound": round(100 * pro_bound / P, 1) if P > 0 else None,
        "k": [k_lo, k_hi],
        "rounds": rounds,
    }), flush=True)


if __name__ == "__main__":
    main()

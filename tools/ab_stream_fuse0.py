#!/usr/bin/env python
"""A/B: fused-sweep0 streamed kernel vs unfused at the 4K fine bucket.

Round-5 lever #1 (VERDICT r4): sweep 0 fused into the prologue chunk
loop saves one sweep's HBM input streams per outer (9 of ~69 field
passes at inner=5 — see relax_du._relax_du_streamed docstring). This
tool measures the per-level delta the honest way: K-slope of
round-medians with ARM-ORDER ROTATION and the two ARMS ALTERNATED
within each round (CLAUDE.md measurement traps #3/#4) — both programs
compiled up front, same input arrays.

Usage: python tools/ab_stream_fuse0.py [k_lo k_hi rounds] [--inner N]
Prints progress lines + one JSON line:
  {"case": "4k-stream-fuse0", "ms_unfused": ..., "ms_fused": ...,
   "speedup": ..., "inner": N}
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


def build(inner, fuse0):
    """Compile the streamed level chain with the given fuse0 setting
    (trace-time env); returns (fn, uv) warmed for both chain lengths."""
    os.environ["TPUFLOW_STREAM_FUSE0"] = "1" if fuse0 else "0"
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from roofline_big import level_chain

    return level_chain(HB4K, WB4K, inner, "streamed")


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    k_lo, k_hi, rounds = (int(pos[0]), int(pos[1]), int(pos[2])) \
        if len(pos) >= 3 else (1, 3, 6)
    inner = 5
    if "--inner" in sys.argv:
        inner = int(sys.argv[sys.argv.index("--inner") + 1])

    arms = {}
    for name, fuse0 in (("unfused", False), ("fused", True)):
        t0 = time.time()
        fn, uv = build(inner, fuse0)
        np.asarray(fn(uv, k_lo)[0])
        np.asarray(fn(uv, k_hi)[0])
        print(f"# {name}: compiled+warm in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        arms[name] = (fn, uv)

    ts = {name: {k_lo: [], k_hi: []} for name in arms}
    names = list(arms)
    for r in range(rounds):
        arm_order = names if r % 2 == 0 else names[::-1]
        k_order = (k_lo, k_hi) if (r // 2) % 2 == 0 else (k_hi, k_lo)
        for name in arm_order:
            fn, uv = arms[name]
            for k in k_order:
                t0 = time.perf_counter()
                np.asarray(fn(uv, k)[0])
                ts[name][k].append(time.perf_counter() - t0)
        print(f"# round {r} done", file=sys.stderr, flush=True)

    res = {}
    for name in names:
        med = {k: sorted(v)[len(v) // 2] for k, v in ts[name].items()}
        res[name] = (med[k_hi] - med[k_lo]) / (k_hi - k_lo)
    print(json.dumps({
        "case": "4k-stream-fuse0",
        "inner": inner,
        "ms_unfused": round(res["unfused"] * 1e3, 3),
        "ms_fused": round(res["fused"] * 1e3, 3),
        "speedup": round(res["unfused"] / res["fused"], 4),
        "k": [k_lo, k_hi],
        "rounds": rounds,
    }), flush=True)


if __name__ == "__main__":
    main()

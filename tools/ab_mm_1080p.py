#!/usr/bin/env python
"""A/B: resample-matmul precision (TPUFLOW_MM_PRECISION) on the
PRODUCTION 1080p pipeline.

Round-5 lead: ~15 ms of the 1080p pair is the resample matmuls, which
run at HIGHEST precision = SIX bf16 passes per f32 matmul on the MXU
(HIGH = 3 passes, DEFAULT = 1). This tool compiles the production
pipeline under each precision (the env is part of the trace
fingerprint), interleaves the arms order-rotated, and also reports the
flow DELTA between the arms on a textured pair — the numerics cost of
the cheaper passes, to be judged against the EPE gates (bench.py's rub
oracle gate must also pass under the chosen precision before flipping
any default).

Caveat: HIGHEST is the only precision the whole-level (rub-class
bucket) kernel admits, so the non-highest arms run their coarse tails
on the fused-level path instead — a bias AGAINST the cheaper arms at
1080p (small tail share). A win here is therefore conservative.

Usage: python tools/ab_mm_1080p.py [k_lo k_hi rounds] [--precisions highest,high]
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


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    k_lo, k_hi, rounds = (int(pos[0]), int(pos[1]), int(pos[2])) \
        if len(pos) >= 3 else (2, 6, 8)
    precs = ["highest", "high"]
    if "--precisions" in sys.argv:
        precs = sys.argv[sys.argv.index("--precisions") + 1].split(",")

    import jax.numpy as jnp

    from tpuflow.config import FlowConfig
    from tpuflow.solver.bucketed import (
        compute_flow_bucketed_async,
        warmup_bucketed,
    )

    h, w = 1080, 1920
    rng = np.random.default_rng(0)
    base = rng.random((h, w), np.float32) * 80
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    blob = 100.0 * np.exp(-((ys - h / 2) ** 2 + (xs - w / 2) ** 2)
                          / (2 * 50.0 ** 2))
    f0 = jnp.asarray(base + blob)
    f1 = jnp.asarray(base + np.roll(np.asarray(blob), (2, 3), (0, 1)))
    cfg = FlowConfig()

    flows = {}
    for p in precs:
        os.environ["TPUFLOW_MM_PRECISION"] = p
        t0 = time.time()
        warmup_bucketed((h, w), cfg)
        u, v = compute_flow_bucketed_async(f0, f1, cfg)
        flows[p] = (np.asarray(u), np.asarray(v))
        print(f"# {p}: compiled+warm {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)

    ref_u, ref_v = flows[precs[0]]
    deltas = {
        p: float(np.mean(np.hypot(flows[p][0] - ref_u, flows[p][1] - ref_v)))
        for p in precs[1:]
    }

    ts = {p: {k_lo: [], k_hi: []} for p in precs}
    for r in range(rounds):
        arm_order = precs if r % 2 == 0 else precs[::-1]
        k_order = (k_lo, k_hi) if (r // 2) % 2 == 0 else (k_hi, k_lo)
        for p in arm_order:
            os.environ["TPUFLOW_MM_PRECISION"] = p
            for k in k_order:
                t0 = time.perf_counter()
                for _ in range(k):
                    u, v = compute_flow_bucketed_async(f0, f1, cfg)
                np.asarray(u)
                ts[p][k].append(time.perf_counter() - t0)
        print(f"# round {r}", file=sys.stderr, flush=True)

    res = {}
    for p in precs:
        med = {k: sorted(v)[len(v) // 2] for k, v in ts[p].items()}
        res[p] = (med[k_hi] - med[k_lo]) / (k_hi - k_lo)
    print(json.dumps({
        "case": "1080p-mm-precision",
        "ms": {p: round(t * 1e3, 3) for p, t in res.items()},
        "speedup_vs_highest": {
            p: round(res["highest"] / res[p], 4) for p in precs[1:]},
        "flow_delta_px_vs_highest": {p: round(d, 9)
                                     for p, d in deltas.items()},
        "k": [k_lo, k_hi],
        "rounds": rounds,
    }), flush=True)


if __name__ == "__main__":
    main()

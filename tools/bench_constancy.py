#!/usr/bin/env python
"""Per-constancy on-chip EPE gate: grey / gradient / log vs committed
oracle goldens (round-5 verdict #6).

bench.py's gate is grey-only (the full default schedule); the gradient
and log data terms were last chip-gated in round 2. This tool runs the
rub pair through the PRODUCTION pipeline on the real chip once per
constancy on the reduced schedule of the committed per-constancy goldens
(data/oracle_rub_{grey,gradient,log}_small.npz — regenerate with
tools/regen_oracle_golden.py) and prints ONE JSON line per constancy:

    {"constancy": "gradient", "epe_px": ..., "epe_ok": true, ...}

Gate bound: SCALE-AWARE — min(0.05 px, 0.1 * golden-flow RMS + 1e-4).
The absolute BASELINE target (0.05 px) is meaningless for the log
constancy on this pair: log-derivative flow on the rub u8 frames is
intrinsically ~1e-3 px (probed across alpha 0.2-35 — the mode is built
for X-ray multiplicative illumination, not this data), so an
all-zeros output would pass an absolute gate. The RMS-relative term
keeps the gate separating (measured cross-engine noise ~1e-6 px <<
bound << flow scale) for all three terms. Clean math vs the oracle's
clean math; the reference grad/log CUDA-block artifact is deliberately
NOT reproduced (reference src/kernels/solve_2d.cu:813-841, bound in
BASELINE.md). Exit 1 if any gate fails.

Usage: python tools/bench_constancy.py [grey|gradient|log ...]
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()

import numpy as np  # noqa: E402

EPE_TARGET_PX = 0.05
SMALL_SCHEDULE = dict(
    warp_levels_count=8, warp_scale_factor=0.7,
    outer_iterations_count=10, inner_iterations_count=5,
    equation_alpha=35.0, median_radius=5, gaussian_sigma=1.5,
)


def main():
    wanted = [a for a in sys.argv[1:] if not a.startswith("-")] or [
        "grey", "gradient", "log"]

    from tpuflow import FlowConfig, compute_flow
    from tpuflow.config import DataConstancy
    from tpuflow.io import read_raw_u8
    from tpuflow.solver.flow2d import endpoint_error

    for d in (os.path.join(REPO, "data"), "/root/reference/data"):
        p1, p2 = os.path.join(d, "rub1.raw"), os.path.join(d, "rub2.raw")
        if os.path.exists(p1) and os.path.exists(p2):
            break
    else:
        raise SystemExit("rub pair not found")
    f0 = read_raw_u8(p1, 584, 388)
    f1 = read_raw_u8(p2, 584, 388)

    by_name = {
        "grey": DataConstancy.GREY,
        "gradient": DataConstancy.GRADIENT,
        "log": DataConstancy.LOG_DERIVATIVES,
    }
    ok = True
    for name in wanted:
        golden_path = os.path.join(REPO, "data",
                                   f"oracle_rub_{name}_small.npz")
        if not os.path.exists(golden_path):
            raise SystemExit(f"missing golden {golden_path} — run "
                             "tools/regen_oracle_golden.py")
        golden = np.load(golden_path, allow_pickle=True)
        cfg = FlowConfig(data_constancy=by_name[name], **SMALL_SCHEDULE)
        res = compute_flow(f0, f1, cfg)
        u, v = np.asarray(res.u), np.asarray(res.v)
        gu, gv = golden["u"], golden["v"]
        epe = float(endpoint_error(u, v, gu, gv))
        rms = float(np.sqrt(np.mean(gu * gu + gv * gv)))
        target = min(EPE_TARGET_PX, 0.1 * rms + 1e-4)
        epe_ok = bool(epe <= target)
        ok = ok and epe_ok
        print(json.dumps({
            "constancy": name,
            "epe_px": round(epe, 9),
            "epe_ok": epe_ok,
            "target_px": round(target, 6),
            "golden_rms_px": round(rms, 6),
            "schedule": "small (8 lvl x 10 x 5)",
        }), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

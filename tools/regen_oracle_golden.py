#!/usr/bin/env python
"""Regenerate data/oracle_rub_default.npz — the NumPy-oracle golden flow
for the rub pair under the FULL default schedule.

The oracle (tpuflow/oracle.py) is the float32 transliteration of the
reference kernel math (reference: src/kernels/*.cu); this golden is what
bench.py gates EPE against. Takes ~30 s of pure NumPy.

Usage: python tools/regen_oracle_golden.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tpuflow import oracle  # noqa: E402
from tpuflow.io import read_raw_u8  # noqa: E402

# Reduced schedule for the per-constancy goldens: small enough that the
# oracle runs in seconds and the on-chip gate compiles in ~a minute,
# deep enough to exercise the pyramid, warp, medians and all sweep math.
SMALL_SCHEDULE = dict(
    warp_levels_count=8, warp_scale_factor=0.7,
    outer_iterations_count=10, inner_iterations_count=5,
    equation_alpha=35.0, median_radius=5, gaussian_sigma=1.5,
)


def main():
    for d in (os.path.join(REPO, "data"), "/root/reference/data"):
        p1, p2 = os.path.join(d, "rub1.raw"), os.path.join(d, "rub2.raw")
        if os.path.exists(p1) and os.path.exists(p2):
            break
    else:
        raise SystemExit("rub pair not found")
    f0 = read_raw_u8(p1, 584, 388)
    f1 = read_raw_u8(p2, 584, 388)

    t0 = time.time()
    u, v = oracle.compute_flow(f0, f1)  # defaults == the reference defaults
    out = os.path.join(REPO, "data", "oracle_rub_default.npz")
    np.savez_compressed(out, u=u.astype(np.float32), v=v.astype(np.float32))
    print(f"wrote {out} in {time.time() - t0:.1f}s  "
          f"|u|max={np.abs(u).max():.3f} |v|max={np.abs(v).max():.3f}")

    # Per-constancy goldens on the SMALL schedule (round-5 verdict #6:
    # grad/log were gated on chip only once, in round 2 — these feed
    # tools/bench_constancy.py's every-round on-chip gate). Clean math
    # (block_emulation=False): the production path deliberately fixes
    # the reference grad/log kernels' CUDA-block halo artifacts
    # (reference src/kernels/solve_2d.cu:813-841; bound in BASELINE.md).
    for constancy in ("grey", "gradient", "log"):
        t0 = time.time()
        u, v = oracle.compute_flow(f0, f1, data_constancy=constancy,
                                   **SMALL_SCHEDULE)
        out = os.path.join(REPO, "data", f"oracle_rub_{constancy}_small.npz")
        np.savez_compressed(
            out, u=u.astype(np.float32), v=v.astype(np.float32),
            schedule=np.array(sorted(SMALL_SCHEDULE.items()), dtype=object))
        print(f"wrote {out} in {time.time() - t0:.1f}s  "
              f"|u|max={np.abs(u).max():.3f} |v|max={np.abs(v).max():.3f}")


if __name__ == "__main__":
    main()

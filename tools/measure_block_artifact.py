#!/usr/bin/env python
"""Quantify the reference grad/log kernels' CUDA-block halo artifacts.

Runs the NumPy oracle on the rub pair (full default schedule) for
GRADIENT and LOG constancy, with clean global stencils vs the reference's
16x8-block halo behavior (tpuflow.oracle block_emulation=True), and
prints the flow deviation between the two. The result is recorded in
BASELINE.md and bounds how far ANY clean-math implementation (including
this framework) can sit from the reference binary's output for grad/log.

Usage: python tools/measure_block_artifact.py  (~2 min of NumPy)
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tpuflow import oracle  # noqa: E402
from tpuflow.io import read_raw_u8  # noqa: E402


def main():
    for d in (os.path.join(REPO, "data"), "/root/reference/data"):
        p1, p2 = os.path.join(d, "rub1.raw"), os.path.join(d, "rub2.raw")
        if os.path.exists(p1) and os.path.exists(p2):
            break
    else:
        raise SystemExit("rub pair not found")
    f0 = read_raw_u8(p1, 584, 388)
    f1 = read_raw_u8(p2, 584, 388)

    for constancy in ("gradient", "log"):
        t0 = time.time()
        u_c, v_c = oracle.compute_flow(f0, f1, data_constancy=constancy)
        u_b, v_b = oracle.compute_flow(
            f0, f1, data_constancy=constancy, block_emulation=True
        )
        epe = np.hypot(u_c - u_b, v_c - v_b)
        mag = float(np.hypot(u_c, v_c).mean())
        print(
            f"{constancy}: clean-vs-block EPE mean={epe.mean():.3e} px "
            f"max={epe.max():.3e} px  (mean |flow|={mag:.3f} px)  "
            f"[{time.time() - t0:.0f}s]"
        )


if __name__ == "__main__":
    main()

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
from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


from tpuflow.config import FlowConfig  # noqa: E402
from tpuflow.io import read_raw_u8  # noqa: E402


def build(ablate: str, mm_prec: str = "highest", banded: str = "1"):
    # Config-differencing requires every variant (INCLUDING the full
    # baseline) to run the same engine path: any ablation or non-default
    # matmul precision disables the fused/whole-level Pallas kernels, so
    # pin them OFF for all variants — the attribution below is for the
    # XLA component path (the kernels fuse most of these components away
    # in production; their cost is measured by bench.py A/Bs instead).
    import tpuflow.solver.bucketed as B

    os.environ["TPUFLOW_ABLATE"] = ablate
    os.environ["TPUFLOW_MM_PRECISION"] = mm_prec
    os.environ["TPUFLOW_BANDED_RESAMPLE"] = banded
    os.environ["TPUFLOW_WHOLE_LEVEL"] = "0"
    os.environ["TPUFLOW_FUSED_LEVEL"] = "0"
    return B.compiled_full_pipeline(SHAPE, FlowConfig())


SHAPE = (388, 584)


def main():
    global SHAPE
    if "--size" in sys.argv:
        name = sys.argv[sys.argv.index("--size") + 1]
        SHAPE = {"rub": (388, 584), "1080p": (1080, 1920),
                 "4k": (2160, 3840)}[name]
    if SHAPE != (388, 584):
        # Scanned pipeline at big sizes: the 9 unrolled-variant compiles
        # otherwise dominate the session (~10 min each, serialized).
        os.environ.setdefault("TPUFLOW_UNROLL", "0")
    if SHAPE == (388, 584):
        f0 = read_raw_u8("/root/reference/data/rub1.raw", 584, 388)
        f1 = read_raw_u8("/root/reference/data/rub2.raw", 584, 388)
    else:
        h, w = SHAPE
        rng = np.random.default_rng(0)
        base = rng.random((h, w), np.float32) * 80
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        blob = 100.0 * np.exp(-((ys - h / 2) ** 2 + (xs - w / 2) ** 2)
                              / (2 * 50.0 ** 2))
        f0 = (base + blob).astype(np.float32)
        f1 = (base + np.roll(blob, (2, 3), (0, 1))).astype(np.float32)
    f0, f1 = jnp.asarray(f0), jnp.asarray(f1)

    # (ablate, mm_precision, banded) variants.
    # - norelax is deliberately ABSENT: du=dv=0 makes zeros propagate
    #   through the whole pyramid and XLA constant-folds every level away;
    #   fakerelax keeps data flowing through every other component.
    # - mm_high/mm_default keep the data flow identical but cut the dense
    #   resample matmuls' f32-emulation pass count 6->3->1: the deltas
    #   bound the matmul share with RIGHT-SHAPED, nearly-right-valued math
    #   (no warp-cliff risk). Measured ~1.3 ms of the pipeline.
    # - banded: the gather-based resample (recorded negative result:
    #   ~+37 ms — TPU scalar-path gathers; see ops/resample.py).
    variants = {
        "full": ("", "highest", "0"),
        "fakerelax": ("fakerelax", "highest", "0"),
        "nomaintain": ("nomaintain", "highest", "0"),
        "nowarp": ("nowarp", "highest", "0"),
        "nomedian": ("nomedian", "highest", "0"),
        "mm_high": ("", "high", "0"),
        "mm_default": ("", "default", "0"),
        "nosmooth": ("nosmooth", "highest", "0"),
    }
    if os.environ.get("ABLATE_BANDED"):
        variants["banded"] = ("", "highest", "1")
    if os.environ.get("ABLATE_NORESAMPLE"):
        variants["noresample"] = ("noresample", "highest", "0")
    runs = {}
    for name, spec in variants.items():
        fn = build(*spec)
        u, v = fn(f0, f1)
        np.asarray(u)
        runs[name] = fn
    os.environ.pop("TPUFLOW_ABLATE", None)
    os.environ.pop("TPUFLOW_MM_PRECISION", None)
    os.environ.pop("TPUFLOW_BANDED_RESAMPLE", None)

    # Fence-free K-slope, per-round arm-order rotation (CLAUDE.md
    # measurement traps #3/#4 — divide-by-K numbers from earlier rounds
    # carried (fence+download)/K plus a first-arm pool transient).
    K_LO, K_HI, ROUNDS = (8, 32, 6) if SHAPE == (388, 584) else (3, 12, 8)
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

    full = times["full"] * 1e3
    print(f"full:      {full:.1f} ms/pair")
    for name in runs:
        if name == "full":
            continue
        t = times[name] * 1e3
        print(f"{name:10s}: {t:.1f} ms  -> component ~{full - t:.1f} ms")
    if "mm_high" in times and "mm_default" in times:
        # t(passes) = base + passes*unit: solve from the 6/3/1-pass points.
        t6, t3, t1 = times["full"], times["mm_high"], times["mm_default"]
        unit = (t6 - t1) / 5.0
        print(f"matmul unit-pass ~{unit * 1e3:.2f} ms -> HIGHEST matmuls "
              f"~{6 * unit * 1e3:.1f} ms of the pipeline "
              f"(3-pass point consistency: {(t6 - t3) / (3 * unit):.2f}, "
              f"want 1.0)")


if __name__ == "__main__":
    main()

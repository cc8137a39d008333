#!/usr/bin/env python
"""A/B the full-field relaxation kernel's shift implementation on-chip.

concat (baseline): stencil shifts as slice+concat with bucket-edge mirror.
roll: stencil shifts as native pltpu.roll relayouts — raw (wrapped) in the
sweeps where every consumer is weight-masked at the affected row/col, with
a mirror where-fix only in the phi-gradient prologue.

Times one FULL-schedule relaxation (40 x (phi + 5 sweeps)) at the rub fine
bucket (448, 640), K kernel launches chained inside ONE dispatch, variants
interleaved across rounds so pool drift hits both. Also bit-compares the
valid region between variants (must be EXACTLY equal).

Usage: python tools/bench_relax_shift.py [K] [rounds]
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
from tpuflow.solver.bucketed import LevelScalars, bucket_dims  # noqa: E402
from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4

CW, CH = 584, 388
HB, WB = bucket_dims(CW, CH)
cfg = FlowConfig()
sc = LevelScalars.make(CW, CH, 1.0, 1.0, cfg.equation_alpha, CW, CH, CW, CH)
sc_t = sc.tree()

rng = np.random.default_rng(0)
shape = (HB, WB)
fx = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.3
fy = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.3
ft = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.1
u0 = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.5
v0 = jnp.asarray(rng.standard_normal(shape), jnp.float32) * 0.5


def build(mode: str, ablate=None, cfg_=None):
    cfg_ = cfg_ or cfg

    @jax.jit
    def chain(u, v):
        def body(c, _):
            uu, vv = c
            du, dv = relax_bucket_fused(
                fx, fy, ft, uu, vv, sc_t, cfg_,
                force_mode="full", shift_mode=mode, _ablate=ablate,
            )
            # data dependence between launches, negligible value change
            return (uu + 1e-30 * du, vv + 1e-30 * dv), None

        (uu, vv), _ = jax.lax.scan(body, (u, v), None, length=K)
        return uu, vv

    @jax.jit
    def once(u, v):
        return relax_bucket_fused(
            fx, fy, ft, u, v, sc_t, cfg_,
            force_mode="full", shift_mode=mode, _ablate=ablate,
        )

    return chain, once


# name -> (shift_mode, _ablate, cfg); WRONG-math probes are the ablates.
VARIANTS = {
    "concat": ("concat", None, None),
    "inner1": ("concat", None, FlowConfig(inner_iterations_count=1)),
}
if os.environ.get("BENCH_ABLATE"):
    VARIANTS.update({
        "recip": ("concat", "recip", None),
        "noxshift": ("concat", "noxshift", None),
        "noyshift": ("concat", "noyshift", None),
        "shiftonly": ("concat", "shiftonly", None),
    })
if os.environ.get("BENCH_ROLL"):
    VARIANTS["roll"] = ("roll", None, None)

# Correctness comparison only for correct-math full-schedule variants
# (wrong-math probes time structure; inner1 changes the schedule).
CHECK = {"concat", "recip", "roll"}

variants = {}
ref_du = ref_dv = None
for name, (mode, ablate, cfg_) in VARIANTS.items():
    chain, once = build(mode, ablate, cfg_)
    if name in CHECK:
        out = once(u0, v0)
        du_full, dv_full = np.asarray(out[0]), np.asarray(out[1])
        if ref_du is None:
            ref_du, ref_dv = du_full, dv_full
        d = max(
            np.abs(du_full[:CH, :CW] - ref_du[:CH, :CW]).max(),
            np.abs(dv_full[:CH, :CW] - ref_dv[:CH, :CW]).max(),
        )
        print(f"{name}: valid-region max |diff| vs baseline = {d:.3e}",
              flush=True)
    variants[name] = (chain,)
    np.asarray(chain(u0, v0)[0])  # warm the chained program
    print(f"{name}: warmed", flush=True)

times = {}
for _ in range(ROUNDS):
    for mode, (chain,) in variants.items():
        t0 = time.perf_counter()
        uu, vv = chain(u0, v0)
        np.asarray(uu)
        dt = (time.perf_counter() - t0) / K
        times.setdefault(mode, []).append(dt)

total = cfg.outer_iterations_count * (cfg.inner_iterations_count + 1)
for mode, ts in times.items():
    best = min(ts)
    print(
        f"{mode}: best {best * 1e3:.2f} ms/level "
        f"({best / total * 1e6:.1f} us/pass), "
        f"all {[f'{t * 1e3:.2f}' for t in ts]}"
    )

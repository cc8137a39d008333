#!/usr/bin/env python
"""A/B the full-field relaxation kernel's internals on-chip.

Times one FULL-schedule relaxation (40 x (phi + 5 sweeps)) at the rub fine
bucket (448, 640), K kernel launches chained inside ONE dispatch, variants
interleaved across rounds so pool drift hits both. Bit-compares the valid
region between correct-math variants.

Variant groups (env-gated to bound compile count):
  default            concat baseline + inner1 (prologue-vs-sweep split)
  BENCH_ABLATE=1     recip / noxshift / noyshift / shiftonly (WRONG math)
  BENCH_PROLOGUE=1   sweeponly / nomaintain / notrans / noksi / nophipw
  BENCH_OUTER=1      outer10 / outer80 (fixed-vs-marginal launch cost)
  BENCH_SMALLCODE=1  fori-looped sweeps (code-size probe; correct math)
  BENCH_KSPLIT=1     each variant also at K=32: solves per-launch cost vs
                     the per-chain fence from T(K1), T(K2)

Usage: python tools/bench_relax_shift.py [K] [rounds]

CAVEAT (round 3): this probe divides a fenced total by K, which
leaves (fence + result-download)/K of tunnel artifact in every
number and a first-arm pool transient in fixed-order A/Bs
(CLAUDE.md measurement traps #3/#4). Its historical absolutes are
inflated; treat ratios as order-biased. For new measurements use
the K-slope + order rotation pattern (tools/bench_du_iterate.py).
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
from tpuflow.solver.bucketed import LevelScalars, bucket_dims  # noqa: E402
from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
ROUNDS = int(sys.argv[2]) if len(sys.argv) > 2 else 4
K2 = 32

CW, CH = (
    tuple(int(x) for x in os.environ["BENCH_SHAPE"].split("x"))
    if os.environ.get("BENCH_SHAPE")
    else (584, 388)
)
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


def build(mode, ablate=None, cfg_=None, loop_sweeps=False, k=K):
    cfg_ = cfg_ or cfg

    @jax.jit
    def chain(u, v):
        def body(c, _):
            uu, vv = c
            du, dv = relax_bucket_fused(
                fx, fy, ft, uu, vv, sc_t, cfg_,
                force_mode="full", shift_mode=mode, _ablate=ablate,
                loop_sweeps=loop_sweeps,
            )
            # data dependence between launches, negligible value change
            return (uu + 1e-30 * du, vv + 1e-30 * dv), None

        (uu, vv), _ = jax.lax.scan(body, (u, v), None, length=k)
        return uu, vv

    @jax.jit
    def once(u, v):
        return relax_bucket_fused(
            fx, fy, ft, u, v, sc_t, cfg_,
            force_mode="full", shift_mode=mode, _ablate=ablate,
            loop_sweeps=loop_sweeps,
        )

    return chain, once


# name -> (shift_mode, _ablate, cfg, loop_sweeps)
VARIANTS = {
    "concat": ("concat", None, None, False),
}
if not os.environ.get("BENCH_KSPLIT"):
    VARIANTS["inner1"] = ("concat", None, FlowConfig(inner_iterations_count=1), False)
if os.environ.get("BENCH_ABLATE"):
    VARIANTS.update({
        "recip": ("concat", "recip", None, False),
        "noxshift": ("concat", "noxshift", None, False),
        "noyshift": ("concat", "noyshift", None, False),
        "shiftonly": ("concat", "shiftonly", None, False),
    })
if os.environ.get("BENCH_PROLOGUE"):
    # Prologue bisection probes (all WRONG math except baseline).
    VARIANTS.update({
        "sweeponly": ("concat", "sweeponly", None, False),
        "nomaintain": ("concat", "nomaintain", None, False),
        "notrans": ("concat", "notrans", None, False),
        "noksi": ("concat", "noksi", None, False),
        "nophipw": ("concat", "nophipw", None, False),
    })
if os.environ.get("BENCH_OUTER"):
    # Fixed-vs-marginal launch cost: T(outer) = F + outer*C (correct math).
    VARIANTS.update({
        "outer10": ("concat", None, FlowConfig(outer_iterations_count=10), False),
        "outer80": ("concat", None, FlowConfig(outer_iterations_count=80), False),
    })
if os.environ.get("BENCH_SMALLCODE"):
    VARIANTS["smallcode"] = ("concat", None, None, True)
if os.environ.get("BENCH_ROLL"):
    VARIANTS["roll"] = ("roll", None, None, False)

# Correctness comparison only for correct-math full-schedule variants
# (wrong-math probes time structure; inner1/outerN change the schedule).
CHECK = {"concat", "recip", "roll", "smallcode"}
KSPLIT = bool(os.environ.get("BENCH_KSPLIT"))

variants = {}
ref_du = ref_dv = None
for name, (mode, ablate, cfg_, lsw) in VARIANTS.items():
    chain, once = build(mode, ablate, cfg_, lsw)
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
    chains = {K: chain}
    if KSPLIT:
        chains[K2] = build(mode, ablate, cfg_, lsw, k=K2)[0]
    for k, ch_fn in chains.items():
        np.asarray(ch_fn(u0, v0)[0])  # warm the chained program
    variants[name] = chains
    print(f"{name}: warmed", flush=True)

times = {}
for _ in range(ROUNDS):
    for name, chains in variants.items():
        for k, ch_fn in chains.items():
            t0 = time.perf_counter()
            uu, vv = ch_fn(u0, v0)
            np.asarray(uu)
            dt = (time.perf_counter() - t0) / k
            times.setdefault((name, k), []).append(dt)

total = cfg.outer_iterations_count * (cfg.inner_iterations_count + 1)
best = {}
for (name, k), ts in times.items():
    best[(name, k)] = b = min(ts)
    print(
        f"{name}@K={k}: best {b * 1e3:.2f} ms/level "
        f"({b / total * 1e6:.1f} us/pass), "
        f"all {[f'{t * 1e3:.2f}' for t in ts]}"
    )
if KSPLIT:
    for name in VARIANTS:
        t1, t2 = best[(name, K)], best[(name, K2)]
        # t(k) = fence/k + L
        L = (K2 * t2 - K * t1) / (K2 - K)
        fence = (t1 - t2) * K * K2 / (K2 - K)
        print(f"{name}: per-launch {L * 1e3:.2f} ms, per-chain fence "
              f"{fence * 1e3:.1f} ms")

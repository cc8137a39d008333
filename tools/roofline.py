#!/usr/bin/env python
"""Roofline / floor accounting for the production relaxation sweep.

The round-2 headline claim was "the fine-bucket sweep is VMEM-traffic
bound" (shiftonly probe 86%); the round-3 du-iterate probe FALSIFIED the
field-count version of that claim (15 -> 13 -> 11 per-sweep field
touches moved nothing). This tool decomposes what actually binds:

1. Component microkernels on the rub fine bucket (392, 640): per-pass
   cost of a plain streaming add, a lane-rotated add (x-shift), a
   sublane-rotated add (y-shift), an fma, a divide and the phi
   transcendental (1/(2*sqrt)). Each is ONE Pallas kernel iterating
   T in-VMEM passes; timing is K-chained calls with one final fence,
   slope over K (CLAUDE.md: per-call numbers through the tunnel are
   fence-contaminated garbage).

2. The production T-iterate sweep, measured by config-differencing
   inside one program family: full-level relaxations at inner=5 vs
   inner=2 give 3 x outer extra sweeps; the slope is the true
   per-sweep cost with prologue/maintain/launch cancelled.

3. A predicted sweep time from the component rates and the kernel's
   exact per-pixel operand counts (relax_bucket._relax_bucket_full
   sweep_from_shifts: 8 shifted reads + 2 center + 11 plain reads +
   2 writes, ~33 flops of which 2 divides), printed against the
   measurement: the dominant term is the floor.

Usage: python tools/roofline.py [K_lo K_hi rounds]   (defaults 4 16 5)
Prints component lines + one final JSON summary line.
"""

import json
import os
import sys
import time

from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

HB, WB = 392, 640          # rub fine bucket
N_IN = 8                   # input fields cycled by the bodies
UNROLL = 8
T_LOOP = 1024              # fori_loop trips -> 8192 passes per call
PASSES = T_LOOP * UNROLL
FIELD_BYTES = HB * WB * 4


def _shift_xp(a):
    return jnp.concatenate([a[:, 1:], a[:, -2:-1]], axis=1)


def _shift_yp(a):
    return jnp.concatenate([a[1:, :], a[-2:-1, :]], axis=0)


# name -> (body(x, a_j), accounting dict). Accounting is per pass per
# pixel: VMEM loads/stores (field passes), plain flops, rotates, divides,
# sqrts. x is the fori-loop carry (a full (HB, WB) field).
BODIES = {
    "stream": (lambda x, a: x + a,
               dict(loads=2, stores=1, flops=1, rot=0, div=0, sqrt=0)),
    "shift_x": (lambda x, a: x + _shift_xp(a),
                dict(loads=2, stores=1, flops=1, rot=1, div=0, sqrt=0)),
    "shift_y": (lambda x, a: x + _shift_yp(a),
                dict(loads=2, stores=1, flops=1, rot=1, div=0, sqrt=0)),
    "fma": (lambda x, a: x * a + 1.25,
            dict(loads=2, stores=1, flops=2, rot=0, div=0, sqrt=0)),
    "div": (lambda x, a: a / (x + 1.0),
            dict(loads=2, stores=1, flops=1, rot=0, div=1, sqrt=0)),
    "phi": (lambda x, a: 1.0 / (2.0 * jnp.sqrt(x * x + a)),
            dict(loads=2, stores=1, flops=2, rot=0, div=1, sqrt=1)),
}

# The production T-iterate sweep's per-pixel operand counts
# (relax_bucket._relax_bucket_full.sweep_from_shifts, concat mode, grey).
SWEEP_COUNTS = dict(loads=21, stores=2, flops=31, rot=8, div=2, sqrt=0)


def microkernel(name):
    body, _ = BODIES[name]

    def kernel(*refs):
        ins = refs[:N_IN]
        out = refs[N_IN]

        def step(i, x):
            for j in range(UNROLL):
                x = body(x, ins[j][:])
            return x

        out[:] = jax.lax.fori_loop(0, T_LOOP, step, ins[0][:] * 0.5)

    from tpuflow.ops.pallas.relax_bucket import VMEM_LIMIT_BYTES

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((HB, WB), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * N_IN,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
    )

    from functools import partial

    @partial(jax.jit, static_argnums=1)
    def chained(ins, k):
        # k chained kernel calls, data-dependent to defeat CSE.
        x = ins[0]
        for _ in range(k):
            y = f(*([x] + list(ins[1:])))
            x = x + 0.0001 * y
        return x

    return chained


def slope_time(call, k_lo, k_hi, rounds, arg):
    """Per-unit time via the K-slope: (t(k_hi) - t(k_lo)) / (k_hi - k_lo),
    one fence per measurement. The slope of a MEDIAN-per-K is used (a
    difference of two noisy mins can go negative under the pool's ±3x
    multi-second noise bursts; medians of interleaved rounds are
    robust)."""
    ts = {k_lo: [], k_hi: []}
    for _ in range(rounds):
        for k in (k_lo, k_hi):
            t0 = time.perf_counter()
            np.asarray(call(arg, k))
            ts[k].append(time.perf_counter() - t0)
    med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
    return (med[k_hi] - med[k_lo]) / (k_hi - k_lo)


def main():
    k_lo = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    k_hi = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    rng = np.random.default_rng(0)
    ins = tuple(
        jnp.asarray(rng.random((HB, WB), np.float32) + 0.5)
        for _ in range(N_IN)
    )

    # ---- component rates -------------------------------------------
    comp_us = {}
    for name in BODIES:
        fn = microkernel(name)
        t0 = time.time()
        np.asarray(fn(ins, k_lo))  # compile both K programs
        np.asarray(fn(ins, k_hi))
        print(f"# {name}: compile {time.time()-t0:.0f}s", file=sys.stderr)
        per_call = slope_time(fn, k_lo, k_hi, rounds, ins)
        comp_us[name] = per_call / PASSES * 1e6
        gbs = (BODIES[name][1]["loads"] + BODIES[name][1]["stores"]) * \
            FIELD_BYTES / (per_call / PASSES) / 1e9
        print(f"{name:8s} {comp_us[name]:7.3f} us/pass  "
              f"({gbs:7.1f} GB/s of VMEM traffic at its op mix)")

    # Solve per-resource surcharges from the component mix:
    #   stream  = base (2 loads + 1 store + 1 flop)
    #   shift_* = base + rotate          -> c_rot
    #   fma     = base + 1 flop          -> c_flop
    #   div     = base + divide          -> c_div
    #   phi     = base + div + sqrt + 1f -> c_sqrt
    base = comp_us["stream"]
    c_rot = max(0.0, (comp_us["shift_x"] + comp_us["shift_y"]) / 2 - base)
    c_flop = max(0.0, comp_us["fma"] - base)
    c_div = max(0.0, comp_us["div"] - base)
    c_sqrt = max(0.0, comp_us["phi"] - comp_us["div"] - c_flop)
    c_access = base / 4  # base = 3 accesses + 1 flop ~ 4 issue slots

    # ---- measured production sweep (config-differencing) -----------
    from tpuflow.config import FlowConfig
    from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused
    from tpuflow.solver.bucketed import (
        LevelScalars, level_constants, maintain_mirror1, maintain_mirror2,
    )

    cw, ch = 584, 388
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, cw, ch, cw, ch).tree()
    f0 = jnp.asarray(np.asarray(maintain_mirror1(
        rng.random((HB, WB), np.float32) * 200, cw, ch)))
    f1 = jnp.asarray(np.asarray(maintain_mirror1(
        rng.random((HB, WB), np.float32) * 200, cw, ch)))
    u0 = jnp.asarray(np.asarray(maintain_mirror2(
        (rng.random((HB, WB), np.float32) - 0.5) * 2, cw, ch)))
    v0 = jnp.asarray(np.asarray(maintain_mirror2(
        (rng.random((HB, WB), np.float32) - 0.5) * 2, cw, ch)))

    def level_chain(inner):
        from functools import partial

        cfg = FlowConfig(inner_iterations_count=inner)
        fx, fy, ft, _ = level_constants(f0, f1, sc, cfg)

        @partial(jax.jit, static_argnums=1)
        def run(uv, k):
            u, v = uv
            for _ in range(k):
                du, dv = relax_bucket_fused(fx, fy, ft, u, v, sc, cfg,
                                            force_mode="full")
                u = u + 0.001 * du
                v = v + 0.001 * dv
            return u, v

        return run

    lvl_s = {}
    for inner in (2, 5):
        fn = level_chain(inner)
        t0 = time.time()
        np.asarray(fn((u0, v0), k_lo)[0])
        np.asarray(fn((u0, v0), k_hi)[0])
        print(f"# level inner={inner}: compile {time.time()-t0:.0f}s",
              file=sys.stderr)
        lvl_s[inner] = slope_time(
            lambda uv, k, fn=fn: fn(uv, k)[0], k_lo, k_hi, rounds, (u0, v0))
        print(f"level inner={inner}: {lvl_s[inner]*1e3:7.2f} ms "
              f"per 40x{inner} relaxation")

    outer = 40
    sweep_meas_us = (lvl_s[5] - lvl_s[2]) / (outer * 3) * 1e6
    per_outer_fixed_us = lvl_s[5] / outer * 1e6 - 5 * sweep_meas_us

    # ---- predicted sweep from components ----------------------------
    c = SWEEP_COUNTS
    pred = (
        (c["loads"] + c["stores"]) * c_access
        + c["flops"] * c_flop
        + c["rot"] * c_rot
        + c["div"] * c_div
        + c["sqrt"] * c_sqrt
    )
    parts = {
        "access": (c["loads"] + c["stores"]) * c_access,
        "flops": c["flops"] * c_flop,
        "rotates": c["rot"] * c_rot,
        "divides": c["div"] * c_div,
    }
    print(f"\nmeasured sweep: {sweep_meas_us:.2f} us   predicted from "
          f"components: {pred:.2f} us")
    for k, v in sorted(parts.items(), key=lambda kv: -kv[1]):
        print(f"  {k:8s} {v:6.2f} us ({v/pred*100:4.1f}% of prediction)")
    print(f"per-outer fixed (prologue+maintain+2 sweeps' overlap): "
          f"{per_outer_fixed_us:.2f} us")

    print(json.dumps({
        "component_us_per_pass": {k: round(v, 4) for k, v in comp_us.items()},
        "surcharges_us": {
            "access": round(c_access, 4), "flop": round(c_flop, 4),
            "rotate": round(c_rot, 4), "divide": round(c_div, 4),
            "sqrt": round(c_sqrt, 4),
        },
        "sweep_measured_us": round(sweep_meas_us, 3),
        "sweep_predicted_us": round(pred, 3),
        "prediction_parts_us": {k: round(v, 3) for k, v in parts.items()},
        "level_ms": {str(k): round(v * 1e3, 3) for k, v in lvl_s.items()},
        "bucket": [HB, WB],
        "passes_per_call": PASSES,
    }))


if __name__ == "__main__":
    main()

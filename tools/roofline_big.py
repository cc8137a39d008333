#!/usr/bin/env python
"""Floor accounting for the 1080p/4K relaxation variants (VERDICT r3 #4).

tools/roofline.py nails the rub fine bucket to the VPU-issue floor; the
1080p (du-chunked) and 4K (du-streamed) records were only relative wins.
This tool produces the missing absolute accounting:

1. HBM streaming roofline anchor: a chained jitted `x + a` on 4K-bucket
   f32 arrays (3 field passes/op, all HBM-resident) — the achievable
   HBM bandwidth on THIS chip, measured the same K-slope way as
   everything else (one fence per chain, slope of round-medians).

2. du-STREAMED level cost at the 4K fine bucket (2176, 3968): every
   sweep streams 11.5 field passes through HBM (du/dv slabs in at 2.5,
   7 term windows in, du/dv chunks out — counted from
   relax_du._relax_du_streamed's DMA schedule) and each outer adds a
   15-pass prologue, so the PER-LEVEL HBM-traffic bound is
   40*(15 + inner*11.5) * bucket_bytes / measured_bandwidth. The
   printed level_4k_innerN_pct_of_hbm_roofline keys are the BASELINE.md
   deliverable (the inner-differenced per-sweep split is also printed,
   with a pool-noise caveat).

3. du-CHUNKED per-sweep cost at the 1080p fine bucket (1088, 2048),
   against two bounds: the VPU-issue floor scaled from the measured rub
   sweep (2.56 us at (392, 640) -> x area ratio; the chunked variant
   keeps iterate+terms VMEM-resident so HBM traffic is near zero) and
   the hypothetical HBM bound if it streamed like the 4K variant.

4. 4K end-to-end decomposition: the capability pipeline at inner=5 vs
   inner=2 (TPUFLOW_UNROLL=0, the 4K production configuration) — the
   difference is 3 x outer sweeps across every level, giving the
   relax-sweep share of the ~1.0 s pair (round-4 measurement; 59%);
   the rest is prologue + warp/median/resample/glue.

Usage: python tools/roofline_big.py [K_lo K_hi rounds] [--skip-e2e]
       (defaults 2 6 5; e2e adds two slow 4K pipeline compiles)
Prints progress lines + one final JSON summary.
"""

import json
import os
import sys
import time

from tpuflow.utils.jitcache import setup_jit_cache  # noqa: E402

setup_jit_cache()
os.environ.setdefault("TPUFLOW_UNROLL", "0")   # the 4K production config
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

HB4K, WB4K = 2176, 3968        # 4K fine bucket (3840x2160 workload)
HB1080, WB1080 = 1088, 2048    # 1080p fine bucket
RUB_SWEEP_US = 2.56            # measured rub-bucket sweep (tools/roofline.py)
RUB_PIX = 392 * 640
# Streamed-variant HBM traffic in field passes (field = hb*wb*4 bytes),
# counted from _relax_du_streamed's DMA schedule at C=64 chunks:
STREAM_PASSES_PER_SWEEP = 11.5   # du/dv slabs in (2.5) + 7 term windows + 2 out
STREAM_PASSES_PER_OUTER = 15.0   # prologue: 4 iterate slabs + consts in, 7 terms out


def slope_time(call, k_lo, k_hi, rounds, arg):
    """K-slope of round-medians, ARM-ORDER ROTATED per round (CLAUDE.md
    measurement trap #4: the first arm of a fixed-order round pays a
    ~1.28x pool transient)."""
    ts = {k_lo: [], k_hi: []}
    for r in range(rounds):
        order = (k_lo, k_hi) if r % 2 == 0 else (k_hi, k_lo)
        for k in order:
            t0 = time.perf_counter()
            np.asarray(call(arg, k))
            ts[k].append(time.perf_counter() - t0)
    med = {k: sorted(v)[len(v) // 2] for k, v in ts.items()}
    return (med[k_hi] - med[k_lo]) / (k_hi - k_lo)


def hbm_stream_rate(k_lo, k_hi, rounds):
    """Achievable HBM GB/s: chained adds on 4K-bucket arrays (each op
    reads 2 fields + writes 1, all HBM-resident at 34.5 MB/field)."""
    from functools import partial

    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.random((HB4K, WB4K), np.float32) + 0.5)
    # Long chains: at HBM-class rates one 4K-bucket op is ~0.1-1 ms, far
    # below the ~64 ms fence + pool noise; 128 ops/k-unit puts the
    # k_hi-k_lo delta in the hundreds of ms where the slope is resolvable.
    n_ops = 128

    @partial(jax.jit, static_argnums=1)
    def chain(x, k):
        for _ in range(k * n_ops):
            # optimization_barrier: without it XLA fuses the WHOLE chain
            # into one kLoop fusion (one read of x/a, one write) and the
            # measurement becomes VPU fma issue, not HBM streaming
            # (round-4 code-review finding, verified on this toolchain).
            # The barrier forces each op to materialize: 2 reads+1 write.
            x = jax.lax.optimization_barrier(x * 0.9999 + a)
        return x

    np.asarray(chain(a, k_lo))
    np.asarray(chain(a, k_hi))
    per_call = slope_time(chain, k_lo, k_hi, rounds, a)
    per_op = per_call / n_ops
    gbs = 3 * HB4K * WB4K * 4 / per_op / 1e9
    return gbs, per_op


def level_chain(hb, wb, inner, mode):
    """One full 40 x inner relaxation at (hb, wb) via the forced du
    variant, K-chained (data-dependent) for slope timing."""
    from functools import partial

    from tpuflow.config import FlowConfig
    from tpuflow.ops.pallas.relax_du import relax_du_fused
    from tpuflow.solver.bucketed import (
        LevelScalars, level_constants, maintain_mirror1, maintain_mirror2,
    )

    cw, ch = wb - 16, hb - 16
    rng = np.random.default_rng(1)
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, cw, ch, cw, ch).tree()
    cfg = FlowConfig(inner_iterations_count=inner)
    f0 = jnp.asarray(np.asarray(maintain_mirror1(
        rng.random((hb, wb), np.float32) * 200, cw, ch)))
    f1 = jnp.asarray(np.asarray(maintain_mirror1(
        rng.random((hb, wb), np.float32) * 200, cw, ch)))
    u0 = jnp.asarray(np.asarray(maintain_mirror2(
        (rng.random((hb, wb), np.float32) - 0.5) * 2, cw, ch)))
    v0 = jnp.asarray(np.asarray(maintain_mirror2(
        (rng.random((hb, wb), np.float32) - 0.5) * 2, cw, ch)))
    fx, fy, ft, _ = level_constants(f0, f1, sc, cfg)

    @partial(jax.jit, static_argnums=1)
    def run(uv, k):
        u, v = uv
        for _ in range(k):
            du, dv = relax_du_fused(fx, fy, ft, u, v, sc, cfg,
                                    force_mode=mode)
            u = u + 0.001 * du
            v = v + 0.001 * dv
        return u, v

    return run, (u0, v0)


def sweep_cost(hb, wb, mode, k_lo, k_hi, rounds):
    """Per-sweep seconds by inner=5/2 config-differencing (slope-timed;
    prologue, maintain and launch cancel)."""
    lvl = {}
    for inner in (2, 5):
        fn, uv = level_chain(hb, wb, inner, mode)
        t0 = time.time()
        np.asarray(fn(uv, k_lo)[0])
        np.asarray(fn(uv, k_hi)[0])
        print(f"# {mode}@({hb},{wb}) inner={inner}: compile "
              f"{time.time()-t0:.0f}s", file=sys.stderr)
        lvl[inner] = slope_time(lambda uv_, k, fn=fn: fn(uv_, k)[0],
                                k_lo, k_hi, rounds, uv)
        print(f"{mode}@({hb},{wb}) inner={inner}: {lvl[inner]*1e3:8.2f} ms "
              f"per 40x{inner} level")
    per_sweep = (lvl[5] - lvl[2]) / (40 * 3)
    per_outer_fixed = lvl[5] / 40 - 5 * per_sweep
    return per_sweep, per_outer_fixed, lvl


def e2e_4k_decomposition(k_lo, k_hi, rounds):
    """4K pair at inner=5 vs inner=2 (production scanned pipeline):
    difference = 3 x 40 sweeps at every level -> the sweep share."""
    import dataclasses
    from functools import partial

    from tpuflow.config import FlowConfig
    from tpuflow.solver.bucketed import compiled_full_pipeline

    rng = np.random.default_rng(2)
    h, w = 2160, 3840
    f0 = jnp.asarray(rng.random((h, w), np.float32) * 255)
    f1 = jnp.asarray(rng.random((h, w), np.float32) * 255)
    total = {}
    for inner in (2, 5):
        cfg = dataclasses.replace(FlowConfig(), inner_iterations_count=inner)
        pipe = compiled_full_pipeline((h, w), cfg)

        @partial(jax.jit, static_argnums=2)
        def chain(a, b, k, pipe=pipe):
            x, y = a, b
            for _ in range(k):
                u, v = pipe(x, y)
                x = a + 1e-6 * u
                y = b + 1e-6 * v
            return x

        t0 = time.time()
        np.asarray(chain(f0, f1, k_lo))
        np.asarray(chain(f0, f1, k_hi))
        print(f"# 4K pipeline inner={inner}: compile {time.time()-t0:.0f}s",
              file=sys.stderr)
        total[inner] = slope_time(
            lambda ab, k, c=chain: c(ab[0], ab[1], k), k_lo, k_hi, rounds,
            (f0, f1))
        print(f"4K pair inner={inner}: {total[inner]*1e3:8.1f} ms")
    sweep_total_5 = (total[5] - total[2]) / 3 * 5   # all levels' 200 sweeps
    return {
        "pair_ms_inner5": round(total[5] * 1e3, 1),
        "pair_ms_inner2": round(total[2] * 1e3, 1),
        "sweep_share_ms": round(sweep_total_5 * 1e3, 1),
        "rest_ms": round((total[5] - sweep_total_5) * 1e3, 1),
    }


def main():
    pos = [a for a in sys.argv[1:] if not a.startswith("-")]
    k_lo = int(pos[0]) if len(pos) > 0 else 2
    k_hi = int(pos[1]) if len(pos) > 1 else 6
    rounds = int(pos[2]) if len(pos) > 2 else 5

    gbs, per_add = hbm_stream_rate(k_lo, k_hi, rounds)
    print(f"HBM stream: {gbs:7.1f} GB/s ({per_add*1e3:.3f} ms per 4K-bucket "
          f"add, 3 passes)")

    out = {"hbm_gbs": round(gbs, 1)}

    # 4K streamed level vs its HBM bound. The PER-LEVEL comparison is
    # the robust one: each measured level time is a clean K-slope of one
    # program; the inner=5/2 DIFFERENCE (sweep split) subtracts two
    # multi-second measurements on a pool with ±3x noise bursts and is
    # reported with that caveat.
    s4k, fix4k, lvl4k = sweep_cost(HB4K, WB4K, "streamed", k_lo, k_hi, rounds)
    field = HB4K * WB4K * 4
    for inner in (2, 5):
        passes = 40 * (STREAM_PASSES_PER_OUTER
                       + inner * STREAM_PASSES_PER_SWEEP)
        bound = passes * field / (gbs * 1e9)
        pct = bound / lvl4k[inner] * 100
        print(f"4K streamed level inner={inner}: measured "
              f"{lvl4k[inner]*1e3:.1f} ms vs HBM traffic bound "
              f"{bound*1e3:.1f} ms -> {pct:.0f}% of roofline")
        out[f"level_4k_inner{inner}_ms"] = round(lvl4k[inner] * 1e3, 1)
        out[f"level_4k_inner{inner}_pct_of_hbm_roofline"] = round(pct, 1)
    bound4k = STREAM_PASSES_PER_SWEEP * field / (gbs * 1e9)
    print(f"4K streamed sweep (inner-differenced, noise-caveat): "
          f"{s4k*1e6:8.1f} us (HBM bound {bound4k*1e6:.1f} us); "
          f"per-outer fixed {fix4k*1e6:.0f} us")
    out["sweep_4k_us"] = round(s4k * 1e6, 1)
    out["sweep_4k_hbm_bound_us"] = round(bound4k * 1e6, 1)
    out["per_outer_fixed_4k_us"] = round(fix4k * 1e6, 1)

    # 1080p chunked sweep vs the VPU floor scaled from rub.
    s1080, fix1080, _ = sweep_cost(HB1080, WB1080, "chunked", k_lo, k_hi,
                                   rounds)
    vpu_bound = RUB_SWEEP_US * 1e-6 * (HB1080 * WB1080) / RUB_PIX
    hbm_if_streamed = STREAM_PASSES_PER_SWEEP * HB1080 * WB1080 * 4 / (gbs * 1e9)
    print(f"1080p chunked sweep: {s1080*1e6:8.1f} us  (VPU floor scaled "
          f"from rub {vpu_bound*1e6:.1f} us -> {vpu_bound/s1080*100:.0f}%; "
          f"HBM-if-streamed {hbm_if_streamed*1e6:.1f} us); per-outer fixed "
          f"{fix1080*1e6:.0f} us")
    out["sweep_1080_us"] = round(s1080 * 1e6, 1)
    out["sweep_1080_vpu_bound_us"] = round(vpu_bound * 1e6, 1)
    out["sweep_1080_pct_of_vpu_floor"] = round(vpu_bound / s1080 * 100, 1)
    out["per_outer_fixed_1080_us"] = round(fix1080 * 1e6, 1)

    if "--skip-e2e" not in sys.argv:
        out["e2e_4k"] = e2e_4k_decomposition(k_lo, k_hi, max(3, rounds - 2))

    print(json.dumps(out))


if __name__ == "__main__":
    main()

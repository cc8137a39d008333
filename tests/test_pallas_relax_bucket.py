"""Bucket-shaped Pallas relaxation kernel vs the XLA bucketed path
(interpret mode on CPU).

Exact-graph parity holds for a single sweep; across many phi/ksi updates
the lagged nonlinearity amplifies compiled-vs-interpret 1-ulp noise at
phi-sensitive pixels (|grad flow| ~ e_smooth), so multi-iteration checks
bound the mean EPE, not bitwise equality (the full-pipeline EPE budget vs
the oracle is 0.05 px; these paths agree to ~1e-3).

v2 kernel: all three data constancies run in the kernel; the second-order
tensor for gradient/log arrives as HBM-streamed per-level constants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused, relax_bucket_supported
from tpuflow.solver.bucketed import (
    LevelScalars,
    _relax_dyn,
    level_constants,
    maintain_mirror1,
)


def setup(HB=128, WB=256, cw=200, ch=100, seed=4):
    rng = np.random.default_rng(seed)

    def mkfield(scale=1.0, base=0.0):
        a = np.zeros((HB, WB), np.float32)
        a[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * scale + base
        return jnp.asarray(a)

    sc = LevelScalars.make(cw, ch, 1.3, 1.7, 35.0, 584, 388, cw, ch)
    f0 = maintain_mirror1(mkfield(255.0), sc.cw, sc.ch)
    f1 = maintain_mirror1(f0 + mkfield(8.0), sc.cw, sc.ch)
    u = maintain_mirror1(mkfield(1.0, -0.5), sc.cw, sc.ch)
    v = maintain_mirror1(mkfield(1.0, -0.5), sc.cw, sc.ch)
    return f0, f1, u, v, sc, (cw, ch)


def run_kernel(f0, f1, u, v, sc, cfg, mode=None):
    fx, fy, ft, J = level_constants(f0, f1, sc.tree(), cfg)
    tensor = None if cfg.data_constancy == DataConstancy.GREY else J
    return relax_bucket_fused(
        fx, fy, ft, u, v, sc.tree(), cfg, tensor=tensor, interpret=True,
        force_mode=mode,
    )


@pytest.mark.parametrize("mode", ["full", "chunked"])
@pytest.mark.parametrize(
    "constancy",
    [DataConstancy.GREY, DataConstancy.GRADIENT, DataConstancy.LOG_DERIVATIVES],
)
def test_single_sweep_matches_xla(constancy, mode):
    f0, f1, u, v, sc, (cw, ch) = setup()
    cfg = FlowConfig(
        outer_iterations_count=1, inner_iterations_count=1, data_constancy=constancy
    )
    want = _relax_dyn(f0, f1, u, v, sc.tree(), cfg, use_pallas=False)
    got = run_kernel(f0, f1, u, v, sc, cfg, mode)
    for g, w in zip(got, want):
        d = np.abs(np.asarray(g)[:ch, :cw] - np.asarray(w)[:ch, :cw])
        assert d.max() < 1e-5, (constancy, mode, d.max())


@pytest.mark.parametrize("mode", ["full", "chunked"])
@pytest.mark.parametrize(
    "outer,inner,constancy",
    [
        (3, 2, DataConstancy.GREY),
        (2, 3, DataConstancy.GREY),
        (3, 2, DataConstancy.GRADIENT),
        (2, 3, DataConstancy.LOG_DERIVATIVES),
    ],
)
def test_multi_iteration_mean_epe_bounded(outer, inner, constancy, mode):
    f0, f1, u, v, sc, (cw, ch) = setup()
    cfg = FlowConfig(
        outer_iterations_count=outer,
        inner_iterations_count=inner,
        data_constancy=constancy,
    )
    want = _relax_dyn(f0, f1, u, v, sc.tree(), cfg, use_pallas=False)
    got = run_kernel(f0, f1, u, v, sc, cfg, mode)
    epe = np.hypot(
        np.asarray(got[0])[:ch, :cw] - np.asarray(want[0])[:ch, :cw],
        np.asarray(got[1])[:ch, :cw] - np.asarray(want[1])[:ch, :cw],
    ).mean()
    assert epe < 1e-3, (constancy, epe)
    # Ghost regions iterate unmaintained in the kernel (their values are
    # masked out of valid pixels) — they must still stay finite.
    assert np.isfinite(np.asarray(got[0])).all()
    assert np.isfinite(np.asarray(got[1])).all()


def test_vmap_lifts_kernel_to_grid():
    # The batched pipeline vmaps the kernel over frame pairs (one grid
    # instance per pair); outputs must match per-pair single calls.
    import jax

    f0, f1, u, v, sc, (cw, ch) = setup()
    cfg = FlowConfig(outer_iterations_count=2, inner_iterations_count=2)
    fx, fy, ft, _ = level_constants(f0, f1, sc.tree(), cfg)
    stack = lambda a: jnp.stack([a, a * 0.5])  # noqa: E731

    def one(fx_, fy_, ft_, u_, v_):
        return relax_bucket_fused(
            fx_, fy_, ft_, u_, v_, sc.tree(), cfg, interpret=True,
            force_mode="full",
        )

    DU, DV = jax.vmap(one)(stack(fx), stack(fy), stack(ft), stack(u), stack(v))
    du0, dv0 = one(fx, fy, ft, u, v)
    # vmapped and plain are different XLA programs -> 1-ulp fma noise,
    # amplified at phi-sensitive pixels; bound the mean like the other
    # cross-program parity tests.
    d = np.abs(np.asarray(DU[0])[:ch, :cw] - np.asarray(du0)[:ch, :cw])
    assert d.mean() < 1e-6 and d.max() < 1e-2, (d.mean(), d.max())


def test_supported_gating():
    cfg = FlowConfig()
    assert relax_bucket_supported(448, 640, cfg)       # top rub bucket fits
    assert relax_bucket_supported(1088, 2048, cfg)     # 1080p fine bucket fits
    assert not relax_bucket_supported(2176, 3968, cfg)  # 4K falls back
    assert not relax_bucket_supported(100, 640, cfg)    # non-64-multiple rows
    # v2: gradient/log run in the kernel too
    assert relax_bucket_supported(448, 640, FlowConfig(data_constancy=DataConstancy.GRADIENT))
    assert relax_bucket_supported(448, 640, FlowConfig(data_constancy=DataConstancy.LOG_DERIVATIVES))

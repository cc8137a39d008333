"""Bucket-shaped Pallas relaxation kernel vs the XLA bucketed path
(interpret mode on CPU).

Exact-graph parity holds for a single sweep; across many phi/ksi updates
the lagged nonlinearity amplifies compiled-vs-interpret 1-ulp noise at
phi-sensitive pixels (|grad flow| ~ e_smooth), so multi-iteration checks
bound the mean EPE, not bitwise equality (the full-pipeline EPE budget vs
the oracle is 0.05 px; these paths agree to ~1e-3).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused, relax_bucket_supported
from tpuflow.solver.bucketed import LevelScalars, _relax_dyn, maintain_mirror1


def derivs(f0, f1, sc):
    from tpuflow.ops.solver_ops import _shifts

    d4x, d4y = sc.div4hx, sc.div4hy
    f0_c, f0_xp, f0_xm, f0_yp, f0_ym = _shifts(f0)
    f1_c, f1_xp, f1_xm, f1_yp, f1_ym = _shifts(f1)
    fx = (f0_xp - f0_xm + f1_xp - f1_xm) / d4x
    fy = (f0_yp - f0_ym + f1_yp - f1_ym) / d4y
    ft = f1_c - f0_c
    return fx, fy, ft


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


def test_single_sweep_matches_xla():
    f0, f1, u, v, sc, (cw, ch) = setup()
    cfg = FlowConfig(outer_iterations_count=1, inner_iterations_count=1)
    want = _relax_dyn(f0, f1, u, v, sc.tree(), cfg, use_pallas=False)
    fx, fy, ft = derivs(f0, f1, sc)
    got = relax_bucket_fused(fx, fy, ft, u, v, sc.tree(), cfg, interpret=True)
    for g, w in zip(got, want):
        d = np.abs(np.asarray(g)[:ch, :cw] - np.asarray(w)[:ch, :cw])
        assert d.max() < 1e-5, d.max()


@pytest.mark.parametrize("outer,inner", [(3, 2), (2, 3)])
def test_multi_iteration_mean_epe_bounded(outer, inner):
    f0, f1, u, v, sc, (cw, ch) = setup()
    cfg = FlowConfig(outer_iterations_count=outer, inner_iterations_count=inner)
    want = _relax_dyn(f0, f1, u, v, sc.tree(), cfg, use_pallas=False)
    fx, fy, ft = derivs(f0, f1, sc)
    got = relax_bucket_fused(fx, fy, ft, u, v, sc.tree(), cfg, interpret=True)
    epe = np.hypot(
        np.asarray(got[0])[:ch, :cw] - np.asarray(want[0])[:ch, :cw],
        np.asarray(got[1])[:ch, :cw] - np.asarray(want[1])[:ch, :cw],
    ).mean()
    assert epe < 1e-3, epe


def test_supported_gating():
    cfg = FlowConfig()
    assert relax_bucket_supported(448, 640, cfg)       # top rub bucket fits
    assert not relax_bucket_supported(2112, 2176, cfg)  # 2K frames fall back
    assert not relax_bucket_supported(100, 640, cfg)    # non-64-multiple rows
    assert not relax_bucket_supported(
        448, 640, FlowConfig(data_constancy=DataConstancy.GRADIENT)
    )

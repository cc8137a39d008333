"""Parity tests for the fused per-level kernel (ops/pallas/level_fused.py).

The kernel fuses level_constants + _relax_dyn + add + mirror maintenance +
median into one Pallas program; interpret mode pins it against the exact
XLA component chain it replaces. Single-sweep runs must agree to ulp
noise; multi-iteration runs amplify 1-ulp cross-program noise through the
lagged nonlinearity (CLAUDE.md), so they are bounded on MEAN EPE like the
relax-kernel tests.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.median import median
from tpuflow.ops.pallas.level_fused import (
    _ghost_r,
    level_fused,
    level_fused_supported,
)
from tpuflow.solver.bucketed import (
    LevelScalars,
    _relax_dyn,
    maintain_mirror,
    maintain_mirror1,
    maintain_mirror2,
)

CW, CH, HB, WB = 101, 59, 64, 128


def setup(seed=3):
    rng = np.random.default_rng(seed)

    def mk(s, pos=False):
        a = np.zeros((HB, WB), np.float32)
        val = rng.standard_normal((CH, CW)).astype(np.float32) * s
        if pos:
            val = np.abs(val) + 1.0
        a[:CH, :CW] = val
        return jnp.asarray(a)

    sc = LevelScalars.make(CW, CH, 1.3, 1.2, 35.0, CW, CH, CW, CH).tree()
    f0 = maintain_mirror1(mk(20.0, True), CW, CH)
    f1 = maintain_mirror1(mk(20.0, True), CW, CH)
    u = maintain_mirror2(mk(0.5), CW, CH)
    v = maintain_mirror2(mk(0.5), CW, CH)
    return f0, f1, u, v, sc


def reference_chain(f0, f1, u, v, sc, cfg):
    du, dv = _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    uu, vv = u + du, v + dv
    gr = _ghost_r(cfg)
    uu = maintain_mirror(uu, CW, CH, gr)
    vv = maintain_mirror(vv, CW, CH, gr)
    r = cfg.median_radius
    if r - (r % 2 == 0) > 1:
        uu = median(uu, r)
        vv = median(vv, r)
    return uu, vv


@pytest.mark.parametrize("radius", [1, 3, 5, 7])
@pytest.mark.parametrize(
    "constancy",
    [DataConstancy.GREY, DataConstancy.GRADIENT, DataConstancy.LOG_DERIVATIVES],
)
def test_single_sweep_and_median_match_xla(constancy, radius):
    # 1 outer x 1 inner keeps the lagged nonlinearity from amplifying ulp
    # noise: derivative + sweep + add + maintain + median must all agree
    # tightly, for every constancy and median width.
    f0, f1, u, v, sc = setup()
    cfg = FlowConfig(
        outer_iterations_count=1, inner_iterations_count=1,
        median_radius=radius, data_constancy=constancy,
    )
    assert level_fused_supported(HB, WB, cfg)
    want_u, want_v = reference_chain(f0, f1, u, v, sc, cfg)
    got_u, got_v = level_fused(f0, f1, u, v, sc, cfg, interpret=True)
    d = np.maximum(
        np.abs(np.asarray(got_u)[:CH, :CW] - np.asarray(want_u)[:CH, :CW]),
        np.abs(np.asarray(got_v)[:CH, :CW] - np.asarray(want_v)[:CH, :CW]),
    )
    assert d.max() < 1e-5, (constancy, radius, d.max())
    assert np.isfinite(np.asarray(got_u)).all()
    assert np.isfinite(np.asarray(got_v)).all()


@pytest.mark.parametrize(
    "outer,inner,constancy",
    [
        (3, 5, DataConstancy.GREY),
        (2, 3, DataConstancy.GRADIENT),
        (3, 2, DataConstancy.LOG_DERIVATIVES),
    ],
)
def test_multi_iteration_mean_epe_bounded(outer, inner, constancy):
    f0, f1, u, v, sc = setup()
    cfg = FlowConfig(
        outer_iterations_count=outer, inner_iterations_count=inner,
        median_radius=5, data_constancy=constancy,
    )
    want_u, want_v = reference_chain(f0, f1, u, v, sc, cfg)
    got_u, got_v = level_fused(f0, f1, u, v, sc, cfg, interpret=True)
    epe = np.hypot(
        np.asarray(got_u)[:CH, :CW] - np.asarray(want_u)[:CH, :CW],
        np.asarray(got_v)[:CH, :CW] - np.asarray(want_v)[:CH, :CW],
    ).mean()
    assert epe < 1e-3, (constancy, epe)

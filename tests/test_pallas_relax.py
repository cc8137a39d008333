"""Pallas fused relaxation kernel vs the XLA scan path (interpret mode on
the CPU mesh — SURVEY.md §4 item 3)."""

import numpy as np
import pytest

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.pallas.relax import relax_fused, relax_supported, _padded_bytes
from tpuflow.solver.level import relax


def inputs(h=24, w=33):
    rng = np.random.default_rng(7)
    f0 = (rng.random((h, w), dtype=np.float32) * 255.0).astype(np.float32)
    f1 = (f0 + rng.random((h, w), dtype=np.float32) * 8.0).astype(np.float32)
    u = (rng.random((h, w), dtype=np.float32) - 0.5).astype(np.float32)
    v = (rng.random((h, w), dtype=np.float32) - 0.5).astype(np.float32)
    return f0, f1, u, v


@pytest.mark.parametrize("constancy", [DataConstancy.GREY])
def test_relax_fused_matches_scan_path(constancy):
    f0, f1, u, v = inputs()
    cfg = FlowConfig(
        outer_iterations_count=3,
        inner_iterations_count=2,
        data_constancy=constancy,
    )
    want_du, want_dv = relax(f0, f1, u, v, 1.0, 1.0, cfg, use_pallas=False)
    got_du, got_dv = relax_fused(f0, f1, u, v, 1.0, 1.0, cfg, interpret=True)
    np.testing.assert_allclose(np.asarray(got_du), np.asarray(want_du), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_dv), np.asarray(want_dv), rtol=1e-4, atol=1e-4)


def test_relax_fused_anisotropic_spacing():
    f0, f1, u, v = inputs(16, 20)
    cfg = FlowConfig(outer_iterations_count=2, inner_iterations_count=3)
    want = relax(f0, f1, u, v, 1.4, 2.1, cfg, use_pallas=False)
    got = relax_fused(f0, f1, u, v, 1.4, 2.1, cfg, interpret=True)
    for g, w_ in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w_), rtol=1e-4, atol=1e-4)


def test_relax_supported_gating():
    cfg = FlowConfig()
    assert relax_supported(388, 584, cfg)  # the reference workload fits
    assert not relax_supported(4000, 3000, cfg)  # 4K+ falls back to XLA
    assert _padded_bytes(388, 584) == 392 * 640 * 4
    # Gradient/log constancy currently routes to the XLA path.
    assert not relax_supported(64, 64, FlowConfig(data_constancy=DataConstancy.GRADIENT))
    assert not relax_supported(
        64, 64, FlowConfig(data_constancy=DataConstancy.LOG_DERIVATIVES)
    )


def test_more_iterations_longer_divergence():
    # 40x5 default schedule in interpret mode on a tiny field: the kernel's
    # fori_loop structure must execute all outer iterations (flow converges
    # further than with the 3x2 schedule).
    f0, f1, u, v = inputs(9, 12)
    short = FlowConfig(outer_iterations_count=2, inner_iterations_count=1)
    long = FlowConfig(outer_iterations_count=12, inner_iterations_count=3)
    du_s, _ = relax_fused(f0, f1, u, v, 1.0, 1.0, short, interpret=True)
    du_l, _ = relax_fused(f0, f1, u, v, 1.0, 1.0, long, interpret=True)
    assert not np.allclose(np.asarray(du_s), np.asarray(du_l), atol=1e-6)

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


# ---------------------------------------------------------------------------
# Whole-level kernel (resample -> ONE Mosaic kernel, trimmed carries)
# ---------------------------------------------------------------------------

def test_warp_max_disp_pinned():
    # level_fused duplicates the constant to avoid a module cycle.
    from tpuflow.ops.pallas import level_fused as lf
    from tpuflow.solver import bucketed as bk

    assert lf.WARP_MAX_DISP == bk.WARP_MAX_DISP


def _whole_setup(seed=7, flow_scale=0.4, h0=48, w0=72, prev=(32, 21),
                 level=(36, 24)):
    """Frames at full res (top bucket) + a previous-level trimmed flow."""
    from tpuflow.solver.bucketed import bucket_dims

    rng = np.random.default_rng(seed)
    cw, ch = level
    prev_cw, prev_ch = prev
    top_bucket = bucket_dims(w0, h0)
    h0b, w0b = top_bucket

    f = np.zeros((2, h0b, w0b), np.float32)
    f[:, :h0, :w0] = np.abs(
        rng.standard_normal((2, h0, w0))
    ).astype(np.float32) * 60.0 + 20.0

    prev_eff = (
        -(-(prev_ch + 2) // 8) * 8,
        -(-(prev_cw + 2) // 128) * 128,
    )
    u_t = np.zeros(prev_eff, np.float32)
    v_t = np.zeros(prev_eff, np.float32)
    u_t[:prev_ch, :prev_cw] = (
        rng.standard_normal((prev_ch, prev_cw)).astype(np.float32) * flow_scale
    )
    v_t[:prev_ch, :prev_cw] = (
        rng.standard_normal((prev_ch, prev_cw)).astype(np.float32) * flow_scale
    )

    sc = LevelScalars.make(
        cw, ch, w0 / cw, h0 / ch, 35.0, w0, h0, prev_cw, prev_ch
    ).tree()
    return jnp.asarray(f), jnp.asarray(u_t), jnp.asarray(v_t), sc, top_bucket


def _classic_level(f, u_t, v_t, sc, bucket, top_bucket, cfg):
    """The pre-trim reference: embed the carry, run the classic step."""
    from tpuflow.solver.bucketed import bucketed_level_step

    h0b, w0b = top_bucket
    u_prev = jnp.zeros((h0b, w0b), jnp.float32).at[
        : u_t.shape[0], : u_t.shape[1]
    ].set(u_t)
    v_prev = jnp.zeros((h0b, w0b), jnp.float32).at[
        : v_t.shape[0], : v_t.shape[1]
    ].set(v_t)
    return bucketed_level_step(
        f[0], f[1], u_prev, v_prev, sc, bucket, top_bucket, cfg,
        use_pallas=False,
    )


@pytest.mark.parametrize(
    "constancy",
    [DataConstancy.GREY, DataConstancy.GRADIENT, DataConstancy.LOG_DERIVATIVES],
)
def test_whole_level_single_sweep_matches_classic(constancy):
    from tpuflow.solver.bucketed import (
        _trim_eff, bucketed_level_step_trim, bucket_dims,
    )

    f, u_t, v_t, sc, top_bucket = _whole_setup()
    cfg = FlowConfig(
        outer_iterations_count=1, inner_iterations_count=1,
        median_radius=5, data_constancy=constancy,
    )
    bucket = bucket_dims(int(sc[0]), int(sc[1]))
    eff = _trim_eff(bucket, sc, cfg)
    got_u, got_v = bucketed_level_step_trim(
        f, u_t, v_t, sc, eff, top_bucket, False, cfg, interpret=True
    )
    assert got_u.shape == eff
    want_u, want_v = _classic_level(f, u_t, v_t, sc, bucket, top_bucket, cfg)
    ch, cw = int(sc[1]), int(sc[0])
    d = np.maximum(
        np.abs(np.asarray(got_u)[:ch, :cw] - np.asarray(want_u)[:ch, :cw]),
        np.abs(np.asarray(got_v)[:ch, :cw] - np.asarray(want_v)[:ch, :cw]),
    )
    assert d.max() < 1e-4, (constancy, d.max())


def test_whole_level_multi_iteration_epe_bounded():
    from tpuflow.solver.bucketed import (
        _trim_eff, bucketed_level_step_trim, bucket_dims,
    )

    f, u_t, v_t, sc, top_bucket = _whole_setup()
    cfg = FlowConfig(
        outer_iterations_count=3, inner_iterations_count=5, median_radius=5,
    )
    bucket = bucket_dims(int(sc[0]), int(sc[1]))
    eff = _trim_eff(bucket, sc, cfg)
    got_u, got_v = bucketed_level_step_trim(
        f, u_t, v_t, sc, eff, top_bucket, False, cfg, interpret=True
    )
    want_u, want_v = _classic_level(f, u_t, v_t, sc, bucket, top_bucket, cfg)
    ch, cw = int(sc[1]), int(sc[0])
    epe = np.hypot(
        np.asarray(got_u)[:ch, :cw] - np.asarray(want_u)[:ch, :cw],
        np.asarray(got_v)[:ch, :cw] - np.asarray(want_v)[:ch, :cw],
    ).mean()
    assert epe < 1e-3, epe


def test_whole_level_outlier_fallback_matches_classic():
    # Displacements beyond the warp fast window must take the XLA gather
    # branch and still match the classic step exactly (same code path).
    from tpuflow.solver.bucketed import (
        _trim_eff, bucketed_level_step_trim, bucket_dims, warp_small_pred,
    )

    f, u_t, v_t, sc, top_bucket = _whole_setup(flow_scale=24.0)
    cfg = FlowConfig(
        outer_iterations_count=2, inner_iterations_count=2, median_radius=3,
    )
    bucket = bucket_dims(int(sc[0]), int(sc[1]))
    eff = _trim_eff(bucket, sc, cfg)
    got_u, got_v = bucketed_level_step_trim(
        f, u_t, v_t, sc, eff, top_bucket, False, cfg, interpret=True
    )
    want_u, want_v = _classic_level(f, u_t, v_t, sc, bucket, top_bucket, cfg)
    ch, cw = int(sc[1]), int(sc[0])
    np.testing.assert_allclose(
        np.asarray(got_u)[:ch, :cw], np.asarray(want_u)[:ch, :cw], atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_v)[:ch, :cw], np.asarray(want_v)[:ch, :cw], atol=1e-5
    )


def test_whole_level_finest_identity_matches_classic():
    # The finest level (resample == identity + ghost mask).
    from tpuflow.solver.bucketed import (
        _trim_eff, bucketed_level_step_trim, bucket_dims,
    )

    h0, w0 = 40, 56
    f, u_t, v_t, sc, top_bucket = _whole_setup(
        h0=h0, w0=w0, prev=(50, 36), level=(w0, h0)
    )
    cfg = FlowConfig(
        outer_iterations_count=2, inner_iterations_count=3, median_radius=5,
    )
    bucket = bucket_dims(w0, h0)
    assert bucket == top_bucket
    eff = _trim_eff(bucket, sc, cfg)
    got_u, got_v = bucketed_level_step_trim(
        f, u_t, v_t, sc, eff, top_bucket, True, cfg, interpret=True
    )
    want_u, want_v = _classic_level(f, u_t, v_t, sc, bucket, top_bucket, cfg)
    epe = np.hypot(
        np.asarray(got_u)[:h0, :w0] - np.asarray(want_u)[:h0, :w0],
        np.asarray(got_v)[:h0, :w0] - np.asarray(want_v)[:h0, :w0],
    ).mean()
    assert epe < 1e-3, epe



def test_inner_zero_stays_on_xla_everywhere():
    # inner_iterations_count=0 is legal (zero Jacobi sweeps in the
    # reference); the Pallas kernels' unrolled structure always executes
    # sweep 0, so every gate must refuse and keep all platforms on the
    # XLA scan path (which runs zero sweeps).
    from tpuflow.ops.pallas.level_fused import (
        level_fused_supported, level_fused_whole_supported,
    )
    from tpuflow.ops.pallas.relax_bucket import relax_bucket_supported

    cfg0 = FlowConfig(inner_iterations_count=0)
    cfg1 = FlowConfig(inner_iterations_count=1)
    assert not level_fused_supported(64, 128, cfg0)
    assert not level_fused_whole_supported(64, 128, cfg0)
    assert not relax_bucket_supported(64, 128, cfg0)
    assert level_fused_supported(64, 128, cfg1)
    assert level_fused_whole_supported(64, 128, cfg1)
    assert relax_bucket_supported(64, 128, cfg1)

"""du-iterate relaxation kernels vs the XLA anchor (interpret mode), plus
the cross-variant parity MATRIX the round-2 verdict asked for: every
Pallas sweep implementation pinned against ``_relax_dyn`` across all
three data constancies and both inner-iteration parities.

Bounds: the kernels' documented 1-ulp-class reassociations are amplified
by the lagged nonlinearity at phi-sensitive pixels, giving a random-field
noise band of ~1e-3 max / ~1e-5 mean (CLAUDE.md); real-image EPE sits at
~1e-6 (bench gate). The matrix pins mean EPE, which separates that band
from genuine defects by 3+ orders of magnitude.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.ops.pallas.relax_bucket import relax_bucket_fused
from tpuflow.ops.pallas.relax_du import (
    du_chunk_rows,
    fits_du_chunked,
    fits_du_full,
    relax_du_fused,
    streamed_supported,
)
from tpuflow.solver.bucketed import (
    LevelScalars,
    _relax_dyn,
    level_constants,
    maintain_mirror1,
    maintain_mirror2,
)

MEAN_BOUND = 5e-5
MAX_BOUND = 2e-2
# GRADIENT's second-order tensor has a documented wider random-field ulp
# band (BASELINE.md: "intrinsic ulp chaos", divergence equal across all
# engine pairs including the verified production kernel).
GRAD_MEAN_BOUND = 2e-4
GRAD_MAX_BOUND = 1e-1


def make_inputs(hb, wb, cw, ch, seed=0):
    rng = np.random.default_rng(seed)
    f0 = rng.random((hb, wb), np.float32) * 200
    f1 = rng.random((hb, wb), np.float32) * 200
    u = (rng.random((hb, wb), np.float32) - 0.5) * 2
    v = (rng.random((hb, wb), np.float32) - 0.5) * 2
    f0 = np.asarray(maintain_mirror1(f0, cw, ch))
    f1 = np.asarray(maintain_mirror1(f1, cw, ch))
    u = np.asarray(maintain_mirror2(u, cw, ch))
    v = np.asarray(maintain_mirror2(v, cw, ch))
    return f0, f1, u, v


def run_variant(kind, mode, f0, f1, u, v, sc, cfg):
    fx, fy, ft, J = level_constants(jnp.asarray(f0), jnp.asarray(f1), sc, cfg)
    tensor = None if cfg.data_constancy == DataConstancy.GREY else J
    if kind == "T":
        du, dv = relax_bucket_fused(fx, fy, ft, jnp.asarray(u),
                                    jnp.asarray(v), sc, cfg, tensor=tensor,
                                    interpret=True, force_mode=mode)
    else:
        du, dv = relax_du_fused(fx, fy, ft, jnp.asarray(u), jnp.asarray(v),
                                sc, cfg, tensor=tensor, interpret=True,
                                force_mode=mode)
    return np.asarray(du), np.asarray(dv)


VARIANTS = [
    ("T", "full"),
    ("T", "chunked"),
    ("du", "full"),
    ("du", "chunked"),
    ("du", "streamed"),
]


@pytest.mark.parametrize("constancy", list(DataConstancy))
@pytest.mark.parametrize("inner", [2, 3])
def test_parity_matrix(constancy, inner):
    """Every kernel variant vs the XLA anchor, both inner parities (the
    ping-pong/copy-back structure differs by parity) and all three data
    constancies — the VERDICT r2 #8 pin matrix."""
    hb, wb, cw, ch = 64, 128, 100, 52
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=inner,
                     data_constancy=constancy)
    sc = LevelScalars.make(cw, ch, 1.3, 1.2, 35.0, 120, 60, 90, 48).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch)
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    grad = constancy == DataConstancy.GRADIENT
    mean_b = GRAD_MEAN_BOUND if grad else MEAN_BOUND
    max_b = GRAD_MAX_BOUND if grad else MAX_BOUND
    for kind, mode in VARIANTS:
        du, dv = run_variant(kind, mode, f0, f1, u, v, sc, cfg)
        d = np.hypot(du[:ch, :cw] - du_a[:ch, :cw],
                     dv[:ch, :cw] - dv_a[:ch, :cw])
        assert d.mean() < mean_b and d.max() < max_b, (
            f"{kind}-{mode} {constancy.name} inner={inner}: "
            f"mean {d.mean():.2e} max {d.max():.2e}"
        )


def test_du_chunked_remainder_chunk():
    """hb=192 picks chunk 128 + a 64-row remainder: the static remainder
    path must agree with the anchor too."""
    hb, wb, cw, ch = 192, 128, 100, 180
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=3)
    assert du_chunk_rows(hb, wb, cfg) == 128
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, 200, 190, 150, 140).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch, seed=3)
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    du, dv = run_variant("du", "chunked", f0, f1, u, v, sc, cfg)
    d = np.hypot(du[:ch, :cw] - du_a[:ch, :cw], dv[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < MAX_BOUND, (d.mean(), d.max())


def test_vmem_gates():
    cfg = FlowConfig()
    # rub fine bucket: full variants fit.
    assert fits_du_full(448, 640, cfg)
    # 1080p fine bucket: full fails, chunked fits.
    assert not fits_du_full(1088, 2048, cfg)
    assert fits_du_chunked(1088, 2048, cfg)
    assert du_chunk_rows(1088, 2048, cfg) == 128
    # 4K fine bucket: only the streamed variant fits.
    assert not fits_du_chunked(2176, 3968, cfg)
    assert streamed_supported(2176, 3968, cfg)
    # inner=0 must stay on XLA everywhere (platform-identical zero sweeps).
    z = FlowConfig(inner_iterations_count=0)
    assert not (fits_du_full(448, 640, z) or fits_du_chunked(448, 640, z)
                or streamed_supported(448, 640, z))


def test_pallas_gate_routes_du(monkeypatch):
    """_pallas_relax_wanted admits du-only buckets (4K) on TPU and
    respects the TPUFLOW_DU_ITERATE=0 opt-out."""
    from tpuflow.solver import bucketed

    class Dev:
        platform = "tpu"

    monkeypatch.setattr(bucketed.jax, "devices", lambda: [Dev()])
    cfg = FlowConfig()
    assert bucketed._pallas_relax_wanted(2176, 3968, cfg)
    monkeypatch.setenv("TPUFLOW_DU_ITERATE", "0")
    assert not bucketed._pallas_relax_wanted(2176, 3968, cfg)
    assert bucketed._pallas_relax_wanted(1088, 2048, cfg)  # T-chunked fits


def test_streamed_fused_sweep0_parity(monkeypatch):
    """Round-5 lever: the fused-sweep0 streamed kernel vs the unfused
    sequence on a MULTI-chunk bucket (the chunk-seam stashes are the
    risky part: chunk i+1 must read pre-sweep iterate rows and the
    pre-sweep pw_yp row after chunk i was already overwritten in HBM).

    Same operand values + same update expression, but the two traces are
    DIFFERENT XLA programs, so fma/fusion choices differ at 1 ulp
    (CLAUDE.md cross-program float-noise band; debugged on a 3-chunk
    case: term fields bit-identical, du scattered 1.2e-7 max). The pin
    is therefore a TIGHT absolute bound well below the parity band plus
    the standard anchor parity, not bitwise equality."""
    hb, wb, cw, ch = 192, 128, 100, 180   # C=64 -> 3 chunks, valid rows
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=2)
    sc = LevelScalars.make(cw, ch, 1.3, 1.2, 35.0, 120, 60, 90, 48).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch, seed=5)

    monkeypatch.setenv("TPUFLOW_STREAM_FUSE0", "0")
    du_u, dv_u = run_variant("du", "streamed", f0, f1, u, v, sc, cfg)
    monkeypatch.setenv("TPUFLOW_STREAM_FUSE0", "1")
    du_f, dv_f = run_variant("du", "streamed", f0, f1, u, v, sc, cfg)

    d = np.hypot(du_u[:ch, :cw] - du_f[:ch, :cw],
                 dv_u[:ch, :cw] - dv_f[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < MAX_BOUND, (
        f"fused vs unfused: mean {d.mean():.2e} max {d.max():.2e}")

    # And against the XLA anchor on the valid region.
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    d = np.hypot(du_f[:ch, :cw] - du_a[:ch, :cw],
                 dv_f[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < MAX_BOUND, (
        f"fused streamed vs anchor: mean {d.mean():.2e} max {d.max():.2e}")


@pytest.mark.parametrize("inner", [1, 2, 3])
def test_streamed_fused_inner_parities(inner):
    """inner=1 makes the fused sweep the ONLY sweep (the post-fusion
    loop runs zero times); odd/even parities cover the copy-back
    structure."""
    hb, wb, cw, ch = 128, 128, 100, 120   # C=64 -> 2 chunks
    cfg = FlowConfig(outer_iterations_count=2, inner_iterations_count=inner)
    sc = LevelScalars.make(cw, ch, 1.3, 1.2, 35.0, 120, 60, 90, 48).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch, seed=7)
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    du, dv = run_variant("du", "streamed", f0, f1, u, v, sc, cfg)
    d = np.hypot(du[:ch, :cw] - du_a[:ch, :cw],
                 dv[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < MAX_BOUND, (
        f"inner={inner}: mean {d.mean():.2e} max {d.max():.2e}")


@pytest.mark.parametrize("ksw", [2, 5])
def test_streamed_ksweep_parity(monkeypatch, ksw):
    """Round-5 k-sweep fusion: ksw sweeps per streaming pass (trapezoid
    wavefront with per-level seam stashes) on a MULTI-chunk bucket at
    inner=5 — ksw=5 is one pass per outer (single read of
    iterate+terms), ksw=2 exercises the remainder pass (2+2+1).

    Pins: (a) TIGHT against the ksw=1 sequential layout (same operand
    values, same expressions — measured identical on this case; the
    bound allows only cross-program fma noise), (b) against the XLA
    anchor at the random-field band. The anchor max bound is wider than
    the parity matrix's: 3 outers x inner=5 amplifies the documented
    1-ulp chaos to ~2.7e-2 at isolated phi-sensitive pixels — verified
    IDENTICAL for ksw=1 (the round-4 layout) on this seed, i.e. it is
    an anchor-vs-kernel property, not a fusion artifact."""
    hb, wb, cw, ch = 192, 128, 100, 180   # C=64 -> 3 chunks
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=5)
    sc = LevelScalars.make(cw, ch, 1.3, 1.2, 35.0, 120, 60, 90, 48).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch, seed=11)
    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    monkeypatch.setenv("TPUFLOW_STREAM_KSWEEP", "1")
    du_1, dv_1 = run_variant("du", "streamed", f0, f1, u, v, sc, cfg)
    monkeypatch.setenv("TPUFLOW_STREAM_KSWEEP", str(ksw))
    du, dv = run_variant("du", "streamed", f0, f1, u, v, sc, cfg)

    d = np.hypot(du[:ch, :cw] - du_1[:ch, :cw],
                 dv[:ch, :cw] - dv_1[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < 1e-3, (
        f"ksweep={ksw} vs 1: mean {d.mean():.2e} max {d.max():.2e}")

    d = np.hypot(du[:ch, :cw] - du_a[:ch, :cw],
                 dv[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < 5e-2, (
        f"ksweep={ksw} vs anchor: mean {d.mean():.2e} max {d.max():.2e}")


def test_chunked_ksweep_parity(monkeypatch):
    """Chunked-variant k-sweep wavefront (the 1080p lever): ksw=5 vs the
    sequential ksw=1 layout on the remainder-chunk case (hb=192 ->
    C=128 + 64-row remainder, seams at BOTH chunk sizes), plus the
    anchor pin."""
    hb, wb, cw, ch = 192, 128, 100, 180
    cfg = FlowConfig(outer_iterations_count=3, inner_iterations_count=5)
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, 200, 190, 150, 140).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch, seed=13)

    monkeypatch.setenv("TPUFLOW_CHUNK_KSWEEP", "1")
    du_1, dv_1 = run_variant("du", "chunked", f0, f1, u, v, sc, cfg)
    monkeypatch.setenv("TPUFLOW_CHUNK_KSWEEP", "5")
    du_5, dv_5 = run_variant("du", "chunked", f0, f1, u, v, sc, cfg)
    d = np.hypot(du_1[:ch, :cw] - du_5[:ch, :cw],
                 dv_1[:ch, :cw] - dv_5[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < 1e-3, (
        f"chunked ksw=5 vs 1: mean {d.mean():.2e} max {d.max():.2e}")

    du_a, dv_a = map(
        np.asarray, _relax_dyn(f0, f1, u, v, sc, cfg, use_pallas=False)
    )
    d = np.hypot(du_5[:ch, :cw] - du_a[:ch, :cw],
                 dv_5[:ch, :cw] - dv_a[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < 5e-2, (
        f"chunked ksw=5 vs anchor: mean {d.mean():.2e} max {d.max():.2e}")


def test_chunked_prologue_db_parity(monkeypatch):
    """TPUFLOW_CHUNK_PRO_DB=1 (double-buffered u/v/const staging) must
    match the default single-slot layout on the remainder-chunk case —
    the prefetch chain crosses both the C-chunks and the trailing
    remainder chunk."""
    hb, wb, cw, ch = 192, 128, 100, 180
    cfg = FlowConfig(outer_iterations_count=2, inner_iterations_count=3)
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, 200, 190, 150, 140).tree()
    f0, f1, u, v = make_inputs(hb, wb, cw, ch, seed=17)
    monkeypatch.setenv("TPUFLOW_CHUNK_PRO_DB", "0")
    du_0, dv_0 = run_variant("du", "chunked", f0, f1, u, v, sc, cfg)
    monkeypatch.setenv("TPUFLOW_CHUNK_PRO_DB", "1")
    du_1, dv_1 = run_variant("du", "chunked", f0, f1, u, v, sc, cfg)
    d = np.hypot(du_0[:ch, :cw] - du_1[:ch, :cw],
                 dv_0[:ch, :cw] - dv_1[:ch, :cw])
    assert d.mean() < MEAN_BOUND and d.max() < 1e-3, (
        f"chunked pro-db vs serial: mean {d.mean():.2e} max {d.max():.2e}")

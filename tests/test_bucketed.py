"""Bucketed engine vs the per-shape engine (CPU mesh).

The bucketed path must reproduce the per-shape solver inside the valid
region — same mirror boundaries (via ghost maintenance), same constants
(host-precomputed float32 scalars), same resample fractions (weights
computed on device from iota arithmetic).
"""

import numpy as np
import pytest

from tpuflow.config import DataConstancy, FlowConfig
from tpuflow.solver.bucketed import (
    bucket_dims,
    compute_flow_bucketed_async,
    maintain_mirror2,
)
from tpuflow.solver.flow2d import compute_flow, endpoint_error


def blob(h, w, cy, cx, sigma=5.0):
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    return (200.0 * np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / (2 * sigma**2))).astype(
        np.float32
    )


def test_bucket_dims():
    assert bucket_dims(584, 388) == (448, 640)
    assert bucket_dims(4, 4) == (64, 128)
    assert bucket_dims(120, 56) == (64, 128)
    # slack guarantees ghost room
    assert bucket_dims(128, 64) == (128, 256)


def test_maintain_mirror2_matches_reflect():
    rng = np.random.default_rng(0)
    a = np.zeros((16, 128), np.float32)
    h, w = 11, 100
    a[:h, :w] = rng.random((h, w), dtype=np.float32)
    out = np.asarray(maintain_mirror2(a, np.int32(w), np.int32(h)))
    # ghost rows: row h == row h-2, row h+1 == row h-3 (reference 2h-r-2)
    np.testing.assert_array_equal(out[h, :w], a[h - 2, :w])
    np.testing.assert_array_equal(out[h + 1, :w], a[h - 3, :w])
    np.testing.assert_array_equal(out[:h, w], a[:h, w - 2])
    np.testing.assert_array_equal(out[:h, w + 1], a[:h, w - 3])
    # ghost corner is the 2D reflection
    assert out[h, w] == a[h - 2, w - 2]


@pytest.mark.parametrize(
    "h,w",
    [
        (40, 48),     # single bucket
        (97, 130),    # odd sizes, two buckets in the schedule
    ],
)
def test_bucketed_matches_per_shape(h, w):
    f0 = blob(h, w, h / 2, w / 2) + blob(h, w, h / 4, w / 4, 3.0)
    f1 = blob(h, w, h / 2 + 1.2, w / 2 - 0.7) + blob(h, w, h / 4 + 0.5, w / 4 + 0.9, 3.0)
    cfg = FlowConfig(
        warp_levels_count=4,
        warp_scale_factor=0.6,
        outer_iterations_count=5,
        inner_iterations_count=3,
        median_radius=5,
        gaussian_sigma=1.0,
    )
    ref = compute_flow(f0, f1, cfg)
    ub, vb = compute_flow_bucketed_async(f0, f1, cfg)
    epe = endpoint_error(np.asarray(ub), np.asarray(vb), ref.u, ref.v)
    assert epe < 5e-4, f"bucketed vs per-shape EPE {epe}"
    assert np.isfinite(np.asarray(ub)).all()


def test_bucketed_median_radius7_matches_per_shape():
    # The side-7 median window reads 3 cells beyond the valid edge: the
    # bucketed engine must maintain radius-3 mirror ghosts before the
    # median or border pixels take medians over stale ghost values
    # (round-1 advisor finding: max EPE 8.5e-5 with only radius-2 ghosts).
    h, w = 48, 56
    f0 = blob(h, w, 24, 28) + blob(h, w, 12, 14, 3.0)
    f1 = blob(h, w, 25.1, 27.2) + blob(h, w, 12.6, 14.8, 3.0)
    cfg = FlowConfig(
        warp_levels_count=3, warp_scale_factor=0.6, outer_iterations_count=4,
        inner_iterations_count=2, median_radius=7, gaussian_sigma=0.8,
    )
    ref = compute_flow(f0, f1, cfg, engine="levels")
    ub, vb = compute_flow_bucketed_async(f0, f1, cfg)
    d = np.hypot(np.asarray(ub) - ref.u, np.asarray(vb) - ref.v)
    assert d.max() < 1e-6, f"median_radius=7 bucketed vs per-shape max diff {d.max()}"


def test_unrolled_pipeline_matches_scanned():
    # The production default unrolls the level scans so per-level weight
    # construction constant-folds; values must match the scanned program.
    from tpuflow.solver.bucketed import compiled_full_pipeline

    h, w = 48, 56
    f0 = blob(h, w, 24, 28)
    f1 = blob(h, w, 25.1, 27.2)
    cfg = FlowConfig(
        warp_levels_count=3, warp_scale_factor=0.6, outer_iterations_count=3,
        inner_iterations_count=2, median_radius=3, gaussian_sigma=0.8,
    )
    us, vs = compiled_full_pipeline((h, w), cfg, unroll=False)(f0, f1)
    uu, vu = compiled_full_pipeline((h, w), cfg, unroll=True)(f0, f1)
    epe = endpoint_error(np.asarray(uu), np.asarray(vu), np.asarray(us), np.asarray(vs))
    assert epe < 1e-5, epe


def test_bucketed_default_schedule_small():
    # Full default iteration counts on a small frame: exercises many levels
    # mapping to the same bucket program.
    f0 = blob(52, 60, 26, 30)
    f1 = blob(52, 60, 25.2, 31.1)
    cfg = FlowConfig(median_radius=3)
    ref = compute_flow(f0, f1, cfg)
    ub, vb = compute_flow_bucketed_async(f0, f1, cfg)
    epe = endpoint_error(np.asarray(ub), np.asarray(vb), ref.u, ref.v)
    assert epe < 2e-3, f"bucketed vs per-shape EPE {epe}"


def test_bucketed_batch_matches_single_and_shards():
    import jax
    from tpuflow.parallel import make_mesh
    from tpuflow.solver.bucketed import compute_flow_bucketed_batch

    b, h, w = 8, 40, 48
    f0 = np.stack([blob(h, w, 20 + 0.2 * i, 24) for i in range(b)])
    f1 = np.stack([blob(h, w, 20.9 + 0.2 * i, 25.1) for i in range(b)])
    cfg = FlowConfig(
        warp_levels_count=3, warp_scale_factor=0.6, outer_iterations_count=4,
        inner_iterations_count=2, median_radius=3, gaussian_sigma=0.8,
    )
    mesh = make_mesh((8, 1))  # all 8 devices on the data axis
    U, V = compute_flow_bucketed_batch(f0, f1, cfg, mesh=mesh)
    assert U.shape == (b, h, w)
    for i in range(0, b, 3):
        u1, v1 = compute_flow_bucketed_async(f0[i], f1[i], cfg)
        d = np.hypot(np.asarray(U[i]) - np.asarray(u1), np.asarray(V[i]) - np.asarray(v1))
        assert d.max() < 1e-5, (i, d.max())


def test_bucketed_batch_dp_padding_and_gspmd_baseline():
    # dp="shard_map" (default): per-shard single-pair engine; batch not
    # divisible by the data axis is padded by repeating the last pair and
    # trimmed. dp="gspmd": the legacy vmapped baseline. Both must match
    # the unsharded single-pair solve per pair.
    from tpuflow.parallel import make_mesh
    from tpuflow.solver.bucketed import compute_flow_bucketed_batch

    b, h, w = 5, 40, 48
    f0 = np.stack([blob(h, w, 20 + 0.3 * i, 24) for i in range(b)])
    f1 = np.stack([blob(h, w, 20.9 + 0.3 * i, 25.1) for i in range(b)])
    cfg = FlowConfig(
        warp_levels_count=3, warp_scale_factor=0.6, outer_iterations_count=4,
        inner_iterations_count=2, median_radius=3, gaussian_sigma=0.8,
    )
    mesh = make_mesh((4, 2))  # n=4 on 'data': b=5 pads to 8, trims back
    U, V = compute_flow_bucketed_batch(f0, f1, cfg, mesh=mesh)
    Ug, Vg = compute_flow_bucketed_batch(f0, f1, cfg, mesh=mesh, dp="gspmd")
    assert np.asarray(U).shape == (b, h, w)
    for i in range(b):
        u1, v1 = compute_flow_bucketed_async(f0[i], f1[i], cfg)
        e = endpoint_error(np.asarray(U[i]), np.asarray(V[i]),
                           np.asarray(u1), np.asarray(v1))
        assert e < 1e-5, f"shard_map dp pair {i}: EPE {e}"
        e = endpoint_error(np.asarray(Ug[i]), np.asarray(Vg[i]),
                           np.asarray(u1), np.asarray(v1))
        assert e < 1e-5, f"gspmd dp pair {i}: EPE {e}"


def test_bucketed_batch_dp_pallas_per_shard_no_collectives(monkeypatch):
    # The round-2 verdict's top directive: a DP mesh must run the Pallas
    # engine per chip. Pin the program contract at the jaxpr level — the
    # shard_map body CONTAINS the Mosaic kernels (whole-level path forced
    # via interpret mode so this runs on the CPU suite) and ZERO
    # cross-shard collectives (pairs are independent).
    import jax
    from tpuflow.parallel import make_mesh
    from tpuflow.solver.bucketed import compiled_full_pipeline_dp

    monkeypatch.setenv("TPUFLOW_UNROLL", "1")
    monkeypatch.setenv("TPUFLOW_WHOLE_LEVEL", "interpret")
    cfg = FlowConfig(
        warp_levels_count=2, warp_scale_factor=0.6, outer_iterations_count=2,
        inner_iterations_count=2, median_radius=3, gaussian_sigma=0.8,
    )
    mesh = make_mesh((8, 1))
    h, w = 40, 48
    fn = compiled_full_pipeline_dp((h, w), 1, mesh, "data", cfg)
    zeros = np.zeros((8, h, w), np.float32)
    jaxpr = str(jax.make_jaxpr(fn)(zeros, zeros))
    assert "pallas_call" in jaxpr, "per-shard body lost the Mosaic kernels"
    for coll in ("ppermute", "psum", "all_gather", "all_to_all",
                 "collective_permute", "reduce_scatter"):
        assert coll not in jaxpr, f"unexpected collective {coll} in DP program"
    # And it executes: per-pair equivalence against the unsharded solve.
    f0 = np.stack([blob(h, w, 20 + 0.3 * i, 24) for i in range(8)])
    f1 = np.stack([blob(h, w, 20.9 + 0.3 * i, 25.1) for i in range(8)])
    U, V = fn(f0, f1)
    u1, v1 = compute_flow_bucketed_async(f0[3], f1[3], cfg)
    e = endpoint_error(np.asarray(U[3]), np.asarray(V[3]),
                       np.asarray(u1), np.asarray(v1))
    assert e < 1e-4, f"dp interpret-kernel pair EPE {e}"


def test_bucketed_spatial_sharding_matches_unsharded():
    from tpuflow.parallel import make_mesh
    from tpuflow.solver.bucketed import compute_flow_bucketed_sharded

    h, w = 120, 140  # top bucket (128, 256): 128 rows shard over 4 devices
    f0 = blob(h, w, 60, 70, 8.0) + blob(h, w, 30, 35, 4.0)
    f1 = blob(h, w, 61.1, 69.2, 8.0) + blob(h, w, 30.7, 35.8, 4.0)
    cfg = FlowConfig(
        warp_levels_count=4, warp_scale_factor=0.6, outer_iterations_count=5,
        inner_iterations_count=3, median_radius=5, gaussian_sigma=1.0,
    )
    mesh = make_mesh((2, 4))
    us, vs = compute_flow_bucketed_sharded(f0, f1, cfg, mesh=mesh)
    u1, v1 = compute_flow_bucketed_async(f0, f1, cfg)
    epe = endpoint_error(np.asarray(us), np.asarray(vs), np.asarray(u1), np.asarray(v1))
    assert epe < 1e-5, f"sharded vs unsharded EPE {epe}"


@pytest.mark.parametrize("constancy", [DataConstancy.GRADIENT, DataConstancy.LOG_DERIVATIVES])
def test_bucketed_grad_log_matches_per_shape(constancy):
    h, w = 48, 56
    f0 = blob(h, w, 24, 28) + blob(h, w, 12, 14, 3.0)
    f1 = blob(h, w, 25.1, 27.2) + blob(h, w, 12.6, 14.8, 3.0)
    cfg = FlowConfig(
        warp_levels_count=3, warp_scale_factor=0.6, outer_iterations_count=4,
        inner_iterations_count=2, median_radius=3, gaussian_sigma=0.8,
        data_constancy=constancy,
    )
    ref = compute_flow(f0, f1, cfg, engine="levels")
    ub, vb = compute_flow_bucketed_async(f0, f1, cfg)
    epe = endpoint_error(np.asarray(ub), np.asarray(vb), ref.u, ref.v)
    assert epe < 1e-3, f"{constancy}: bucketed vs per-shape EPE {epe}"


@pytest.mark.parametrize("scale,path", [(3.0, "fast"), (30.0, "gather-fallback")])
def test_warp_dyn_paths_match_oracle(scale, path):
    # Small displacements take the masked shift-sum; displacements beyond
    # WARP_MAX_DISP trigger the runtime lax.cond gather fallback. Both must
    # match the oracle on the valid region.
    import jax.numpy as jnp

    import tpuflow.oracle as oracle
    from tpuflow.solver.bucketed import warp_dyn

    rng = np.random.default_rng(2)
    HB, WB, cw, ch = 64, 128, 100, 50
    f0 = np.zeros((HB, WB), np.float32)
    f1 = np.zeros((HB, WB), np.float32)
    f0[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 255
    f1[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 255
    u = ((rng.random((HB, WB), dtype=np.float32) - 0.5) * scale).astype(np.float32)
    v = ((rng.random((HB, WB), dtype=np.float32) - 0.5) * scale).astype(np.float32)
    got = np.asarray(
        warp_dyn(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(u), jnp.asarray(v),
            np.int32(cw), np.int32(ch), np.float32(1), np.float32(1),
            np.float32(cw - 1), np.float32(ch - 1),
        )
    )
    want = oracle.warp(f0[:ch, :cw], f1[:ch, :cw], u[:ch, :cw], v[:ch, :cw], 1.0, 1.0)
    np.testing.assert_allclose(got[:ch, :cw], want, atol=2e-4, err_msg=path)


def test_warp_disp_env_widens_fast_path(monkeypatch):
    """TPUFLOW_WARP_DISP (the cliff mitigation): displacements beyond the
    default +-4 window re-enter the fast path when D is raised at trace
    time, and the widened shift-sum stays exact vs the oracle."""
    import jax.numpy as jnp

    import tpuflow.oracle as oracle
    from tpuflow.solver.bucketed import warp_dyn, warp_small_pred

    rng = np.random.default_rng(5)
    HB, WB, cw, ch = 64, 128, 100, 50
    f0 = np.zeros((HB, WB), np.float32)
    f1 = np.zeros((HB, WB), np.float32)
    f0[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 255
    f1[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 255
    # Displacements in (-6, 6): outside the default window, inside D=8.
    u = ((rng.random((HB, WB), dtype=np.float32) - 0.5) * 12).astype(np.float32)
    v = ((rng.random((HB, WB), dtype=np.float32) - 0.5) * 12).astype(np.float32)
    args = (jnp.asarray(u), jnp.asarray(v), np.float32(1), np.float32(1),
            np.float32(cw - 1), np.float32(ch - 1))
    assert not bool(warp_small_pred(*args))          # default D=4: cliff
    monkeypatch.setenv("TPUFLOW_WARP_DISP", "8")
    assert bool(warp_small_pred(*args))              # widened: fast path
    got = np.asarray(
        warp_dyn(
            jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(u), jnp.asarray(v),
            np.int32(cw), np.int32(ch), np.float32(1), np.float32(1),
            np.float32(cw - 1), np.float32(ch - 1),
        )
    )
    want = oracle.warp(f0[:ch, :cw], f1[:ch, :cw], u[:ch, :cw], v[:ch, :cw], 1.0, 1.0)
    np.testing.assert_allclose(got[:ch, :cw], want, atol=2e-4)


def test_warp_adaptive_wide_tier_no_env_needed():
    """Round-4 adaptive tiers (VERDICT r3 #5): displacements in (D, 2D]
    take the widened +-2D shift-sum WITHOUT any env knob, matching the
    exact gather (and the oracle) — a violent-motion level that round 3
    sent to the ~5 ms scalar gather now runs the vectorized fast path."""
    import jax.numpy as jnp

    import tpuflow.oracle as oracle
    from tpuflow.solver.bucketed import warp_dyn, warp_gather

    rng = np.random.default_rng(5)
    HB, WB, cw, ch = 64, 128, 100, 50
    f0 = np.zeros((HB, WB), np.float32)
    f1 = np.zeros((HB, WB), np.float32)
    f0[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 255
    f1[:ch, :cw] = rng.random((ch, cw), dtype=np.float32) * 255
    # Displacements in (-6, 6): beyond the default D=4, inside 2D=8.
    u = ((rng.random((HB, WB), dtype=np.float32) - 0.5) * 12).astype(np.float32)
    v = ((rng.random((HB, WB), dtype=np.float32) - 0.5) * 12).astype(np.float32)
    args = (jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(u), jnp.asarray(v),
            np.int32(cw), np.int32(ch), np.float32(1), np.float32(1),
            np.float32(cw - 1), np.float32(ch - 1))
    got = np.asarray(warp_dyn(*args))
    want_gather = np.asarray(warp_gather(*args))
    want_oracle = oracle.warp(f0[:ch, :cw], f1[:ch, :cw], u[:ch, :cw],
                              v[:ch, :cw], 1.0, 1.0)
    # Value-exact vs the gather (the tiers differ only in the 4-tap
    # summation association, <=1 ulp on 0..255 data).
    np.testing.assert_allclose(got[:ch, :cw], want_gather[:ch, :cw],
                               atol=1e-4)
    np.testing.assert_allclose(got[:ch, :cw], want_oracle, atol=2e-4)


def test_level_step_warp_tier_telemetry():
    """return_tier: the classic level step reports which warp branch the
    traced cond takes (0 fast / 1 wide / 2 gather) — derived from the
    same predicates the cond uses."""
    import jax.numpy as jnp

    from tpuflow.config import FlowConfig
    from tpuflow.solver.bucketed import LevelScalars, bucketed_level_step

    cfg = FlowConfig(outer_iterations_count=1, inner_iterations_count=1,
                     median_radius=3)
    HB, WB = 64, 128
    cw, ch = 100, 50
    sc = LevelScalars.make(cw, ch, 1.0, 1.0, 35.0, cw, ch, cw, ch)
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.random((HB, WB), dtype=np.float32) * 255)
    for disp, want_tier in ((0.5, 0), (6.0, 1), (20.0, 2)):
        u_prev = jnp.full((HB, WB), np.float32(disp))
        out = bucketed_level_step(
            f, f, u_prev, jnp.zeros_like(u_prev), sc.tree(), (HB, WB),
            (HB, WB), cfg, use_pallas=False, return_tier=True,
        )
        assert len(out) == 3
        assert int(out[2]) == want_tier, (disp, int(out[2]))


def test_warp_report_pipeline():
    """compute_flow_warp_report: production-observable per-level warp
    telemetry. Gentle motion -> every level tier 0; violent motion (a
    ~6.5 px shift) -> the fine levels report the wide tier (and none of
    this perturbs the two-output production pipeline)."""
    from tpuflow.config import FlowConfig
    from tpuflow.solver.bucketed import (
        compute_flow_bucketed_async,
        compute_flow_warp_report,
    )

    h, w = 72, 96
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)

    def blobs(dx):
        return (200.0 * np.exp(-((ys - 36) ** 2 + (xs - 48 - dx) ** 2) / 60.0)
                + 150.0 * np.exp(-((ys - 20) ** 2 + (xs - 20 - dx) ** 2) / 40.0)
                ).astype(np.float32)

    # A schedule that actually tracks the motion (alpha=10, deep
    # pyramid): dx=6.5 recovers ~6.5 px of flow, whose finest levels
    # exceed the +-4 fast window and must REPORT the wide tier.
    cfg = FlowConfig(warp_levels_count=8, warp_scale_factor=0.6,
                     outer_iterations_count=30, inner_iterations_count=5,
                     equation_alpha=10.0, median_radius=3,
                     gaussian_sigma=1.5)
    u, v, rep = compute_flow_warp_report(blobs(0), blobs(0.8), cfg)
    assert rep["tiers"].shape[0] == len(rep["levels"])
    assert rep["n_wide"] == 0 and rep["n_gather"] == 0
    assert (rep["tiers"] == 0).all()

    u2, v2, rep2 = compute_flow_warp_report(blobs(0), blobs(6.5), cfg)
    assert rep2["n_wide"] >= 1, rep2
    # Telemetry is a SEPARATE compiled program (extra outputs can change
    # fusion choices), so bound mean EPE per the repo's cross-program
    # rule rather than asserting bitwise equality.
    up, vp = compute_flow_bucketed_async(blobs(0), blobs(6.5), cfg)
    epe = np.hypot(np.asarray(u2) - np.asarray(up),
                   np.asarray(v2) - np.asarray(vp)).mean()
    assert epe <= 1e-5, epe


def test_vmem_overflow_falls_back_to_xla(monkeypatch):
    """VMEM-gate safety net: a Mosaic scoped-vmem compile failure retries
    the pipeline with Pallas disabled instead of failing the solve; any
    other error re-raises."""
    import tpuflow.solver.bucketed as B
    from tpuflow.utils import envcache

    envcache.reset_pallas_runtime()
    calls = []

    def fake_builder(shape, cfg):
        disabled = envcache.pallas_disabled()
        calls.append(disabled)

        def run(f0, f1):
            if not disabled:
                raise RuntimeError(
                    "Ran out of memory in memory space vmem while "
                    "allocating on stack")
            return f0 * 0 + 7.0, f1 * 0 + 9.0

        return run

    monkeypatch.setattr(B, "compiled_full_pipeline", fake_builder)
    f = np.ones((16, 16), np.float32)
    try:
        with pytest.warns(RuntimeWarning, match="VMEM budget"):
            u, v = B.compute_flow_bucketed_async(f, f)
        assert calls == [False, True]
        assert float(np.asarray(u)[0, 0]) == 7.0
        # The latch is a module flag, NOT os.environ (the round-3 env
        # leak poisoned later tests via monkeypatch teardown).
        import os

        assert "TPUFLOW_DISABLE_PALLAS" not in os.environ
        assert envcache.pallas_disabled()
    finally:
        envcache.reset_pallas_runtime()

    # Non-vmem errors must propagate untouched.

    def fake_builder2(shape, cfg):
        def run(f0, f1):
            raise RuntimeError("unrelated failure")

        return run

    monkeypatch.setattr(B, "compiled_full_pipeline", fake_builder2)
    with pytest.raises(RuntimeError, match="unrelated"):
        B.compute_flow_bucketed_async(f, f)


def test_level_step_blocked_resample_matches_dense(monkeypatch):
    # Force the block-banded route at a small size and pin it against the
    # dense-matmul route on the same level step (one sweep keeps ulp
    # amplification down; both routes apply the same linear map).
    import sys

    import jax.numpy as jnp

    import tpuflow.ops.resample  # noqa: F401 - ops/__init__ shadows the attr
    from tpuflow.solver.bucketed import (
        LevelScalars, bucket_dims, bucketed_level_step,
    )

    rs = sys.modules["tpuflow.ops.resample"]

    h0, w0 = 90, 130
    top_bucket = bucket_dims(w0, h0)
    h0b, w0b = top_bucket
    cw, ch = 84, 58
    bucket = bucket_dims(cw, ch)
    sc = LevelScalars.make(
        cw, ch, w0 / cw, h0 / ch, 35.0, w0, h0, 60, 40
    ).tree()
    cfg = FlowConfig(
        warp_levels_count=1, outer_iterations_count=1,
        inner_iterations_count=1, median_radius=3,
    )
    rng = np.random.default_rng(5)
    f0s = np.zeros((h0b, w0b), np.float32)
    f1s = np.zeros((h0b, w0b), np.float32)
    f0s[:h0, :w0] = rng.random((h0, w0), np.float32) * 200.0
    f1s[:h0, :w0] = rng.random((h0, w0), np.float32) * 200.0
    u_prev = np.zeros((h0b, w0b), np.float32)
    v_prev = np.zeros((h0b, w0b), np.float32)
    u_prev[:40, :60] = rng.standard_normal((40, 60)).astype(np.float32) * 0.3
    v_prev[:40, :60] = rng.standard_normal((40, 60)).astype(np.float32) * 0.3
    args = tuple(jnp.asarray(a) for a in (f0s, f1s, u_prev, v_prev))

    want_u, want_v = bucketed_level_step(
        *args, sc, bucket, top_bucket, cfg, use_pallas=False
    )
    monkeypatch.setattr(rs, "BLOCK_BANDED_MIN_K", 64)
    got_u, got_v = bucketed_level_step(
        *args, sc, bucket, top_bucket, cfg, use_pallas=False
    )
    d = np.maximum(
        np.abs(np.asarray(got_u)[:ch, :cw] - np.asarray(want_u)[:ch, :cw]),
        np.abs(np.asarray(got_v)[:ch, :cw] - np.asarray(want_v)[:ch, :cw]),
    )
    assert d.max() < 1e-5, d.max()


def test_pipeline_cache_keys_on_trace_env(monkeypatch):
    # Flipping a TPUFLOW_* trace-time flag must produce a different cached
    # program (the old behavior silently returned the stale one).
    from tpuflow.solver.bucketed import compiled_full_pipeline

    cfg = FlowConfig(warp_levels_count=2, warp_scale_factor=0.6,
                     outer_iterations_count=1, inner_iterations_count=1,
                     median_radius=3)
    a = compiled_full_pipeline((16, 24), cfg, unroll=False)
    monkeypatch.setenv("TPUFLOW_MM_PRECISION", "default")
    b = compiled_full_pipeline((16, 24), cfg, unroll=False)
    monkeypatch.delenv("TPUFLOW_MM_PRECISION")
    c = compiled_full_pipeline((16, 24), cfg, unroll=False)
    assert a is not b
    assert a is c

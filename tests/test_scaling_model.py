"""Analytic sp-scaling projection (parallel/model) — structure checks:
the model must walk the REAL applicability gates and price the two
paths' documented message counts."""

import pytest

from tpuflow.config import FlowConfig
from tpuflow.parallel.model import (
    ICIParams,
    level_comm_cost,
    level_sharded_time,
    project_schedule,
    rub_default_levels,
)


def test_rub_breakdown_matches_schedule():
    levels = rub_default_levels()
    assert len(levels) == 47  # the real rub default schedule depth
    total_ms = sum(t for _, _, t in levels) * 1e3
    # fine 7 ms + 37 coarse levels x 42 us ~ 8.6-9.0 ms (the measured pair)
    assert 8.0 < total_ms < 9.5


def test_kernel_comm_cheaper_than_explicit():
    """The RDMA path must price below the ppermute path at equal config:
    same once-per-level volume class, but no XLA dispatch per message."""
    cfg = FlowConfig()
    ici = ICIParams()
    for wb in (128, 640, 2048):
        assert level_comm_cost(448, wb, cfg, 4, "kernel", ici) < (
            level_comm_cost(448, wb, cfg, 4, "explicit", ici))


def test_gates_respected():
    cfg = FlowConfig()
    ici = ICIParams()
    # 8 rows/shard: replicated, full single-chip cost, no comm.
    t, path = level_sharded_time(1e-3, 64, 128, cfg, 8, "explicit", ici)
    assert path == "replicated" and t == 1e-3
    # 4K bucket: kernel VMEM gate fails -> explicit.
    _, path = level_sharded_time(1e-3, 2176, 3968, cfg, 4, "kernel", ici)
    assert path == "explicit"
    # rub fine bucket over 4: kernel admitted.
    _, path = level_sharded_time(1e-3, 448, 640, cfg, 4, "kernel", ici)
    assert path == "kernel"


def test_large_frames_scale_better():
    """The documented conclusion: rub-size frames are below the sp
    comm floor; 1080p-class frames with the kernel path clear it."""
    cfg = FlowConfig()
    rub = project_schedule(rub_default_levels(), cfg, 2, "kernel")
    big = project_schedule(
        rub_default_levels(fine_ms_total=120.0, w=1920, h=1080), cfg, 2,
        "kernel")
    assert big["efficiency"] > rub["efficiency"]
    assert big["efficiency"] >= 0.8  # the BASELINE target, projected


def test_k_outer_cuts_comm():
    """k-outer fusion divides the per-level exchange count: comm cost
    must fall monotonically in k for both paths (same once-per-level
    constant volume, ceil(outer/k) iterate exchanges of a k-widened
    halo — bandwidth up, message count and dispatch down)."""
    cfg = FlowConfig()
    ici = ICIParams()
    for path in ("explicit", "kernel"):
        costs = [level_comm_cost(448, 640, cfg, 4, path, ici, k)
                 for k in (1, 2, 5, 10)]
        assert costs == sorted(costs, reverse=True), (path, costs)
        # k=10 must at least halve k=1 (the kernel path's fixed
        # once-per-level constant volume GROWS with the halo width, so
        # its floor is higher than the explicit path's).
        assert costs[-1] < 0.45 * costs[0], (path, costs)


def test_plan_level_router():
    """The halo='auto' router: mid-pyramid levels whose exchange cost
    exceeds the sharding gain must resolve to replicated; the finest
    1080p-class buckets must shard."""
    from tpuflow.parallel.model import plan_level

    cfg = FlowConfig()
    # Coarse bucket: replicate (gate + cost both say so).
    path, _, _ = plan_level(64, 128, cfg, 4)
    assert path == "replicated"
    # 1080p fine bucket: shard.
    path, k, _ = plan_level(1088, 2048, cfg, 4)
    assert path in ("kernel", "explicit") and k >= 1


def test_auto_projection_clears_target_at_n4():
    """The round-4 headline: cost-based per-level routing (+ k-outer
    fusion) lifts the projected 1080p n=4 efficiency over the >=80%
    BASELINE target (round 3's gate-only routing projected 72%)."""
    from tpuflow.parallel.model import project_schedule_auto

    cfg = FlowConfig()
    lv = rub_default_levels(fine_ms_total=120.0, w=1920, h=1080)
    for n, floor in ((2, 0.9), (4, 0.8)):
        r = project_schedule_auto(lv, cfg, n)
        assert r["efficiency"] >= floor, (n, r)
    # Router beats the fixed gate-only routing it replaced.
    r8 = project_schedule_auto(lv, cfg, 8)
    fixed8 = project_schedule(lv, cfg, 8, "kernel")
    assert r8["efficiency"] > fixed8["efficiency"]


def test_efficiency_definition():
    cfg = FlowConfig()
    r = project_schedule(rub_default_levels(), cfg, 4, "explicit")
    assert r["efficiency"] == pytest.approx(r["speedup"] / 4, abs=1e-3)
    assert sum(r["levels"].values()) == 47


def test_hybrid_split_matches_router():
    """The hybrid pipeline's tail/fine boundary must agree with the
    router: on the 1080p schedule at n=8 the split leaves a non-empty
    dp tail (coarse groups the router replicates) and a non-empty sp
    fine section."""
    from tpuflow.parallel.hybrid import hybrid_split_group
    from tpuflow.solver.bucketed import _level_groups, level_schedule

    cfg = FlowConfig()
    specs = level_schedule(1920, 1080, cfg.warp_levels_count,
                          cfg.warp_scale_factor)
    groups = _level_groups(specs, 1920, 1080, cfg)
    g0 = hybrid_split_group(groups, cfg, 8)
    assert 0 < g0 < len(groups), (g0, len(groups))
    # Independent structural property (not a re-run of the router): the
    # dp tail consists of strictly coarser buckets than every sharded
    # fine group — the split is a coarse/fine boundary, not arbitrary.
    tail_max_area = max(b[0] * b[1] for b, _ in groups[:g0])
    fine_min_area = min(b[0] * b[1] for b, _ in groups[g0:])
    assert tail_max_area < fine_min_area, (tail_max_area, fine_min_area)

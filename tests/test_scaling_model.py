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


def test_efficiency_definition():
    cfg = FlowConfig()
    r = project_schedule(rub_default_levels(), cfg, 4, "explicit")
    assert r["efficiency"] == pytest.approx(r["speedup"] / 4, abs=1e-3)
    assert sum(r["levels"].values()) == 47

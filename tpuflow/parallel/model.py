"""Analytic sp-scaling projection: collective volume x ICI cost next to
the pinned exchange counts.

No multi-chip hardware exists in the build environment, so the >=80%
linear-scaling BASELINE target cannot be *measured* here. This module
makes it *estimable*: given measured single-chip per-level times and ICI
parameters, it walks the same per-level applicability gates the real
sharded pipeline uses (replicate / explicit ppermute / in-kernel RDMA)
and prices each level as

    t_level(n) = t_compute + t_comm
    t_compute  = t1 * (s_rows + 2*halo) / hb        (redundant-halo split)
    t_comm     = msgs * latency + bytes / bandwidth  (per ring direction)

with the exact per-level message/byte counts of each path:

  explicit (parallel/halo.py): (n_const + 2) fields x 2 ppermutes of an
    (inner+1)-row halo once per level, plus 2 fields x 2 ppermutes per
    outer iteration; every ppermute also pays an XLA collective-dispatch
    overhead (`dispatch_s`).
  kernel (parallel/halo_kernel.py): same once-per-level constant volume
    (halo rounded up to the 8-sublane tile), 2 fields x 2 RDMA messages
    + 2 barrier semaphore signals per outer, at bare hop latency — no
    XLA dispatch.
  replicated: t_level(n) = t1 (buckets under the gates run unsharded).

Default ICI parameters are the public TPU v5e numbers (one-way
inter-chip bandwidth ~45 GB/s per link, ~1 us hop latency) and a
measured-elsewhere 5 us XLA collective dispatch floor; all are
overridable — the model's value is the STRUCTURE (which levels shard,
what volume moves), the constants are calibration knobs for the day
hardware exists. tools/report_scaling.py --project prints the table.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

from tpuflow.config import DataConstancy, FlowConfig


@dataclass(frozen=True)
class ICIParams:
    bandwidth_bytes_s: float = 4.5e10   # one-way per ring direction (v5e)
    hop_latency_s: float = 1e-6
    dispatch_s: float = 5e-6            # XLA collective launch overhead


def _n_const_fields(cfg: FlowConfig) -> int:
    return 5 if cfg.data_constancy == DataConstancy.GREY else 10


def level_comm_cost(
    hb: int, wb: int, cfg: FlowConfig, n_y: int, path: str, ici: ICIParams
) -> float:
    """Seconds of halo-exchange cost for ONE level on one shard (both
    ring directions run concurrently on separate links, so cost is the
    per-direction maximum = one direction's volume)."""
    outer = cfg.outer_iterations_count
    if path == "explicit":
        halo = cfg.inner_iterations_count + 1
        row_bytes = halo * wb * 4
        # (n_cf + u + v) once, (du, dv) per outer; 1 ppermute per field
        # per direction.
        n_once = _n_const_fields(cfg) + 2
        msgs = n_once + 2 * outer
        per_msg = ici.dispatch_s + ici.hop_latency_s + row_bytes / ici.bandwidth_bytes_s
        return msgs * per_msg
    if path == "kernel":
        halo = -(-(cfg.inner_iterations_count + 1) // 8) * 8
        row_bytes = halo * wb * 4
        # once: consts (incl u, v) RDMA; per outer: du+dv RDMA + 2
        # barrier semaphore signals.
        msgs_once = _n_const_fields(cfg) + 2
        per_rdma = ici.hop_latency_s + row_bytes / ici.bandwidth_bytes_s
        per_outer = 2 * per_rdma + 2 * ici.hop_latency_s
        return msgs_once * per_rdma + outer * per_outer
    raise ValueError(path)


def level_sharded_time(
    t1_s: float, hb: int, wb: int, cfg: FlowConfig, n_y: int, path: str,
    ici: ICIParams,
) -> Tuple[float, str]:
    """(projected seconds on n_y shards, resolved path) for one level.

    Applies the real gates: the kernel path falls back to explicit, and
    both fall back to replication, exactly as
    solver.bucketed.compiled_full_pipeline_sharded routes."""
    from tpuflow.parallel.halo import halo_applicable
    from tpuflow.parallel.halo_kernel import kernel_halo_applicable

    resolved = path
    if path == "kernel" and not kernel_halo_applicable(hb, wb, n_y, cfg):
        resolved = "explicit"
    if resolved == "explicit" and not halo_applicable(hb, n_y, cfg):
        return t1_s, "replicated"
    if resolved == "explicit":
        halo = cfg.inner_iterations_count + 1
    else:
        halo = -(-(cfg.inner_iterations_count + 1) // 8) * 8
    s_rows = hb // n_y
    compute = t1_s * (s_rows + 2 * halo) / hb
    return compute + level_comm_cost(hb, wb, cfg, n_y, resolved, ici), resolved


def project_schedule(
    levels: Sequence[Tuple[int, int, float]], cfg: FlowConfig, n_y: int,
    path: str = "kernel", ici: ICIParams = ICIParams(),
) -> dict:
    """Project total sharded time for a [(hb, wb, t1_seconds), ...]
    schedule. Returns totals, speedup vs sum(t1) and linear-scaling
    efficiency (= speedup / n_y), plus the per-path level counts."""
    t1_total = sum(t for _, _, t in levels)
    tn_total = 0.0
    counts: dict = {}
    for hb, wb, t1 in levels:
        tn, resolved = level_sharded_time(t1, hb, wb, cfg, n_y, path, ici)
        tn_total += tn
        counts[resolved] = counts.get(resolved, 0) + 1
    speedup = t1_total / tn_total if tn_total else float("inf")
    return {
        "n_y": n_y,
        "path": path,
        "t1_ms": round(t1_total * 1e3, 3),
        "tn_ms": round(tn_total * 1e3, 3),
        "speedup": round(speedup, 3),
        "efficiency": round(speedup / n_y, 3),
        "levels": counts,
    }


def rub_default_levels(
    fine_ms_total: float = 7.0, coarse_us_per_level: float = 42.0,
    w: int = 584, h: int = 388, cfg: FlowConfig | None = None,
) -> List[Tuple[int, int, float]]:
    """The measured rub-default per-level time breakdown (BASELINE.md:
    fine buckets ~7 ms of the 8.96 ms pair, coarse tail ~42 us/level of
    real work), distributed over the actual level schedule: the fine
    total is split over the levels of the two finest buckets
    proportional to bucket area, every other level gets the flat coarse
    cost. A calibration convenience for tools/report_scaling.py, not a
    measurement."""
    from tpuflow.solver.bucketed import _level_groups, level_schedule

    cfg = cfg or FlowConfig()
    specs = level_schedule(w, h, cfg.warp_levels_count, cfg.warp_scale_factor)
    groups = _level_groups(specs, w, h, cfg)
    area_total = sum(
        bucket[0] * bucket[1] * stacked[0].shape[0]
        for bucket, stacked in groups[-2:]
    )
    per_level: List[Tuple[int, int, float]] = []
    for gi, (bucket, stacked) in enumerate(groups):
        hb, wb = bucket
        for _ in range(stacked[0].shape[0]):
            if gi >= len(groups) - 2:
                per_level.append(
                    (hb, wb, fine_ms_total * 1e-3 * (hb * wb) / area_total))
            else:
                per_level.append((hb, wb, coarse_us_per_level * 1e-6))
    return per_level

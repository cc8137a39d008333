"""The coarse-to-fine optical-flow driver (public API).

TPU execution contract, preserved from the reference
(reference: src/optical_flow/optical_flow_2d.cpp:214-215,543-545):
upload the two frames once, run every pyramid level on-device, download the
final flow once. Each level is one jitted XLA program
(tpuflow.solver.level); the Python loop here only sequences level programs
— there are no host syncs inside any hot loop.

Equivalent of OpticalFlow2D::ComputeFlow
(reference: src/optical_flow/optical_flow_2d.cpp:142-569), minus its
inefficiencies (per-sweep stream sync, per-launch tensor recompute).
"""

from __future__ import annotations

import dataclasses
import time
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpuflow.config import FlowConfig
from tpuflow.ops.gaussian import gaussian_smooth
from tpuflow.pyramid import level_schedule
from tpuflow.solver.level import compiled_level_step, level_step
from tpuflow.utils.envcache import env_cached, trace_env_fingerprint


@dataclasses.dataclass
class LevelTrace:
    """Per-level timing/observability record (structured replacement for the
    reference's printf progress output,
    reference: optical_flow_2d.cpp:274-275)."""

    level: int
    width: int
    height: int
    seconds: float


@dataclasses.dataclass
class FlowResult:
    """Final flow in original-pixel units, materialized on host (numpy) —
    the flow leaves the device exactly once, like the reference's single
    D2H copy pair. ``seconds`` covers device compute + the final download,
    measured by host materialization (async backends may return from
    ``block_until_ready`` early; device_get is the honest fence)."""

    u: np.ndarray
    v: np.ndarray
    seconds: float
    levels: List[LevelTrace]

    @property
    def megapixels_per_second(self) -> float:
        h, w = self.u.shape
        return (w * h) / self.seconds / 1e6


def plan_parallel(shape: Tuple[int, int], batched: bool, cfg: FlowConfig,
                  mesh) -> str:
    """The front-door routing decision (round-5 verdict #7): which
    parallel strategy `compute_flow(..., mesh=)` uses, chosen by the
    same cost model that routes the sharded pipeline per level
    (parallel.model.plan_level).

      (B, H, W)    -> "dp"     always: pairs are independent, so one
                               pair per chip with the full local engine
                               is throughput-optimal whenever a frame
                               fits one chip (projected dp efficiency
                               ~1.0 vs the hybrid's 0.83 at n=8/1080p —
                               the hybrid is the LATENCY specialist,
                               reached explicitly via
                               compute_flow_bucketed_hybrid).
      single pair  -> "sp"     if the router would shard the finest
                               bucket over the mesh's 'y' axis (the
                               projection says row-sharding beats one
                               chip in latency — even rub-size gains
                               2.6x at n=8),
                      "single" otherwise (tiny frames: every level
                               replicates; sharding only adds cost).
    """
    from tpuflow.parallel.model import plan_level
    from tpuflow.solver.bucketed import bucket_dims

    if batched:
        return "dp"
    n_y = dict(zip(mesh.axis_names, mesh.devices.shape)).get("y", 1)
    h, w = shape
    specs = level_schedule(w, h, cfg.warp_levels_count, cfg.warp_scale_factor)
    hb, wb = bucket_dims(specs[-1].width, specs[-1].height)
    shardable = n_y > 1 and plan_level(hb, wb, cfg, n_y)[0] != "replicated"
    return "sp" if shardable else "single"


def compute_flow(
    frame_0,
    frame_1,
    cfg: Optional[FlowConfig] = None,
    *,
    collect_trace: bool = False,
    fused: bool = False,
    engine: Optional[str] = None,
    mesh=None,
) -> FlowResult:
    """Compute dense 2D optical flow from frame_0 to frame_1.

    THE front door. Frames are (H, W) arrays (numpy or jax), any real
    dtype — or (B, H, W) stacks of independent pairs; computation is
    float32. The returned flow is in original-pixel units, like the
    reference.

    mesh: a `jax.sharding.Mesh` (see `tpuflow.parallel.make_mesh`) to
    scale over multiple chips. The strategy is routed automatically by
    the cost model (`plan_parallel`): batches run data-parallel (one
    pair per chip, throughput-optimal); single pairs large enough that
    row sharding pays run sharded with the per-level halo router; tiny
    single pairs run on one chip. The specialist entry points
    (`compute_flow_bucketed_batch/_sharded/_hybrid`, `process_sequence`)
    remain available for explicit control (e.g. the dp x sp hybrid for
    latency-sensitive batched large-frame work).

    engine: "bucketed" (default — one compiled program serves the whole
    pyramid, any constancy) or "levels" (one program per level shape;
    used for per-level tracing).

    fused=True: the ENTIRE coarse-to-fine solve as one XLA program (one
    dispatch per pair). Measured equal to per-level at steady state on TPU
    v5e but ~10x slower to compile, so off by default.
    """
    cfg = cfg or FlowConfig()
    f0 = jnp.asarray(frame_0, dtype=jnp.float32)
    f1 = jnp.asarray(frame_1, dtype=jnp.float32)
    if f0.shape != f1.shape or f0.ndim not in (2, 3):
        raise ValueError(
            f"expected two equal (H, W) frames or (B, H, W) stacks, "
            f"got {f0.shape} {f1.shape}")

    if f0.ndim == 3:
        return _compute_flow_batch_front(f0, f1, cfg, mesh)
    if mesh is not None:
        route = plan_parallel(f0.shape, False, cfg, mesh)
        if route == "sp":
            from tpuflow.solver.bucketed import compute_flow_bucketed_sharded

            t0 = time.perf_counter()
            u, v = compute_flow_bucketed_sharded(f0, f1, cfg, mesh=mesh,
                                                 halo="auto")
            u_host, v_host = np.asarray(u), np.asarray(v)
            return FlowResult(u=u_host, v=v_host,
                              seconds=time.perf_counter() - t0, levels=[])
        # "single": fall through to the one-chip engine below.
    orig_h, orig_w = f0.shape

    if collect_trace:
        fused = False
        engine = engine or "levels"  # explicit engine="bucketed" gives group-level traces

    # NOTE: the first call for a given (shape, config) pays XLA compilation;
    # steady-state timing starts from the second call (benchmarks warm up
    # with one throwaway run).
    if fused:
        run = _compiled_pipeline((orig_h, orig_w), cfg)
        t0 = time.perf_counter()
        u, v = run(f0, f1)
        u_host, v_host = np.asarray(u), np.asarray(v)
        return FlowResult(
            u=u_host, v=v_host, seconds=time.perf_counter() - t0, levels=[]
        )

    # Pre-pay compilation outside the timed region (idempotent).
    resolved = engine or "bucketed"
    if resolved == "bucketed":
        from tpuflow.solver.bucketed import warmup_bucketed

        warmup_bucketed((orig_h, orig_w), cfg)
    else:
        warmup((orig_h, orig_w), cfg)

    t0 = time.perf_counter()
    traces: List[LevelTrace] = []
    u, v = compute_flow_async(
        f0, f1, cfg, engine=engine, _traces=traces if collect_trace else None
    )
    u_host, v_host = np.asarray(u), np.asarray(v)
    seconds = time.perf_counter() - t0

    return FlowResult(u=u_host, v=v_host, seconds=seconds, levels=traces)


def _compute_flow_batch_front(f0, f1, cfg: FlowConfig, mesh) -> FlowResult:
    """(B, H, W) front-door path: dp or hybrid per `plan_parallel`
    (sequential single-pair solves when no mesh is given)."""
    t0 = time.perf_counter()
    if mesh is None:
        us, vs = [], []
        for i in range(f0.shape[0]):
            r = compute_flow(f0[i], f1[i], cfg)
            us.append(r.u)
            vs.append(r.v)
        return FlowResult(u=np.stack(us), v=np.stack(vs),
                          seconds=time.perf_counter() - t0, levels=[])
    from tpuflow.parallel.mesh import make_mesh
    from tpuflow.solver.bucketed import compute_flow_bucketed_batch

    # Pure dp wants EVERY device on the batch axis; the user's mesh
    # may split them ('data', 'y') — reshape to a flat data mesh
    # over the same devices (output is materialized to host, so the
    # transient mesh never leaks).
    n_dev = mesh.devices.size
    if dict(zip(mesh.axis_names, mesh.devices.shape)).get("data") != n_dev:
        mesh = make_mesh((n_dev, 1), devices=list(mesh.devices.flat))
    U, V = compute_flow_bucketed_batch(f0, f1, cfg, mesh=mesh)
    return FlowResult(u=np.asarray(U), v=np.asarray(V),
                      seconds=time.perf_counter() - t0, levels=[])


def compute_flow_async(
    frame_0,
    frame_1,
    cfg: Optional[FlowConfig] = None,
    *,
    engine: Optional[str] = None,
    _traces: Optional[List[LevelTrace]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Like compute_flow but returns DEVICE arrays without a host fence.

    The streaming building block: submit many frame pairs back-to-back and
    fence once — on networked dispatch paths each host materialization
    costs a ~50+ ms round trip, so batch pipelines should stay on device.

    engine: "bucketed" (default) or "levels" (per-shape programs, used
    for per-level tracing).
    """
    cfg = cfg or FlowConfig()
    if engine is None:
        engine = "levels" if _traces is not None else "bucketed"
    f0 = jnp.asarray(frame_0, dtype=jnp.float32)
    f1 = jnp.asarray(frame_1, dtype=jnp.float32)
    orig_h, orig_w = f0.shape

    if engine == "bucketed":
        from tpuflow.solver.bucketed import (
            compute_flow_bucketed_async,
            warmup_bucketed,
        )

        warmup_bucketed((orig_h, orig_w), cfg)
        if _traces is not None:
            # Group-level tracing (one record per bucket group of levels;
            # the per-level engine gives finer granularity on CPU).
            gt = []
            u, v = compute_flow_bucketed_async(f0, f1, cfg, group_traces=gt)
            for (hb, wb), n, secs in gt:
                _traces.append(LevelTrace(level=-n, width=wb, height=hb,
                                          seconds=secs))
            return u, v
        return compute_flow_bucketed_async(f0, f1, cfg)

    warmup((orig_h, orig_w), cfg)

    specs = level_schedule(orig_w, orig_h, cfg.warp_levels_count, cfg.warp_scale_factor)
    smooth = _compiled_smooth(cfg.gaussian_sigma)

    f0s = smooth(f0)
    f1s = smooth(f1)

    first = specs[0]
    u = jnp.zeros((first.height, first.width), dtype=jnp.float32)
    v = jnp.zeros_like(u)

    for spec in specs:
        lt0 = time.perf_counter() if _traces is not None else 0.0
        step = compiled_level_step(spec, cfg, u.shape)
        u, v = step(f0s, f1s, u, v)
        if _traces is not None:
            np.asarray(u)  # host fence (see FlowResult docstring)
            _traces.append(
                LevelTrace(spec.level, spec.width, spec.height,
                           time.perf_counter() - lt0)
            )
    return u, v


@env_cached(maxsize=64)
def _compiled_pipeline(orig_shape: tuple, cfg: FlowConfig, *, _env=None):
    """One jitted program for the whole coarse-to-fine solve."""
    orig_h, orig_w = orig_shape
    specs = level_schedule(orig_w, orig_h, cfg.warp_levels_count, cfg.warp_scale_factor)

    @jax.jit
    def run(f0, f1):
        f0s = gaussian_smooth(f0, cfg.gaussian_sigma)
        f1s = gaussian_smooth(f1, cfg.gaussian_sigma)
        first = specs[0]
        u = jnp.zeros((first.height, first.width), dtype=jnp.float32)
        v = jnp.zeros_like(u)
        for spec in specs:  # unrolled: every level has its own static shape
            u, v = level_step(f0s, f1s, u, v, spec, cfg)
        return u, v

    return run


@env_cached(maxsize=64)
def _compiled_smooth(sigma: float, *, _env=None):
    # gaussian_smooth reads TPUFLOW_SMOOTH at trace time, so the cache is
    # env-keyed like the bucketed engine's builders (round-2 advisory).
    return jax.jit(lambda a: gaussian_smooth(a, sigma))


_WARMED: set = set()


def warmup(orig_shape: Tuple[int, int], cfg: FlowConfig, max_workers: int = 16) -> float:
    """Concurrently warm every level program for a workload shape.

    Warms by CALLING each jitted program with zero arrays and fencing with
    device_get: ``.lower().compile()`` does NOT populate the jit dispatch
    cache, so an AOT-only warmup still pays the full compile inside the
    first (timed) real call on remote-compile backends. XLA compilation of
    the ~46 per-level programs is embarrassingly parallel, so a thread pool
    cuts cold-start from minutes to tens of seconds. Returns wall seconds
    spent. Idempotent per (shape, cfg) within the process.
    """
    key = (orig_shape, cfg, trace_env_fingerprint())
    if key in _WARMED:
        return 0.0
    t0 = time.perf_counter()
    orig_h, orig_w = orig_shape
    specs = level_schedule(orig_w, orig_h, cfg.warp_levels_count, cfg.warp_scale_factor)
    frame = jnp.zeros((orig_h, orig_w), jnp.float32)

    def compile_level(i: int):
        spec = specs[i]
        prev = specs[i - 1] if i > 0 else spec
        prev_shape = (prev.height, prev.width)
        flow = jnp.zeros(prev_shape, jnp.float32)
        fn = compiled_level_step(spec, cfg, prev_shape)
        np.asarray(fn(frame, frame, flow, flow)[0])

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=max_workers) as ex:
        list(ex.map(compile_level, range(len(specs))))
    np.asarray(_compiled_smooth(cfg.gaussian_sigma)(frame))
    _WARMED.add(key)
    return time.perf_counter() - t0


def endpoint_error(u_a, v_a, u_b, v_b) -> float:
    """Mean endpoint error between two flow fields (the parity metric)."""
    u_a, v_a = np.asarray(u_a), np.asarray(v_a)
    u_b, v_b = np.asarray(u_b), np.asarray(v_b)
    return float(np.mean(np.sqrt((u_a - u_b) ** 2 + (v_a - v_b) ** 2)))

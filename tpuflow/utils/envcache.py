"""Trace-env-keyed lru_cache for compiled-program builders.

Several TPUFLOW_* env flags are read at TRACE time (ablation probes,
matmul precision, kernel/unroll toggles, smooth mode): a builder cached
with a plain ``functools.lru_cache`` would keep returning the program
traced under the OLD flag values after a flip. Every compiled-program
builder in the package therefore caches through ``env_cached``, which
appends the current fingerprint of those flags to the cache key.
"""

from __future__ import annotations

import functools
import os

# Env flags the traced programs bake in.
TRACE_ENV_FLAGS = (
    "TPUFLOW_ABLATE", "TPUFLOW_MM_PRECISION", "TPUFLOW_BANDED_RESAMPLE",
    "TPUFLOW_BANDED_COLS", "TPUFLOW_FUSED_LEVEL", "TPUFLOW_WHOLE_LEVEL",
    "TPUFLOW_DISABLE_PALLAS", "TPUFLOW_SMOOTH", "TPUFLOW_KERNEL_SHIFT",
    "TPUFLOW_DU_ITERATE", "TPUFLOW_WARP_DISP",
)


def trace_env_fingerprint() -> tuple:
    return tuple(os.environ.get(k, "") for k in TRACE_ENV_FLAGS)


def warp_max_disp() -> int:
    """Trace-time warp fast-path half-window D (default 4): displacements
    within +-D level pixels use the vectorized masked shift-sum; one
    pixel beyond flips the WHOLE level to the gather slow path (the
    documented cliff, solver.bucketed.warp_dyn). Workloads living near
    the cliff — violent motion whose per-level increment exceeds 4 px —
    raise TPUFLOW_WARP_DISP instead of paying ~5 ms/level on the gather:
    fast-path cost grows ~(2D+2)^2 masked adds, still far below the
    gather at D <= 8. Read at trace time by BOTH the XLA warp and the
    whole-level kernel's in-kernel shift-sum (this module is the shared
    leaf); part of TRACE_ENV_FLAGS, so program caches key on it."""
    return int(os.environ.get("TPUFLOW_WARP_DISP", "4"))


def env_cached(maxsize: int):
    """``lru_cache`` that appends the TPUFLOW_* trace-env fingerprint to
    the key, so flipping a trace-time flag can never return a stale
    program."""

    def deco(fn):
        cached = functools.lru_cache(maxsize=maxsize)(fn)

        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            return cached(*args, _env=trace_env_fingerprint(), **kwargs)

        wrapper.cache_clear = cached.cache_clear
        return wrapper

    return deco

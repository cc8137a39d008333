"""Profiling hooks.

The reference's only instrumentation is CUDA event pairs and printf
(reference: optical_flow_2d.cpp:172-179, cuda_operation_solve_2d.cpp:211-226);
here we expose jax.profiler traces (viewable in XProf/TensorBoard or
Perfetto) plus the per-level LevelTrace table from the solver.
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/tpuflow_trace"):
    """Capture a device trace around a block:

        with profiling.trace("/tmp/mytrace"):
            compute_flow(f0, f1)

    Load the resulting directory in XProf/TensorBoard. On backends without
    profiler support this degrades to a no-op with a warning.
    """
    import jax

    os.makedirs(log_dir, exist_ok=True)
    try:
        jax.profiler.start_trace(log_dir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"tpuflow: profiler unavailable ({e}); continuing without trace")
        started = False
    try:
        yield log_dir
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception:
                pass

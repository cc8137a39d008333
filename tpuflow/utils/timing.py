"""Timing/observability helpers.

Structured replacement for the reference's CUDA-event timing + console
progress bar (reference: src/optical_flow/optical_flow_2d.cpp:172-179,
src/utils/common_utils.cpp:54-68). On async dispatch backends the only
honest fence is host materialization — use ``Timer`` around code that ends
with a device_get.
"""

from __future__ import annotations

import time
from typing import List


class Timer:
    """Context-manager wall timer: ``with Timer() as t: ...; t.seconds``."""

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self.t0
        return False


def format_level_table(levels) -> str:
    """Render per-level traces (tpuflow.solver.flow2d.LevelTrace) as the
    per-level timing table."""
    lines = [f"{'level':>5} {'size':>12} {'seconds':>9} {'Mpix/s':>8}"]
    for lt in levels:
        mpix = lt.width * lt.height / max(lt.seconds, 1e-12) / 1e6
        lines.append(
            f"{lt.level:>5} {lt.width:>5}x{lt.height:<6} {lt.seconds:>9.4f} {mpix:>8.2f}"
        )
    return "\n".join(lines)

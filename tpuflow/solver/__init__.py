"""Coarse-to-fine solver orchestration."""

from tpuflow.solver.flow2d import compute_flow  # noqa: F401

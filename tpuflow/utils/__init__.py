"""Utilities: timing, structured logging."""

from tpuflow.utils.timing import Timer, format_level_table  # noqa: F401

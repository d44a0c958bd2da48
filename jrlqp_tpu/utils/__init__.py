"""Utilities: iteration tracing / observability (Logger analog) and the
no-retrace guard (allocation-sanitizer analog)."""
from .compile_guard import no_retrace
from .logger import (IterationTrace, LogFlags, capture_pallas_trajectory,
                     dump_matlab, solve_fast_traced, solve_traced)

__all__ = ["IterationTrace", "LogFlags", "capture_pallas_trajectory",
           "dump_matlab", "solve_fast_traced", "solve_traced", "no_retrace"]

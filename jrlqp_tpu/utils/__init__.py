"""Utilities: iteration tracing / observability (Logger analog)."""
from .logger import IterationTrace, LogFlags, dump_matlab, solve_traced

__all__ = ["IterationTrace", "LogFlags", "dump_matlab", "solve_traced"]

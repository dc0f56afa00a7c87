"""Utilities: profiling, debug validation."""

from tpurt.utils.debug import nan_report, validate_scene, with_checks
from tpurt.utils.profiling import KernelTimer, annotate, trace

__all__ = [
    "nan_report",
    "validate_scene",
    "with_checks",
    "KernelTimer",
    "annotate",
    "trace",
]

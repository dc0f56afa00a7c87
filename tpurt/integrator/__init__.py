"""Wavefront path-tracing integrator (the TPU reformulation of the
reference's recursive RT pipeline, SURVEY.md §3.3)."""

from tpurt.integrator.wavefront import MAX_WAVES, render_sample, trace_paths

__all__ = ["MAX_WAVES", "render_sample", "trace_paths"]

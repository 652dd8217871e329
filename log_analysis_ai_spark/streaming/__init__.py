"""Structured Streaming surface: file-source tailing, micro-batch pipeline."""

from .stream import (  # noqa: F401
    compact_and_restart,
    stream_lines,
    stream_pipeline,
    stream_pipeline_online,
    windowed_template_counts,
)

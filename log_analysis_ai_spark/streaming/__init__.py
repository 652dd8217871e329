"""Structured Streaming surface: file-source tailing, micro-batch pipeline."""

from .stream import stream_lines, stream_pipeline, windowed_template_counts  # noqa: F401

"""Streaming layer: the reference's 'streaming' is cursor-driven
micro-batching over an unbounded integer domain (SURVEY.md §2.8) — no
event-time windows, watermarks, or late data anywhere in its workload.

The pipeline runner in ``plans/pipeline.py`` IS that streaming model
(tip-poll → bounded ranges → ordered commit). This package holds the
Structured-Streaming-facing helpers for users who want the same pipelines
as a ``readStream``: a rate-limited cursor source and watermark/window
wrappers are planned surface (Spark's native ``readStream`` +
``applyInPandasWithState`` cover custom stateful operators when a workload
actually needs event-time semantics)."""

from .cursor_source import cursor_stream_batches
from .dedup import dedup_stream, dedup_stream_bounded

__all__ = ["cursor_stream_batches", "dedup_stream", "dedup_stream_bounded"]

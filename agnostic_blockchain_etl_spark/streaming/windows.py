"""Event-time streaming helpers (beyond the reference's cursor model).

The reference has no event-time semantics (SURVEY.md §2.8) — but a
general engine needs them, so these wrap Spark Structured Streaming's
native primitives: tumbling/sliding windows with watermark-bounded state
and late-data drop. At scale the state store is per-key per-window; the
watermark bounds its size — without it an unbounded-key stream grows
state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame, ts_col: str, key_col: str,
                    window: str = "1 hour", slide: str | None = None,
                    watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling (or sliding) window counts per key.

    Works identically on batch and streaming DataFrames — the plan is the
    same; only the sink differs (the unified model the engine leans on for
    testing streaming logic against batch oracles)."""
    w = (F.window(F.col(ts_col), window, slide) if slide
         else F.window(F.col(ts_col), window))
    out = events
    if events.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    return (out.groupBy(w.alias("win"), F.col(key_col))
            .agg(F.count("*").alias("n"),
                 F.sum("value").alias("total"))
            .select(F.col("win.start").alias("window_start"),
                    F.col("win.end").alias("window_end"),
                    key_col, "n", "total"))


def session_windows(events: DataFrame, ts_col: str, key_col: str,
                    gap: str = "30 minutes",
                    watermark: str = "10 minutes") -> DataFrame:
    """Per-key session aggregation on Spark's NATIVE ``session_window``
    (dynamic event-time windows that merge while events arrive within
    ``gap``) — the streaming twin of the batch `sessionization` operator,
    whose lag-over-window formulation cannot run on an unbounded stream.

    Same plan on batch and streaming frames; streaming adds the watermark
    that lets the state store finalize (and emit) a session once the
    event-time clock passes its close + gap. State per open session only —
    bounded by active keys, not history."""
    out = events
    if events.isStreaming:
        out = out.withWatermark(ts_col, watermark)
    return (out.groupBy(F.session_window(F.col(ts_col), gap).alias("win"),
                        F.col(key_col))
            .agg(F.count("*").alias("n_events"),
                 F.sum("value").alias("total"))
            .select(F.col("win.start").alias("session_start"),
                    F.col("win.end").alias("session_end"),
                    key_col, "n_events", "total"))

"""Streaming exact deduplication: first-seen-wins over an unbounded
document stream.

The batch dedup suite (``operators/dedup.py``) answers "which documents
in this corpus are duplicates"; this operator answers the ingest-time
form — "have I seen this content before, across all micro-batches so
far" — the shape a continuously-fed training-data pipeline needs so a
re-crawled page never reaches the corpus twice.

Spark-first: this is built on the engine's native stateful dedup
(``dropDuplicates`` / ``dropDuplicatesWithinWatermark``), not a custom
state UDF — the state store (RocksDB-backed at cluster scale) keys on
the 16-byte content digest, partitioned by key, and the watermark
variant bounds state growth for infinite streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_COL = "content_key"


def dedup_stream(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """First-seen exact dedup on a streaming DataFrame: each distinct
    ``text`` digest is emitted exactly once across the whole stream
    lifetime (state never expires — use :func:`dedup_stream_bounded`
    when the stream is infinite and re-crawls arrive within a known
    horizon).

    The dedup key is the md5 digest, not the text: state-store entries
    are 16 bytes + key overhead each, so a billion-document history is
    tens of GB of state across the cluster, not the corpus itself."""
    return (docs
            .withColumn(KEY_COL, F.md5(F.col(text_col).cast("binary")))
            .dropDuplicates([KEY_COL]))


def dedup_stream_bounded(docs: DataFrame, ts_col: str,
                         horizon: str = "1 hour",
                         text_col: str = "text") -> DataFrame:
    """Watermark-bounded variant: duplicates are suppressed only within
    the event-time ``horizon``; state older than the watermark is
    evicted, so state size is bounded by the duplicate-arrival window
    instead of stream lifetime — the infinite-ingest configuration."""
    return (docs
            .withColumn(KEY_COL, F.md5(F.col(text_col).cast("binary")))
            .withWatermark(ts_col, horizon)
            .dropDuplicatesWithinWatermark([KEY_COL]))

"""Structured Streaming tests: file-source micro-batches through a
watermarked windowed aggregation, checked against the identical batch
plan (the unified batch/stream model), plus cursor-stream properties."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.streaming.cursor_source import (
    cursor_stream_batches)
from agnostic_blockchain_etl_spark.streaming.windows import windowed_counts


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    s = get_session(master="local[8]",
                    conf={"spark.sql.shuffle.partitions": "8"})
    yield s


class TestWindowedStream:
    def test_stream_matches_batch(self, spark, tmp_path):
        src = str(tmp_path / "stream_src")
        os.makedirs(src)
        # events with event-time timestamps, written as two file batches
        batch1 = spark.range(0, 500).select(
            (F.col("id") % 7).alias("user_id"),
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 37).alias("ts"),
            (F.col("id") % 100).cast("double").alias("value"))
        batch2 = spark.range(500, 1000).select(
            (F.col("id") % 7).alias("user_id"),
            F.timestamp_seconds(1_700_000_000 + F.col("id") * 37).alias("ts"),
            (F.col("id") % 100).cast("double").alias("value"))
        batch1.write.parquet(src + "/b1")
        batch2.write.parquet(src + "/b2")

        stream = (spark.readStream.schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
                  .option("maxFilesPerTrigger", 1)
                  .parquet(src + "/*"))
        agg = windowed_counts(stream, "ts", "user_id",
                              window="15 minutes", watermark="30 minutes")
        q = (agg.writeStream.outputMode("complete")
             .format("memory").queryName("win_counts").start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.table("win_counts")

        batch_df = batch1.unionByName(batch2)
        expected = windowed_counts(batch_df, "ts", "user_id",
                                   window="15 minutes")
        assert got.count() == expected.count() > 0
        assert (got.exceptAll(expected).count() == 0
                and expected.exceptAll(got).count() == 0)


class TestCursorStream:
    def test_bounded_drain(self):
        tips = iter([10, 10, 25])
        batches = list(cursor_stream_batches(
            lambda: next(tips, None), start=0, max_batch_size=8,
            poll_interval_s=0, stop_when_caught_up=True))
        covered = [c for b in batches for c in range(b.start, b.end + 1)]
        assert covered == list(range(0, 26))
        assert all(b.items <= 8 for b in batches)
        assert [b.number for b in batches] == list(range(len(batches)))

    def test_stop_after(self):
        batches = list(cursor_stream_batches(
            lambda: 1000, start=0, max_batch_size=10,
            poll_interval_s=0, stop_after_batches=3))
        assert len(batches) == 3 and batches[-1].end == 29

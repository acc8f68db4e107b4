"""Schema-drift guard + schema-adaptive events.ts conversion.

The round-2 testdata regeneration silently flipped ``events.ts`` from
TIMESTAMP(NANOS)/nanos-long to ``timestamp[us]``; every downstream query
died late with an opaque AnalysisException. These tests pin the two
defenses: ``check_schema`` fails early with the drifted column named, and
``events_us`` yields identical epoch-µs for every physical type the
driver has shipped — independent of the session timezone.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


class TestSchemaGuard:
    def test_real_testdata_passes(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import load_tables
        load_tables(spark, SF_DIR)  # raises on drift

    def test_drifted_column_named_in_error(self, spark, tmp_path):
        from agnostic_blockchain_etl_spark.operators.tables import load_tables
        bad = spark.createDataFrame(
            [(1, "not-a-timestamp", 2, "click", 0.5, "{}")],
            "event_id long, ts string, user_id long, event_type string, "
            "value double, props string")
        bad.write.parquet(str(tmp_path / "events.parquet"))
        with pytest.raises(ValueError, match=r"events\.ts.*'string'"):
            load_tables(spark, str(tmp_path), ("events",))

    def test_missing_column_named_in_error(self, spark, tmp_path):
        from agnostic_blockchain_etl_spark.operators.tables import load_tables
        bad = spark.createDataFrame([(1,)], "event_id long")
        bad.write.parquet(str(tmp_path / "events.parquet"))
        with pytest.raises(ValueError, match=r"missing expected column 'ts'"):
            load_tables(spark, str(tmp_path), ("events",))


class TestEventsUs:
    MICROS = 1_710_506_096_789_012  # 2024-03-15 12:34:56.789012 naive-UTC

    def test_bigint_nanos_and_ntz_agree(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import events_us
        as_nanos = spark.createDataFrame(
            [(self.MICROS * 1000,)], "ts long")
        as_ntz = spark.createDataFrame(
            [("2024-03-15 12:34:56.789012",)], "raw string").select(
            F.col("raw").cast("timestamp_ntz").alias("ts"))
        v_nanos = events_us(as_nanos).collect()[0].ts
        v_ntz = events_us(as_ntz).collect()[0].ts
        assert v_nanos == v_ntz == self.MICROS

    def test_ntz_conversion_is_timezone_independent(self, spark):
        # under a non-UTC session timezone the NTZ branch must NOT shift
        # by the session offset (a cast-to-timestamp implementation would)
        from agnostic_blockchain_etl_spark.operators.tables import events_us
        saved = spark.conf.get("spark.sql.session.timeZone")
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        try:
            df = spark.createDataFrame(
                [("2024-03-15 12:34:56.789012",)], "raw string").select(
                F.col("raw").cast("timestamp_ntz").alias("ts"))
            assert events_us(df).collect()[0].ts == self.MICROS
        finally:
            spark.conf.set("spark.sql.session.timeZone", saved)

    def test_unsupported_type_raises(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import events_us
        df = spark.createDataFrame([("x",)], "ts string")
        with pytest.raises(TypeError, match="events.ts"):
            events_us(df)

    def test_epoch_day_matches_naive_date(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import epoch_day
        df = spark.createDataFrame([(self.MICROS,)], "ts long")
        assert str(df.select(epoch_day("ts").alias("d"))
                   .collect()[0].d) == "2024-03-15"


class TestSpread:
    """spread() heals pathologically under-split scans (single-row-group
    parquet pins fused pipelines to one task) and stays out of plans
    that are already parallel enough."""

    def test_underpartitioned_source_is_spread(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import spread
        df = spark.range(1000).coalesce(1)
        out = spread(df)
        assert out.rdd.getNumPartitions() == \
            spark.sparkContext.defaultParallelism
        assert out.count() == 1000

    def test_wellpartitioned_source_untouched(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import spread
        p = spark.sparkContext.defaultParallelism
        df = spark.range(1000).repartition(p)
        # no healing shuffle: the plan object is returned as-is
        assert spread(df) is df

    def test_testdata_documents_scan_is_healed(self, spark):
        # the driver's parquet is single-row-group: the guard must fire
        from agnostic_blockchain_etl_spark.operators.tables import (
            load_tables, spread)
        docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
        assert docs.rdd.getNumPartitions() == 1
        assert spread(docs).rdd.getNumPartitions() > 1

    def test_streaming_frame_passes_through(self, spark):
        # .rdd is illegal on an unstarted stream — spread must no-op
        from agnostic_blockchain_etl_spark.operators.tables import spread
        stream = spark.readStream.format("rate").load()
        assert spread(stream) is stream

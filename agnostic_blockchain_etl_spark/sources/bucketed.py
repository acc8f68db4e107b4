"""Bucketed-table co-location: the shuffle-elimination path for repeated
big-big joins.

The reference's sink tables are ClickHouse MergeTree trees ordered by the
join/cursor key (e.g. examples/ethereum_blocks/create_table.sql ORDER BY
number), which makes its per-batch joins merge-local. The Spark analog is
bucketing: ``bucketBy(N, key)`` at write time pins rows to buckets by
``hash(key) % N``, so two tables bucketed the same way join WITHOUT any
exchange — the single biggest shuffle saving available for a fact-fact
join that runs every batch.

At 100 TB: bucket the sink once at ingest (the write pays the shuffle),
then every downstream decode/enrich/dedup join on the bucket key is
map-side. Bucket count should target HDFS-block-sized files per bucket
at steady state; AQE cannot coalesce bucketed scans, so pick N for the
steady-state table size, not the first batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int,
                   sort: bool = True, mode: str = "overwrite") -> None:
    """Persist ``df`` as a bucketed (and by default sorted) table on
    ``key``. Sorting within buckets additionally enables sort-merge joins
    with no per-task sort."""
    writer = df.write.format("parquet").bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.mode(mode).saveAsTable(table)


def colocated_join(spark: SparkSession, left: str, right: str, key: str,
                   how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With matching
    bucket specs Catalyst plans a SortMergeJoin with NO Exchange on
    either side (asserted by tests/test_bucketing.py); the join cost is
    a co-partitioned local merge."""
    return spark.table(left).join(spark.table(right), key, how)

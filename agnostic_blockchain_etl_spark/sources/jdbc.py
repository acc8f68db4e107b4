"""Proxy (remote) tables via JDBC — the ``remote(host, db, table, user,
passwd)`` analog (SURVEY.md §2.2; reference:
examples/ethereum_blocks/create_remote_table.sql:1-7 creates a local alias
for a table on another server; create_source.sql/create_sink.sql do the
same for decode pipelines).

Spark-first mapping: ``spark.read.jdbc`` with predicate/partition pushdown
for sources, ``DataFrameWriter.jdbc`` for sinks. Exercised live against
the Derby engine embedded in the Spark distribution
(tests/test_sources.py::TestJdbcRemote); for a networked warehouse, pass
its driver class + URL the same way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def remote_table(spark: SparkSession, url: str, table: str, user: str = "",
                 password: str = "", partition_column: str | None = None,
                 lower_bound: int | None = None, upper_bound: int | None = None,
                 num_partitions: int | None = None,
                 driver: str | None = None, **options: str) -> DataFrame:
    """Read a remote table as a DataFrame.

    For large remote tables pass ``partition_column`` (+ bounds): Spark
    issues ``num_partitions`` parallel range-predicated queries instead of
    one serial cursor — the analog of the reference reading its remote()
    proxy per batch range."""
    reader = (spark.read.format("jdbc")
              .option("url", url).option("dbtable", table)
              .option("user", user).option("password", password))
    if driver is not None:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions or 8)))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def register_remote_table(spark: SparkSession, name: str, url: str,
                          table: str, **kwargs) -> None:
    """``CREATE TABLE sink AS remote(...)`` parity: register the proxy under
    a local view name so templated SQL addresses it like any table."""
    remote_table(spark, url, table, **kwargs).createOrReplaceTempView(name)


def write_remote_table(df: DataFrame, url: str, table: str, user: str = "",
                       password: str = "", mode: str = "append",
                       driver: str | None = None, **options: str) -> None:
    """INSERT INTO a remote table (the proxy-sink write path)."""
    writer = (df.write.format("jdbc")
              .option("url", url).option("dbtable", table)
              .option("user", user).option("password", password))
    if driver is not None:
        writer = writer.option("driver", driver)
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.mode(mode).save()

"""Metadata-only file listing — the ``s3('…/date=*/*.parquet', …, 'One')``
analog (reference: examples/table_to_daily_parquet_file/start.sql:6-11
reads only virtual columns: the hive partition value + a file count).

Spark mapping: list the filesystem through Spark's Hadoop FS (so the same
code paths work for s3a/gcs/hdfs/local), parse hive partition key=value
segments from paths, and return a small driver-side DataFrame. No data
files are opened — exactly the 'One' format's contract."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

_PARTITION_RE = re.compile(r"([^/=]+)=([^/]+)")


def list_partition_files(spark: SparkSession, path: str,
                         suffix: str = ".parquet") -> DataFrame:
    """(file, partition key/value columns) for every data file under
    ``path`` — footer-free, metadata-only."""
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    fs_path = jvm.org.apache.hadoop.fs.Path(path)
    fs = fs_path.getFileSystem(hconf)
    # strip the FULLY-QUALIFIED base, not the caller's spelling: Hadoop
    # echoes paths back qualified (file:/..., s3a://bucket/...), so a
    # caller's bare '/data/env=prod/events' never prefix-matched and
    # key=value segments from ANCESTOR directories leaked into the
    # partitions map (review finding: a phantom env=prod in every row)
    base = fs.makeQualified(fs_path).toString().rstrip("/")
    rows: list[tuple] = []
    if fs.exists(fs_path):
        it = fs.listFiles(fs_path, True)
        while it.hasNext():
            f = it.next()
            p = f.getPath().toString()
            if not p.endswith(suffix):
                continue
            rel = p[len(base):] if p.startswith(base) else p
            parts = dict(_PARTITION_RE.findall(rel))
            rows.append((p, parts))
    return spark.createDataFrame(rows, "file STRING, partitions MAP<STRING,STRING>")


def partition_summary(spark: SparkSession, path: str,
                      partition_key: str = "date") -> tuple[int, str | None]:
    """(num_files, max partition value) — the start.sql resume probe shape
    (count + max(date) without touching data)."""
    df = list_partition_files(spark, path)
    rows = df.collect()
    values = [r["partitions"].get(partition_key) for r in rows
              if r["partitions"].get(partition_key) is not None]
    return len(rows), (max(values) if values else None)

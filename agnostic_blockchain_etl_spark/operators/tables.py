"""Testdata table loading + view registration.

Reads the driver-provided parquet tables (TESTDATA.md) and registers them as
temp views so both DataFrame code and ``spark.sql`` can address them. Reads
are lazy scans — Catalyst prunes columns and pushes filters into the parquet
reader, so loading "all tables" costs only footer reads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def load_tables(spark: SparkSession, sf_dir: str,
                names: tuple[str, ...] = TABLES) -> dict[str, DataFrame]:
    """Register ``{sf_dir}/{name}.parquet`` as temp views; return the dfs."""
    try:
        # events.parquet carries TIMESTAMP(NANOS); without this flag the scan
        # fails on schema inference (session-settable in Spark 4)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    # the driver may call queries() on a fresh session without entry() —
    # make every query self-sufficient (idempotent, no-op after first call)
    from ..functions.registry import register_all
    register_all(spark)
    out: dict[str, DataFrame] = {}
    for name in names:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

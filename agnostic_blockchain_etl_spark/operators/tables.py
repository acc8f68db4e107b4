"""Testdata table loading + view registration.

Reads the driver-provided parquet tables (TESTDATA.md) and registers them as
temp views so both DataFrame code and ``spark.sql`` can address them. Reads
are lazy scans — Catalyst prunes columns and pushes filters into the parquet
reader, so loading "all tables" costs only footer reads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def avg_units(sum_dec: Column, count: Column, scale: int) -> Column:
    """Cross-engine-exact rounded average: half-up integer arithmetic.

    ``round(sum_double / count, scale)`` is not portable — when the true
    quotient terminates exactly at ``scale+1`` digits ending in 5 (a tie,
    ~1/(2·count) of groups), Spark and DuckDB round the nearest-double
    differently. ``(2s + c) div (2c)`` over the exactly-scaled integer sum
    is the same integer on every engine, and the final division by
    ``10^scale`` is one identical IEEE op. DuckDB twin:
    ``((2 * CAST(sum(dec) * 10^scale AS BIGINT) + count(*)) //
    (2 * count(*))) / 10^scale.0``.

    Exact while the scaled sum fits a signed 64-bit int (~9e18 — at
    DECIMAL(18,4) money scale that is ~900 T currency units per group)."""
    s = (sum_dec * (10 ** scale)).cast("long")
    return F.call_function("div", 2 * s + count, 2 * count) / float(10 ** scale)


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

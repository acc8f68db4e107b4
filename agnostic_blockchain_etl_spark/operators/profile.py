"""Generic table profiling: per-column statistics in one pass — the
engine-side analog of ClickHouse's system-table column stats / DESCRIBE
workflows (and the first thing run against an unknown 100 TB table).

One ``agg`` computes every column's facets as parallel aggregate
expressions (never a per-column job), then one ``stack`` unpivots to
long form — a single scan with map-side partial aggregation regardless
of column count. Distinct counts are HLL approximations
(``approx_count_distinct``): exact distincts per column would be one
shuffle each at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def profile_table(df: DataFrame, approx_rsd: float = 0.05) -> DataFrame:
    """(column, dtype, n_rows, n_nulls, null_frac, approx_distinct,
    min_value, max_value, mean_value) — one row per profilable column
    (atomic types; nested/binary columns report null min/max/mean but
    still count nulls)."""
    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, dtype in cols:
        c = F.col(name)
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0))
                    .alias(f"__nulls__{name}"))
        atomic = ("array<" not in dtype and "struct<" not in dtype
                  and "map<" not in dtype and dtype != "binary")
        aggs.append((F.approx_count_distinct(name, approx_rsd) if atomic
                     else F.lit(None).cast("long"))
                    .alias(f"__dist__{name}"))
        aggs.append((F.min(c).cast("string") if atomic
                     else F.lit(None).cast("string"))
                    .alias(f"__min__{name}"))
        aggs.append((F.max(c).cast("string") if atomic
                     else F.lit(None).cast("string"))
                    .alias(f"__max__{name}"))
        aggs.append((F.round(F.avg(c), 6) if dtype in _NUMERIC
                     else F.lit(None).cast("double"))
                    .alias(f"__mean__{name}"))
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{n}', '{t}', __nulls__{n}, __dist__{n}, __min__{n}, __max__{n}, "
        f"__mean__{n}" for n, t in cols)
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(cols)}, {stack}) AS "
        "(column, dtype, n_nulls, approx_distinct, min_value, max_value, "
        "mean_value)"
    ).select(
        "column", "dtype", F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.round(F.col("n_nulls") / F.greatest("n_rows", F.lit(1)), 6)
         .alias("null_frac"),
        F.col("approx_distinct").cast("long").alias("approx_distinct"),
        "min_value", "max_value", "mean_value")

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


def profile_sketch(df: DataFrame, lg_k: int = 12) -> DataFrame:
    """Mergeable one-row profile summary of ``df`` — the incremental
    form of :func:`profile_table`: profile each ingest batch once, store
    the summary row, and :func:`merge_profile_sketches` folds any set of
    summaries into the full-corpus profile WITHOUT re-reading data.
    Distinct counts ride Apache DataSketches HLL binaries
    (``hll_sketch_agg``/``hll_union_agg`` — exactly-mergeable state, the
    property ``approx_count_distinct``'s internal buffer does not
    expose); min/max/sum/count are trivially mergeable scalars. Numeric
    min/max merge as doubles, date/timestamp/string as strings (ISO
    date strings order correctly); the sketch stays one scan with
    map-side partial aggregation, like the one-shot profile."""
    cols = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, dtype in cols:
        c = F.col(name)
        atomic = ("array<" not in dtype and "struct<" not in dtype
                  and "map<" not in dtype and dtype != "binary")
        numeric = dtype in _NUMERIC
        aggs.append(F.sum(F.when(c.isNull(), 1).otherwise(0))
                    .alias(f"__nulls__{name}"))
        # hll_sketch_agg accepts int/long/string/binary only — feed
        # everything else through its string form (same distinct set)
        sk_in = name if dtype in ("int", "bigint", "string") \
            else f"CAST({name} AS STRING)"
        aggs.append((F.expr(f"hll_sketch_agg({sk_in}, {lg_k})") if atomic
                     else F.lit(None).cast("binary"))
                    .alias(f"__sk__{name}"))
        # numeric min/max keep their ORIGINAL type (merge preserves it,
        # and the final cast-to-string then matches profile_table's
        # rendering — a long 5 prints "5", not "5.0")
        aggs.append((F.min(c) if numeric
                     else F.lit(None).cast("double"))
                    .alias(f"__minn__{name}"))
        aggs.append((F.max(c) if numeric
                     else F.lit(None).cast("double"))
                    .alias(f"__maxn__{name}"))
        aggs.append((F.min(c).cast("string") if atomic and not numeric
                     else F.lit(None).cast("string"))
                    .alias(f"__mins__{name}"))
        aggs.append((F.max(c).cast("string") if atomic and not numeric
                     else F.lit(None).cast("string"))
                    .alias(f"__maxs__{name}"))
        aggs.append((F.sum(c.cast("double")) if numeric
                     else F.lit(None).cast("double"))
                    .alias(f"__sum__{name}"))
        aggs.append((F.count(c) if numeric else F.lit(None).cast("long"))
                    .alias(f"__cnt__{name}"))
    out = df.agg(*aggs)
    for name, dtype in cols:   # dtype rides the summary row
        out = out.withColumn(f"__dtype__{name}", F.lit(dtype))
    return out


def merge_profile_sketches(sketches: DataFrame) -> DataFrame:
    """Fold any number of :func:`profile_sketch` rows (same source
    schema, unioned) into the long-form profile — same output schema as
    :func:`profile_table`. One tiny aggregation over B summary rows."""
    names = sorted(c[len("__sk__"):] for c in sketches.columns
                   if c.startswith("__sk__"))
    aggs = [F.sum("__n").alias("__n")]
    for n in names:
        aggs += [
            F.sum(f"__nulls__{n}").alias(f"__nulls__{n}"),
            F.expr(f"hll_union_agg(__sk__{n})").alias(f"__sk__{n}"),
            F.min(f"__minn__{n}").alias(f"__minn__{n}"),
            F.max(f"__maxn__{n}").alias(f"__maxn__{n}"),
            F.min(f"__mins__{n}").alias(f"__mins__{n}"),
            F.max(f"__maxs__{n}").alias(f"__maxs__{n}"),
            F.sum(f"__sum__{n}").alias(f"__sum__{n}"),
            F.sum(f"__cnt__{n}").alias(f"__cnt__{n}"),
            F.first(f"__dtype__{n}").alias(f"__dtype__{n}"),
        ]
    wide = sketches.agg(*aggs)
    stack = ", ".join(
        f"'{n}', __dtype__{n}, __nulls__{n}, "
        f"CASE WHEN __sk__{n} IS NULL THEN CAST(NULL AS BIGINT) "
        f"ELSE CAST(hll_sketch_estimate(__sk__{n}) AS BIGINT) END, "
        f"coalesce(CAST(__minn__{n} AS STRING), __mins__{n}), "
        f"coalesce(CAST(__maxn__{n} AS STRING), __maxs__{n}), "
        f"round(__sum__{n} / __cnt__{n}, 6)" for n in names)
    return wide.selectExpr(
        "__n AS n_rows",
        f"stack({len(names)}, {stack}) AS "
        "(column, dtype, n_nulls, approx_distinct, min_value, max_value, "
        "mean_value)"
    ).select(
        "column", "dtype", F.col("n_rows").cast("long").alias("n_rows"),
        F.col("n_nulls").cast("long").alias("n_nulls"),
        F.round(F.col("n_nulls") / F.greatest("n_rows", F.lit(1)), 6)
         .alias("null_frac"),
        F.col("approx_distinct").cast("long").alias("approx_distinct"),
        "min_value", "max_value", "mean_value")


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

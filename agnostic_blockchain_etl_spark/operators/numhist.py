"""Fixed-bin numeric histograms + quantile estimation — the NUMERIC
complement to `observe.unigram_histogram` (terms) and the mergeable
alternative to `analytics.approx_sketches`' Spark-native percentiles
(which are not oracle-pinnable; these are, value-for-value). The
training-data uses: document-length / score / token-count
distribution monitoring per source and per ingest day, where the
store must be MERGEABLE (day-1 + day-2 = cell-wise addition — the
`cms`/`bloom`/KMV store posture) and the quantile read must be cheap
(arithmetic over ≤ n_bins summary rows, never a sort of the data).

Estimator: within the first bin whose cumulative count reaches the
target rank ``r = q · total``, linearly interpolate —
``est = lo + (bin + max(0, r − cum_prev) / n_bin) · width``. All
inputs to the interpolation are exact longs plus one shared double
multiply, so estimates pin across engines at 6 dp. The histogram is
lossy by construction (resolution = bin width); the estimator is the
standard equi-width read, NOT exact order statistics — `analytics`'
exact percentiles remain the small-data tool.

NULL values count under bin −1 (flag-don't-drop — visible in the
store, excluded from quantiles); values outside [lo, hi) clamp into
the edge bins (documented saturation, the knob owner widens the
range when the edge bins grow hot).

Scale: building is one map-side-combined count onto ≤ n_bins (×
groups) cells; merging is cell-wise addition; the quantile read's
window runs over the ≤ n_bins-row summary per group, never data
(`ordering._bucketed_rank`'s summary-window discipline).

Reference: no counterpart; LLM-data-pipeline mandate, sibling of
`observe.py`'s drift family (same store shape, numeric axis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()


def _check_geometry(lo: float, hi: float, n_bins: int) -> None:
    if not hi > lo:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    if n_bins <= 0:
        raise ValueError(f"n_bins must be positive, got {n_bins}")


def numeric_histogram(df: DataFrame, value_col: str, *, lo: float,
                      hi: float, n_bins: int,
                      group_cols: list[str] | None = None) -> DataFrame:
    """``(group…, bin int, n long)`` — equi-width bin counts of
    ``value_col``; NULLs under bin −1, out-of-range values clamped
    into the edge bins. One aggregation onto bounded cells."""
    _check_geometry(lo, hi, n_bins)
    g = list(group_cols or [])
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width))
    b = F.when(F.col(value_col).isNull(), F.lit(-1)) \
         .otherwise(F.least(F.lit(n_bins - 1),
                            F.greatest(F.lit(0), raw))).cast("int")
    return (df.select(*g, b.alias("bin"))
            .groupBy(*g, "bin").agg(F.count("*").alias("n")))


def merge_numeric_histograms(*hists: DataFrame,
                             group_cols: list[str] | None = None
                             ) -> DataFrame:
    """Cell-wise addition of histograms built with the same geometry
    — day-1 + day-2 equals one build over both days."""
    if not hists:
        raise ValueError("merge needs at least one histogram")
    g = list(group_cols or [])
    out = hists[0]
    for h in hists[1:]:
        out = out.unionByName(h)
    return out.groupBy(*g, "bin").agg(F.sum("n").alias("n"))


def histogram_quantiles(hist: DataFrame, qs: list[float], *, lo: float,
                        hi: float, n_bins: int,
                        group_cols: list[str] | None = None
                        ) -> DataFrame:
    """``(group…, q double, est double)`` — the equi-width
    interpolated quantile read over a `numeric_histogram` frame. The
    NULL bin is excluded; a group with zero non-null values emits no
    rows (absent, not NaN — callers join back if they need the
    flag). Windows run over the ≤ n_bins-row summary per group."""
    _check_geometry(lo, hi, n_bins)
    if not qs or any(not 0.0 < q <= 1.0 for q in qs):
        raise ValueError(f"quantiles must lie in (0, 1], got {qs}")
    g = list(group_cols or [])
    width = (hi - lo) / n_bins
    h = hist.where(F.col("bin") >= 0)
    wc = (Window.partitionBy(*g).orderBy("bin")
          if g else Window.orderBy("bin")) \
        .rowsBetween(Window.unboundedPreceding, 0)
    wt = Window.partitionBy(*g) if g else \
        Window.partitionBy(F.lit(1))
    cum = (h.withColumn("cum", F.sum("n").over(wc))
           .withColumn("total", F.sum("n").over(wt))
           .withColumn("cum_prev", F.col("cum") - F.col("n")))
    qf = F.explode(F.lit([float(q) for q in sorted(qs)])).alias("q")
    qdf = hist.sparkSession.range(1).select(qf)
    hit = (cum.join(F.broadcast(qdf),
                    (F.col("cum") >= F.col("q") * F.col("total"))
                    & (F.col("n") > 0)))
    # first qualifying bin per (group, q): min-of-struct, bin leads
    first = (hit.groupBy(*g, "q")
             .agg(F.min(F.struct("bin", "cum_prev", "n", "total"))
                  .alias("__s")))
    est = (F.lit(lo)
           + (F.col("__s.bin")
              + F.greatest(F.lit(0.0),
                           F.col("q") * F.col("__s.total")
                           - F.col("__s.cum_prev"))
              / F.col("__s.n")) * F.lit(width))
    return first.select(*g, "q", F.round(est, 6).alias("est"))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------

_LO, _HI, _BINS = 0.0, 640.0, 64      # n_chars ∈ [44, 577] across SFs
_QS = [0.5, 0.9, 0.99]
_W = (_HI - _LO) / _BINS


def _sql_numhist() -> str:
    qvals = ", ".join(f"{q}::DOUBLE" for q in _QS)
    bin_expr = ("CASE WHEN n_chars IS NULL THEN -1 ELSE "
                f"least({_BINS - 1}, greatest(0, "
                f"CAST(floor((n_chars - {_LO}) / {_W}) AS INT))) END")
    est_expr = (f"round({_LO} + (bin + greatest(0.0, "
                f"q * total - cum_prev) / n) * {_W}, 6)")
    return f"""
    WITH b AS (SELECT source, {bin_expr} AS bin FROM documents),
    gh AS (SELECT source, bin, CAST(count(*) AS BIGINT) AS n
           FROM b GROUP BY source, bin),
    h AS (SELECT bin, CAST(sum(n) AS BIGINT) AS n
          FROM gh GROUP BY bin),
    qs AS (SELECT unnest([{qvals}]) AS q),
    cum AS (SELECT bin, n,
                   sum(n) OVER (ORDER BY bin) AS cum,
                   sum(n) OVER () AS total
            FROM h WHERE bin >= 0),
    hit AS (SELECT q, bin, cum - n AS cum_prev, n, total,
                   row_number() OVER (PARTITION BY q
                                      ORDER BY bin) AS rn
            FROM cum JOIN qs ON cum.cum >= qs.q * cum.total
                            AND cum.n > 0),
    quant AS (SELECT q, {est_expr} AS est FROM hit WHERE rn = 1),
    gcum AS (SELECT source, bin, n,
                    sum(n) OVER (PARTITION BY source ORDER BY bin)
                        AS cum,
                    sum(n) OVER (PARTITION BY source) AS total
             FROM gh WHERE bin >= 0),
    ghit AS (SELECT source, q, bin, cum - n AS cum_prev, n, total,
                    row_number() OVER (PARTITION BY source, q
                                       ORDER BY bin) AS rn
             FROM gcum JOIN qs ON gcum.cum >= qs.q * gcum.total
                              AND gcum.n > 0),
    gquant AS (SELECT source, q, {est_expr} AS est
               FROM ghit WHERE rn = 1)
    SELECT 'hist' AS facet, CAST(NULL AS VARCHAR) AS source,
           CAST(bin AS INT) AS bin, n, CAST(NULL AS DOUBLE) AS q,
           CAST(NULL AS DOUBLE) AS est
    FROM h
    UNION ALL
    SELECT 'quantile', CAST(NULL AS VARCHAR), CAST(NULL AS INT),
           CAST(NULL AS BIGINT), q, est
    FROM quant
    UNION ALL
    SELECT 'group', source, CAST(NULL AS INT), CAST(NULL AS BIGINT),
           q, est
    FROM gquant
    """


@query("numeric_quantile_report", oracle=_sql_numhist())
def numeric_quantile_report(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Gate row for the numeric-histogram family, three facets over
    documents.n_chars (64 × 10-char bins): ``hist`` — the global
    histogram built as a TWO-HALF MERGE (doc_id parity) vs the
    oracle's one-shot build; ``quantile`` — interpolated p50/p90/p99;
    ``group`` — the same three per source. Registered PAST the
    driver's 50-slot window (``__spark_entry__._PAST_WINDOW``)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"] \
        .select("doc_id", "source", "n_chars")
    gh = numeric_histogram(docs, "n_chars", lo=_LO, hi=_HI,
                           n_bins=_BINS, group_cols=["source"])
    halves = [numeric_histogram(docs.where(F.col("doc_id") % 2 == i),
                                "n_chars", lo=_LO, hi=_HI, n_bins=_BINS)
              for i in (0, 1)]
    h = merge_numeric_histograms(*halves)

    def _nul(c, t):
        return F.lit(None).cast(t).alias(c)

    hist = h.select(F.lit("hist").alias("facet"),
                    _nul("source", "string"), F.col("bin"), F.col("n"),
                    _nul("q", "double"), _nul("est", "double"))
    quant = (histogram_quantiles(h, _QS, lo=_LO, hi=_HI, n_bins=_BINS)
             .select(F.lit("quantile").alias("facet"),
                     _nul("source", "string"), _nul("bin", "int"),
                     _nul("n", "long"), "q", "est"))
    gq = (histogram_quantiles(gh, _QS, lo=_LO, hi=_HI, n_bins=_BINS,
                              group_cols=["source"])
          .select(F.lit("group").alias("facet"), "source",
                  _nul("bin", "int"), _nul("n", "long"), "q", "est"))
    return hist.unionByName(quant).unionByName(gq)

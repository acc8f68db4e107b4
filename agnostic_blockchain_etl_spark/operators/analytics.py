"""Advanced analytics operators: percentiles, correlation, time-bucket
rollups, sessionization, moving windows, ordered string aggregation.

Beyond the reference's own workload (SURVEY.md §2.5-2.6 lists these as
'free in Spark'), these prove out the windowed/statistical surface a
warehouse replacement needs, each hash-verified against DuckDB.

Scale shapes: all are single-shuffle plans — percentile/corr are
algebraic-ish aggregations (Spark's exact percentile sorts within groups;
for 100 TB use approx_percentile and accept the oracle-exempt path);
sessionization and moving averages are one window pass keyed on the
entity, which partitions cleanly by user at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import load_tables

QUERIES: dict = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


def _events_us(spark, sf_dir):
    """events with ts as epoch-µs longs (nanos truncated, DuckDB parity)."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].withColumn("ts", F.expr("ts div 1000"))


@query("percentiles_exact", oracle="""
    SELECT event_type,
           round(quantile_cont(value, 0.5), 4) AS p50,
           round(quantile_cont(value, 0.9), 4) AS p90,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events GROUP BY event_type
""")
def percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark ``percentile`` ==
    DuckDB ``quantile_cont``). The 100 TB path swaps in approx_percentile
    (t-digest) — same plan shape, bounded memory."""
    t = load_tables(spark, sf_dir, ("events",))
    return (t["events"].groupBy("event_type")
            .agg(F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
                 F.round(F.expr("percentile(value, 0.99)"), 4).alias("p99")))


@query("corr_covar_stats", oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 4)      AS qty_disc_covar,
           round(stddev_samp(l_extendedprice), 4)            AS price_stddev
    FROM lineitem GROUP BY l_returnflag
""")
def corr_covar_stats(spark, sf_dir):
    """Correlation / covariance / stddev per group — algebraic moments,
    map-side combinable."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (t["lineitem"].groupBy("l_returnflag")
            .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 4)
                  .alias("qty_price_corr"),
                 F.round(F.covar_samp("l_quantity", "l_discount"), 4)
                  .alias("qty_disc_covar"),
                 F.round(F.stddev_samp("l_extendedprice"), 4)
                  .alias("price_stddev")))


@query("time_bucket_rollup", oracle="""
    SELECT date_trunc('week', o_orderdate)     AS week,
           CAST(count(*) AS BIGINT)            AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue,
           round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 4) AS avg_order
    FROM orders GROUP BY 1
""")
def time_bucket_rollup(spark, sf_dir):
    """Hypertable-style time-bucket rollup: truncate to the bucket, group,
    aggregate — the continuous-aggregate shape (both engines start weeks
    on Monday).

    Revenue sums in DECIMAL(18,4) (associative → identical at any
    partitioning; round-1 driver gate caught the double-sum ULP flip);
    avg is the exact decimal sum cast to double over count — one
    deterministic IEEE division on both engines."""
    t = load_tables(spark, sf_dir, ("orders",))
    price_dec = F.col("o_totalprice").cast("decimal(18,4)")
    return (t["orders"]
            .groupBy(F.date_trunc("week", "o_orderdate").alias("week"))
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum(price_dec), 2).cast("double").alias("revenue"),
                 F.round(F.sum(price_dec).cast("double") / F.count("*"), 4)
                  .alias("avg_order")))


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query("sessionization", oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_ts
        FROM events),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > {_SESSION_GAP_US}
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered),
    sessions AS (
        SELECT user_id, event_id, ts,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM sessions GROUP BY user_id, session_id
""")
def sessionization(spark, sf_dir):
    """Gaps-and-islands sessionization: a new session opens after a 30-min
    silence; session ids are running sums of the new-session flag. One
    window pass partitioned by user — the canonical scalable shape."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (e.select("user_id", "event_id", "ts")
               .withColumn("prev_ts", F.lag("ts").over(w))
               .withColumn("is_new",
                           F.when(F.col("prev_ts").isNull() |
                                  (F.col("ts") - F.col("prev_ts") > _SESSION_GAP_US),
                                  1).otherwise(0)))
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)))
    return (sessions.groupBy("user_id",
                             F.col("session_id").cast("long").alias("session_id"))
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end")))


@query("moving_average", oracle="""
    SELECT user_id, event_id,
           round(avg(value) OVER (PARTITION BY user_id
                                  ORDER BY epoch_us(ts), event_id
                                  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4)
               AS value_ma4
    FROM events
""")
def moving_average(spark, sf_dir):
    """Trailing moving average over a row frame per user."""
    e = _events_us(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, Window.currentRow))
    return e.select("user_id", "event_id",
                    F.round(F.avg("value").over(w), 4).alias("value_ma4"))


@query("approx_sketches")
def approx_sketches(spark, sf_dir):
    """Approximate sketches: HyperLogLog distinct counts and t-digest
    quantiles per group, emitted NEXT TO their exact values with a
    within-tolerance flag (rows-only — approximation has no byte-exact
    DuckDB oracle; the embedded flags make the check self-asserting: a
    broken sketch flips `hll_ok`/`pct_ok` to 0 and changes the value
    hash). These are the 100 TB forms of count-distinct and percentile —
    bounded memory, single pass, mergeable partial states."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    g = (t["lineitem"].groupBy("l_returnflag")
         .agg(F.countDistinct("l_partkey").alias("exact_distinct"),
              F.approx_count_distinct("l_partkey", 0.02).alias("hll_distinct"),
              F.expr("percentile(l_extendedprice, 0.5)").alias("exact_p50"),
              F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
               .alias("approx_p50")))
    return g.select(
        "l_returnflag", "exact_distinct", "hll_distinct",
        F.round("exact_p50", 2).alias("exact_p50"),
        F.round("approx_p50", 2).alias("approx_p50"),
        F.when((F.abs(F.col("hll_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")) <= 0.05, 1).otherwise(0)
         .alias("hll_ok"),
        F.when((F.abs(F.col("approx_p50") - F.col("exact_p50"))
                / F.col("exact_p50")) <= 0.05, 1).otherwise(0)
         .alias("pct_ok"))


@query("ordered_string_agg", oracle="""
    SELECT c_mktsegment,
           string_agg(DISTINCT c_name, ',' ORDER BY c_name) AS customers
    FROM customer GROUP BY c_mktsegment
""")
def ordered_string_agg(spark, sf_dir):
    """Ordered string aggregation (listagg): canonical sorted-distinct
    concat, identical bytes in both engines."""
    t = load_tables(spark, sf_dir, ("customer",))
    return (t["customer"].groupBy("c_mktsegment")
            .agg(F.array_join(F.array_sort(F.collect_set("c_name")), ",")
                 .alias("customers")))

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

from pyspark.sql import Window
from pyspark.sql import functions as F

from .tables import avg_units, events_us, load_tables, spread

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


def _events_us(spark, sf_dir):
    """events with ts as epoch-µs longs (schema-adaptive, DuckDB parity)."""
    t = load_tables(spark, sf_dir, ("events",))
    return events_us(t["events"])


@query("stats_distinct_agg", oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 4)       AS qty_price_corr,
           round(covar_samp(l_quantity, l_discount), 4)      AS qty_disc_covar,
           round(stddev_samp(l_extendedprice), 4)            AS price_stddev,
           CAST(count(DISTINCT l_partkey) AS BIGINT)         AS distinct_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT)         AS distinct_supps,
           round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                               0.5) / 100.0, 2)              AS price_p50,
           round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                               0.9) / 100.0, 2)              AS price_p90,
           round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                               0.99) / 100.0, 2)             AS price_p99,
           string_agg(DISTINCT strftime(l_shipdate, '%Y'), ','
                      ORDER BY strftime(l_shipdate, '%Y'))  AS ship_years
    FROM lineitem GROUP BY l_returnflag
""")
def stats_distinct_agg(spark, sf_dir):
    """Grouped statistics: correlation / covariance / stddev (algebraic
    moments, map-side combinable), distinct aggregation (§2.5; Spark
    expands count-distinct to a two-stage partial-distinct plan, no
    driver collect), exact interpolated percentiles (Spark
    ``percentile`` == DuckDB ``quantile_cont``, interpolated over exact
    CENT integers so both engines midpoint the same longs — the 100 TB
    path swaps in approx_percentile, same plan shape), and ordered
    string aggregation (canonical sorted-distinct concat, identical
    bytes in both engines). The percentile and listagg facets were
    standalone gate rows through round 3 (`percentiles_exact`,
    `ordered_string_agg`); they consolidated here in round 4 to free
    gate-window slots for `semantic_dedup_seeded` and
    `incremental_neardup_pairs` — same capabilities, same oracles, one
    grouping key."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    # moments/percentiles and count-distincts in separate branches:
    # fusing them makes Spark Expand-multiply every row through the
    # moment buffers (see approx_sketches); the branches share the scan,
    # run concurrently, and recombine over a 3-row broadcast join
    li = spread(t["lineitem"])
    cents = "cast(round(l_extendedprice * 100) as bigint)"
    moments = (li.groupBy("l_returnflag")
               .agg(F.round(F.corr("l_quantity", "l_extendedprice"), 4)
                     .alias("qty_price_corr"),
                    F.round(F.covar_samp("l_quantity", "l_discount"), 4)
                     .alias("qty_disc_covar"),
                    F.round(F.stddev_samp("l_extendedprice"), 4)
                     .alias("price_stddev"),
                    # ONE percentile buffer for all three quantiles: three
                    # separate percentile() aggregates each collect the
                    # full per-group value multiset (3× buffer inserts +
                    # memory); the array form shares one buffer and
                    # interpolates identically (r11)
                    F.expr(f"percentile({cents}, "
                           f"array(0.5D, 0.9D, 0.99D))").alias("__pcts"),
                    F.array_join(F.array_sort(F.collect_set(
                        F.date_format("l_shipdate", "yyyy"))), ",")
                     .alias("ship_years"))
               .select("*",
                       *[F.round(F.element_at("__pcts", i + 1) / 100.0, 2)
                          .alias(f"price_p{int(q * 100)}")
                         for i, q in enumerate((0.5, 0.9, 0.99))])
               .drop("__pcts"))
    distincts = (li.groupBy("l_returnflag")
                 .agg(F.countDistinct("l_partkey").alias("distinct_parts"),
                      F.countDistinct("l_suppkey").alias("distinct_supps")))
    return (moments.join(F.broadcast(distincts), "l_returnflag")
            .select("l_returnflag", "qty_price_corr", "qty_disc_covar",
                    "price_stddev", "distinct_parts", "distinct_supps",
                    "price_p50", "price_p90", "price_p99", "ship_years"))


@query("time_bucket_rollup", oracle="""
    SELECT 'week' AS facet,
           strftime(date_trunc('week', o_orderdate), '%Y-%m-%d') AS bucket,
           CAST(count(*) AS BIGINT)            AS n_orders,
           CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS revenue,
           ((2 * CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) * 10000
                      AS BIGINT) + count(*))
            // (2 * count(*))) / 10000.0 AS avg_order,
           CAST(NULL AS TIMESTAMP) AS min_plus30
    FROM orders GROUP BY 2
    UNION ALL
    SELECT 'month', strftime(o_orderdate, '%Y%m'),
           CAST(count(*) AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           min(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)
    FROM orders GROUP BY 2
""")
def time_bucket_rollup(spark, sf_dir):
    """Hypertable-style time-bucket rollup: truncate to the bucket, group,
    aggregate — the continuous-aggregate shape (both engines start weeks
    on Monday). The month facet carries the toYYYYMM / addDays / toDate
    family (§2.7): month partitioning keys (ethereum_blocks
    create_table.sql:31) and day-cursor arithmetic (table_to_daily
    start.sql:14).

    Revenue sums in DECIMAL(18,4) (associative → identical at any
    partitioning; round-1 driver gate caught the double-sum ULP flip);
    avg is half-up integer arithmetic on the exact scaled sum — a
    round(sum_double/count) tie at the .xxxx5 boundary rounds
    differently across engines (caught locally at sf0.01, bucket
    1999-06-28: 9199288.61/40 = exactly .21525), while ``(2s+c) div
    (2c)`` is the same integer everywhere, then one identical IEEE
    division."""
    t = load_tables(spark, sf_dir, ("orders",))
    price_dec = F.col("o_totalprice").cast("decimal(18,4)")
    weeks = (t["orders"]
             .groupBy(F.date_format(F.date_trunc("week", "o_orderdate"),
                                    "yyyy-MM-dd").alias("bucket"))
             .agg(F.count("*").alias("n_orders"),
                  F.round(F.sum(price_dec), 2).cast("double").alias("revenue"),
                  avg_units(F.sum(price_dec), F.count("*"), 4)
                   .alias("avg_order"))
             .select(F.lit("week").alias("facet"), "bucket", "n_orders",
                     "revenue", "avg_order",
                     F.lit(None).cast("timestamp_ntz").alias("min_plus30")))
    months = (t["orders"]
              .groupBy(F.date_format("o_orderdate", "yyyyMM").alias("bucket"))
              .agg(F.count("*").alias("n_orders"),
                   # NTZ, not TIMESTAMP: an instant-typed midnight is
                   # minted in the SESSION timezone and py-collects in
                   # machine time — found by the --plain-session
                   # hostile-tz gate run; DuckDB's TIMESTAMP is naive
                   F.min(F.date_add(F.col("o_orderdate").cast("date"), 30))
                    .cast("timestamp_ntz").alias("min_plus30"))
              .select(F.lit("month").alias("facet"), "bucket", "n_orders",
                      F.lit(None).cast("double").alias("revenue"),
                      F.lit(None).cast("double").alias("avg_order"),
                      "min_plus30"))
    return weeks.unionByName(months)


_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes


@query("sessionization", oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts, value,
               lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_ts,
               round(avg(value) OVER (PARTITION BY user_id
                                      ORDER BY epoch_us(ts), event_id
                                      ROWS BETWEEN 3 PRECEDING AND CURRENT ROW),
                     4) AS value_ma4
        FROM events),
    flagged AS (
        SELECT *, CASE WHEN prev_ts IS NULL
                         OR ts - prev_ts > {_SESSION_GAP_US}
                       THEN 1 ELSE 0 END AS is_new
        FROM ordered),
    sessions AS (
        SELECT user_id, event_id, ts, value_ma4,
               sum(is_new) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged),
    ranked AS (
        SELECT *, row_number() OVER (PARTITION BY user_id, session_id
                                     ORDER BY ts DESC, event_id DESC) AS rnd
        FROM sessions)
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           CAST(count(*) AS BIGINT) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end,
           max(CASE WHEN rnd = 1 THEN value_ma4 END) AS ma4_at_end
    FROM ranked GROUP BY user_id, session_id
""")
def sessionization(spark, sf_dir):
    """Gaps-and-islands sessionization: a new session opens after a 30-min
    silence; session ids are running sums of the new-session flag. One
    window pass partitioned by user — the canonical scalable shape.

    ``ma4_at_end`` carries the sliding-row-frame facet (the trailing
    4-row moving average over the per-user event stream, read at each
    session's closing event) — absorbed from the freed `moving_average`
    gate row in the round-7 rotation, so ROWS BETWEEN frames stay
    driver-verified; `moving_average` remains the library entry point."""
    e = _events_us(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = (e.select("user_id", "event_id", "ts", "value")
               .withColumn("value_ma4",
                           F.round(F.avg("value").over(
                               w.rowsBetween(-3, Window.currentRow)), 4))
               .withColumn("prev_ts", F.lag("ts").over(w))
               .withColumn("is_new",
                           F.when(F.col("prev_ts").isNull() |
                                  (F.col("ts") - F.col("prev_ts") > _SESSION_GAP_US),
                                  1).otherwise(0)))
    sessions = flagged.withColumn(
        "session_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding,
                                           Window.currentRow)))
    wd = Window.partitionBy("user_id", "session_id") \
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (sessions.withColumn("rnd", F.row_number().over(wd))
            .groupBy("user_id",
                     F.col("session_id").cast("long").alias("session_id"))
            .agg(F.count("*").alias("n_events"),
                 F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.max(F.when(F.col("rnd") == 1, F.col("value_ma4")))
                  .alias("ma4_at_end")))


def moving_average(spark, sf_dir):
    """Trailing moving average over a row frame per user. Gate coverage
    moved into ``sessionization.ma4_at_end`` (round-7 rotation — the
    slot went to `similarity.text_hashed_tfidf_embed`); kept as a
    library entry point."""
    e = _events_us(spark, sf_dir)
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-3, Window.currentRow))
    return e.select("user_id", "event_id",
                    F.round(F.avg("value").over(w), 4).alias("value_ma4"))


@query("approx_sketches", oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT)      AS exact_distinct,
           round(quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
                               0.5) / 100.0, 2)          AS exact_p50,
           CAST(1 AS INT) AS hll_ok,
           CAST(1 AS INT) AS pct_ok
    FROM lineitem GROUP BY l_returnflag
""")
def approx_sketches(spark, sf_dir):
    """Approximate sketches: HyperLogLog distinct counts and t-digest
    quantiles per group, checked against their exact values with a
    within-tolerance flag. The raw sketch estimates are engine-specific
    (no byte-exact DuckDB twin), so the hashed output carries the EXACT
    values (real oracle) plus the tolerance flags — the oracle asserts
    them 1, so a broken sketch fails the driver hash. These are the
    100 TB forms of count-distinct and percentile — bounded memory,
    single pass, mergeable partial states."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    # Two aggregation branches instead of one: mixing count-DISTINCT
    # with regular aggregates makes Spark plan an Expand (one projected
    # copy of every row per distinct group + one for the regular aggs),
    # so the percentile buffers chewed 2× the rows — measured 4.5-10 s
    # for the fused form vs ~2 s split. The branches share the healed
    # scan and run CONCURRENTLY (independent stages under one job);
    # the recombining join is 3 rows, broadcast.
    li = spread(t["lineitem"])
    distincts = (li.groupBy("l_returnflag")
                 .agg(F.countDistinct("l_partkey").alias("exact_distinct")))
    sketches = (li.groupBy("l_returnflag")
                .agg(F.approx_count_distinct("l_partkey", 0.02)
                      .alias("hll_distinct"),
                     # interpolate over exact CENT integers: both engines
                     # then midpoint the same longs — a double-vs-decimal
                     # source difference otherwise flips the .xx5 rounding
                     # tie at the median (caught by the decimal-drift gate
                     # replay, tables._DBL note)
                     F.expr("percentile(cast(round(l_extendedprice * 100) "
                            "as bigint), 0.5) / 100.0")
                      .alias("exact_p50"),
                     F.expr("approx_percentile(l_extendedprice, 0.5, 10000)")
                      .alias("approx_p50")))
    g = sketches.join(F.broadcast(distincts), "l_returnflag")
    return g.select(
        "l_returnflag", "exact_distinct",
        F.round("exact_p50", 2).alias("exact_p50"),
        F.when((F.abs(F.col("hll_distinct") - F.col("exact_distinct"))
                / F.col("exact_distinct")) <= 0.05, 1).otherwise(0)
         .cast("int").alias("hll_ok"),
        F.when((F.abs(F.col("approx_p50") - F.col("exact_p50"))
                / F.col("exact_p50")) <= 0.05, 1).otherwise(0)
         .cast("int").alias("pct_ok"))



"""Event-rate anomaly detection — rolling z-scores over densified
time buckets, the "did ingest just break?" monitor a continuously-fed
pipeline runs next to `observe.py`'s distribution drift and
`sourcecap`'s volume caps. The reference's operational analog is its
pipeline metrics (reference: internal/pipeline metrics counters —
items/s per stage); this is the corpus-side read: per event type,
bucket counts scored against their own trailing window, so both
spikes (a crawler loop, a replayed shard) and SILENCES (a dead
source — only visible because empty buckets are densified to
explicit zeros, not skipped) surface as flagged rows.

Determinism: bucket counts are exact longs; the trailing mean /
variance come from exact long sums over the frame (s1, s2 —
``var = (s2 − s1²/c) / (c−1)``), so both engines divide the SAME
integers and the 6-dp rounded z pins cross-engine. A z is emitted
only when the trailing frame is FULL (the first ``trailing`` buckets
per type warm up as NULL — flagged unknown, not silently scored
against a short window) and the window variance is positive (a
constant-rate window scores NULL, not ±inf).

Scale: the pipeline aggregates to a (type × bucket) summary first —
every window and the densify join run over that summary, never the
events (the `ordering._bucketed_rank` summary-window discipline);
the bucket span is bounded by time-range / bucket_width (a knob-
bounded frame for any retention a monitor would hold).

Reference: operational-monitoring counterpart (see above);
LLM-data-pipeline mandate, sibling of `observe.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import events_us, load_tables

QUERIES, ORACLES, query = make_registry()

_BUCKET_US = 3_600_000_000      # 1 h buckets
_TRAILING = 24                  # score vs the trailing day
_Z_THRESH = 3.0


def event_rate_zscores(events: DataFrame, *,
                       ts_col: str = "ts",
                       group_col: str = "event_type",
                       bucket_micros: int = _BUCKET_US,
                       trailing: int = _TRAILING,
                       z_threshold: float = _Z_THRESH) -> DataFrame:
    """``(grp, bucket, n, mean, sd, z, is_anomaly)`` — densified
    per-group bucket counts with rolling z-scores against the
    ``trailing`` PRECEDING buckets (the scored bucket itself is
    excluded, so a spike cannot mask itself). ``ts_col`` must already
    be epoch micros (`tables.events_us`)."""
    if bucket_micros <= 0:
        raise ValueError(f"bucket_micros must be positive, "
                         f"got {bucket_micros}")
    if trailing < 2:
        raise ValueError(f"trailing must be >= 2 (variance needs it), "
                         f"got {trailing}")
    b = F.floor(F.col(ts_col) / F.lit(bucket_micros)).cast("long")
    counts = (events.select(F.col(group_col).alias("grp"),
                            b.alias("bucket"))
              .groupBy("grp", "bucket")
              .agg(F.count("*").alias("n")))        # summary frame
    span = counts.agg(F.min("bucket").alias("lo"),
                      F.max("bucket").alias("hi"))
    grid = (counts.select("grp").distinct()
            .crossJoin(F.broadcast(span))           # |groups| × 1
            .select("grp", F.explode(F.sequence("lo", "hi"))
                    .alias("bucket")))
    dense = (grid.join(counts, ["grp", "bucket"], "left")
             .select("grp", "bucket",
                     F.coalesce("n", F.lit(0)).cast("long").alias("n")))
    w = (Window.partitionBy("grp").orderBy("bucket")
         .rowsBetween(-trailing, -1))
    s = (dense
         .withColumn("__c", F.count("n").over(w))
         .withColumn("__s1", F.sum("n").over(w))
         .withColumn("__s2", F.sum(F.col("n") * F.col("n")).over(w)))
    full = F.col("__c") == trailing
    mean = F.col("__s1").cast("double") / F.col("__c")
    var = ((F.col("__s2").cast("double")
            - F.col("__s1").cast("double") * F.col("__s1") / F.col("__c"))
           / (F.col("__c") - 1))
    sd = F.when(full & (var > 0.0), F.sqrt(var))
    z = (F.col("n") - mean) / sd
    return s.select(
        "grp", "bucket", "n",
        F.round(F.when(full, mean), 6).alias("mean"),
        F.round(sd, 6).alias("sd"),
        F.round(z, 6).alias("z"),
        F.coalesce((F.abs(z) >= F.lit(float(z_threshold))).cast("int"),
                   F.lit(0)).alias("is_anomaly"))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------


def _sql_anomaly() -> str:
    return f"""
    WITH ev AS (SELECT event_type AS grp,
                       CAST(floor(epoch_us(ts) / {_BUCKET_US})
                            AS BIGINT) AS bucket
                FROM events),
    counts AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS n
               FROM ev GROUP BY grp, bucket),
    span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM counts),
    grid AS (SELECT g.grp, s.b AS bucket
             FROM (SELECT DISTINCT grp FROM counts) g
             CROSS JOIN (SELECT unnest(generate_series(
                 (SELECT lo FROM span), (SELECT hi FROM span))) AS b) s),
    dense AS (SELECT g.grp, g.bucket,
                     CAST(coalesce(c.n, 0) AS BIGINT) AS n
              FROM grid g LEFT JOIN counts c
                ON c.grp = g.grp AND c.bucket = g.bucket),
    rolled AS (SELECT grp, bucket, n,
                      count(n) OVER w AS c,
                      sum(n) OVER w AS s1,
                      sum(n * n) OVER w AS s2
               FROM dense
               WINDOW w AS (PARTITION BY grp ORDER BY bucket
                            ROWS BETWEEN {_TRAILING} PRECEDING
                                     AND 1 PRECEDING)),
    scored AS (SELECT grp, bucket, n,
                      CASE WHEN c = {_TRAILING}
                           THEN CAST(s1 AS DOUBLE) / c END AS mean,
                      CASE WHEN c = {_TRAILING} AND
                                (CAST(s2 AS DOUBLE)
                                 - CAST(s1 AS DOUBLE) * s1 / c)
                                / (c - 1) > 0.0
                           THEN sqrt((CAST(s2 AS DOUBLE)
                                      - CAST(s1 AS DOUBLE) * s1 / c)
                                     / (c - 1)) END AS sd
               FROM rolled)
    SELECT grp, bucket, n, round(mean, 6) AS mean, round(sd, 6) AS sd,
           round((n - mean) / sd, 6) AS z,
           CAST(coalesce(abs((n - mean) / sd) >= {_Z_THRESH}, FALSE)
                AS INT) AS is_anomaly
    FROM scored
    """


@query("event_rate_anomaly_report", oracle=_sql_anomaly())
def event_rate_anomaly_report(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Gate row for the anomaly monitor: hourly per-event-type
    densified bucket counts scored against the trailing 24 full
    buckets — warm-up NULLs, constant-window NULLs, zero-densify, and
    every 6-dp mean/sd/z value-pinned against DuckDB running the
    identical exact-integer-sums algebra. Registered PAST the
    driver's 50-slot window (``__spark_entry__._PAST_WINDOW``)."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("ts", "event_type")
    return event_rate_zscores(ev)

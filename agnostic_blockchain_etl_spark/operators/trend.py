"""Per-group rate-trend fitting — closed-form OLS over densified
time-bucket counts, the "is this source growing or dying?" read next
to `anomaly.py`'s spike/silence monitor (same densify-to-the-summary
discipline) and `zipf.py`'s closed-form fits. SQL engines ship this
as ``regr_slope`` / ``regr_intercept`` / ``regr_r2``, but those
aggregate FLOATS in partition order — not value-pinnable across
engines; this module computes the same statistics from EXACT integer
sums, so both engines divide the same integers and the 6-dp results
pin.

Algebra (x = bucket index re-based to the span start, y = bucket
count — both exact longs):

    slope     = (c·Sxy − Sx·Sy) / (c·Sxx − Sx²)
    intercept = (Sy·Sxx − Sx·Sxy) / (c·Sxx − Sx²)
    r²        = (c·Sxy − Sx·Sy)² / ((c·Sxx − Sx²)·(c·Syy − Sy²))

Every sum is exact (Syy accumulates 128-bit: Spark sums a
DECIMAL(38,0) cast, DuckDB sums BIGINT into HUGEINT — the per-term
``y·y`` long bound, y < 3·10⁹ per bucket, is documented); the
composite numerators/denominators are then formed IN DOUBLE with the
IDENTICAL expression shape on both engines (exact-int → double
conversion is correctly rounded, and the same IEEE ops on the same
doubles give the same doubles). A constant series (zero x-variance
or zero y-variance) yields NULL slope/r² rather than ±inf. Zero-y
buckets are densified in (a dead source TRENDS DOWN — skipping empty
buckets would hide exactly the decay this exists to catch).

Scale: aggregates to the (group × bucket) summary first — the
densify join and the five sums run on that summary, never events;
output is one row per group.

Reference: operational-metrics counterpart (items/s per stage);
LLM-data-pipeline mandate, sibling of anomaly.py / observe.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import events_us, load_tables

QUERIES, ORACLES, query = make_registry()

_BUCKET_US = 86_400_000_000     # daily buckets
_ROUND = 6


def rate_trend(events: DataFrame, *,
               ts_col: str = "ts",
               group_col: str = "event_type",
               bucket_micros: int = _BUCKET_US) -> DataFrame:
    """``(grp, n_buckets, y_total, slope, intercept, r2)`` — per
    group, OLS of densified bucket counts against the bucket index
    (re-based to the GLOBAL span start, shared by all groups so
    intercepts compare). ``ts_col`` must be epoch-µs BIGINT."""
    if bucket_micros <= 0:
        raise ValueError(f"bucket_micros must be positive, "
                         f"got {bucket_micros}")
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
                    .alias("bucket"), "lo"))
    dense = (grid.join(counts, ["grp", "bucket"], "left")
             .select("grp",
                     (F.col("bucket") - F.col("lo")).alias("x"),
                     F.coalesce("n", F.lit(0)).cast("long").alias("y")))
    sums = dense.groupBy("grp").agg(
        F.count("*").cast("long").alias("c"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        # y·y is long per-term (exact for y < 3e9 per bucket); the SUM
        # accumulates 128-bit so a long tail of hot buckets can't wrap
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)"))
        .alias("__syy"))
    c = F.col("c").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    syy = F.col("__syy").cast("double")
    num = c * sxy - sx * sy
    denx = c * sxx - sx * sx
    deny = c * syy - sy * sy
    slope = F.when(denx > 0, num / denx)
    intercept = F.when(denx > 0, (sy * sxx - sx * sxy) / denx)
    r2 = F.when((denx > 0) & (deny > 0),
                (num * num) / (denx * deny))
    return sums.select(
        "grp", F.col("c").alias("n_buckets"),
        F.col("sy").alias("y_total"),
        F.round(slope, _ROUND).alias("slope"),
        F.round(intercept, _ROUND).alias("intercept"),
        F.round(r2, _ROUND).alias("r2"))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------


def _sql_trend() -> str:
    return f"""
    WITH ev AS (SELECT event_type AS grp,
                       CAST(floor(epoch_us(ts) / {_BUCKET_US})
                            AS BIGINT) AS bucket
                FROM events),
    counts AS (SELECT grp, bucket, CAST(count(*) AS BIGINT) AS n
               FROM ev GROUP BY grp, bucket),
    span AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM counts),
    grid AS (SELECT g.grp, s.b AS bucket, sp.lo
             FROM (SELECT DISTINCT grp FROM counts) g
             CROSS JOIN (SELECT unnest(generate_series(
                 (SELECT lo FROM span), (SELECT hi FROM span))) AS b) s
             CROSS JOIN span sp),
    dense AS (SELECT g.grp, g.bucket - g.lo AS x,
                     CAST(coalesce(c.n, 0) AS BIGINT) AS y
              FROM grid g LEFT JOIN counts c
                ON c.grp = g.grp AND c.bucket = g.bucket),
    sums AS (SELECT grp,
                    CAST(count(*) AS BIGINT) AS c,
                    CAST(sum(x) AS BIGINT) AS sx,
                    CAST(sum(y) AS BIGINT) AS sy,
                    CAST(sum(x * x) AS BIGINT) AS sxx,
                    CAST(sum(x * y) AS BIGINT) AS sxy,
                    sum(y * y) AS syy
             FROM dense GROUP BY grp),
    fin AS (SELECT grp, c, sy,
                   CAST(c AS DOUBLE) * CAST(sxy AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
                   CAST(c AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS denx,
                   CAST(c AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS deny,
                   CAST(sy AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE) AS inum
            FROM sums)
    SELECT grp, c AS n_buckets, sy AS y_total,
           round(CASE WHEN denx > 0 THEN num / denx END, {_ROUND})
               AS slope,
           round(CASE WHEN denx > 0 THEN inum / denx END, {_ROUND})
               AS intercept,
           round(CASE WHEN denx > 0 AND deny > 0
                      THEN (num * num) / (denx * deny) END, {_ROUND})
               AS r2
    FROM fin
    """


@query("event_trend_report", oracle=_sql_trend())
def event_trend_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the trend fitter: per-event-type daily densified
    counts fitted by exact-integer-sum OLS — slope, intercept, and r²
    all value-pinned against DuckDB running the identical algebra
    (regr_* would not pin; this does). Registered PAST the driver's
    50-slot window."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("ts", "event_type")
    return rate_trend(ev)

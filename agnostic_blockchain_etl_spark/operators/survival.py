"""Kaplan–Meier survival curves — time-to-event with right-censoring
(Kaplan & Meier 1958), the fourth read of the product-analytics
family: `funnel` (did they convert), `funnel_latency` (how fast,
among converters), `cohort_retention` (do they come back), and this
(how long until conversion, counting the users who HAVEN'T yet —
mean/median over converters alone is survivorship-biased; KM is the
standard unbiased estimator under censoring).

Definitions: each subject starts at their first ``start_events`` row
(t₀) and either converts at their first ``terminal_events`` row
after t₀ (duration = event time − t₀, an event) or is censored at
the observation end (the global max timestamp — still at risk, never
seen converting). Durations bucket to days. At each event time t:
``n_risk(t)`` = subjects with duration ≥ t, ``d(t)`` = conversions
at t, and ``S(t) = Π_{u ≤ t} (1 − d(u)/n_risk(u))``.

Determinism: risk sets and event counts are exact longs (total minus
an ordered cumulative sum over the ≤-span-days duration summary).
The survival product is accumulated in LOG SPACE WITH INTEGER
SCALING: each factor contributes ``round(ln(1 − d/n) · 10⁹)`` as a
long (one libm ln on the identical double both engines computed from
exact integers), the cumulative sum over the ordered event times is
exact long addition — no float accumulation order exists — and
``S = exp(cum / 10⁹)`` is one exp, 6-dp rounded. A time where every
remaining subject converts (d = n_risk) zeroes the curve from there
on via an explicit flag, not a ln(0).

Scale (100 TB): two hit-filtered per-subject aggregations (the
funnel-level shape), one global 1-row max, then everything runs on
the duration summary (≤ observation-span-days rows) — the windows
order THAT summary, never subjects.

Reference: no counterpart; LLM-data-pipeline mandate sibling of
funnel.py (e.g. time-until-first-contribution curves over crawl
snapshots, annotation-latency curves with open items censored).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import events_us, load_tables

QUERIES, ORACLES, query = make_registry()

_DAY_US = 86_400_000_000
_LOG_SCALE = 1_000_000_000       # ln terms as 1e-9-scaled longs


def km_survival(start_events: DataFrame, terminal_events: DataFrame,
                *, ts_col: str = "ts", subject_col: str = "user_id",
                bucket_micros: int = _DAY_US) -> DataFrame:
    """``(t, n_risk, n_events, survival)`` — one row per duration
    bucket with ≥ 1 event, the KM estimate after that bucket's
    events. Subjects in ``terminal_events`` only (no start) are
    ignored; a terminal row at-or-before t₀ does not count (strict
    ordering, the funnel convention)."""
    if bucket_micros <= 0:
        raise ValueError(f"bucket_micros must be positive, "
                         f"got {bucket_micros}")
    s = (start_events.select(F.col(subject_col).alias("subject"),
                             F.col(ts_col).alias("ts"))
         .groupBy("subject").agg(F.min("ts").alias("t0")))
    t = (terminal_events.select(F.col(subject_col).alias("subject"),
                                F.col(ts_col).alias("ts"))
         .join(s, "subject")
         .filter(F.col("ts") > F.col("t0"))
         .groupBy("subject").agg(F.min("ts").alias("t1")))
    end = (start_events.select(F.col(ts_col).alias("ts"))
           .unionByName(terminal_events.select(F.col(ts_col)
                                               .alias("ts")))
           .agg(F.max("ts").alias("__end")))
    per = (s.join(t, "subject", "left")
           .crossJoin(F.broadcast(end))
           .select(
               F.call_function(
                   "div",
                   F.coalesce(F.col("t1"), F.col("__end"))
                   - F.col("t0"),
                   F.lit(bucket_micros)).alias("dur"),
               F.col("t1").isNotNull().cast("long").alias("ev")))
    counts = per.groupBy("dur").agg(
        F.sum("ev").cast("long").alias("d"),
        F.count("*").cast("long").alias("c_all"))
    total = per.agg(F.count("*").cast("long").alias("__total"))
    w_before = (Window.orderBy("dur")
                .rowsBetween(Window.unboundedPreceding, -1))
    risked = (counts.crossJoin(F.broadcast(total))
              .withColumn("n_risk",
                          F.col("__total")
                          - F.coalesce(F.sum("c_all").over(w_before),
                                       F.lit(0))))
    ev = risked.filter(F.col("d") > 0)
    frac = F.col("d").cast("double") / F.col("n_risk").cast("double")
    step = F.when(F.col("d") < F.col("n_risk"),
                  F.round(F.log(F.lit(1.0) - frac)
                          * F.lit(float(_LOG_SCALE)), 0)
                  .cast("long")).otherwise(F.lit(0))
    dead = (F.col("d") == F.col("n_risk")).cast("int")
    w_cum = (Window.orderBy("dur")
             .rowsBetween(Window.unboundedPreceding, 0))
    scored = (ev.withColumn("__cum", F.sum(step).over(w_cum))
              .withColumn("__dead", F.max(dead).over(w_cum)))
    survival = F.when(F.col("__dead") == 1, F.lit(0.0)) \
                .otherwise(F.exp(F.col("__cum").cast("double")
                                 / F.lit(float(_LOG_SCALE))))
    return scored.select(
        F.col("dur").alias("t"), "n_risk",
        F.col("d").alias("n_events"),
        F.round(survival, 6).alias("survival"))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------

_START_TYPE = "signup"
_TERM_TYPE = "purchase"


def _sql_km() -> str:
    return f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS ts, event_type
                FROM events),
    s AS (SELECT user_id, min(ts) AS t0 FROM ev
          WHERE event_type = '{_START_TYPE}' GROUP BY user_id),
    t AS (SELECT e.user_id, min(e.ts) AS t1
          FROM ev e JOIN s ON e.user_id = s.user_id
          WHERE e.event_type = '{_TERM_TYPE}' AND e.ts > s.t0
          GROUP BY e.user_id),
    fin AS (SELECT max(ts) AS fin FROM ev
            WHERE event_type IN ('{_START_TYPE}', '{_TERM_TYPE}')),
    per AS (SELECT (coalesce(t.t1, (SELECT fin FROM fin)) - s.t0)
                       // {_DAY_US} AS dur,
                   CAST(t.t1 IS NOT NULL AS BIGINT) AS ev
            FROM s LEFT JOIN t ON s.user_id = t.user_id),
    counts AS (SELECT dur, CAST(sum(ev) AS BIGINT) AS d,
                      CAST(count(*) AS BIGINT) AS c_all
               FROM per GROUP BY dur),
    risked AS (SELECT dur, d, c_all,
                      (SELECT count(*) FROM per)
                      - coalesce(sum(c_all) OVER (
                            ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS n_risk
               FROM counts),
    evd AS (SELECT dur, d, CAST(n_risk AS BIGINT) AS n_risk,
                   CASE WHEN d < n_risk THEN
                        CAST(round(ln(1.0 - CAST(d AS DOUBLE)
                                            / CAST(n_risk AS DOUBLE))
                                   * {float(_LOG_SCALE)!r}, 0)
                             AS BIGINT)
                   ELSE 0 END AS step,
                   CAST(d = n_risk AS INT) AS dead
            FROM risked WHERE d > 0),
    scored AS (SELECT dur, n_risk, d,
                      sum(step) OVER w AS cum,
                      max(dead) OVER w AS any_dead
               FROM evd
               WINDOW w AS (ORDER BY dur
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW))
    SELECT dur AS t, n_risk, d AS n_events,
           round(CASE WHEN any_dead = 1 THEN 0.0
                      ELSE exp(CAST(cum AS DOUBLE)
                               / {float(_LOG_SCALE)!r}) END,
                 6) AS survival
    FROM scored
    """


@query("km_survival_curve", oracle=_sql_km())
def km_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the Kaplan–Meier estimator: time from first
    signup to first subsequent purchase in days, non-converters
    censored at the observation end — risk sets, event counts, and
    the 6-dp survival curve (integer-scaled log-space accumulation)
    all value-pinned against DuckDB running the identical algebra.
    Registered PAST the driver's 50-slot window."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "ts", "event_type")
    return km_survival(
        ev.filter(F.col("event_type") == _START_TYPE),
        ev.filter(F.col("event_type") == _TERM_TYPE))

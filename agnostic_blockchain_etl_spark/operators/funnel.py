"""User-journey analytics over event streams — the windowed funnel
and the cohort retention matrix, the two product-analytics reads a
continuously-ingested event pipeline serves next to `anomaly.py`'s
rate monitor and `misc.sessionization`'s session cuts. ClickHouse
ships these as ``windowFunnel`` / ``retention`` aggregate functions
(the reference's engine dialect); this module re-expresses the same
questions as declarative multi-pass aggregation so BOTH engines run
the identical, fully-specified algebra.

Funnel semantics (documented, deterministic — a simplification of
ClickHouse's ``windowFunnel``, which greedily searches ALL chain
starts): the chain is anchored at each user's EARLIEST step-1 event.
``t1 = min ts of step1``; ``t_{k+1} = min ts of step_{k+1} with
ts > t_k and ts <= t1 + window``. Strictly ordered (equal timestamps
do not advance the chain), window measured from the chain's first
step — every tie is broken by "earliest", so the result is a pure
function of the event set.

Determinism: timestamps are exact epoch-µs longs, every level count
is an exact long, and the two conversion ratios use the repo's
half-up integer division (`tables.avg_units`' trick) — no engine
rounds a float.

Scale: each funnel level is one hit-filtered user-keyed aggregation
(events filtered to ONE step type before the shuffle), joined to the
previous level's per-user frame on user_id — summary-sized state per
level, never a per-user event array (a power user with millions of
events costs nothing beyond their filtered rows). The retention
matrix aggregates to (user, week) distinct rows before any join and
its output is |cohorts| × |offsets|.

Reference: ClickHouse windowFunnel/retention counterparts (behavior
target, not code); LLM-data-pipeline mandate sibling of anomaly.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import events_us, load_tables

QUERIES, ORACLES, query = make_registry()

_STEPS = ("view", "click", "purchase")
_WINDOW_US = 72 * 3_600_000_000          # 72 h funnel window
_DAY_US = 86_400_000_000
_RSCALE = 1_000_000                      # 6-dp half-up ratios


def _ratio6(n: Column, d: Column) -> Column:
    """6-dp half-up ratio from two exact longs — ``(2·n·10⁶ + d) div
    (2·d) / 10⁶``, the `tables.avg_units` integer trick, so a tie at
    the 7th digit rounds the same way on every engine. NULL when the
    denominator is 0 (an empty funnel stage divides nothing)."""
    return F.when(d > 0,
                  F.call_function("div",
                                  2 * n * _RSCALE + d, 2 * d)
                  / float(_RSCALE))


def _sql_ratio6(n: str, d: str) -> str:
    return (f"CASE WHEN {d} > 0 THEN "
            f"((2 * {n} * {_RSCALE} + {d}) // (2 * {d})) "
            f"/ {_RSCALE}.0 END")


def funnel_user_levels(events: DataFrame,
                       steps: tuple[str, ...] = _STEPS, *,
                       window_micros: int = _WINDOW_US,
                       ts_col: str = "ts",
                       user_col: str = "user_id",
                       type_col: str = "event_type") -> DataFrame:
    """Per-user funnel times: ``(user_id, t1..tK, level)`` with the
    earliest-anchor semantics above. ``ts_col`` must be epoch-µs
    BIGINT (`tables.events_us`). Users with no step-1 event are
    absent (level 0 — report-side denominators count them from the
    raw frame)."""
    if len(steps) < 2:
        raise ValueError(f"a funnel needs >= 2 steps, got {steps!r}")
    if window_micros <= 0:
        raise ValueError(f"window_micros must be positive, "
                         f"got {window_micros}")
    ev = events.select(F.col(user_col).alias("user_id"),
                       F.col(ts_col).alias("ts"),
                       F.col(type_col).alias("etype"))
    cur = (ev.filter(F.col("etype") == steps[0])
           .groupBy("user_id").agg(F.min("ts").alias("t1")))
    for k, step in enumerate(steps[1:], start=2):
        hits = (ev.filter(F.col("etype") == step)
                .join(cur.select("user_id", f"t{k - 1}", "t1")
                      if k > 2 else cur, "user_id")
                .filter((F.col("ts") > F.col(f"t{k - 1}"))
                        & (F.col("ts") <= F.col("t1")
                           + F.lit(window_micros)))
                .groupBy("user_id").agg(F.min("ts").alias(f"t{k}")))
        cur = cur.join(hits, "user_id", "left")
    level = F.lit(1)
    for k in range(2, len(steps) + 1):
        level = F.when(F.col(f"t{k}").isNotNull(), k).otherwise(level)
    return cur.withColumn("level", level.cast("int"))


def funnel_report(events: DataFrame,
                  steps: tuple[str, ...] = _STEPS, *,
                  window_micros: int = _WINDOW_US,
                  ts_col: str = "ts",
                  user_col: str = "user_id",
                  type_col: str = "event_type") -> DataFrame:
    """One row per funnel level: ``(level, step, n_users, conv_prev,
    conv_start)`` — users reaching the level, conversion from the
    previous level (level 1 converts from the all-users base) and
    from the base. Exact counts; 6-dp half-up ratios."""
    lv = funnel_user_levels(events, steps,
                            window_micros=window_micros,
                            ts_col=ts_col, user_col=user_col,
                            type_col=type_col)
    counts = lv.agg(*[
        F.count(f"t{k}").cast("long").alias(f"n{k}")
        for k in range(1, len(steps) + 1)])
    base = events.agg(
        F.countDistinct(F.col(user_col)).cast("long").alias("n0"))
    one = counts.crossJoin(F.broadcast(base))   # 1 row × 1 row
    cells = []
    for k, step in enumerate(steps, start=1):
        cells += [str(k), f"'{step}'", f"n{k}",
                  f"n{k - 1}" if k > 1 else "n0"]
    stacked = one.selectExpr(
        f"stack({len(steps)}, {', '.join(cells)}) "
        "as (level, step, n_users, prev)", "n0")
    return stacked.select(
        F.col("level").cast("int").alias("level"), "step",
        "n_users",
        _ratio6(F.col("n_users"), F.col("prev")).alias("conv_prev"),
        _ratio6(F.col("n_users"), F.col("n0")).alias("conv_start"))


def _active_frame(activity: DataFrame,
                  cohort_events: DataFrame | None = None, *,
                  ts_col: str = "ts", user_col: str = "user_id",
                  week_days: int = 7) -> DataFrame:
    """Shared retention derivation: distinct ``(user_id, cohort_week,
    week_offset >= 0)`` activity cells (see `cohort_retention` for the
    semantics) — consumed by both the exact matrix and the mergeable
    HLL cell store."""
    if week_days <= 0:
        raise ValueError(f"week_days must be positive, got {week_days}")
    span = week_days * _DAY_US

    def weeks(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(user_col).alias("user_id"),
            F.call_function("div", F.col(ts_col), F.lit(span))
            .alias("week"))

    first = (weeks(cohort_events if cohort_events is not None
                   else activity)
             .groupBy("user_id").agg(F.min("week").alias("cohort_week")))
    return (weeks(activity).distinct()
            .join(first, "user_id")
            .select("user_id", "cohort_week",
                    (F.col("week") - F.col("cohort_week"))
                    .alias("week_offset"))
            .filter(F.col("week_offset") >= 0))


def _cohort_sizes(activity: DataFrame,
                  cohort_events: DataFrame | None = None, *,
                  ts_col: str = "ts", user_col: str = "user_id",
                  week_days: int = 7) -> DataFrame:
    span = week_days * _DAY_US
    src = cohort_events if cohort_events is not None else activity
    return (src.select(
        F.col(user_col).alias("user_id"),
        F.call_function("div", F.col(ts_col), F.lit(span))
        .alias("week"))
        .groupBy("user_id").agg(F.min("week").alias("cohort_week"))
        .groupBy("cohort_week")
        .agg(F.count("*").cast("long").alias("n_cohort")))


def cohort_retention(activity: DataFrame,
                     cohort_events: DataFrame | None = None, *,
                     ts_col: str = "ts",
                     user_col: str = "user_id",
                     week_days: int = 7) -> DataFrame:
    """Cohort retention matrix: ``(cohort_week, week_offset,
    n_active, n_cohort, retention)`` — users are cohorted by the week
    of their first ``cohort_events`` row (default: first ``activity``
    row); each (cohort, offset ≥ 0) cell counts distinct users with
    an ``activity`` row offset weeks after their cohort week. Weeks
    are epoch-µs div (days·86 400·10⁶) — calendar-free integer
    arithmetic identical on both engines. Users with activity but no
    cohort row have no cohort and are absent (the standard retention
    read); pre-cohort activity (negative offsets) is excluded."""
    kw = dict(ts_col=ts_col, user_col=user_col, week_days=week_days)
    active = _active_frame(activity, cohort_events, **kw)
    cells = (active.groupBy("cohort_week", "week_offset")
             .agg(F.countDistinct("user_id").cast("long")
                  .alias("n_active")))
    sizes = _cohort_sizes(activity, cohort_events, **kw)
    return (cells.join(sizes, "cohort_week")
            .select("cohort_week", "week_offset", "n_active",
                    "n_cohort",
                    _ratio6(F.col("n_active"), F.col("n_cohort"))
                    .alias("retention")))


def retention_hll_cells(activity: DataFrame,
                        cohort_events: DataFrame | None = None, *,
                        ts_col: str = "ts",
                        user_col: str = "user_id",
                        week_days: int = 7, p: int = 9,
                        salt: str = "rhll:") -> DataFrame:
    """MERGEABLE retention cells: ``(cohort_week, week_offset,
    bucket, rho)`` — per-cell HyperLogLog registers over the active
    users instead of an exact distinct count. Why: exact
    ``countDistinct`` per cell is NOT incrementally maintainable — a
    day-N store would have to re-scan all history — while register
    frames from any row-split of the activity merge by per-register
    max (`hll.hll_group_merge`) into exactly the one-shot build, so
    a store can fold each ingest day in and read estimates any time
    (`hll.hll_group_estimate_regs`). The cohort side stays the full
    frame (cohort assignment is a property of a user's first event —
    the store keeps that map, as any incremental system must)."""
    from .hll import hll_group_build
    active = _active_frame(activity, cohort_events, ts_col=ts_col,
                           user_col=user_col, week_days=week_days)
    return hll_group_build(active, ["cohort_week", "week_offset"],
                           "user_id", p=p, salt=salt)


def event_transitions(events: DataFrame, *,
                      ts_col: str = "ts",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      id_col: str = "event_id") -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: ``(from_type, to_type, n, p)`` — counts of consecutive
    event-type pairs and the row-normalized transition probability
    (6-dp half-up). Ordering is ``(ts, id_col)`` so timestamp ties
    break deterministically on the unique event id; each user's last
    event has no successor and emits nothing.

    Scale: the lead() window partitions on the user — bounded by one
    user's event count (the stream's natural key; a pathological
    single-user firehose is a key-design problem, as `scd2.py`
    states for entity history). The matrix itself is
    |types|² rows."""
    w = (Window.partitionBy("__u").orderBy("__t", "__i"))
    # successor existence rides a companion lead(1): filtering on
    # to_type IS NOT NULL would conflate "last event" with "next
    # event's type is NULL" and drop the latter (self-review fix)
    pairs = (events.select(F.col(user_col).alias("__u"),
                           F.col(ts_col).alias("__t"),
                           F.col(id_col).alias("__i"),
                           F.col(type_col).alias("from_type"))
             .withColumn("to_type", F.lead("from_type").over(w))
             .withColumn("__has", F.lead(F.lit(1)).over(w))
             .filter(F.col("__has").isNotNull())
             .groupBy("from_type", "to_type")
             .agg(F.count("*").cast("long").alias("n")))
    totals = (pairs.groupBy(F.col("from_type").alias("__f"))
              .agg(F.sum("n").cast("long").alias("__tot")))
    # eqNullSafe: a NULL event type is a real state (the kmv/cms grp
    # convention) — a plain equi-join would silently drop its row
    return (pairs.join(totals,
                       pairs["from_type"].eqNullSafe(totals["__f"]))
            .select("from_type", "to_type", "n",
                    _ratio6(F.col("n"), F.col("__tot")).alias("p")))


# ---------------------------------------------------------------------------
# Gate queries + DuckDB oracles
# ---------------------------------------------------------------------------


def _sql_funnel() -> str:
    s1, s2, s3 = _STEPS
    return f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS ts, event_type
                FROM events),
    t1 AS (SELECT user_id, min(ts) AS t1 FROM ev
           WHERE event_type = '{s1}' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(t1.t1) AS t1, min(e.ts) AS t2
           FROM ev e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = '{s2}' AND e.ts > t1.t1
             AND e.ts <= t1.t1 + {_WINDOW_US}
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(e.ts) AS t3
           FROM ev e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = '{s3}' AND e.ts > t2.t2
             AND e.ts <= t2.t1 + {_WINDOW_US}
           GROUP BY e.user_id),
    ns AS (SELECT (SELECT count(DISTINCT user_id) FROM ev) AS n0,
                  (SELECT count(*) FROM t1) AS n1,
                  (SELECT count(*) FROM t2) AS n2,
                  (SELECT count(*) FROM t3) AS n3),
    lv AS (SELECT 1 AS level, '{s1}' AS step, n1 AS n, n0 AS prev, n0
           FROM ns
           UNION ALL
           SELECT 2, '{s2}', n2, n1, n0 FROM ns
           UNION ALL
           SELECT 3, '{s3}', n3, n2, n0 FROM ns)
    SELECT CAST(level AS INT) AS level, step,
           CAST(n AS BIGINT) AS n_users,
           {_sql_ratio6('n', 'prev')} AS conv_prev,
           {_sql_ratio6('n', 'n0')} AS conv_start
    FROM lv
    """


@query("funnel_conversion_report", oracle=_sql_funnel())
def funnel_conversion_report(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """Gate row for the windowed funnel: the view → click → purchase
    chain within 72 h, earliest-anchor semantics, level counts and
    both conversion ratios value-pinned against DuckDB running the
    identical min-chain CTEs. Registered PAST the driver's 50-slot
    window (``__spark_entry__._PAST_WINDOW``)."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "ts", "event_type")
    return funnel_report(ev)


_COHORT_TYPE = "signup"
_ACTIVE_TYPE = "purchase"


def _sql_retention() -> str:
    span = 1 * _DAY_US
    return f"""
    WITH act AS (SELECT user_id, epoch_us(ts) // {span} AS week
                 FROM events WHERE event_type = '{_ACTIVE_TYPE}'),
    coh AS (SELECT user_id, epoch_us(ts) // {span} AS week
            FROM events WHERE event_type = '{_COHORT_TYPE}'),
    first AS (SELECT user_id, min(week) AS cohort_week
              FROM coh GROUP BY user_id),
    active AS (SELECT a.user_id, f.cohort_week,
                      a.week - f.cohort_week AS week_offset
               FROM (SELECT DISTINCT user_id, week FROM act) a
               JOIN first f ON a.user_id = f.user_id
               WHERE a.week - f.cohort_week >= 0),
    cells AS (SELECT cohort_week, week_offset,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_active
              FROM active GROUP BY cohort_week, week_offset),
    sizes AS (SELECT cohort_week, CAST(count(*) AS BIGINT) AS n_cohort
              FROM first GROUP BY cohort_week)
    SELECT c.cohort_week, c.week_offset, c.n_active, s.n_cohort,
           {_sql_ratio6('c.n_active', 's.n_cohort')} AS retention
    FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week
    """


@query("cohort_retention_matrix", oracle=_sql_retention())
def cohort_retention_matrix(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Gate row for cohort retention: users cohorted by first-signup
    DAY, retained = made a purchase N days later — day granularity
    keeps the matrix sparse enough to discriminate (7-day weeks on
    this testdata retain 100% everywhere, which pins nothing).
    Distinct-active counts and 6-dp half-up ratios, every cell
    value-pinned. Registered PAST the driver's 50-slot window."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "ts", "event_type")
    return cohort_retention(
        ev.filter(F.col("event_type") == _ACTIVE_TYPE),
        ev.filter(F.col("event_type") == _COHORT_TYPE),
        week_days=1)


def _sql_transitions() -> str:
    return f"""
    WITH seq AS (SELECT event_type AS from_type,
                        lead(event_type) OVER w AS to_type,
                        lead(1) OVER w AS has_next
                 FROM events
                 WINDOW w AS (PARTITION BY user_id
                              ORDER BY epoch_us(ts), event_id)),
    pairs AS (SELECT from_type, to_type,
                     CAST(count(*) AS BIGINT) AS n
              FROM seq WHERE has_next IS NOT NULL
              GROUP BY from_type, to_type),
    totals AS (SELECT from_type, CAST(sum(n) AS BIGINT) AS tot
               FROM pairs GROUP BY from_type)
    SELECT p.from_type, p.to_type, p.n,
           {_sql_ratio6('p.n', 't.tot')} AS p
    FROM pairs p JOIN totals t
      ON p.from_type IS NOT DISTINCT FROM t.from_type
    """


@query("event_transition_matrix", oracle=_sql_transitions())
def event_transition_matrix(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """Gate row for the Markov transition matrix: consecutive
    event-type pairs per user (ts then event_id ordering — ties
    pinned), counts and 6-dp half-up row probabilities, every cell
    value-pinned. Registered PAST the driver's 50-slot window."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "ts", "event_type", "event_id")
    return event_transitions(ev)


def funnel_latency(events: DataFrame,
                   steps: tuple[str, ...] = _STEPS, *,
                   window_micros: int = _WINDOW_US,
                   ts_col: str = "ts",
                   user_col: str = "user_id",
                   type_col: str = "event_type") -> DataFrame:
    """Time-to-convert per funnel transition: ``(level, step,
    n_users, mean_us, min_us, max_us)`` — over users who reached
    level k, the µs gap ``t_k − t_{k−1}`` (level 1 reports 0 gaps —
    it IS the anchor). Counts and extrema are exact longs; the mean
    is the half-up integer division, so no float a partition order
    can move. One more read of the `funnel_user_levels` frame — the
    level joins are shared, not recomputed per statistic."""
    lv = funnel_user_levels(events, steps,
                            window_micros=window_micros,
                            ts_col=ts_col, user_col=user_col,
                            type_col=type_col)
    # ONE conditional aggregation over the lv frame, stacked to rows —
    # the previous shape ran one filtered aggregate per transition and
    # unioned them, which recomputed the whole funnel-chain DAG
    # len(steps)−1 times (plan-visible: 22 Exchanges / 20 scans for the
    # 3-step gate). dt is NULL exactly where t_k is NULL (the chain
    # guarantees t_{k−1} ≤ t_k when t_k exists), so null-skipping
    # count/sum/min/max over dt equal the filtered aggregates long for
    # long (r11 opt round, guide §2.4 remove-shuffles).
    aggs = []
    for k in range(2, len(steps) + 1):
        dt = F.col(f"t{k}") - F.col(f"t{k - 1}")
        aggs += [F.count(dt).cast("long").alias(f"__n{k}"),
                 F.sum(dt).cast("long").alias(f"__s{k}"),
                 F.min(dt).cast("long").alias(f"__min{k}"),
                 F.max(dt).cast("long").alias(f"__max{k}")]
    one = lv.agg(*aggs)
    cells = []
    for k, step in enumerate(steps[1:], start=2):
        cells += [str(k), f"'{step}'", f"__n{k}", f"__s{k}",
                  f"__min{k}", f"__max{k}"]
    stacked = one.selectExpr(
        f"stack({len(steps) - 1}, {', '.join(cells)}) "
        "as (level, step, n_users, __sum, min_us, max_us)")
    mean = F.when(F.col("n_users") > 0,
                  F.call_function("div",
                                  2 * F.col("__sum") + F.col("n_users"),
                                  2 * F.col("n_users")))
    return stacked.select(
        F.col("level").cast("int").alias("level"), "step", "n_users",
        mean.cast("long").alias("mean_us"), "min_us", "max_us")


def _sql_latency() -> str:
    s1, s2, s3 = _STEPS
    return f"""
    WITH ev AS (SELECT user_id, epoch_us(ts) AS ts, event_type
                FROM events),
    t1 AS (SELECT user_id, min(ts) AS t1 FROM ev
           WHERE event_type = '{s1}' GROUP BY user_id),
    t2 AS (SELECT e.user_id, min(t1.t1) AS t1, min(e.ts) AS t2
           FROM ev e JOIN t1 ON e.user_id = t1.user_id
           WHERE e.event_type = '{s2}' AND e.ts > t1.t1
             AND e.ts <= t1.t1 + {_WINDOW_US}
           GROUP BY e.user_id),
    t3 AS (SELECT e.user_id, min(t2.t2) AS t2, min(e.ts) AS t3
           FROM ev e JOIN t2 ON e.user_id = t2.user_id
           WHERE e.event_type = '{s3}' AND e.ts > t2.t2
             AND e.ts <= t2.t1 + {_WINDOW_US}
           GROUP BY e.user_id),
    l2 AS (SELECT CAST(2 AS INT) AS level, '{s2}' AS step,
                  CAST(count(*) AS BIGINT) AS n_users,
                  CAST(sum(t2 - t1) AS BIGINT) AS s,
                  CAST(min(t2 - t1) AS BIGINT) AS min_us,
                  CAST(max(t2 - t1) AS BIGINT) AS max_us
           FROM t2),
    l3 AS (SELECT CAST(3 AS INT), '{s3}',
                  CAST(count(*) AS BIGINT),
                  CAST(sum(t3 - t2) AS BIGINT),
                  CAST(min(t3 - t2) AS BIGINT),
                  CAST(max(t3 - t2) AS BIGINT)
           FROM t3),
    lv AS (SELECT * FROM l2 UNION ALL SELECT * FROM l3)
    SELECT level, step, n_users,
           CASE WHEN n_users > 0
                THEN CAST((2 * s + n_users) // (2 * n_users) AS BIGINT)
           END AS mean_us,
           min_us, max_us
    FROM lv
    """


@query("funnel_latency_report", oracle=_sql_latency())
def funnel_latency_report(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Gate row for funnel time-to-convert: per-transition gap counts,
    half-up mean, and exact extrema over the same earliest-anchor
    chain the conversion gate pins — value-pinned against DuckDB
    running the identical min-chain CTEs. Registered PAST the
    driver's 50-slot window."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "ts", "event_type")
    return funnel_latency(ev)


def _sql_retention_hll() -> str:
    from .hashing import sql_keyed_h60
    span = 1 * _DAY_US
    p, bits = 9, 60
    m = 1 << p
    rem_bits = bits - p
    maxrank = rem_bits + 1
    h = sql_keyed_h60("'rhll:'",
                      "coalesce(CAST(user_id AS VARCHAR), chr(0))")
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}))"
    return f"""
    WITH act AS (SELECT user_id, epoch_us(ts) // {span} AS week
                 FROM events WHERE event_type = '{_ACTIVE_TYPE}'),
    coh AS (SELECT user_id, epoch_us(ts) // {span} AS week
            FROM events WHERE event_type = '{_COHORT_TYPE}'),
    first AS (SELECT user_id, min(week) AS cohort_week
              FROM coh GROUP BY user_id),
    active AS (SELECT a.user_id, f.cohort_week,
                      a.week - f.cohort_week AS week_offset
               FROM (SELECT DISTINCT user_id, week FROM act) a
               JOIN first f ON a.user_id = f.user_id
               WHERE a.week - f.cohort_week >= 0),
    hashed AS (SELECT cohort_week, week_offset, {h} AS h
               FROM (SELECT DISTINCT user_id, cohort_week, week_offset
                     FROM active)),
    rows_ AS (SELECT cohort_week, week_offset,
                     h // {1 << rem_bits} AS bucket,
                     h % {1 << rem_bits} AS rem
              FROM hashed),
    regs AS (SELECT cohort_week, week_offset, bucket,
                    max(CASE WHEN rem = 0 THEN {maxrank}
                        ELSE {maxrank} - length(bin(rem)) END) AS rho
             FROM rows_ GROUP BY cohort_week, week_offset, bucket),
    agg AS (SELECT cohort_week, week_offset,
                   CAST(count(*) AS BIGINT) AS present,
                   CAST(sum(1::BIGINT << ({maxrank} - rho))
                        AS BIGINT) AS s_present
            FROM regs GROUP BY cohort_week, week_offset),
    est AS (SELECT cohort_week, week_offset,
                   {m} - present AS zeros,
                   s_present + ({m} - present)
                       * {1 << maxrank} AS s_int
            FROM agg),
    fin AS (SELECT cohort_week, week_offset, zeros, s_int,
                   {alpha} * {float(m)!r} * {float(m)!r}
                       * {float(1 << maxrank)!r}
                       / CAST(s_int AS DOUBLE) AS raw,
                   CAST({float(m)!r} * ln({float(m)!r}
                       / CAST(zeros AS DOUBLE)) AS DOUBLE) AS lin
            FROM est),
    exact AS (SELECT cohort_week, week_offset,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
              FROM active GROUP BY cohort_week, week_offset)
    SELECT f.cohort_week, f.week_offset,
           CAST(f.zeros AS BIGINT) AS zeros,
           CAST(f.s_int AS BIGINT) AS s_int,
           round(CASE WHEN f.raw <= {2.5 * m} AND f.zeros > 0
                      THEN f.lin ELSE f.raw END, 6) AS est,
           x.n_exact
    FROM fin f JOIN exact x
      ON f.cohort_week = x.cohort_week
     AND f.week_offset = x.week_offset
    """


@query("retention_hll_matrix", oracle=_sql_retention_hll())
def retention_hll_matrix(spark: SparkSession,
                         sf_dir: str) -> DataFrame:
    """Gate row for the MERGEABLE retention matrix: per-cell HLL
    registers over active users, the Spark side built as a TWO-HALF
    MERGE (activity split on event_id parity, per-register max) while
    the oracle builds one-shot — merge-equals-one-shot per cell is
    the pinned property, with each cell's register indicator sum,
    zeros, estimate, and the exact distinct count alongside (under-
    full linear-counting regime here, so estimates sit near exact).
    Registered PAST the driver's 50-slot window."""
    from .hll import hll_group_estimate_regs, hll_group_merge
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "ts", "event_type", "event_id")
    purch = ev.filter(F.col("event_type") == _ACTIVE_TYPE)
    signup = ev.filter(F.col("event_type") == _COHORT_TYPE)
    gc = ["cohort_week", "week_offset"]
    halves = [retention_hll_cells(
        purch.filter(F.col("event_id") % 2 == i), signup,
        week_days=1, p=9, salt="rhll:") for i in (0, 1)]
    est = hll_group_estimate_regs(
        hll_group_merge(*halves, group_cols=gc), gc, p=9)
    exact = (_active_frame(purch, signup, week_days=1)
             .groupBy(*gc)
             .agg(F.countDistinct("user_id").cast("long")
                  .alias("n_exact")))
    return est.join(exact, gc)

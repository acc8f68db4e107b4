"""Slowly-changing-dimension (type 2) views over a change log:
validity intervals, point-in-time snapshots, and multi-cursor state
series — the "what was the state at X?" family the reference's sinks
answer with ``ReplacingMergeTree`` + ``FINAL`` (reference:
examples/ethereum_token_erc20_balances/create_table.sql — balances
are a change log whose queries want latest-as-of; this repo's
`sources/replacing.py` re-expresses the FINAL read, this module adds
the TIME-TRAVEL reads next to it). The LLM-data uses are the same
shape: crawl snapshots ("which version of this url was live when the
eval set was frozen?"), label histories, feature-store time travel.

Semantics: a change row ``(key, ts, value…)`` starts an interval at
its own timestamp and ends it at the key's NEXT change (NULL = still
current); ties on ts break on a caller-named tiebreak column (the
reference's insert-order column; `event_id` in the gate), so replayed
or same-instant writes order deterministically — the
ReplacingMergeTree version-column rule.

Scale notes (100 TB): interval construction windows PARTITION BY KEY
— each partition holds one entity's history, the natural bound for a
change log (a pathologically hot key concentrates its own history;
that is inherent to "this key's next change", and the fix at ingest
is key design, not the operator). `state_at` never windows at all:
it is one filter (``ts <= cursor``, pushed to the scan) + one
max-of-struct aggregation — map-side combinable, the
`group_window_first` discipline. `state_series` joins intervals to a
BOUNDED literal cursor list (broadcast nested loop over n_cursors
rows), never cursor × corpus.

Cross-engine: timestamps ride as epoch-micro longs end to end
(`tables.events_us` ↔ DuckDB ``epoch_us``; the r5 ts-parity rule);
money-ish sums use exact cents arithmetic (the `tables.avg_units`
posture), so every facet value-pins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import events_us, load_tables

QUERIES, ORACLES, query = make_registry()


def scd2_intervals(changes: DataFrame, *, key_cols: list[str],
                   ts_col: str = "ts",
                   tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Validity intervals from a change log: every input row + three
    columns — ``valid_from`` (its own ts), ``valid_to`` (the key's
    next change's ts; NULL while current), ``is_current`` (int).
    Same-instant changes order by the tiebreak columns, giving
    zero-width intervals to all but the last — flag-don't-drop: the
    superseded rows remain visible with valid_from == valid_to."""
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    tb = list(tiebreak_cols or [])
    w = Window.partitionBy(*key_cols).orderBy(ts_col, *tb)
    return (changes
            .withColumn("valid_from", F.col(ts_col))
            .withColumn("valid_to", F.lead(ts_col).over(w))
            .withColumn("is_current",
                        F.col("valid_to").isNull().cast("int")))


def state_at(changes: DataFrame, *, key_cols: list[str],
             ts_col: str = "ts", cursor,
             tiebreak_cols: list[str] | None = None) -> DataFrame:
    """Point-in-time snapshot WITHOUT a window: the latest change per
    key with ``ts <= cursor`` (filter pushed to the scan) via one
    max-of-struct aggregation — (ts, tiebreak…) lead the struct so
    lexicographic max IS the ordering rule; every non-key column
    rides in the struct and comes back out. Keys whose first change
    is after the cursor are absent (they did not exist yet)."""
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    tb = list(tiebreak_cols or [])
    rest = [c for c in changes.columns
            if c not in key_cols and c != ts_col and c not in tb]
    packed = F.struct(F.col(ts_col), *[F.col(c) for c in tb],
                      *[F.col(c) for c in rest])
    agg = (changes.where(F.col(ts_col) <= F.lit(cursor))
           .groupBy(*key_cols).agg(F.max(packed).alias("__s")))
    return agg.select(*key_cols, F.col(f"__s.{ts_col}").alias(ts_col),
                      *[F.col(f"__s.{c}").alias(c) for c in tb + rest])


def state_series(intervals: DataFrame, cursors: list, *,
                 cursor_col: str = "cursor") -> DataFrame:
    """The interval rows active at each cursor of a BOUNDED literal
    list: one row per (cursor, active interval) — the multi-snapshot
    read (broadcast nested-loop over len(cursors) rows, never
    cursor × corpus). Zero-width intervals are never active (their
    successor at the same instant is — the tiebreak rule)."""
    if not cursors:
        raise ValueError("cursors must be a non-empty literal list")
    c = F.explode(F.lit(sorted(cursors))).alias(cursor_col)
    cur = intervals.sparkSession.range(1).select(c)
    active = (F.col("valid_from") <= F.col(cursor_col)) & (
        F.col("valid_to").isNull()
        | (F.col(cursor_col) < F.col("valid_to")))
    return intervals.join(F.broadcast(cur), active)


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------

# epoch micros, UTC: 2024-01-02 / 2024-01-08 / 2024-01-20. sf0.001's
# events span ~2.7 days, so the later cursors degenerate to "final
# state" there while sf0.01/sf0.1 exercise genuine mid-history cuts —
# both regimes run under the value oracle across the driver's SFs.
_CURSORS = [1704153600000000, 1704672000000000, 1705708800000000]
_IV_KEYS = 50          # interval facet: full history of user_id < 50

_SQL_CENTS = "CAST(round(value * 100) AS BIGINT)"


def _sql_scd2() -> str:
    """DuckDB twin: the same intervals via the naive window, the
    snapshot via row_number DESC (vs Spark's max-of-struct — the
    two-path proof), the series via an UNNEST cursor join."""
    return f"""
    WITH ch AS (
        SELECT user_id, event_id, epoch_us(ts) AS ts, event_type, value
        FROM events),
    iv AS (
        SELECT user_id, event_id, event_type, value,
               ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id
                              ORDER BY ts, event_id) AS valid_to
        FROM ch),
    snap AS (
        SELECT user_id, ts, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM ch WHERE ts <= {_CURSORS[0]}),
    cur AS (SELECT unnest([{", ".join(map(str, _CURSORS))}]) AS cursor),
    ser AS (
        SELECT c.cursor, CAST(count(*) AS BIGINT) AS n_entities,
               sum({_SQL_CENTS}) / 100.0 AS sum_value
        FROM iv JOIN cur c
          ON iv.valid_from <= c.cursor
         AND (iv.valid_to IS NULL OR c.cursor < iv.valid_to)
        GROUP BY c.cursor)
    SELECT 'interval' AS facet, user_id, event_type, value,
           valid_from, valid_to,
           CAST(valid_to IS NULL AS INT) AS is_current,
           CAST(NULL AS BIGINT) AS cursor,
           CAST(NULL AS BIGINT) AS n_entities,
           CAST(NULL AS DOUBLE) AS sum_value
    FROM iv WHERE user_id < {_IV_KEYS}
    UNION ALL
    SELECT 'state', user_id, event_type, value, ts,
           CAST(NULL AS BIGINT), CAST(NULL AS INT),
           {_CURSORS[0]}, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
    FROM snap WHERE rn = 1
    UNION ALL
    SELECT 'series', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(NULL AS DOUBLE), CAST(NULL AS BIGINT),
           CAST(NULL AS BIGINT), CAST(NULL AS INT),
           cursor, n_entities, sum_value
    FROM ser
    """


@query("scd2_state_snapshot", oracle=_sql_scd2())
def scd2_state_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the SCD2 family, three facets over events as a
    change log (entity = user_id, state = (event_type, value)):
    ``interval`` — the full validity history of user_id < 50 (lead
    window incl. the NULL-open current rows); ``state`` — the
    snapshot at cursor 1 through the window-free max-of-struct path
    vs the oracle's row_number DESC window (two-path proof);
    ``series`` — active-entity counts + exact-cents value sums at
    three cursors through the broadcast cursor join. Registered PAST
    the driver's 50-slot window (``__spark_entry__._PAST_WINDOW``)."""
    ev = events_us(load_tables(spark, sf_dir, ("events",))["events"]) \
        .select("user_id", "event_id", "ts", "event_type", "value")
    iv = scd2_intervals(ev, key_cols=["user_id"],
                        tiebreak_cols=["event_id"])

    nulls = {"cursor": "long", "n_entities": "long",
             "sum_value": "double"}

    def _null(name):
        return F.lit(None).cast(nulls[name]).alias(name)

    interval = (iv.where(F.col("user_id") < _IV_KEYS)
                .select(F.lit("interval").alias("facet"), "user_id",
                        "event_type", "value", "valid_from", "valid_to",
                        "is_current", *[_null(c) for c in nulls]))
    snap = state_at(ev, key_cols=["user_id"], cursor=_CURSORS[0],
                    tiebreak_cols=["event_id"])
    state = snap.select(
        F.lit("state").alias("facet"), "user_id", "event_type", "value",
        F.col("ts").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(None).cast("int").alias("is_current"),
        F.lit(_CURSORS[0]).alias("cursor"), _null("n_entities"),
        _null("sum_value"))
    cents = F.round(F.col("value") * 100).cast("long")
    series = (state_series(iv, _CURSORS)
              .groupBy("cursor")
              .agg(F.count("*").cast("long").alias("n_entities"),
                   (F.sum(cents) / 100.0).alias("sum_value"))
              .select(F.lit("series").alias("facet"),
                      F.lit(None).cast("long").alias("user_id"),
                      F.lit(None).cast("string").alias("event_type"),
                      F.lit(None).cast("double").alias("value"),
                      F.lit(None).cast("long").alias("valid_from"),
                      F.lit(None).cast("long").alias("valid_to"),
                      F.lit(None).cast("int").alias("is_current"),
                      "cursor", "n_entities", "sum_value"))
    return interval.unionByName(state).unionByName(series)

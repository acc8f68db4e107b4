"""Reshaping surface: PIVOT (wide) and UNPIVOT/stack (long) round-tripped
through one plan. The map/regex/null-handling scalar families live in
``relational.documents_scalar_facets`` / ``relational.events_scalar_facets``
(same scan, one gate entry each).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import load_tables

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query("pivot_unpivot_roundtrip", oracle=f"""
    WITH pv AS (
        SELECT user_id,
               {", ".join(f'''CAST(count(*) FILTER (WHERE event_type = '{t}')
                              AS BIGINT) AS n_{t}''' for t in _EVENT_TYPES)}
        FROM events GROUP BY user_id)
    SELECT user_id, metric, n
    FROM pv UNPIVOT (n FOR metric IN ({", ".join(f"n_{t}" for t in _EVENT_TYPES)}))
""")
def pivot_unpivot_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT then UNPIVOT: the per-user event-type count matrix widened
    with `pivot(col, values)` and immediately stacked back to long form.

    Scale: the explicit value list keeps pivot one pass (an unlisted
    pivot needs a distinct-scan first); counts coalesce to 0 before the
    stack because DuckDB's UNPIVOT (and a NULL-dropping stack) would
    silently lose never-seen combinations otherwise."""
    t = load_tables(spark, sf_dir, ("events",))
    pv = (t["events"].groupBy("user_id")
          .pivot("event_type", list(_EVENT_TYPES)).count())
    wide = pv.select(
        "user_id",
        *[F.coalesce(F.col(t_), F.lit(0)).cast("long").alias(f"n_{t_}")
          for t_ in _EVENT_TYPES])
    stack_args = ", ".join(f"'n_{t_}', n_{t_}" for t_ in _EVENT_TYPES)
    return wide.selectExpr(
        "user_id",
        f"stack({len(_EVENT_TYPES)}, {stack_args}) AS (metric, n)")

"""Miscellaneous relational surface: pivot, map columns, regex extraction,
null-handling — rounding out the 'free in Spark' inventory with oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")


@query("pivot_event_counts", oracle=f"""
    SELECT user_id,
           {", ".join(f'''CAST(count(*) FILTER (WHERE event_type = '{t}')
                          AS BIGINT) AS n_{t}''' for t in _EVENT_TYPES)}
    FROM events GROUP BY user_id
""")
def pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event-type count matrix. Implemented with an
    explicit value list (`pivot(col, values)`) — at scale an unlisted
    pivot requires a distinct-scan first; the listed form is one pass."""
    t = load_tables(spark, sf_dir, ("events",))
    pv = (t["events"].groupBy("user_id")
          .pivot("event_type", list(_EVENT_TYPES)).count())
    return pv.select(
        "user_id",
        *[F.coalesce(F.col(t_), F.lit(0)).cast("long").alias(f"n_{t_}")
          for t_ in _EVENT_TYPES])


@query("map_column_ops", oracle="""
    SELECT doc_id,
           CAST(m['len'][1] AS BIGINT)    AS len_v,
           CAST(m['words'][1] AS BIGINT)  AS words_v,
           CAST(cardinality(m) AS INT)    AS n_keys
    FROM (SELECT doc_id,
                 MAP {'len': length(text),
                      'words': len(string_split_regex(trim(text), '\\s+'))} AS m
          FROM documents)
""")
def map_column_ops(spark, sf_dir):
    """MapType column construction + key access + cardinality."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select(
        "doc_id",
        F.create_map(
            F.lit("len"), F.length("text"),
            F.lit("words"), F.size(F.split(F.trim(F.col("text")), r"\s+")),
        ).alias("m"))
    return d.select(
        "doc_id",
        F.element_at("m", "len").cast("long").alias("len_v"),
        F.element_at("m", "words").cast("long").alias("words_v"),
        F.size("m").cast("int").alias("n_keys"))


@query("regexp_extraction", oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+)', 1)                      AS first_word,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT) AS n_vowels,
           regexp_replace(text, '\\s+', '_', 'g')[:40]              AS squashed40
    FROM documents
""")
def regexp_extraction(spark, sf_dir):
    """Regex extract / extract-all / replace family."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id",
        F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[aeiou]"), F.lit(0)))
         .cast("long").alias("n_vowels"),
        F.substring(F.regexp_replace("text", r"\s+", "_"), 1, 40)
         .alias("squashed40"))


@query("null_handling", oracle="""
    SELECT event_id,
           ifnull(nullif(event_type, 'error'), 'none')         AS kind,
           CAST(value IS NULL AS BOOLEAN)                      AS value_missing,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE round(value, 2) END                       AS clean_value,
           round(coalesce(CASE WHEN event_type = 'error' THEN NULL
                               ELSE value END, -1.0), 2)       AS filled
    FROM events
""")
def null_handling(spark, sf_dir):
    """NULL algebra: nullif/ifnull/coalesce/is-null through one plan."""
    t = load_tables(spark, sf_dir, ("events",))
    clean = F.when(F.col("event_type") == "error", F.lit(None)) \
             .otherwise(F.col("value"))
    return t["events"].select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("none"))
         .alias("kind"),
        F.col("value").isNull().alias("value_missing"),
        F.round(clean, 2).alias("clean_value"),
        F.round(F.coalesce(clean, F.lit(-1.0)), 2).alias("filled"))


@query("unpivot_stack", oracle="""
    SELECT o_orderkey, metric, round(v, 2) AS v
    FROM (SELECT o_orderkey, o_totalprice AS price,
                 CAST(o_custkey AS DOUBLE) AS cust
          FROM orders WHERE o_orderkey < 500)
    UNPIVOT (v FOR metric IN (price, cust))
""")
def unpivot_stack(spark, sf_dir):
    """UNPIVOT (stack): wide → long metric rows."""
    t = load_tables(spark, sf_dir, ("orders",))
    base = (t["orders"].where(F.col("o_orderkey") < 500)
            .select("o_orderkey", F.col("o_totalprice").alias("price"),
                    F.col("o_custkey").cast("double").alias("cust")))
    return base.selectExpr(
        "o_orderkey",
        "stack(2, 'price', price, 'cust', cust) as (metric, v0)"
    ).select("o_orderkey", "metric", F.round("v0", 2).alias("v"))

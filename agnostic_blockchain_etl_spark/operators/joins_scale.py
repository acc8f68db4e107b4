"""Scale-pattern joins: banded range join and salted skew join.

Both produce results identical to their naive formulations (the DuckDB
oracles ARE the naive formulations) while keeping the Spark plan linear:

- **range join**: Spark executes an inequality join as
  BroadcastNestedLoopJoin (quadratic). Banding quantizes the range
  predicate into equi-join buckets: each left row joins only its ±1
  bucket neighborhood, then the exact predicate filters — an equi-shuffle
  whose fan-out is the band width, not the table size.
- **salted join**: a hot key floods one shuffle partition. Salting
  appends a random-ish shard to the build key and explodes the probe side
  across shards, spreading the hot key over N partitions. (Spark's AQE
  skew-join does this adaptively for sort-merge joins; explicit salting
  is the portable form and works for any join type.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .tables import events_us, load_tables

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


_BAND_US = 3_600_000_000  # 1 hour in µs


def banded_range_join(left: DataFrame, right: DataFrame, key: str,
                      left_ts: str, right_ts: str, tolerance_us: int,
                      band_us: int) -> DataFrame:
    """Pairs (left, right) with same ``key`` and |left_ts - right_ts| ≤
    tolerance, via band-bucket equi-join (band ≥ tolerance)."""
    lb = left.withColumn("__band", F.explode(F.array(
        (F.col(left_ts) / band_us).cast("long") - 1,
        (F.col(left_ts) / band_us).cast("long"),
        (F.col(left_ts) / band_us).cast("long") + 1)))
    rb = right.withColumn("__band", (F.col(right_ts) / band_us).cast("long"))
    joined = lb.join(rb, on=[key, "__band"])
    return joined.where(
        F.abs(F.col(left_ts) - F.col(right_ts)) <= tolerance_us).drop("__band")


@query("range_join_banded", oracle=f"""
    SELECT p.event_id AS purchase_id,
           CAST(count(c.event_id) AS BIGINT) AS clicks_within_1h
    FROM (SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
          WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT event_id, user_id, epoch_us(ts) AS ts FROM events
               WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND abs(p.ts - c.ts) <= {_BAND_US}
    GROUP BY p.event_id
""")
def range_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks within ±1 h of each purchase (same user): the banded
    range-join pattern; oracle is the naive inequality join."""
    t = load_tables(spark, sf_dir, ("events",))
    e = events_us(t["events"])
    purchases = e.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id",
        F.col("ts").alias("p_ts"))
    clicks = e.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id",
        F.col("ts").alias("c_ts"))
    pairs = banded_range_join(purchases, clicks, "user_id",
                              "p_ts", "c_ts", _BAND_US, _BAND_US)
    counts = pairs.groupBy("purchase_id").agg(
        F.count("click_id").alias("clicks_within_1h"))
    # left semantics: purchases with zero nearby clicks still appear
    return (purchases.select("purchase_id")
            .join(counts, "purchase_id", "left")
            .select("purchase_id",
                    F.coalesce("clicks_within_1h", F.lit(0)).cast("long")
                     .alias("clicks_within_1h")))


_SALT = 8


def salted_join(facts: DataFrame, dim: DataFrame, key: str,
                salt_expr: Column, n_salt: int = _SALT) -> DataFrame:
    """Skew-resistant equi-join: facts carry ``key || salt``; the dim side
    replicates across all salts. Result == plain ``facts.join(dim, key)``."""
    # pmod, not % — a negative (or NULL) salt expression would match no
    # dim shard and silently drop fact rows
    salted_facts = facts.withColumn(
        "__salt", F.pmod(F.coalesce(salt_expr, F.lit(0)), F.lit(n_salt)))
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    return salted_facts.join(salted_dim, on=[key, "__salt"]).drop("__salt")


@query("skew_salted_join", oracle="""
    SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_brand,
           round(l.l_extendedprice, 2) AS price
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
""")
def skew_salted_join(spark, sf_dir):
    """lineitem ⋈ part through explicit salting (8 shards) — identical
    rows to the plain join (the oracle), with hot part keys spread over 8
    shuffle partitions."""
    t = load_tables(spark, sf_dir, ("lineitem", "part"))
    facts = t["lineitem"].select(
        "l_orderkey", "l_linenumber", "l_partkey",
        F.round("l_extendedprice", 2).alias("price"))
    dim = t["part"].select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    out = salted_join(facts, dim, "l_partkey",
                      salt_expr=F.col("l_orderkey") + F.col("l_linenumber"))
    return out.select("l_orderkey", "l_linenumber", "l_partkey",
                      "p_brand", "price")

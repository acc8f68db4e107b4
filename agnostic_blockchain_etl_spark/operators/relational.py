"""Relational operator surface (SURVEY.md §2.3-§2.7) as Spark plans with
DuckDB oracle SQL for the driver's correctness gate.

Each operator the reference workload exercises gets a named query here;
``QUERIES``/``ORACLES`` are assembled into ``__spark_entry__.py``. Spark
implementations use the DataFrame API (or spark.sql where that is the
idiomatic surface); every computed column is aliased identically in both
engines because the driver hash-compares values after sorting columns by
name.

Determinism rules applied throughout (hash-compare safety):
- double aggregates rounded to a fixed scale in BOTH engines;
- DuckDB ``sum(INTEGER)`` yields HUGEINT → explicit BIGINT casts both sides;
- the reference's ``any()`` pick-arbitrary (erc20 create_buffer.sql:66-70)
  is expressed as ``min()`` so replay produces identical bytes;
- top-k / first-per-group always carries a unique tie-break key.

Scale notes are inline per operator; the broad strategy: dimension joins
broadcast (region/nation/customer at any SF are << fact tables), fact-fact
joins shuffle on the join key with AQE handling skew, aggregations rely on
partial (map-side) aggregation which Spark applies automatically to all
algebraic aggregates used here.
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


# ---------------------------------------------------------------------------
# Aggregations (§2.5) — flagship first
# ---------------------------------------------------------------------------

@query("q1_pricing_summary", oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(round(sum(CAST(l_quantity AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_qty,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE)
               AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4)) *
                          (CAST(1 AS DECIMAL(18,4)) -
                           CAST(l_discount AS DECIMAL(18,4)))), 2) AS DOUBLE)
               AS sum_disc_price,
           round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 6) AS avg_qty,
           round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                 / count(*), 6) AS avg_price,
           CAST(count(*) AS BIGINT)                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: the groupBy/agg surface of §2.5.

    Scale: partial aggregation map-side, then a shuffle keyed on the 2 low-
    cardinality flags — tiny shuffle regardless of input size; the scan
    prunes to 6 columns + pushes the shipdate filter into parquet. All
    money sums run in DECIMAL(18,4) (associative → bit-stable across
    partitionings); averages are decimal sum / count, rounded once."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    qty_dec = F.col("l_quantity").cast("decimal(18,4)")
    price_dec = F.col("l_extendedprice").cast("decimal(18,4)")
    return (t["lineitem"]
            .where(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum(qty_dec), 2).cast("double").alias("sum_qty"),
                 F.round(F.sum(price_dec), 2).cast("double")
                  .alias("sum_base_price"),
                 F.round(F.sum(_disc_price_decimal()), 2).cast("double")
                  .alias("sum_disc_price"),
                 F.round(F.sum(qty_dec).cast("double") / F.count("*"), 6)
                  .alias("avg_qty"),
                 F.round(F.sum(price_dec).cast("double") / F.count("*"), 6)
                  .alias("avg_price"),
                 F.count("*").alias("count_order")))


@query("group_min_multi_key", oracle="""
    SELECT o_custkey, o_orderstatus,
           min(o_orderdate)                 AS first_order,
           max(o_orderdate)                 AS last_order,
           CAST(count(*) AS BIGINT)         AS n_orders
    FROM orders GROUP BY o_custkey, o_orderstatus
""")
def group_min_multi_key(spark, sf_dir):
    """Multi-key grouping + pick-per-group (reference ``any(timestamp) …
    GROUP BY wallet, token, block``, erc20 create_buffer.sql:66-89 —
    expressed as min/max for replay determinism)."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (t["orders"].groupBy("o_custkey", "o_orderstatus")
            .agg(F.min("o_orderdate").alias("first_order"),
                 F.max("o_orderdate").alias("last_order"),
                 F.count("*").alias("n_orders")))


@query("count_distinct_agg", oracle="""
    SELECT l_returnflag,
           CAST(count(DISTINCT l_partkey) AS BIGINT) AS distinct_parts,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS distinct_supps
    FROM lineitem GROUP BY l_returnflag
""")
def count_distinct_agg(spark, sf_dir):
    """Distinct aggregation (available 'for free' per §2.5; Spark expands
    to a two-stage partial-distinct plan — no driver collect)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (t["lineitem"].groupBy("l_returnflag")
            .agg(F.countDistinct("l_partkey").alias("distinct_parts"),
                 F.countDistinct("l_suppkey").alias("distinct_supps")))


@query("rollup_agg", oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(count(*) AS BIGINT)   AS n,
           round(sum(l_quantity), 2)  AS qty
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_agg(spark, sf_dir):
    """ROLLUP grouping sets (§2.5 'free in Spark if we expose SQL')."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (t["lineitem"].rollup("l_returnflag", "l_linestatus")
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("l_quantity"), 2).alias("qty")))


@query("resume_point_max", oracle="""
    SELECT CAST(max(o_orderkey) + 1 AS BIGINT) AS start FROM orders
""")
def resume_point_max(spark, sf_dir):
    """The init/tip control-query shape: ``max(number)+1 AS start``
    (examples/ethereum_blocks/start.sql:1-3) — an aggregate-pushdown scan."""
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].agg((F.max("o_orderkey") + 1).cast("long").alias("start"))


# ---------------------------------------------------------------------------
# Projections / filters (§2.3)
# ---------------------------------------------------------------------------

@query("projection_alias", oracle="""
    SELECT l_orderkey                                     AS order_key,
           l_linenumber                                   AS line_number,
           round(l_extendedprice * (1 - l_discount), 4)   AS net_price
    FROM lineitem
""")
def projection_alias(spark, sf_dir):
    """Snake-case re-aliasing projection (blocks create_buffer.sql:13-36)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].select(
        F.col("l_orderkey").alias("order_key"),
        F.col("l_linenumber").alias("line_number"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4)
         .alias("net_price"))


@query("select_except", oracle="""
    SELECT * EXCLUDE (text) FROM documents
""")
def select_except(spark, sf_dir):
    """``SELECT * EXCEPT (col)`` (decoded_logs create_buffer.sql:24) →
    ``df.drop`` — pure column pruning, reaches the scan."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].drop("text")


@query("replace_one_column", oracle="""
    SELECT * REPLACE (lower(l_returnflag) AS l_returnflag) FROM lineitem
""")
def replace_one_column(spark, sf_dir):
    """``SELECT t.* EXCEPT (c), f(c) AS c`` (decoded_logs_to_daily_parquet
    transform.sql:11-16) → ``withColumn``."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return t["lineitem"].withColumn("l_returnflag", F.lower("l_returnflag"))


@query("cursor_range_filter", oracle="""
    SELECT * FROM orders WHERE o_orderkey >= 100 AND o_orderkey <= 500
""")
def cursor_range_filter(spark, sf_dir):
    """The per-batch cursor predicate (decoded_logs create_buffer.sql:18).
    Scale: this exact predicate is what makes incremental batches cheap —
    it pushes to parquet row-group min/max stats."""
    t = load_tables(spark, sf_dir, ("orders",))
    return t["orders"].where((F.col("o_orderkey") >= 100) &
                             (F.col("o_orderkey") <= 500))


@query("length_filters", oracle="""
    SELECT doc_id, n_chars FROM documents
    WHERE length(text) > 400 AND length(source) >= 4
""")
def length_filters(spark, sf_dir):
    """length()-guard filters (decoded create_buffer.sql:19,27)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (t["documents"]
            .where((F.length("text") > 400) & (F.length("source") >= 4))
            .select("doc_id", "n_chars"))


@query("conditional_coalesce", oracle="""
    SELECT event_id,
           CASE WHEN value > 50 THEN 'high' ELSE 'low' END AS bucket,
           coalesce(nullif(event_type, 'error'), 'unknown') AS kind
    FROM events
""")
def conditional_coalesce(spark, sf_dir):
    """if()/coalesce conditionals (table_to_daily start.sql:14, tip.sql:2)."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].select(
        "event_id",
        F.when(F.col("value") > 50, "high").otherwise("low").alias("bucket"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown"))
         .alias("kind"))


# ---------------------------------------------------------------------------
# Joins (§2.4)
# ---------------------------------------------------------------------------

@query("left_join_enrich", oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
""")
def left_join_enrich(spark, sf_dir):
    """Equi left-join chain onto small dims (logs create_buffer.sql:95-96).
    Scale: nation/region are broadcast — zero shuffle of the fact side."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "region"))
    return (t["customer"]
            .join(F.broadcast(t["nation"]),
                  t["customer"].c_nationkey == t["nation"].n_nationkey, "left")
            .join(F.broadcast(t["region"]),
                  t["nation"].n_regionkey == t["region"].r_regionkey, "left")
            .select("c_custkey", "c_name",
                    F.col("n_name").alias("nation"),
                    F.col("r_name").alias("region")))


@query("join_after_agg", oracle="""
    SELECT g.o_custkey, g.total_spent, c.c_name, c.c_mktsegment
    FROM (SELECT o_custkey, round(sum(o_totalprice), 2) AS total_spent
          FROM orders GROUP BY o_custkey) g
    LEFT JOIN customer c ON g.o_custkey = c.c_custkey
""")
def join_after_agg(spark, sf_dir):
    """Enrichment join after aggregation (erc20 create_buffer.sql:119-120).
    Scale: agg shrinks the left side to |custkeys| before the join; customer
    broadcast if small, else shuffle-hash on the already-shuffled key."""
    t = load_tables(spark, sf_dir, ("orders", "customer"))
    g = (t["orders"].groupBy("o_custkey")
         .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent")))
    return (g.join(t["customer"], g.o_custkey == t["customer"].c_custkey, "left")
            .select("o_custkey", "total_spent", "c_name", "c_mktsegment"))


@query("semi_join", oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
""")
def semi_join(spark, sf_dir):
    """Left-semi join (§2.4: 'Spark covers these for free')."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].where(F.col("o_totalprice") > 300000)
    return (t["customer"]
            .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
            .select("c_custkey", "c_name"))


@query("anti_join", oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def anti_join(spark, sf_dir):
    """Left-anti join."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    return (t["customer"]
            .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey,
                  "left_anti")
            .select("c_custkey", "c_name"))


@query("zip_arrays_posexplode", oracle="""
    SELECT l_orderkey,
           CAST(row_number() OVER (PARTITION BY l_orderkey
                ORDER BY l_linenumber, l_partkey, l_quantity) - 1
                AS INT)     AS pos,
           l_partkey        AS partkey,
           l_quantity       AS quantity
    FROM lineitem
""")
def zip_arrays_posexplode(spark, sf_dir):
    """Positional zip-join of two parallel arrays (transactions
    create_buffer.sql:161 ``ARRAY JOIN block.transactions AS tx, receipts AS
    r``): build parallel arrays, then ``posexplode(arrays_zip(...))`` — NOT
    a cross join; elements pair by index. Oracle reconstructs the same rows
    relationally."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    per_order = (t["lineitem"]
                 .groupBy("l_orderkey")
                 .agg(F.sort_array(F.collect_list(F.struct(
                     "l_linenumber", "l_partkey", "l_quantity"))).alias("lines"))
                 .select("l_orderkey",
                         F.col("lines.l_partkey").alias("partkeys"),
                         F.col("lines.l_quantity").alias("quantities")))
    return (per_order
            .select("l_orderkey",
                    F.posexplode(F.arrays_zip("partkeys", "quantities")))
            .select("l_orderkey",
                    F.col("pos").cast("int").alias("pos"),
                    F.col("col.partkeys").alias("partkey"),
                    F.col("col.quantities").alias("quantity")))


@query("element_at_position_join", oracle="""
    SELECT l_orderkey, l_partkey AS first_partkey FROM (
        SELECT l_orderkey, l_partkey,
               row_number() OVER (PARTITION BY l_orderkey
                   ORDER BY l_linenumber, l_partkey) AS rn
        FROM lineitem) WHERE rn = 1
""")
def element_at_position_join(spark, sf_dir):
    """1-based index into a sibling array (traces create_buffer.sql:136-139
    ``receipts[transaction_position + 1]``) via ``element_at`` (also
    1-based, exact semantic match)."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    per_order = (t["lineitem"].groupBy("l_orderkey")
                 .agg(F.sort_array(F.collect_list(F.struct(
                     "l_linenumber", "l_partkey"))).alias("lines")))
    return per_order.select(
        "l_orderkey",
        F.element_at(F.col("lines.l_partkey"), 1).alias("first_partkey"))


# ---------------------------------------------------------------------------
# Set ops / sorts / windows (§2.6)
# ---------------------------------------------------------------------------

@query("union_all_wallets", oracle="""
    SELECT user_id, role, CAST(count(*) AS BIGINT) AS n FROM (
        SELECT user_id, 'actor' AS role FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, 'buyer' AS role FROM events WHERE event_type = 'purchase'
    ) GROUP BY user_id, role
""")
def union_all_wallets(spark, sf_dir):
    """UNION ALL of two role-projections of the same stream (the erc20
    sender∪recipient pattern, create_buffer.sql:74-87) → unionByName."""
    t = load_tables(spark, sf_dir, ("events",))
    e = t["events"]
    a = e.where(F.col("event_type") == "click").select(
        "user_id", F.lit("actor").alias("role"))
    b = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.lit("buyer").alias("role"))
    return a.unionByName(b).groupBy("user_id", "role").agg(
        F.count("*").alias("n"))


@query("distinct_keys", oracle="""
    SELECT DISTINCT p_brand, p_type FROM part
""")
def distinct_keys(spark, sf_dir):
    """DISTINCT (the ``GROUP BY token_address`` dedup shape,
    erc20 create_buffer.sql:37-64)."""
    t = load_tables(spark, sf_dir, ("part",))
    return t["part"].select("p_brand", "p_type").distinct()


@query("window_first_per_group", oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate FROM (
        SELECT o_custkey, o_orderkey, o_orderdate,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1
""")
def window_first_per_group(spark, sf_dir):
    """Window row_number (available beyond the reference surface, §2.6).
    Unique tie-break key keeps it hash-deterministic."""
    t = load_tables(spark, sf_dir, ("orders",))
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (t["orders"]
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("o_custkey", "o_orderkey", "o_orderdate"))


@query("topk_order_limit", oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 25
""")
def topk_order_limit(spark, sf_dir):
    """Global ORDER BY + LIMIT. Scale: Spark plans TakeOrderedAndProject —
    per-partition top-k then a k-row merge on the driver, no full sort."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (t["orders"]
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(25)
            .select("o_orderkey", "o_totalprice"))


# ---------------------------------------------------------------------------
# Scalar functions (§2.7)
# ---------------------------------------------------------------------------

@query("lambda_transform_array", oracle="""
    SELECT doc_id,
           array_to_string(list_transform(string_split(text, ' '),
                                          x -> upper(x)), '|') AS upper_words
    FROM documents WHERE doc_id < 50
""")
def lambda_transform_array(spark, sf_dir):
    """arrayMap lambda (blocks create_buffer.sql:35) → ``F.transform`` —
    stays entirely in the JVM (no UDF)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return (t["documents"].where(F.col("doc_id") < 50)
            .select("doc_id",
                    F.array_join(F.transform(F.split("text", " "), F.upper), "|")
                     .alias("upper_words")))


@query("named_struct_access", oracle="""
    SELECT o_orderkey, o_totalprice AS price, o_orderstatus AS status
    FROM orders WHERE o_orderkey < 1000
""")
def named_struct_access(spark, sf_dir):
    """tuple(a AS x, …) construction + ``t.field`` access (logs
    create_buffer.sql:16-20, traces :71-91): build a named struct, read
    fields back via dot paths. Catalyst collapses the round-trip."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (t["orders"].where(F.col("o_orderkey") < 1000)
            .select("o_orderkey",
                    F.struct(F.col("o_totalprice").alias("price"),
                             F.col("o_orderstatus").alias("status")).alias("o"))
            .select("o_orderkey", F.col("o.price").alias("price"),
                    F.col("o.status").alias("status")))


@query("json_extract_scalar", oracle="""
    SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k_val FROM events
""")
def json_extract_scalar(spark, sf_dir):
    """JSON path extraction + typed cast (JSONExtractUInt, erc20
    create_buffer.sql:51-61)."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"))


@query("json_typed_struct", oracle="""
    SELECT CAST(props->>'$.k' AS BIGINT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(value), 2) AS total
    FROM events GROUP BY 1
""")
def json_typed_struct(spark, sf_dir):
    """from_json into a declared schema then aggregate on the extracted
    field (the JSONExtract→Tuple pattern, blocks create_buffer.sql:39-71)."""
    t = load_tables(spark, sf_dir, ("events",))
    parsed = t["events"].withColumn(
        "p", F.from_json("props", "k BIGINT"))
    return (parsed.groupBy((F.col("p.k") % 10).alias("k_bucket"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 2).alias("total")))


@query("datetime_functions", oracle="""
    SELECT strftime(o_orderdate, '%Y%m')                    AS month,
           CAST(count(*) AS BIGINT)                          AS n,
           min(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)  AS min_plus30
    FROM orders GROUP BY 1
""")
def datetime_functions(spark, sf_dir):
    """toYYYYMM / addDays / toDate family (§2.7): month partitioning keys
    (ethereum_blocks create_table.sql:31) and day-cursor arithmetic
    (table_to_daily start.sql:14)."""
    t = load_tables(spark, sf_dir, ("orders",))
    return (t["orders"]
            .groupBy(F.date_format("o_orderdate", "yyyyMM").alias("month"))
            .agg(F.count("*").alias("n"),
                 F.min(F.date_add(F.col("o_orderdate").cast("date"), 30))
                  .cast("timestamp").alias("min_plus30")))


@query("math_scaling", oracle="""
    SELECT event_id,
           round(value / pow(10, 2), 6)       AS scaled,
           round(least(value, 50.0), 2)       AS capped,
           round(greatest(value, 10.0), 2)    AS floored
    FROM events
""")
def math_scaling(spark, sf_dir):
    """exp10 scaling (erc20 create_buffer.sql:118 ``balance/exp10(dec)``)
    + least/greatest (batcher.go:73 min)."""
    t = load_tables(spark, sf_dir, ("events",))
    return t["events"].select(
        "event_id",
        F.round(F.col("value") / F.pow(F.lit(10), F.lit(2)), 6).alias("scaled"),
        F.round(F.least("value", F.lit(50.0)), 2).alias("capped"),
        F.round(F.greatest("value", F.lit(10.0)), 2).alias("floored"))


@query("string_functions", oracle="""
    SELECT doc_id,
           substring(text, 1, 4)                       AS prefix4,
           CAST(length(text) AS BIGINT)                AS text_len,
           concat('0x', lower(hex(encode(source))))    AS source_hex
    FROM documents
""")
def string_functions(spark, sf_dir):
    """left(s,n)/length/hex-encode family (§2.7: ``left(input,4)`` selector
    prefix, decoded_traces create_buffer.sql:36)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return t["documents"].select(
        "doc_id",
        F.substring("text", 1, 4).alias("prefix4"),
        F.length("text").cast("long").alias("text_len"),
        F.concat(F.lit("0x"), F.lower(F.hex(F.encode(F.col("source"), "UTF-8"))))
         .alias("source_hex"))


def _disc_price_decimal():
    """``l_extendedprice * (1 - l_discount)`` in DECIMAL(18,4) arithmetic.

    Double summation is order-dependent; Spark and DuckDB partition sums
    differently and ULP drift crosses 2-decimal rounding boundaries at
    sf0.1 (driver hash_match failures in round 1). Decimal aggregation is
    associative and engine-exact, so the hash matches at any parallelism —
    the same property that makes the result reproducible run-to-run on a
    1000-executor cluster."""
    one = F.lit(1).cast("decimal(18,4)")
    return (F.col("l_extendedprice").cast("decimal(18,4)") *
            (one - F.col("l_discount").cast("decimal(18,4)")))


_DISC_PRICE_SQL = ("CAST(l_extendedprice AS DECIMAL(18,4)) * "
                   "(CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))")


@query("q3_shipping_priority", oracle=f"""
    SELECT l.l_orderkey,
           CAST(round(sum({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate  > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
""")
def q3_shipping_priority(spark, sf_dir):
    """TPC-H-Q3-style three-way fact join with selective dimension filter.

    Scale: the segment filter shrinks customer before it joins; Catalyst
    pushes both date predicates into the scans and (with AQE) broadcasts
    the filtered customer side — join order matters and is left to the
    optimizer, not hand-scheduled. Revenue is summed in decimal (see
    ``_disc_price_decimal``) so the result is bit-stable at any
    partitioning."""
    t = load_tables(spark, sf_dir, ("customer", "orders", "lineitem"))
    c = t["customer"].where(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = t["lineitem"].where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (c.join(o, c.c_custkey == o.o_custkey)
            .join(l, l.l_orderkey == o.o_orderkey)
            .groupBy("l_orderkey", "o_orderdate")
            .agg(F.round(F.sum(_disc_price_decimal()), 2)
                  .cast("double").alias("revenue"))
            .select("l_orderkey", "revenue", "o_orderdate"))


@query("q5_supplier_volume", oracle=f"""
    SELECT n.n_name AS nation,
           CAST(round(sum({_DISC_PRICE_SQL}), 2) AS DOUBLE) AS revenue
    FROM region r
    JOIN nation n   ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN lineitem l ON l.l_suppkey = s.s_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
""")
def q5_supplier_volume(spark, sf_dir):
    """TPC-H-Q5-style five-way star join (region→nation→supplier dims onto
    the lineitem⋈orders facts).

    Scale: three dims broadcast (bytes, not gigabytes, at any SF); the one
    real shuffle is lineitem⋈orders on orderkey; the aggregate shrinks to
    |nations| rows map-side."""
    t = load_tables(spark, sf_dir,
                    ("region", "nation", "supplier", "lineitem", "orders"))
    r = t["region"].where(F.col("r_name") == "ASIA")
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp")) &
        (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")))
    return (F.broadcast(r)
            .join(F.broadcast(t["nation"]),
                  t["nation"].n_regionkey == r.r_regionkey)
            .join(F.broadcast(t["supplier"]),
                  t["supplier"].s_nationkey == t["nation"].n_nationkey)
            .join(t["lineitem"],
                  t["lineitem"].l_suppkey == t["supplier"].s_suppkey)
            .join(o, o.o_orderkey == t["lineitem"].l_orderkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(F.round(F.sum(_disc_price_decimal()), 2)
                  .cast("double").alias("revenue")))


@query("generate_series_scan", oracle="""
    SELECT CAST(sum(n) AS BIGINT) AS total, CAST(count(*) AS BIGINT) AS n_rows
    FROM (SELECT unnest(generate_series(0, 9999)) AS n)
""")
def generate_series_scan(spark, sf_dir):
    """generate_series driver of per-block fan-out (blocks
    create_buffer.sql:7-11) → ``spark.range`` — a parallel, splittable
    source (each partition materializes its own subrange)."""
    return (spark.range(0, 10000)
            .agg(F.sum("id").cast("long").alias("total"),
                 F.count("*").alias("n_rows")))

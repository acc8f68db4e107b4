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

from .tables import avg_units, load_tables

from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


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
           ((2 * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) * 1000000
                      AS BIGINT) + count(*))
            // (2 * count(*))) / 1000000.0 AS avg_qty,
           ((2 * CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) * 1000000
                      AS BIGINT) + count(*))
            // (2 * count(*))) / 1000000.0 AS avg_price,
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
    partitionings); averages use half-up integer arithmetic
    (``avg_units``) so rounding ties can't diverge across engines."""
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
                 avg_units(F.sum(qty_dec), F.count("*"), 6).alias("avg_qty"),
                 avg_units(F.sum(price_dec), F.count("*"), 6)
                  .alias("avg_price"),
                 F.count("*").alias("count_order")))


@query("group_window_first", oracle="""
    SELECT o_custkey, o_orderstatus, first_order, last_order, n_orders,
           first_orderkey
    FROM (SELECT o_custkey, o_orderstatus,
                 min(o_orderdate) OVER wg             AS first_order,
                 max(o_orderdate) OVER wg             AS last_order,
                 CAST(count(*) OVER wg AS BIGINT)     AS n_orders,
                 o_orderkey                           AS first_orderkey,
                 row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                    ORDER BY o_orderdate, o_orderkey) AS rn
          FROM orders
          WINDOW wg AS (PARTITION BY o_custkey, o_orderstatus))
    WHERE rn = 1
""")
def group_window_first(spark, sf_dir):
    """Multi-key grouping + pick-per-group (reference ``any(timestamp) …
    GROUP BY wallet, token, block``, erc20 create_buffer.sql:66-89 —
    min/max for replay determinism) fused with first-row-per-group via
    ``row_number`` (§2.6). One shuffle on the grouping key serves both the
    windowed aggregates and the rank — the scalable form of 'group stats
    plus a representative row'."""
    t = load_tables(spark, sf_dir, ("orders",))
    wg = Window.partitionBy("o_custkey", "o_orderstatus")
    wr = wg.orderBy("o_orderdate", "o_orderkey")
    return (t["orders"]
            .select("o_custkey", "o_orderstatus",
                    F.min("o_orderdate").over(wg).alias("first_order"),
                    F.max("o_orderdate").over(wg).alias("last_order"),
                    F.count("*").over(wg).alias("n_orders"),
                    F.col("o_orderkey").alias("first_orderkey"),
                    F.row_number().over(wr).alias("rn"))
            .where(F.col("rn") == 1)
            .drop("rn"))


# ---------------------------------------------------------------------------
# Projections / filters (§2.3)
# ---------------------------------------------------------------------------

@query("projection_struct_facets", oracle="""
    SELECT * EXCLUDE (l_shipdate)
           REPLACE (lower(l_returnflag) AS l_returnflag),
           round(l_extendedprice * (1 - l_discount), 4)   AS net_price,
           l_extendedprice                                AS s_price,
           lower(l_returnflag)                            AS s_flag
    FROM lineitem
    WHERE l_orderkey >= 100 AND l_orderkey <= 500
""")
def projection_struct_facets(spark, sf_dir):
    """Projection surface in one plan (§2.3, consolidating the r1-r3
    ``projection_facets`` + ``cursor_struct_projection`` gate rows —
    both stay value-pinned): the per-batch cursor predicate
    (decoded_logs create_buffer.sql:18) over ``SELECT * EXCEPT (col)``
    (decoded_logs create_buffer.sql:24) → ``df.drop``, ``SELECT t.*
    EXCEPT (c), f(c) AS c`` (decoded_logs_to_daily_parquet
    transform.sql:11-16) → ``withColumn``, a computed aliased column
    (blocks create_buffer.sql:13-36), and a named-struct round-trip
    (logs create_buffer.sql:16-20, traces :71-91): build ``tuple(a AS
    x, …)``, read fields back by dot path — Catalyst collapses the
    round-trip so ``s_price``/``s_flag`` cost nothing. Scale: the range
    predicate pushes to parquet row-group min/max stats (what makes
    incremental batches cheap) and the dropped column never leaves the
    scan."""
    t = load_tables(spark, sf_dir, ("lineitem",))
    return (t["lineitem"]
            .where((F.col("l_orderkey") >= 100) &
                   (F.col("l_orderkey") <= 500))
            .drop("l_shipdate")
            .withColumn("l_returnflag", F.lower("l_returnflag"))
            .withColumn("net_price",
                        F.round(F.col("l_extendedprice") *
                                (1 - F.col("l_discount")), 4))
            .withColumn("_o", F.struct(
                F.col("l_extendedprice").alias("price"),
                F.col("l_returnflag").alias("flag")))
            .withColumn("s_price", F.col("_o.price"))
            .withColumn("s_flag", F.col("_o.flag"))
            .drop("_o"))


@query("documents_scalar_facets", oracle="""
    WITH mapped AS (
        SELECT *, MAP {'len': length(text),
                       'words': len(string_split_regex(trim(text), '\\s+'))} AS m
        FROM documents
        WHERE length(text) > 400 AND length(source) >= 4)
    SELECT doc_id, n_chars,
           substring(text, 1, 4)                       AS prefix4,
           CAST(length(text) AS BIGINT)                AS text_len,
           concat('0x', lower(hex(encode(source))))    AS source_hex,
           array_to_string(list_transform(string_split(text, ' '),
                                          x -> upper(x)), '|') AS upper_words,
           CAST(m['words'][1] AS BIGINT)               AS words_v,
           CAST(cardinality(m) AS INT)                 AS n_keys,
           regexp_extract(text, '([a-z]+)', 1)         AS first_word,
           CAST(len(regexp_extract_all(text, '[aeiou]')) AS BIGINT)
                                                       AS n_vowels,
           regexp_replace(text, '\\s+', '_', 'g')[:40] AS squashed40
    FROM mapped
""")
def documents_scalar_facets(spark, sf_dir):
    """Scalar-function surface over documents in one scan (§2.3/§2.7):
    length()-guard filters (decoded create_buffer.sql:19,27), left/length/
    hex-encode strings (decoded_traces create_buffer.sql:36), arrayMap
    lambda → ``F.transform`` (blocks create_buffer.sql:35, JVM-side), a
    MapType column with key access + cardinality, and the regex extract /
    extract-all / replace family. One projection over one pruned scan —
    the filters push to parquet."""
    t = load_tables(spark, sf_dir, ("documents",))
    m = F.create_map(
        F.lit("len"), F.length("text"),
        F.lit("words"), F.size(F.split(F.trim(F.col("text")), r"\s+")))
    return (t["documents"]
            .where((F.length("text") > 400) & (F.length("source") >= 4))
            .select(
                "doc_id", "n_chars",
                F.substring("text", 1, 4).alias("prefix4"),
                F.length("text").cast("long").alias("text_len"),
                F.concat(F.lit("0x"),
                         F.lower(F.hex(F.encode(F.col("source"), "UTF-8"))))
                 .alias("source_hex"),
                F.array_join(F.transform(F.split("text", " "), F.upper), "|")
                 .alias("upper_words"),
                F.element_at(m, "words").cast("long").alias("words_v"),
                F.size(m).cast("int").alias("n_keys"),
                F.regexp_extract("text", "([a-z]+)", 1).alias("first_word"),
                F.size(F.regexp_extract_all(F.col("text"), F.lit("[aeiou]"),
                                            F.lit(0)))
                 .cast("long").alias("n_vowels"),
                F.substring(F.regexp_replace("text", r"\s+", "_"), 1, 40)
                 .alias("squashed40")))


@query("events_scalar_facets", oracle="""
    SELECT event_id,
           CASE WHEN value > 50 THEN 'high' ELSE 'low' END     AS bucket,
           coalesce(nullif(event_type, 'error'), 'unknown')    AS kind,
           CAST(props->>'$.k' AS BIGINT)                       AS k_val,
           round(value / pow(10, 2), 6)                        AS scaled,
           round(least(value, 50.0), 2)                        AS capped,
           round(greatest(value, 10.0), 2)                     AS floored,
           CAST(value IS NULL AS BOOLEAN)                      AS value_missing,
           CASE WHEN event_type = 'error' THEN NULL
                ELSE round(value, 2) END                       AS clean_value,
           round(coalesce(CASE WHEN event_type = 'error' THEN NULL
                               ELSE value END, -1.0), 2)       AS filled
    FROM events
""")
def events_scalar_facets(spark, sf_dir):
    """Scalar-function surface over events in one scan: if()/coalesce
    conditionals (table_to_daily start.sql:14, tip.sql:2), JSON path
    extraction + typed cast (JSONExtractUInt, erc20 create_buffer.sql:
    51-61), exp10 scaling (erc20 :118) + least/greatest (batcher.go:73),
    and the NULL algebra (nullif/ifnull/is-null)."""
    t = load_tables(spark, sf_dir, ("events",))
    clean = F.when(F.col("event_type") == "error", F.lit(None)) \
             .otherwise(F.col("value"))
    return t["events"].select(
        "event_id",
        F.when(F.col("value") > 50, "high").otherwise("low").alias("bucket"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown"))
         .alias("kind"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.round(F.col("value") / F.pow(F.lit(10), F.lit(2)), 6).alias("scaled"),
        F.round(F.least("value", F.lit(50.0)), 2).alias("capped"),
        F.round(F.greatest("value", F.lit(10.0)), 2).alias("floored"),
        F.col("value").isNull().alias("value_missing"),
        F.round(clean, 2).alias("clean_value"),
        F.round(F.coalesce(clean, F.lit(-1.0)), 2).alias("filled"))


# ---------------------------------------------------------------------------
# Joins (§2.4)
# ---------------------------------------------------------------------------

@query("enrich_join_chain", oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           n.n_name AS nation, r.r_name AS region,
           g.total_spent
    FROM customer c
    LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
    LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN (SELECT o_custkey,
                      CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4))), 2)
                           AS DOUBLE) AS total_spent
               FROM orders GROUP BY o_custkey) g
      ON g.o_custkey = c.c_custkey
""")
def enrich_join_chain(spark, sf_dir):
    """Equi left-join chain onto small dims (logs create_buffer.sql:95-96)
    plus the enrichment-join-after-aggregation shape (erc20
    create_buffer.sql:119-120) in one plan.

    Scale: nation/region broadcast — zero shuffle of the customer side for
    the dim chain; the orders aggregation shrinks to |custkeys| rows
    before its join, which shuffles on the already-grouped key. Spend is
    summed in DECIMAL(18,4) (associative → hash-stable at any
    parallelism)."""
    t = load_tables(spark, sf_dir, ("customer", "nation", "region", "orders"))
    g = (t["orders"].groupBy("o_custkey")
         .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 2)
               .cast("double").alias("total_spent")))
    return (t["customer"]
            .join(F.broadcast(t["nation"]),
                  t["customer"].c_nationkey == t["nation"].n_nationkey, "left")
            .join(F.broadcast(t["region"]),
                  t["nation"].n_regionkey == t["region"].r_regionkey, "left")
            .join(g, g.o_custkey == t["customer"].c_custkey, "left")
            .select("c_custkey", "c_name", "c_mktsegment",
                    F.col("n_name").alias("nation"),
                    F.col("r_name").alias("region"),
                    "total_spent"))


@query("semi_anti_join", oracle="""
    SELECT 'semi' AS facet, c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
    UNION ALL
    SELECT 'anti' AS facet, c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""")
def semi_anti_join(spark, sf_dir):
    """Left-semi + left-anti joins (§2.4: 'Spark covers these for free'),
    faceted through one UNION ALL plan."""
    t = load_tables(spark, sf_dir, ("customer", "orders"))
    big = t["orders"].where(F.col("o_totalprice") > 300000)
    semi = (t["customer"]
            .join(big, t["customer"].c_custkey == big.o_custkey, "left_semi")
            .select(F.lit("semi").alias("facet"), "c_custkey", "c_name"))
    anti = (t["customer"]
            .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey,
                  "left_anti")
            .select(F.lit("anti").alias("facet"), "c_custkey", "c_name"))
    return semi.unionByName(anti)


@query("array_zip_index", oracle="""
    SELECT l_orderkey,
           CAST(row_number() OVER w - 1 AS INT)   AS pos,
           l_partkey                              AS partkey,
           l_quantity                             AS quantity,
           first_value(l_partkey) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND UNBOUNDED FOLLOWING)
                                                  AS first_partkey
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_quantity)
""")
def array_zip_index(spark, sf_dir):
    """Positional zip-join of two parallel arrays (transactions
    create_buffer.sql:161 ``ARRAY JOIN block.transactions AS tx, receipts AS
    r``): build parallel arrays, then ``posexplode(arrays_zip(...))`` — NOT
    a cross join; elements pair by index. The ``first_partkey`` column is
    the sibling-array 1-based index read (traces create_buffer.sql:136-139
    ``receipts[transaction_position + 1]``) via ``element_at`` (also
    1-based, exact semantic match). Oracle reconstructs the same rows with
    one window."""
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
                    F.posexplode(F.arrays_zip("partkeys", "quantities")),
                    F.element_at(F.col("partkeys"), 1).alias("first_partkey"))
            .select("l_orderkey",
                    F.col("pos").cast("int").alias("pos"),
                    F.col("col.partkeys").alias("partkey"),
                    F.col("col.quantities").alias("quantity"),
                    "first_partkey"))


# ---------------------------------------------------------------------------
# Set ops / sorts / windows (§2.6)
# ---------------------------------------------------------------------------

@query("key_set_facets", oracle="""
    SELECT 'wallet' AS facet, CAST(user_id AS VARCHAR) AS k1, role AS k2,
           CAST(count(*) AS BIGINT) AS n
    FROM (
        SELECT user_id, 'actor' AS role FROM events WHERE event_type = 'click'
        UNION ALL
        SELECT user_id, 'buyer' AS role FROM events WHERE event_type = 'purchase'
    ) GROUP BY user_id, role
    UNION ALL
    SELECT 'part_keys', p_brand, p_type, CAST(NULL AS BIGINT)
    FROM (SELECT DISTINCT p_brand, p_type FROM part)
    UNION ALL
    SELECT 'intersect', CAST(user_id AS VARCHAR), CAST(NULL AS VARCHAR),
           CAST(NULL AS BIGINT)
    FROM (
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'except', CAST(user_id AS VARCHAR), CAST(day AS VARCHAR),
           CAST(NULL AS BIGINT)
    FROM (
        SELECT user_id, CAST(ts AS DATE) AS day FROM events
        WHERE event_type = 'view'
        EXCEPT
        SELECT user_id, CAST(ts AS DATE) AS day FROM events
        WHERE event_type = 'purchase')
    UNION ALL
    SELECT 'semi', CAST(c_custkey AS VARCHAR), c_name, CAST(NULL AS BIGINT)
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > 300000)
    UNION ALL
    SELECT 'anti', CAST(c_custkey AS VARCHAR), c_name, CAST(NULL AS BIGINT)
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
""")
def key_set_facets(spark, sf_dir):
    """Every §2.6 set-operation shape in ONE gate row: UNION ALL of two
    role-projections of the same stream (the erc20 sender∪recipient
    pattern, create_buffer.sql:74-87) → ``unionByName`` + groupBy;
    DISTINCT (the ``GROUP BY token_address`` dedup shape, erc20
    create_buffer.sql:37-64); INTERSECT (users who clicked AND bought);
    and EXCEPT on a composite (user, day) key — days a user viewed
    without buying (consolidates the r1-r5 ``set_ops`` row; the corpus
    has every user doing every event type, so the composite key keeps
    the except facet non-trivial). Round 8 folds in the left-SEMI and
    left-ANTI join facets (customers with a >300k order / customers
    with no orders — the `semi_anti_join` gate row rotated out to make
    window room for `shard_assign_balanced`; the standalone query stays
    a library/bench entry point). Each facet keeps its own single
    shuffle; the final union is plan-level concatenation, not a join."""
    from .tables import epoch_day, events_us
    t = load_tables(spark, sf_dir, ("events", "part", "customer",
                                    "orders"))
    e = t["events"]
    a = e.where(F.col("event_type") == "click").select(
        "user_id", F.lit("actor").alias("role"))
    b = e.where(F.col("event_type") == "purchase").select(
        "user_id", F.lit("buyer").alias("role"))
    wallets = (a.unionByName(b).groupBy("user_id", "role")
               .agg(F.count("*").alias("n"))
               .select(F.lit("wallet").alias("facet"),
                       F.col("user_id").cast("string").alias("k1"),
                       F.col("role").alias("k2"), "n"))
    parts = (t["part"].select("p_brand", "p_type").distinct()
             .select(F.lit("part_keys").alias("facet"),
                     F.col("p_brand").alias("k1"),
                     F.col("p_type").alias("k2"),
                     F.lit(None).cast("long").alias("n")))
    eu = events_us(e).withColumn("day", epoch_day("ts"))
    inter = (eu.where(F.col("event_type") == "click").select("user_id")
             .intersect(eu.where(F.col("event_type") == "purchase")
                        .select("user_id"))
             .select(F.lit("intersect").alias("facet"),
                     F.col("user_id").cast("string").alias("k1"),
                     F.lit(None).cast("string").alias("k2"),
                     F.lit(None).cast("long").alias("n")))
    exc = (eu.where(F.col("event_type") == "view").select("user_id", "day")
           .subtract(eu.where(F.col("event_type") == "purchase")
                     .select("user_id", "day"))
           .select(F.lit("except").alias("facet"),
                   F.col("user_id").cast("string").alias("k1"),
                   F.col("day").cast("string").alias("k2"),
                   F.lit(None).cast("long").alias("n")))
    big = t["orders"].where(F.col("o_totalprice") > 300000)
    semi = (t["customer"]
            .join(big, t["customer"].c_custkey == big.o_custkey,
                  "left_semi")
            .select(F.lit("semi").alias("facet"),
                    F.col("c_custkey").cast("string").alias("k1"),
                    F.col("c_name").alias("k2"),
                    F.lit(None).cast("long").alias("n")))
    anti = (t["customer"]
            .join(t["orders"],
                  t["customer"].c_custkey == t["orders"].o_custkey,
                  "left_anti")
            .select(F.lit("anti").alias("facet"),
                    F.col("c_custkey").cast("string").alias("k1"),
                    F.col("c_name").alias("k2"),
                    F.lit(None).cast("long").alias("n")))
    return (wallets.unionByName(parts).unionByName(inter)
            .unionByName(exc).unionByName(semi).unionByName(anti))


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


# Hash-canary: the 60-bit md5-prefix hash of fixed literals, exposed as
# absolute values in a 1-row gate query. Every dedup/LSH oracle derives
# from this hash; if the driver environment ever computes it differently
# (engine version, conf), this row flips red and localizes the divergence
# to the raw hash — vs a flip only in a signature query, which localizes
# it downstream (permutation/SWAR arithmetic). No quotes/backslashes in
# the literals — they are spliced into both SQL dialects verbatim.
_CANARY_STRINGS = ("the quick brown fox", "Hello, World", "a  b c",
                   "unicode tokens üö", "0123456789abcdef")


@query("control_scan_facets", oracle="""
    SELECT (SELECT CAST(max(o_orderkey) + 1 AS BIGINT) FROM orders) AS start,
           CAST(sum(n) AS BIGINT)    AS total,
           CAST(count(*) AS BIGINT)  AS n_rows,
""" + ",\n".join(
    f"           CAST('0x' || substr(md5('{s}'), 1, 15) AS BIGINT)"
    f" AS canary_h{i}" for i, s in enumerate(_CANARY_STRINGS)) + """
    FROM (SELECT unnest(generate_series(0, 9999)) AS n)
""")
def control_scan_facets(spark, sf_dir):
    """The two control-plane scans in one row: the init/resume shape
    ``max(number)+1 AS start`` (examples/ethereum_blocks/start.sql:1-3, an
    aggregate-pushdown scan) and the generate_series per-block fan-out
    driver (blocks create_buffer.sql:7-11) → ``spark.range`` — a parallel,
    splittable source (each partition materializes its own subrange).
    Rides the 60-bit hash canaries (see ``_CANARY_STRINGS``)."""
    from .dedup import _spark_hash60
    t = load_tables(spark, sf_dir, ("orders",))
    start = t["orders"].agg(
        (F.max("o_orderkey") + 1).cast("long").alias("start"))
    series = (spark.range(0, 10000)
              .agg(F.sum("id").cast("long").alias("total"),
                   F.count("*").alias("n_rows")))
    canaries = [(_spark_hash60(F.lit(s)).alias(f"canary_h{i}"))
                for i, s in enumerate(_CANARY_STRINGS)]
    return start.crossJoin(series).select("start", "total", "n_rows",
                                          *canaries)


# Gate-window rotations (q5_supplier_volume rotated out round 9 for
# `mixture_apply`, facets pinned by q3 + enrich_join_chain;
# semi_anti_join rotated out round 8, facets folded into
# key_set_facets) are ORDERED centrally by `__spark_entry__.
# _PAST_WINDOW` — the single authority for the driver's 50-slot
# correctness window. Both queries stay registered, benched, and
# checked by the local oracle harness.

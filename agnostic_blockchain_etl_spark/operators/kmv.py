"""KMV (k-minimum-values) distinct-count sketch — the CARDINALITY
member of the bounded-sketch family: `bloom` answers "seen before?",
`cms` answers "roughly how many times?", this answers "roughly how
many DISTINCT keys?" in k longs, regardless of cardinality. The
training-data uses: distinct-document counts per crawl snapshot
without a corpus-keyed exact distinct, vocabulary-growth tracking
across ingest days, per-source unique-user/unique-url monitoring —
anywhere an exact ``count(DISTINCT key)`` shuffles the full key set
while the sketch ships k values.

Estimator (Bar-Yossef et al. 2002): with hashes uniform on [0, H),
the k-th smallest distinct hash value h_k estimates the cardinality
as ``(k-1) · H / h_k``; when fewer than k distinct values exist the
sketch IS the distinct hash set and the count is exact. Two sketches
over the same (k, salt) merge by "union, keep the k smallest" —
exactly the k smallest of the combined stream (any global top-k is
contained in the union of the halves' top-ks), so day-1 + day-2
equals one build over both days BIT-EXACT, which the gate pins by
building its sketch as a two-half merge while the oracle builds
one-shot.

Determinism: hashes are the engine's one cross-engine primitive
(`hashing.keyed_h60`, 60-bit salted md5), so sketches — and even the
hash-collision behavior of the estimate — are value-identical across
Spark and DuckDB. NULL keys hash under the chr(0) sentinel (the
`cms`/`bloom` convention; flag-don't-drop).

Scale notes (100 TB): `kmv_build`'s distinct is a partial-aggregated
hash dedup (map-side combine dedups within partitions before the
shuffle) followed by ``TakeOrderedAndProject`` — k rows per partition
reach the driver, never the key set. `kmv_group_build` needs the k
smallest PER GROUP, where a naive window partitions on the group and
holds every distinct key of a hot group; instead it reuses the repo's
two-level discipline (`ordering._bucketed_rank`'s shape): a 4096-band
summary keyed on the hash's top bits finds each group's cutoff band,
rows past the cutoff are filtered BEFORE the per-group window, so
every window partition holds ≈ k + one band's slop rows no matter how
hot the group.

Reference: no counterpart (the reference's distinct counts are
exact); LLM-data-pipeline mandate, sibling of `cms` and
`analytics.approx_sketches` (whose HLL is Spark-native and therefore
not oracle-pinnable — this sketch is, value-for-value).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .hashing import keyed_h60, sql_keyed_h60
from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()

_DEFAULT_K = 1024
_NULL_SENTINEL = "\x00"
_H_SPAN = float(2 ** 60)      # hash range [0, 2^60) — exact as double
_N_BANDS = 4096               # top-12-bit bands for the group cutoff


def _check_k(k: int) -> None:
    if k <= 1:
        raise ValueError(f"k must be > 1 (the estimator divides by "
                         f"k-1), got {k}")


def _kmv_key(key_col: str) -> Column:
    return F.coalesce(F.col(key_col).cast("string"),
                      F.lit(_NULL_SENTINEL))


def _kmv_hash(key_col: str, salt: str) -> Column:
    return keyed_h60(salt, _kmv_key(key_col))


def kmv_build(df: DataFrame, key_col: str, *, k: int = _DEFAULT_K,
              salt: str = "kmv:") -> DataFrame:
    """Build the sketch: ``(h long)`` — the k smallest distinct salted
    hashes of the key. Partial-agg dedup + TakeOrdered keep both the
    shuffle and the driver transfer bounded (k per partition)."""
    _check_k(k)
    return (df.select(_kmv_hash(key_col, salt).alias("h"))
            .distinct().orderBy("h").limit(k))


def kmv_merge(*sketches: DataFrame, k: int = _DEFAULT_K) -> DataFrame:
    """Union sketches built with the same (k, salt) and keep the k
    smallest — bit-exactly the sketch of the concatenated inputs."""
    _check_k(k)
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    return (reduce(DataFrame.unionByName, sketches)
            .distinct().orderBy("h").limit(k))


def kmv_estimate(sketch: DataFrame, *, k: int = _DEFAULT_K) -> DataFrame:
    """One row ``(n_kept long, est double)``: exact count while the
    sketch is under-full (n_kept < k — the sketch IS the distinct
    set), else the Bar-Yossef estimator ``(k-1) · 2^60 / h_k`` with
    h_k the sketch maximum. Rounded to 6 for cross-engine pinning."""
    _check_k(k)
    agg = sketch.agg(F.count("*").cast("long").alias("n_kept"),
                     F.max("h").alias("__hk"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")) \
           .otherwise(F.lit(k - 1) * F.lit(_H_SPAN)
                      / F.col("__hk").cast("double"))
    return agg.select("n_kept", F.round(est, 6).alias("est"))


def kmv_group_build(df: DataFrame, group_col: str, key_col: str, *,
                    k: int = _DEFAULT_K,
                    salt: str = "kmv:") -> DataFrame:
    """Per-group sketch: ``(grp, h)``, the k smallest distinct hashes
    per group WITHOUT a group-sized window: a (group, band) count
    summary over the hash's top 12 bits finds each group's cutoff
    band (the first band where the running count reaches k); only
    rows at-or-under the cutoff — ≈ k + one band — reach the ranked
    window. NULL groups are a real group (flag-don't-drop)."""
    _check_k(k)
    d = (df.select(F.col(group_col).alias("grp"),
                   _kmv_hash(key_col, salt).alias("h"))
         .distinct())
    band = F.shiftright(F.col("h"), 48).cast("int")   # 2^60 → 4096 bands
    d = d.withColumn("__band", band)
    # summary frame: ≤ n_groups × 4096 rows; its window is over the
    # summary, never the data (the `_bucketed_rank` shape)
    wcum = (Window.partitionBy("grp").orderBy("__band")
            .rowsBetween(Window.unboundedPreceding, 0))
    summary = (d.groupBy("grp", "__band").agg(F.count("*").alias("__c"))
               .withColumn("__cum", F.sum("__c").over(wcum)))
    cutoff = (summary.groupBy(F.col("grp").alias("__g"))
              .agg(F.coalesce(
                  F.min(F.when(F.col("__cum") >= k, F.col("__band"))),
                  F.max("__band")).alias("__cut")))
    pruned = (d.join(cutoff, F.col("grp").eqNullSafe(F.col("__g")))
              .where(F.col("__band") <= F.col("__cut"))
              .select("grp", "h"))
    wrank = Window.partitionBy("grp").orderBy("h")
    return (pruned.withColumn("__r", F.row_number().over(wrank))
            .where(F.col("__r") <= k).drop("__r"))


def kmv_group_estimate(gsketch: DataFrame, *,
                       k: int = _DEFAULT_K) -> DataFrame:
    """Per-group ``(grp, n_kept long, est double)`` — the
    `kmv_estimate` algebra applied groupwise."""
    _check_k(k)
    agg = gsketch.groupBy("grp").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.max("h").alias("__hk"))
    est = F.when(F.col("n_kept") < k, F.col("n_kept").cast("double")) \
           .otherwise(F.lit(k - 1) * F.lit(_H_SPAN)
                      / F.col("__hk").cast("double"))
    return agg.select("grp", "n_kept", F.round(est, 6).alias("est"))


def kmv_set_estimates(a: DataFrame, b: DataFrame, *,
                      k: int = _DEFAULT_K) -> DataFrame:
    """Set-operation estimates from two sketches built with the same
    (k, salt) — Beyer et al. 2007's multiset-operation synopses: one
    row ``(n_kept, rho, jaccard, union_est, inter_est)``.

    ``K`` = the k smallest of the combined sketches (= the union's
    sketch); ``rho`` counts members of K present in BOTH inputs —
    decidable exactly from the sketches alone, because any h ∈ K
    satisfies h ≤ max(that side's sketch) whenever the side could
    contain it (a full sketch's k-th smallest bounds the union's;
    an under-full sketch IS its whole set). Then ``Ĵ = rho / |K|-
    or-k`` (half-up 6-dp integer ratio — no float division of
    counts), the union cardinality is the standard KMV estimate
    (exact when under-full), and the intersection estimate is their
    product of the ROUNDED values (both engines multiply identical
    doubles).

    Scale: two k-row frames joined semi twice plus two 1-row
    aggregates — sketch-sized everything."""
    _check_k(k)
    u = kmv_merge(a, b, k=k)
    rho = (u.join(a, "h", "left_semi").join(b, "h", "left_semi")
           .agg(F.count("*").cast("long").alias("rho")))
    stats = u.agg(F.count("*").cast("long").alias("n_kept"),
                  F.max("h").alias("__hk"))
    one = stats.crossJoin(F.broadcast(rho))
    denom = F.when(F.col("n_kept") < k, F.col("n_kept")) \
             .otherwise(F.lit(k).cast("long"))
    jacc = F.when(denom > 0,
                  F.call_function("div",
                                  2 * F.col("rho") * 1_000_000 + denom,
                                  2 * denom) / 1e6)
    union_est = F.round(
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(F.lit(k - 1) * F.lit(_H_SPAN)
                   / F.col("__hk").cast("double")), 6)
    return (one.select("n_kept", "rho", jacc.alias("jaccard"),
                       union_est.alias("union_est"))
            .select("n_kept", "rho", "jaccard", "union_est",
                    F.round(F.col("jaccard") * F.col("union_est"), 6)
                    .alias("inter_est")))


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle
# ---------------------------------------------------------------------------

_GK = 32      # gate k: sf0.001 has 15 distinct users (exact path),
#               sf0.01 has 150 (estimation path) — both branches run
#               under the value oracle across the driver's SFs
_GHEAD = 8    # sketch head rows the gate value-pins
_GH = sql_keyed_h60("'kmv:'",
                    "COALESCE(CAST(e.user_id AS VARCHAR), chr(0))")


def _sql_kmv() -> str:
    """DuckDB twin: one-shot build + NAIVE per-group window — the
    two-path proof for the merge algebra AND the banded group
    cutoff."""
    est_expr = (f"CASE WHEN n_kept < {_GK} THEN CAST(n_kept AS DOUBLE) "
                f"ELSE {_GK - 1}.0 * POW(2.0, 60) / CAST(hk AS DOUBLE) "
                f"END")
    return f"""
    WITH keyed AS (
        SELECT DISTINCT ({_GH}) AS h FROM events e),
    ranked AS (
        SELECT h, CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS rank
        FROM keyed),
    sk AS (SELECT h, rank FROM ranked WHERE rank <= {_GK}),
    gl AS (SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS hk
           FROM sk),
    ex AS (SELECT CAST(count(DISTINCT COALESCE(
               CAST(user_id AS VARCHAR), chr(0))) AS BIGINT) AS exact_n
           FROM events),
    gkeyed AS (
        SELECT DISTINCT e.event_type AS grp, ({_GH}) AS h FROM events e),
    granked AS (
        SELECT grp, h, row_number() OVER (
            PARTITION BY grp ORDER BY h) AS rank
        FROM gkeyed),
    gsk AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_kept,
                   max(h) AS hk
            FROM granked WHERE rank <= {_GK} GROUP BY grp),
    gex AS (SELECT event_type AS grp, CAST(count(DISTINCT COALESCE(
                CAST(user_id AS VARCHAR), chr(0))) AS BIGINT) AS exact_n
            FROM events GROUP BY event_type)
    SELECT 'global' AS facet, CAST(NULL AS VARCHAR) AS grp,
           CAST(NULL AS BIGINT) AS rank, CAST(NULL AS BIGINT) AS h,
           gl.n_kept, round({est_expr}, 6) AS est, ex.exact_n
    FROM gl, ex
    UNION ALL
    SELECT 'head', CAST(NULL AS VARCHAR), rank, h,
           CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
           CAST(NULL AS BIGINT)
    FROM sk WHERE rank <= {_GHEAD}
    UNION ALL
    SELECT 'group', g.grp, CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           g.n_kept, round({est_expr}, 6) AS est, x.exact_n
    FROM gsk g JOIN gex x ON g.grp IS NOT DISTINCT FROM x.grp
    """


@query("kmv_distinct_estimate", oracle=_sql_kmv())
def kmv_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the KMV family, three facets over events.user_id:
    ``global`` — the sketch built as a TWO-HALF MERGE (event_id
    parity split) against the oracle's one-shot build, estimate next
    to the exact distinct count; ``head`` — the first 8 sketch hashes
    value-pinned (hash algebra + k-smallest order); ``group`` — per
    event_type estimates through the banded-cutoff group build vs the
    naive per-group window. Registered PAST the driver's 50-slot
    window (``__spark_entry__._PAST_WINDOW``)."""
    ev = load_tables(spark, sf_dir, ("events",))["events"] \
        .select("event_id", "user_id", "event_type")
    halves = [kmv_build(ev.where(F.col("event_id") % 2 == i),
                        "user_id", k=_GK) for i in (0, 1)]
    sketch = kmv_merge(*halves, k=_GK)

    nulls = (F.lit(None).cast("long").alias("n_kept"),
             F.lit(None).cast("double").alias("est"),
             F.lit(None).cast("long").alias("exact_n"))
    exact = ev.agg(F.count_distinct(_kmv_key("user_id"))
                   .cast("long").alias("exact_n"))
    glob = (kmv_estimate(sketch, k=_GK).crossJoin(exact)   # 1 row × 1 row
            .select(F.lit("global").alias("facet"),
                    F.lit(None).cast("string").alias("grp"),
                    F.lit(None).cast("long").alias("rank"),
                    F.lit(None).cast("long").alias("h"),
                    "n_kept", "est", "exact_n"))
    head = (sketch.withColumn(
                "rank", F.row_number().over(Window.orderBy("h"))
                         .cast("long"))                    # ≤ k-row frame
            .where(F.col("rank") <= _GHEAD)
            .select(F.lit("head").alias("facet"),
                    F.lit(None).cast("string").alias("grp"),
                    "rank", "h", *nulls))
    gex = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count_distinct(_kmv_key("user_id")).cast("long")
        .alias("exact_n"))
    gest = kmv_group_estimate(
        kmv_group_build(ev, "event_type", "user_id", k=_GK), k=_GK)
    grp = (gest.join(gex, gest["grp"].eqNullSafe(gex["grp"]))
           .select(F.lit("group").alias("facet"),
                   gest["grp"].alias("grp"),
                   F.lit(None).cast("long").alias("rank"),
                   F.lit(None).cast("long").alias("h"),
                   "n_kept", "est", "exact_n"))
    return glob.unionByName(head).unionByName(grp)


_SETK = 256
_SETH = sql_keyed_h60("'kmv:'",
                      "COALESCE(CAST(l_orderkey AS VARCHAR), chr(0))")


def _sql_kmv_set() -> str:
    """DuckDB twin of the set-operation gate: both sketches built
    naively (ranked windows), k-smallest union, IN-subquery
    membership — the identical estimator algebra."""
    return f"""
    WITH ka AS (SELECT DISTINCT ({_SETH}) AS h FROM lineitem
                WHERE l_returnflag = 'A'),
    ska AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h)
                           AS r FROM ka) WHERE r <= {_SETK}),
    kb AS (SELECT DISTINCT ({_SETH}) AS h FROM lineitem
           WHERE l_returnflag = 'R'),
    skb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h)
                           AS r FROM kb) WHERE r <= {_SETK}),
    un AS (SELECT DISTINCT h FROM (SELECT h FROM ska
                                   UNION ALL SELECT h FROM skb)),
    sku AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h)
                           AS r FROM un) WHERE r <= {_SETK}),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_kept, max(h) AS hk
              FROM sku),
    rho_ AS (SELECT CAST(count(*) AS BIGINT) AS rho FROM sku
             WHERE h IN (SELECT h FROM ska)
               AND h IN (SELECT h FROM skb)),
    fin AS (SELECT s.n_kept, r.rho,
                   CASE WHEN s.n_kept < {_SETK}
                        THEN s.n_kept ELSE {_SETK} END AS denom,
                   round(CASE WHEN s.n_kept < {_SETK}
                              THEN CAST(s.n_kept AS DOUBLE)
                              ELSE {_SETK - 1}.0 * POW(2.0, 60)
                                   / CAST(s.hk AS DOUBLE) END,
                         6) AS union_est
            FROM stats s, rho_ r),
    jac AS (SELECT n_kept, rho, union_est,
                   CASE WHEN denom > 0 THEN
                        ((2 * rho * 1000000 + denom) // (2 * denom))
                        / 1000000.0 END AS jaccard
            FROM fin)
    SELECT n_kept, rho, jaccard, union_est,
           round(jaccard * union_est, 6) AS inter_est
    FROM jac
    """


@query("kmv_set_overlap", oracle=_sql_kmv_set())
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for KMV set operations: the returnflag-A and
    returnflag-R order-key sets of lineitem (large, genuinely
    partially-overlapping subsets), k = 256 — union-sketch size, the
    exact sketch-membership intersection count rho, the half-up
    Jaccard ratio, and the union/intersection cardinality estimates
    all value-pinned against DuckDB building both sketches one-shot.
    Registered PAST the driver's 50-slot window."""
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"] \
        .select("l_orderkey", "l_returnflag")
    a = kmv_build(li.where(F.col("l_returnflag") == "A"),
                  "l_orderkey", k=_SETK)
    b = kmv_build(li.where(F.col("l_returnflag") == "R"),
                  "l_orderkey", k=_SETK)
    return kmv_set_estimates(a, b, k=_SETK)

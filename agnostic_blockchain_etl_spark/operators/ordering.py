"""Deterministic training order — the last step between a curated
corpus and a data loader: give every document a stable GLOBAL position
(a reproducible corpus-wide shuffle) and, optionally, a
source-interleaved position that prevents long same-source runs (a
shuffled corpus can still hand a trainer thousands of consecutive
docs from one crawl snapshot; round-robin interleaving by source
bounds that run length by the number of live sources — the standard
heterogeneous-mixture loader discipline).

Order is a pure function of doc_id (salted md5, `corpus._salted_h60`),
never ``rand()`` — re-runs, engines, and partitionings agree, and the
shuffle is reproducible from the salt alone (new epoch = new salt).

Scale shape — the point of this module: a global position is
``row_number() OVER (ORDER BY hash)``, which plans as ONE window
partition holding the entire corpus (the same single-task hotspot
`corpus.token_budget_cap` refuses for running sums). Both operators
here compute exact global ranks with the two-level bucketed form
instead: a monotone bucket key splits the order into ≤ ``n_buckets``
contiguous ranges, per-bucket COUNTS (a ≤ n_buckets-row summary) give
cumulative offsets via one bounded window, and each row's global rank
is its bucket offset + its within-bucket row_number — every window
partition holds ~1/n_buckets of the data, bounded by the knob. The
`training_order_global` oracle pair proves the two-level ranks equal
the naive one-level windows value-for-value.

Reference: no counterpart (the reference orders within partitions via
ClickHouse ORDER BY); LLM-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables

QUERIES, ORACLES, query = make_registry()

_DEFAULT_BUCKETS = 4096


def _check_buckets(n_buckets: int) -> None:
    if n_buckets & (n_buckets - 1) or n_buckets <= 0:
        raise ValueError(f"n_buckets must be a power of two, "
                         f"got {n_buckets}")


def _bucketed_rank(d: DataFrame, bucket: Column, order_cols: list,
                   out_col: str) -> DataFrame:
    """Exact global row_number over ``order_cols`` WITHOUT a global
    window: ``bucket`` must be monotone in the order (same order key →
    same bucket) with boundedly many values. Offsets come from the
    ≤ n_buckets-row count summary (its window is over that summary,
    never the data); within-bucket ranks partition by bucket."""
    d = d.withColumn("__bk", bucket)
    woff = Window.orderBy("__bk") \
                 .rowsBetween(Window.unboundedPreceding, -1)
    offsets = (d.groupBy("__bk").agg(F.count("*").alias("__c"))
               .select("__bk",
                       F.coalesce(F.sum("__c").over(woff),
                                  F.lit(0)).alias("__off")))
    wrow = Window.partitionBy("__bk").orderBy(*order_cols)
    return (d.join(F.broadcast(offsets), "__bk")
            .withColumn(out_col,
                        (F.col("__off") + F.row_number().over(wrow))
                        .cast("long"))
            .drop("__bk", "__off"))


def global_order_index(docs: DataFrame, *, salt: str = "order:",
                       n_buckets: int = _DEFAULT_BUCKETS,
                       id_col: str = "doc_id",
                       out_col: str = "ord") -> DataFrame:
    """The reproducible corpus shuffle: global position 1..N in salted
    hash order (ties impossible — ``id_col`` breaks them). The hash's
    top bits are the bucket key (monotone by construction), so the
    rank is exact and every window partition is ~N/n_buckets."""
    _check_buckets(n_buckets)
    from .hashing import keyed_h60
    shift = 60 - n_buckets.bit_length() + 1
    d = docs.withColumn("__h",
                        keyed_h60(salt, F.col(id_col).cast("string")))
    out = _bucketed_rank(d, F.shiftright("__h", shift).cast("int"),
                         [F.col("__h"), F.col(id_col)], out_col)
    return out.drop("__h")


def _grouped_rank(docs: DataFrame, group_col: str, salt: str,
                  n_buckets: int, id_col: str,
                  rank_col: str) -> DataFrame:
    """Exact within-group rank in salted hash order WITHOUT whole-group
    window partitions: per-(group, bucket) counts give per-group
    offsets (a ≤ |groups|×n_buckets summary — the `token_budget_cap`
    shape), and row ranks partition by (group, bucket). A NULL group
    is a group like any other (null-safe offsets join)."""
    from .hashing import keyed_h60
    shift = 60 - n_buckets.bit_length() + 1
    d = docs.withColumn("__h",
                        keyed_h60(salt, F.col(id_col).cast("string"))) \
            .withColumn("__bk", F.shiftright("__h", shift).cast("int"))
    counts = (d.groupBy(F.col(group_col).alias("__g"), "__bk")
              .agg(F.count("*").alias("__c")))
    wg = Window.partitionBy("__g").orderBy("__bk") \
               .rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "__g", F.col("__bk").alias("__ob"),
        F.coalesce(F.sum("__c").over(wg), F.lit(0)).alias("__off"))
    wrow = Window.partitionBy(group_col, "__bk") \
                 .orderBy("__h", id_col)
    return (d.join(F.broadcast(offsets),
                   F.col(group_col).eqNullSafe(F.col("__g"))
                   & (F.col("__bk") == F.col("__ob")))
            .withColumn(rank_col,
                        (F.col("__off") + F.row_number().over(wrow))
                        .cast("long"))
            .drop("__bk", "__ob", "__g", "__off", "__h"))


def interleaved_order_index(docs: DataFrame, *,
                            group_col: str = "source",
                            salt: str = "ilv:",
                            n_buckets: int = _DEFAULT_BUCKETS,
                            id_col: str = "doc_id",
                            rank_col: str = "src_rank",
                            out_col: str = "ord_ilv") -> DataFrame:
    """Source-interleaved training order: rank docs within each group
    by salted hash (``rank_col``), then order globally by (rank,
    group) — position r of every group comes before position r+1 of
    any group, so same-source run length is bounded by the live group
    count. Two two-level ranks:

    1. within-group rank — per-(group, bucket) counts give per-group
       offsets (a ≤ |groups|×n_buckets summary, the
       `token_budget_cap` shape); window partitions are (group,
       bucket), never a whole group;
    2. global rank over (rank, group, id) — bucket =
       ``(r-1)·n_buckets // max_r`` (monotone in r, same r → same
       bucket; ``max_r`` is a 1-row collect), so no single-partition
       window over the corpus there either.

    A NULL group is a group like any other (null-safe keys, matching
    the composition family's NULL-stratum tolerance)."""
    _check_buckets(n_buckets)
    ranked = _grouped_rank(docs, group_col, salt, n_buckets, id_col,
                           rank_col)
    # max rank == largest group's row count: read it off a cheap
    # count aggregate over docs, NOT off `ranked` — an action on the
    # ranked lineage would execute the whole grouped-rank pipeline a
    # second time when the result is consumed (review finding)
    max_r = (docs.groupBy(group_col).count()
             .agg(F.max("count")).collect()[0][0]) or 1   # 1-row
    bucket2 = ((F.col(rank_col) - 1) * n_buckets / F.lit(max_r)) \
        .cast("int")
    # group tie-break pinned NULLS FIRST on BOTH engines: Spark's ASC
    # default is nulls-first, DuckDB's is nulls-last — an unpinned
    # NULL group would silently diverge from the oracle (the module
    # advertises NULL groups as first-class)
    return _bucketed_rank(ranked, bucket2,
                          [F.col(rank_col),
                           F.col(group_col).asc_nulls_first(),
                           F.col(id_col)], out_col)


def stratified_split_exact(docs: DataFrame,
                           splits: dict[str, int], *,
                           strat_col: str = "lang",
                           rest: str = "train",
                           salt: str = "split-exact:",
                           n_buckets: int = _DEFAULT_BUCKETS,
                           id_col: str = "doc_id",
                           rank_col: str = "split_rank",
                           out_col: str = "split") -> DataFrame:
    """EXACT-count per-stratum splits — "carve 500 val + 500 test docs
    per language, rest train" (the frozen-snapshot heldout recipe):
    the first ``splits[name1]`` docs of each stratum in salted hash
    order go to ``name1``, the next ``splits[name2]`` to ``name2``
    (dict order is assignment order), remainder to ``rest``. A
    stratum smaller than the cumulative thresholds fills splits in
    order and leaves later ones short (never errors — the gate covers
    that boundary).

    vs. `corpus_sampling_facets`' hash-threshold split: that one is
    PROPORTIONAL and stable under corpus growth (new rows never move
    old ones); this one is EXACT-count but a grown corpus re-ranks —
    use it on release snapshots, not on live accumulation (docstring
    contract, same trade-off `token_budget_cap` documents for its
    boundary). Scale: one `_grouped_rank` (two-level, bounded window
    partitions) + a literal CASE — no data-sized joins."""
    _check_buckets(n_buckets)
    if not splits or any(int(v) < 0 for v in splits.values()):
        raise ValueError(f"splits must be non-empty with non-negative "
                         f"counts, got {splits!r}")
    ranked = _grouped_rank(docs, strat_col, salt, n_buckets, id_col,
                           rank_col)
    expr = None
    cum = 0
    for name, n in splits.items():
        cum += int(n)
        cond = F.col(rank_col) <= cum
        expr = F.when(cond, name) if expr is None \
            else expr.when(cond, name)
    return ranked.withColumn(out_col, expr.otherwise(rest))


def curriculum_order_index(docs: DataFrame, *, score_col: str,
                           n_stages: int = 4, salt: str = "curr:",
                           n_buckets: int = _DEFAULT_BUCKETS,
                           id_col: str = "doc_id",
                           stage_col: str = "stage",
                           rank_col: str = "curr_rank",
                           out_col: str = "ord_curr") -> DataFrame:
    """Curriculum training order (Bengio et al. 2009): partition the
    corpus into ``n_stages`` equal difficulty stages by ``score_col``
    (ascending — easy first; stage ``s`` holds exact global ranks
    ``(s·N/n_stages, (s+1)·N/n_stages]``), then SHUFFLE within each
    stage (salted hash — anneal difficulty across training without
    feeding the loader a fully sorted stream, which would correlate
    adjacent batches). NULL scores are flag-don't-drop: they rank
    after every scored doc (both engines pin NULLS LAST) and fill the
    final stage.

    Scale shape: the difficulty rank is a two-level bucketed rank whose
    bucket key is ``width_bucket`` over the collected (min, max) — a
    1-row collect; a pathological distribution (every score equal)
    degenerates to one bucket, the documented `max_bucket_size`-class
    boundary, never a wrong answer. The final position is a second
    two-level rank over (stage, hash) — bucket = stage × hash-bucket,
    bounded by ``n_stages × n_buckets``. No corpus-wide window
    partition exists in either step; N is one count aggregate."""
    _check_buckets(n_buckets)
    if n_stages < 1:
        raise ValueError(f"n_stages must be >= 1, got {n_stages}")
    from .hashing import keyed_h60
    sc = F.col(score_col)
    lo, hi = docs.agg(F.min(score_col), F.max(score_col)).collect()[0]
    if lo is None or lo == hi:        # all-NULL or all-equal scores
        bucket1 = F.when(sc.isNull(), F.lit(2)).otherwise(F.lit(1))
    else:
        bucket1 = F.when(sc.isNull(), F.lit(n_buckets + 3)) \
            .otherwise(F.width_bucket(sc, F.lit(lo), F.lit(hi),
                                      F.lit(n_buckets)))
    ranked = _bucketed_rank(docs, bucket1.cast("int"),
                            [sc.asc_nulls_last(), F.col(id_col)],
                            rank_col)
    n = docs.count() or 1             # 1-row action
    stage = F.call_function(
        "div", (F.col(rank_col) - 1) * n_stages, F.lit(n)).cast("int")
    d = (ranked.withColumn(stage_col, stage)
         .withColumn("__h", keyed_h60(salt,
                                      F.col(id_col).cast("string"))))
    shift = 60 - n_buckets.bit_length() + 1
    bucket2 = (F.col(stage_col).cast("long") * n_buckets
               + F.shiftright("__h", shift)).cast("long")
    out = _bucketed_rank(d, bucket2,
                         [F.col(stage_col), F.col("__h"),
                          F.col(id_col)], out_col)
    return out.drop("__h")


# ---------------------------------------------------------------------------
# Gate query + DuckDB oracle (the naive one-level windows)
# ---------------------------------------------------------------------------


def _oracle() -> str:
    from .corpus import _sql_salted_h60
    return f"""
    WITH h AS (
        SELECT doc_id, source,
               {_sql_salted_h60('order:')} AS h1,
               {_sql_salted_h60('ilv:')}   AS h2
        FROM documents),
    o AS (
        SELECT doc_id, source,
               row_number() OVER (ORDER BY h1, doc_id)     AS ord,
               row_number() OVER (PARTITION BY source
                                  ORDER BY h2, doc_id)     AS src_rank
        FROM h)
    SELECT doc_id, source, CAST(ord AS BIGINT) AS ord,
           CAST(src_rank AS BIGINT) AS src_rank,
           CAST(row_number() OVER (ORDER BY src_rank,
                                   source NULLS FIRST, doc_id)
                AS BIGINT) AS ord_ilv
    FROM o
    """


@query("training_order_global", oracle=_oracle())
def training_order_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate row for the training-order family: the reproducible global
    shuffle position AND the source-interleaved position of every
    document, both computed via the two-level bucketed rank, verified
    value-for-value against DuckDB's NAIVE one-level windows (one
    global ``row_number`` + one per-source partition — exactly the
    plans the operators refuse at scale). Registered PAST the
    driver's 50-slot window (``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "source")
    d = global_order_index(d)
    d = interleaved_order_index(d)
    return d.select("doc_id", "source", "ord", "src_rank", "ord_ilv")


_SPLITS = {"val": 40, "test": 40}    # per-stratum; sf0.001 strata hold
#                                      ~10 docs -> the short-stratum
#                                      boundary runs under the oracle


def _split_oracle() -> str:
    from .corpus import _sql_salted_h60
    return f"""
    WITH h AS (
        SELECT doc_id, lang, {_sql_salted_h60('split-exact:')} AS h
        FROM documents),
    r AS (
        SELECT doc_id, lang,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY h, doc_id) AS r
        FROM h)
    SELECT doc_id, lang, CAST(r AS BIGINT) AS split_rank,
           CASE WHEN r <= 40 THEN 'val'
                WHEN r <= 80 THEN 'test'
                ELSE 'train' END AS split
    FROM r
    """


_N_STAGES = 4


def _curriculum_oracle() -> str:
    from .corpus import _sql_salted_h60
    return f"""
    WITH h AS (
        SELECT doc_id, n_chars, {_sql_salted_h60('curr:')} AS h
        FROM documents),
    r AS (
        SELECT doc_id, n_chars, h,
               row_number() OVER (ORDER BY n_chars ASC NULLS LAST,
                                  doc_id) AS cr,
               COUNT(*) OVER () AS n
        FROM h),
    s AS (
        SELECT doc_id, cr, h,
               ((cr - 1) * {_N_STAGES}) // n AS stage
        FROM r)
    SELECT doc_id, CAST(stage AS INT) AS stage,
           CAST(cr AS BIGINT) AS curr_rank,
           CAST(row_number() OVER (ORDER BY stage, h, doc_id)
                AS BIGINT) AS ord_curr
    FROM s
    """


@query("curriculum_order", oracle=_curriculum_oracle())
def curriculum_order_gate(spark: SparkSession,
                          sf_dir: str) -> DataFrame:
    """Gate row for `curriculum_order_index`: documents staged easy→
    hard by ``n_chars`` (the cheap difficulty proxy — short docs
    first) into 4 stages, shuffled within stage, every (stage, rank,
    position) verified against DuckDB's naive one-level windows (one
    global difficulty ``row_number`` + one global position window —
    the plans the operator refuses at scale). Registered past the
    50-slot gate window (``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "n_chars")
    out = curriculum_order_index(d, score_col="n_chars",
                                 n_stages=_N_STAGES)
    return out.select("doc_id", "stage", "curr_rank", "ord_curr")


@query("stratified_split_exact", oracle=_split_oracle())
def stratified_split_exact_gate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Gate row for `stratified_split_exact`: 40 val + 40 test per
    language, rest train — per-doc split assignment AND stratum rank
    verified against DuckDB's naive per-stratum window (the
    one-partition-per-stratum plan the operator refuses). At sf0.001
    every stratum is SMALLER than the val threshold (the
    short-stratum fill boundary); at sf0.01+ all three splits
    populate. Registered PAST the driver's 50-slot window
    (``__spark_entry__._PAST_WINDOW``)."""
    t = load_tables(spark, sf_dir, ("documents",))
    d = t["documents"].select("doc_id", "lang")
    return stratified_split_exact(d, _SPLITS) \
        .select("doc_id", "lang", "split_rank", "split")

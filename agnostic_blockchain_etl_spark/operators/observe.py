"""Corpus observability: the aggregate diagnostics a 100 TB training-
data pipeline runs BETWEEN builds — has the ingest distribution
drifted, which sources copy from each other, how efficiently does the
packed stream use its budget. Each operator reduces the corpus to a
bounded report frame (vocabulary-, |sources|²-, or |shards|-sized);
none ever returns a data-sized result.

- `corpus_js_divergence`: Jensen-Shannon divergence (in bits) between
  two corpora's unigram distributions — the standard symmetric,
  bounded [0, 1] drift score (Lin 1991) a crawl-ops dashboard tracks
  between ingest days or before/after a filter change. One token-count
  aggregation per side (map-side combined), one vocabulary-sized
  full-outer join; the corpus text is scanned exactly once per side.
- `source_overlap_matrix`: which sources near-duplicate each other —
  the MinHash-LSH verified pairs (`dedup.minhash_lsh_pairs`, the
  banded join that never goes all-pairs) aggregated into a
  (source_a, source_b) matrix with pair counts and mean Jaccard; the
  licensing/provenance question ("how much of source X is source Y?")
  as one bounded frame. Pairs are the small side of every join here.
- `pack_efficiency_report`: per-output-shard packing utilization of a
  `corpus.pack_sequences` frame — packs, chunks, tokens, boundary
  spill, and tokens/capacity — the number that says whether the
  packing budget and chunking stride waste accelerator steps. One
  aggregation over the already-packed frame, |shards| rows out.

Reference: no counterpart (the reference has no corpus-analytics
surface); LLM-data-pipeline mandate, sibling of `zipf.py`'s
language-shape diagnostics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables, spread

QUERIES, ORACLES, query = make_registry()


def unigram_histogram(docs: DataFrame, *,
                      text_col: str = "text") -> DataFrame:
    """``(term, n)`` unigram counts under the engine token convention
    (``split(lower(trim(text)), '\\s+')``; NULL text contributes no
    terms). Map-side combined — the shuffle is vocabulary-sized. The
    tokenize+explode scan is CPU-heavy per row, so the input is
    `spread()` (single-row-group parquet otherwise runs it one-core —
    the measured winnow/zipf failure shape; streaming batch frames
    pass through untouched)."""
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    return (spread(docs).select(F.explode(words).alias("term"))
            .groupBy("term").agg(F.count("*").alias("n")))


def merge_histograms(*hists: DataFrame) -> DataFrame:
    """Fold any number of `unigram_histogram` frames into one: counts
    sum per term — merge(hist(A), hist(B)) == hist(A ∪ B) exactly, the
    store family's merge contract (a growing corpus keeps an exact
    global histogram without ever re-scanning history)."""
    if not hists:
        raise ValueError("need at least one histogram")
    u = hists[0].select("term", "n")
    for h in hists[1:]:
        u = u.unionByName(h.select("term", "n"))
    return u.groupBy("term").agg(F.sum("n").alias("n"))


def jsd_from_histograms(hp: DataFrame, hq: DataFrame) -> DataFrame:
    """`corpus_js_divergence` with the two sides already reduced to
    ``(term, n)`` histograms — the incremental path: compare a stored
    cumulative histogram (`merge_histograms` of per-batch deltas)
    against a reference WITHOUT rescanning either corpus. An empty
    side is guarded (its distribution is all-zero, never a 0/0 ANSI
    error): only the other side's KL term survives, so jsd_bits reads
    0.5 — and 0.0 when both sides are empty of terms."""
    j = (hp.select("term", F.col("n").alias("p_n"))
         .join(hq.select("term", F.col("n").alias("q_n")),
               "term", "full_outer")
         .select("term",
                 F.coalesce("p_n", F.lit(0)).alias("p_n"),
                 F.coalesce("q_n", F.lit(0)).alias("q_n")))
    w = Window.partitionBy()    # vocabulary-sized frame — see module doc
    tot = j.select("p_n", "q_n",
                   F.sum("p_n").over(w).alias("tp"),
                   F.sum("q_n").over(w).alias("tq"))
    # ANSI-safe: an empty side has tp/tq = 0 — its p is 0, not 0/0
    pq = tot.select(
        "p_n", "q_n",
        F.when(F.col("tp") > 0, F.col("p_n") / F.col("tp"))
         .otherwise(F.lit(0.0)).alias("p"),
        F.when(F.col("tq") > 0, F.col("q_n") / F.col("tq"))
         .otherwise(F.lit(0.0)).alias("q"))
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    probs = pq.select(
        "p_n", "q_n",
        F.when(F.col("p_n") > 0, F.col("p") * F.log(F.col("p") / m))
         .otherwise(F.lit(0.0)).alias("kp"),
        F.when(F.col("q_n") > 0, F.col("q") * F.log(F.col("q") / m))
         .otherwise(F.lit(0.0)).alias("kq"))
    # every column coalesced: aggregating the EMPTY joined frame (both
    # sides term-free) must yield a defined (0, 0, 0, 0.0) row, not
    # NULL counts (r11 self-review finding #5)
    return probs.agg(
        F.coalesce(F.sum(F.when(F.col("p_n") > 0, 1).otherwise(0)),
                   F.lit(0)).cast("long").alias("n_terms_p"),
        F.coalesce(F.sum(F.when(F.col("q_n") > 0, 1).otherwise(0)),
                   F.lit(0)).cast("long").alias("n_terms_q"),
        F.coalesce(F.sum(F.when((F.col("p_n") > 0) & (F.col("q_n") > 0),
                                1).otherwise(0)),
                   F.lit(0)).cast("long").alias("n_shared"),
        F.round(F.coalesce(
            (F.lit(0.5) * F.sum("kp") + F.lit(0.5) * F.sum("kq"))
            / F.log(F.lit(2.0)), F.lit(0.0)), 6).alias("jsd_bits"))


def corpus_js_divergence(p_docs: DataFrame, q_docs: DataFrame, *,
                         text_col: str = "text") -> DataFrame:
    """One-row report: ``(n_terms_p, n_terms_q, n_shared, jsd_bits)``
    — the Jensen-Shannon divergence between the two corpora's unigram
    distributions, in bits (base-2; 0 = identical, 1 = disjoint).

    JSD = ½·KL(P‖M) + ½·KL(Q‖M) with M = (P+Q)/2; zero-probability
    terms contribute 0 to their side's KL (the 0·ln 0 convention), and
    a term private to one side contributes p·ln 2 — the quantity is
    always finite, which is why JSD (not KL) is the drift metric of
    choice between corpora with non-identical vocabularies.

    Scale: two histogram aggregations + a vocabulary-sized full-outer
    join; the normalization window runs over the joined VOCABULARY
    frame, never the corpus. Rounded to 6 decimals (order-insensitive
    cross-engine, the repo's log-sum precedent). The histogram halves
    are the mergeable store artifact — see `jsd_from_histograms` /
    `merge_histograms` for the day-N path and
    `streaming.dedup.drift_monitor_stream` for the stream form."""
    return jsd_from_histograms(
        unigram_histogram(p_docs, text_col=text_col),
        unigram_histogram(q_docs, text_col=text_col))


@query("corpus_js_divergence", oracle="""
    WITH hp AS (
        SELECT term, count(*) AS p_n FROM (
            SELECT unnest(string_split_regex(lower(trim(text)),
                                             '\\s+')) AS term
            FROM documents WHERE doc_id % 2 = 0) GROUP BY term),
    hq AS (
        SELECT term, count(*) AS q_n FROM (
            SELECT unnest(string_split_regex(lower(trim(text)),
                                             '\\s+')) AS term
            FROM documents WHERE doc_id % 2 = 1) GROUP BY term),
    j AS (
        SELECT coalesce(hp.term, hq.term) AS term,
               coalesce(p_n, 0) AS p_n, coalesce(q_n, 0) AS q_n
        FROM hp FULL OUTER JOIN hq ON hp.term = hq.term),
    tot AS (
        SELECT p_n, q_n,
               SUM(p_n) OVER () AS tp, SUM(q_n) OVER () AS tq
        FROM j),
    pq AS (
        SELECT p_n, q_n,
               CASE WHEN tp > 0 THEN p_n / tp ELSE 0.0 END AS p,
               CASE WHEN tq > 0 THEN q_n / tq ELSE 0.0 END AS q
        FROM tot),
    probs AS (
        SELECT p_n, q_n,
               CASE WHEN p_n > 0 THEN p * ln(p / ((p + q) / 2.0))
                    ELSE 0.0 END AS kp,
               CASE WHEN q_n > 0 THEN q * ln(q / ((p + q) / 2.0))
                    ELSE 0.0 END AS kq
        FROM pq)
    SELECT CAST(coalesce(SUM(CASE WHEN p_n > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_terms_p,
           CAST(coalesce(SUM(CASE WHEN q_n > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_terms_q,
           CAST(coalesce(SUM(CASE WHEN p_n > 0 AND q_n > 0
                                  THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_shared,
           round(coalesce((0.5 * SUM(kp) + 0.5 * SUM(kq)) / ln(2.0),
                          0.0), 6) AS jsd_bits
    FROM probs
""")
def corpus_js_divergence_gate(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """Gate form of `corpus_js_divergence`: the documents corpus split
    in two deterministic halves (doc_id parity — the 'day 1 vs day 2'
    drift question), divergence value-pinned. Registered past the
    50-slot gate window (``__spark_entry__._PAST_WINDOW``)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return corpus_js_divergence(docs.where(F.col("doc_id") % 2 == 0),
                                docs.where(F.col("doc_id") % 2 == 1))


def stratum_divergence_report(docs: DataFrame, *,
                              strat_col: str = "source",
                              text_col: str = "text") -> DataFrame:
    """``(stratum, n_terms, jsd_bits)`` — each stratum's Jensen-Shannon
    divergence against the WHOLE corpus's unigram distribution: the
    "which source is distributionally anomalous" ranking a crawl-ops
    review starts from (a source of boilerplate, a mis-tagged
    language, or an ingest bug shows up as the jsd_bits outlier).

    Correctness subtlety: each stratum's comparison frame must carry
    the FULL corpus vocabulary, not just the stratum's own terms — a
    term the stratum never uses still contributes q·ln 2 to the
    corpus-side KL (it is evidence of divergence). The frame is
    therefore the |strata| × |vocab| expansion of the per-stratum
    histogram — report-sized (bounded by two catalog cardinalities),
    never corpus-sized; the corpus text is scanned exactly once.

    Same algebra as `jsd_from_histograms`, windows partitioned by
    stratum; rounded to 6."""
    from .dedup import _scoped_cache

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # scoped-cached: g, strata and the expansion join all consume this
    # histogram — uncached, the tokenize+explode corpus scan ran three
    # times (3 Scan→Generate subtrees in the r11 before-plan). The
    # cache is the bounded |strata|×|vocab| report frame, never corpus.
    h = _scoped_cache(
        spread(docs)
        .select(F.col(strat_col).alias("stratum"),
                F.explode(words).alias("term"))
        .groupBy("stratum", "term").agg(F.count("*").alias("p_n")))
    g = h.groupBy("term").agg(F.sum("p_n").alias("q_n"))
    strata = h.select("stratum").distinct()
    full = (strata.crossJoin(g)                  # |strata| × |vocab|
            .join(h, ["stratum", "term"], "left")
            .select("stratum", "term",
                    F.coalesce("p_n", F.lit(0)).alias("p_n"), "q_n"))
    w = Window.partitionBy("stratum")
    tot = full.select(
        "stratum", "p_n", "q_n",
        F.sum("p_n").over(w).alias("tp"),
        F.sum("q_n").over(w).alias("tq"))
    pq = tot.select(
        "stratum", "p_n", "q_n",
        F.when(F.col("tp") > 0, F.col("p_n") / F.col("tp"))
         .otherwise(F.lit(0.0)).alias("p"),
        F.when(F.col("tq") > 0, F.col("q_n") / F.col("tq"))
         .otherwise(F.lit(0.0)).alias("q"))
    m = (F.col("p") + F.col("q")) / F.lit(2.0)
    probs = pq.select(
        "stratum", "p_n", "q_n",
        F.when(F.col("p_n") > 0, F.col("p") * F.log(F.col("p") / m))
         .otherwise(F.lit(0.0)).alias("kp"),
        F.when(F.col("q_n") > 0, F.col("q") * F.log(F.col("q") / m))
         .otherwise(F.lit(0.0)).alias("kq"))
    return (probs.groupBy("stratum")
            .agg(F.coalesce(F.sum(F.when(F.col("p_n") > 0, 1)
                                  .otherwise(0)), F.lit(0))
                 .cast("long").alias("n_terms"),
                 F.round(F.coalesce(
                     (F.lit(0.5) * F.sum("kp")
                      + F.lit(0.5) * F.sum("kq"))
                     / F.log(F.lit(2.0)), F.lit(0.0)), 6)
                 .alias("jsd_bits")))


@query("stratum_divergence_report", oracle="""
    WITH h AS (
        SELECT source AS stratum, term, count(*) AS p_n FROM (
            SELECT source,
                   unnest(string_split_regex(lower(trim(text)),
                                             '\\s+')) AS term
            FROM documents) GROUP BY 1, 2),
    g AS (SELECT term, SUM(p_n) AS q_n FROM h GROUP BY term),
    strata AS (SELECT DISTINCT stratum FROM h),
    fullv AS (
        SELECT s.stratum, g.term,
               coalesce(h.p_n, 0) AS p_n, g.q_n
        FROM strata s CROSS JOIN g
        LEFT JOIN h ON h.stratum = s.stratum AND h.term = g.term),
    tot AS (
        SELECT stratum, p_n, q_n,
               SUM(p_n) OVER (PARTITION BY stratum) AS tp,
               SUM(q_n) OVER (PARTITION BY stratum) AS tq
        FROM fullv),
    pq AS (
        SELECT stratum, p_n, q_n,
               CASE WHEN tp > 0 THEN p_n / tp ELSE 0.0 END AS p,
               CASE WHEN tq > 0 THEN q_n / tq ELSE 0.0 END AS q
        FROM tot),
    probs AS (
        SELECT stratum, p_n, q_n,
               CASE WHEN p_n > 0 THEN p * ln(p / ((p + q) / 2.0))
                    ELSE 0.0 END AS kp,
               CASE WHEN q_n > 0 THEN q * ln(q / ((p + q) / 2.0))
                    ELSE 0.0 END AS kq
        FROM pq)
    SELECT stratum,
           CAST(coalesce(SUM(CASE WHEN p_n > 0 THEN 1 ELSE 0 END), 0)
                AS BIGINT) AS n_terms,
           round(coalesce((0.5 * SUM(kp) + 0.5 * SUM(kq)) / ln(2.0),
                          0.0), 6) AS jsd_bits
    FROM probs GROUP BY stratum
""")
def stratum_divergence_report_gate(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    """Gate form of `stratum_divergence_report`: every source's
    divergence against the corpus-wide unigram distribution,
    value-pinned. Registered past the 50-slot gate window
    (``__spark_entry__._PAST_WINDOW``)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return stratum_divergence_report(docs)


def source_overlap_matrix(docs: DataFrame, *,
                          strat_col: str = "source",
                          max_bucket_size: int | None = None
                          ) -> DataFrame:
    """``(source_a, source_b, n_pairs, sum_jaccard, max_jaccard)`` —
    the verified MinHash-LSH near-dup pairs of the corpus rolled up by
    UNORDERED stratum pair (``source_a <= source_b``; the diagonal
    counts intra-source duplication). The provenance question — which
    sources copy from each other, and how strongly — as a bounded
    |sources|² frame; mean strength = ``sum_jaccard / n_pairs``.

    Why sum+max and not mean: the pair jaccards are round-4 grid
    values, so their MEAN lands exactly on .00005 decimal midpoints
    (any even n_pairs), where Spark's shortest-repr HALF_UP round and
    DuckDB's binary-value round disagree — a guaranteed cross-engine
    hash split, found at sf0.1. Sums and maxima of grid values stay
    ~k·ulp from a grid point, never near a midpoint — round-stable.

    Scale: candidate generation is `dedup.minhash_lsh_pairs`' banded
    equi-join (pass ``max_bucket_size`` for the 100 TB skew guard);
    the pair frame is match-sized and rides the small side of both
    stratum-lookup joins."""
    from .dedup import minhash_lsh_pairs
    pairs = minhash_lsh_pairs(docs.select("doc_id", "text"),
                              max_bucket_size=max_bucket_size)
    s = docs.select("doc_id", F.col(strat_col).alias("__s"))
    j = (pairs
         .join(s.select(F.col("doc_id").alias("doc_a"),
                        F.col("__s").alias("sa")), "doc_a")
         .join(s.select(F.col("doc_id").alias("doc_b"),
                        F.col("__s").alias("sb")), "doc_b"))
    return (j.select(F.least("sa", "sb").alias("source_a"),
                     F.greatest("sa", "sb").alias("source_b"),
                     "jaccard")
            .groupBy("source_a", "source_b")
            .agg(F.count("*").alias("n_pairs"),
                 F.round(F.sum("jaccard"), 4).alias("sum_jaccard"),
                 F.max("jaccard").alias("max_jaccard")))


def _sql_source_overlap() -> str:
    """DuckDB twin: the `dedup_minhash_lsh_pairs` oracle's CTE chain
    with the stratum rollup on top."""
    from .dedup import _JACCARD_THRESHOLD, _R, _SQL_MINHASH_BASE
    return _SQL_MINHASH_BASE + f"""
    , bands AS (
        SELECT doc_id, perm // {_R} AS band,
               md5(array_to_string(list(minhash ORDER BY perm), '-'))
                   AS bucket
        FROM sig GROUP BY doc_id, perm // {_R}),
    cand AS (
        SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bucket = y.bucket
         AND x.doc_id < y.doc_id),
    doc_sh AS (
        SELECT doc_id, shingle FROM shingles_t GROUP BY doc_id, shingle),
    sizes AS (SELECT doc_id, count(*) AS n FROM doc_sh GROUP BY doc_id),
    inter AS (
        SELECT c.doc_a, c.doc_b, count(*) AS n_common
        FROM cand c
        JOIN doc_sh sa ON sa.doc_id = c.doc_a
        JOIN doc_sh sb ON sb.doc_id = c.doc_b AND sa.shingle = sb.shingle
        GROUP BY c.doc_a, c.doc_b),
    pairs AS (
        SELECT i.doc_a, i.doc_b,
               round(CAST(i.n_common AS DOUBLE)
                     / (za.n + zb.n - i.n_common), 4) AS jaccard
        FROM inter i
        JOIN sizes za ON za.doc_id = i.doc_a
        JOIN sizes zb ON zb.doc_id = i.doc_b
        WHERE CAST(i.n_common AS DOUBLE) / (za.n + zb.n - i.n_common)
              >= {_JACCARD_THRESHOLD})
    SELECT least(da.source, db.source)    AS source_a,
           greatest(da.source, db.source) AS source_b,
           CAST(count(*) AS BIGINT)       AS n_pairs,
           round(sum(p.jaccard), 4)       AS sum_jaccard,
           max(p.jaccard)                 AS max_jaccard
    FROM pairs p
    JOIN documents da ON da.doc_id = p.doc_a
    JOIN documents db ON db.doc_id = p.doc_b
    GROUP BY 1, 2
    """


@query("source_overlap_matrix", oracle=_sql_source_overlap())
def source_overlap_matrix_gate(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Gate form of `source_overlap_matrix` over the testdata corpus
    at the dedup family's own LSH settings. Registered past the
    50-slot gate window (``__spark_entry__._PAST_WINDOW``)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return source_overlap_matrix(docs)


def pack_efficiency_report(packed: DataFrame) -> DataFrame:
    """``(shard, n_packs, n_chunks, n_tokens, spill_tokens,
    utilization)`` — per-output-shard packing efficiency of a
    `corpus.pack_sequences` frame. ``utilization`` is tokens over
    capacity (``n_packs × budget``; < 1 means the final pack of the
    stream runs short, the padding a loader pays), ``spill_tokens``
    sums each pack's boundary overhang (chunks straddling into the
    next pack — `pack_manifest`'s spill, totaled).

    The budget is read from the frame's own ``pack_budget`` column
    (`pack_sequences` always carries it) so the arithmetic can't
    desync from the packing run. One aggregation keyed by the packing
    keys, |shards| rows out."""
    if "pack_budget" not in packed.columns:
        raise ValueError("frame has no pack_budget column (not a "
                         "pack_sequences output?)")
    per_pack = (packed.groupBy("shard", "pack_id", "pack_budget")
                .agg(F.count("*").alias("n_chunks"),
                     F.sum("n_tokens").alias("n_tokens"),
                     F.greatest(
                         F.max(F.col("pack_offset") + F.col("n_tokens"))
                         - F.col("pack_budget"),
                         F.lit(0).cast("long")).alias("spill")))
    return (per_pack.groupBy("shard", "pack_budget")
            .agg(F.count("*").alias("n_packs"),
                 F.sum("n_chunks").cast("long").alias("n_chunks"),
                 F.sum("n_tokens").cast("long").alias("n_tokens"),
                 F.sum("spill").cast("long").alias("spill_tokens"))
            .select("shard", "n_packs", "n_chunks", "n_tokens",
                    "spill_tokens",
                    F.round(F.col("n_tokens").cast("double")
                            / (F.col("n_packs") * F.col("pack_budget"))
                              .cast("double"), 6).alias("utilization")))


def _sql_pack_efficiency() -> str:
    from .corpus import _PACK_BUDGET, _PACK_CTE_SQL
    return f"""
    WITH {_PACK_CTE_SQL},
    per_pack AS (
        SELECT shard, start_pos // {_PACK_BUDGET} AS pack_id,
               count(*) AS n_chunks, SUM(n_tokens) AS n_tokens,
               greatest(MAX(start_pos % {_PACK_BUDGET} + n_tokens)
                        - {_PACK_BUDGET}, 0) AS spill
        FROM pos GROUP BY 1, 2)
    SELECT CAST(shard AS INT) AS shard,
           count(*) AS n_packs,
           CAST(SUM(n_chunks) AS BIGINT) AS n_chunks,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
           CAST(SUM(spill) AS BIGINT) AS spill_tokens,
           round(CAST(SUM(n_tokens) AS DOUBLE)
                 / CAST(count(*) * {_PACK_BUDGET} AS DOUBLE), 6)
               AS utilization
    FROM per_pack GROUP BY shard
    """


@query("pack_efficiency_report", oracle=_sql_pack_efficiency())
def pack_efficiency_report_gate(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Gate form of `pack_efficiency_report` over the chunked + packed
    documents corpus (`chunk_pack_documents`' own pipeline), every
    shard's utilization and spill value-pinned. Registered past the
    50-slot gate window (``__spark_entry__._PAST_WINDOW``)."""
    from .corpus import chunk, pack_sequences
    t = load_tables(spark, sf_dir, ("documents",))
    return pack_efficiency_report(
        pack_sequences(chunk(spread(t["documents"]))))

"""Corpus-statistics diagnostics: Zipf rank-frequency law fit and
type-token ratio — the "does this corpus look like natural language?"
check a training-data pipeline runs before trusting a new source.
Natural text follows Zipf (log-frequency ≈ intercept + slope·log-rank
with slope ≈ −1 and high r²); template spam, log dumps, and
synthetic-corruption batches bend or flatten the curve, so the single
(slope, r²) pair is a cheap corpus-level quality gate next to the
per-document Gopher rules.

Scale design: term frequencies are one map-side-combined count; the
frequency RANK — the only global order in the operator — reuses
`ordering._bucketed_rank`'s two-level form with the frequency's log2
band as the monotone bucket, so no window partition ever holds the
whole vocabulary (the `token_budget_cap` / `training_order` shape;
the oracle is the NAIVE one-level window, making the gate the same
two-path exactness proof). The regression is a closed-form least
squares over five sums — one aggregation of the vocabulary-sized
frame, then 1-row arithmetic.

Reference: no counterpart; LLM-data-pipeline mandate, sibling of
`textstats` (per-document shape rules — this is the corpus-level
complement) and `corpus.vocab_tfidf_terms` (which ranks by TF-IDF,
not by the rank-frequency law).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .registry import make_registry
from .tables import load_tables, spread

QUERIES, ORACLES, query = make_registry()

_HEAD = 10      # ranked head rows the gate value-pins


def zipf_rank_frequencies(docs: DataFrame, *,
                          text_col: str = "text") -> DataFrame:
    """``(term, freq, rank)`` — corpus term frequencies with their
    exact frequency rank (1 = most frequent; ties break on term asc).
    The rank is a two-level bucketed row_number over the frequency's
    log2 band — exact, with every window partition bounded to one
    band of the vocabulary."""
    from .ordering import _bucketed_rank
    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    freqs = (spread(docs).select(F.explode(words).alias("term"))
             .groupBy("term").agg(F.count("*").alias("freq")))
    # monotone bucket: rank order is freq DESC, so the bucket must be
    # ascending in -freq; the negated log2 band is, and has boundedly
    # many values (≤ 64 bands for any corpus)
    band = (-F.floor(F.log2(F.col("freq")))).cast("int")
    return _bucketed_rank(freqs, band,
                          [F.col("freq").desc(), F.col("term")], "rank")


def corpus_zipf_stats(docs: DataFrame, *,
                      text_col: str = "text") -> DataFrame:
    """One row of corpus-level language-shape diagnostics:
    ``(n_tokens, vocab, slope, intercept, r2, ttr)`` — the least-
    squares fit of ln(freq) on ln(rank) over the whole vocabulary plus
    the type-token ratio. Degenerate corpora (vocabulary of one term,
    or all terms equally frequent) yield NULL fit columns rather than
    a divide-by-zero. Values round to 6 for cross-engine exactness."""
    return _fit(zipf_rank_frequencies(docs, text_col=text_col))


def _fit(rf: DataFrame) -> DataFrame:
    """Closed-form least squares of ln(freq) on ln(rank) over a
    `zipf_rank_frequencies` frame — split out so the gate can share
    ONE ranked frame between the fit and the head facet."""
    pts = rf.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("freq").cast("double")).alias("y"),
        "freq")
    s = pts.agg(F.count("*").cast("double").alias("n"),
                F.sum("x").alias("sx"), F.sum("y").alias("sy"),
                F.sum(F.col("x") * F.col("y")).alias("sxy"),
                F.sum(F.col("x") * F.col("x")).alias("sxx"),
                F.sum(F.col("y") * F.col("y")).alias("syy"),
                F.sum("freq").alias("n_tokens"))
    den_x = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    den_y = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    slope = F.when(den_x > 0.0, num / den_x)
    return s.select(
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n").cast("long").alias("vocab"),
        F.round(slope, 6).alias("slope"),
        F.round(F.when(den_x > 0.0,
                       (F.col("sy") - slope * F.col("sx")) / F.col("n")),
                6).alias("intercept"),
        F.round(F.when((den_x > 0.0) & (den_y > 0.0),
                       (num * num) / (den_x * den_y)), 6).alias("r2"),
        F.round(F.col("n") / F.col("n_tokens").cast("double"), 6)
         .alias("ttr"))


def _sql_zipf() -> str:
    """DuckDB twin: NAIVE one-level rank window + the identical
    closed-form regression — the two-path proof for the bucketed
    rank AND the fit algebra."""
    return f"""
    WITH words_t AS (
        SELECT unnest(string_split_regex(lower(trim(text)), '\\s+'))
                   AS term
        FROM documents WHERE text IS NOT NULL),
    freqs AS (SELECT term, CAST(count(*) AS BIGINT) AS freq
              FROM words_t GROUP BY term),
    ranked AS (SELECT term, freq,
                      CAST(row_number() OVER (
                          ORDER BY freq DESC, term) AS BIGINT) AS rank
               FROM freqs),
    pts AS (SELECT term, freq, rank,
                   ln(CAST(rank AS DOUBLE)) AS x,
                   ln(CAST(freq AS DOUBLE)) AS y
            FROM ranked),
    s AS (SELECT CAST(count(*) AS DOUBLE) AS n,
                 sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                 sum(x * x) AS sxx, sum(y * y) AS syy,
                 sum(freq) AS n_tokens
          FROM pts),
    fit AS (SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(n AS BIGINT) AS vocab,
                   round(CASE WHEN n * sxx - sx * sx > 0.0 THEN
                       (n * sxy - sx * sy) / (n * sxx - sx * sx)
                   END, 6) AS slope,
                   round(CASE WHEN n * sxx - sx * sx > 0.0 THEN
                       (sy - ((n * sxy - sx * sy)
                              / (n * sxx - sx * sx)) * sx) / n
                   END, 6) AS intercept,
                   round(CASE WHEN n * sxx - sx * sx > 0.0
                              AND n * syy - sy * sy > 0.0 THEN
                       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                       / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                   END, 6) AS r2,
                   round(n / CAST(n_tokens AS DOUBLE), 6) AS ttr
            FROM s)
    SELECT 'stats' AS facet, CAST(NULL AS VARCHAR) AS term,
           CAST(NULL AS BIGINT) AS freq, CAST(NULL AS BIGINT) AS rank,
           n_tokens, vocab, slope, intercept, r2, ttr
    FROM fit
    UNION ALL
    SELECT 'head', term, freq, rank,
           CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
           CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
    FROM ranked WHERE rank <= {_HEAD}
    """


@query("corpus_zipf_stats", oracle=_sql_zipf())
def corpus_zipf_stats_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate form: the 1-row fit PLUS the top-10 ranked head (facet
    union) — the head rows pin the two-level bucketed rank
    value-for-value against the naive window; the stats row pins the
    regression algebra."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    from .dedup import _scoped_cache
    rf = _scoped_cache(zipf_rank_frequencies(docs))  # vocab-sized
    stats = _fit(rf).select(
        F.lit("stats").alias("facet"),
        F.lit(None).cast("string").alias("term"),
        F.lit(None).cast("long").alias("freq"),
        F.lit(None).cast("long").alias("rank"),
        "n_tokens", "vocab", "slope", "intercept", "r2", "ttr")
    head = rf.where(F.col("rank") <= _HEAD) \
        .select(F.lit("head").alias("facet"), "term", "freq", "rank",
                F.lit(None).cast("long").alias("n_tokens"),
                F.lit(None).cast("long").alias("vocab"),
                F.lit(None).cast("double").alias("slope"),
                F.lit(None).cast("double").alias("intercept"),
                F.lit(None).cast("double").alias("r2"),
                F.lit(None).cast("double").alias("ttr"))
    return stats.unionByName(head)

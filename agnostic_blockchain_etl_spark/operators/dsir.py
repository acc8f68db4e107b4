"""DSIR-style data selection via importance resampling (Xie et al.
2023, arXiv:2302.03169 "Data Selection for Language Models via
Importance Resampling"): pick raw-corpus documents whose hashed-n-gram
distribution looks like a small TARGET domain — the standard recipe for
building a domain-matched pre-training subset from a 100 TB crawl.

The method in the paper's own terms:

1. featurize every document as a bag of hashed n-grams (unigrams +
   adjacent bigrams, hashed into ``B`` buckets);
2. fit two bag-of-buckets unigram distributions — ``p`` on the target
   set, ``q`` on the raw corpus (add-one smoothing over the B buckets);
3. each raw document's importance log-weight is
   ``Σ_features [ log p(b) − log q(b) ]``;
4. resample without replacement ∝ the importance weight via the
   Gumbel-top-k trick (entirely in the log domain, so extreme ratios
   cannot overflow).

Spark-first scale shape: the feature space is ``B`` hash buckets (a
knob, default 8192), so BOTH distributions are bounded B-row artifacts
— training each is one count shuffle densified against ``range(B)``;
scoring broadcasts the B-row log-ratio table and pays one
(doc_id)-keyed aggregation over the exploded features (the
`lm.perplexity_score` shape); selection is a global top-k, planned as
``TakeOrderedAndProject`` (per-partition heaps, never a full sort). No
Python anywhere — the feature hash is the corpus-wide portable 60-bit
md5 (`dedup._spark_hash60`), so every stage has an exact DuckDB twin
(differential-tested in tests/test_dsir.py).

Determinism: the Gumbel noise draws ``u`` as a pure hash of doc_id
(salt ``'dsir:'``) exactly like `corpus.weighted_sample` — membership
is reproducible across runs/engines/partitionings, and new corpus rows
never re-draw old ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _spark_hash60, _spark_words

_DEFAULT_BUCKETS = 8192


def _hashed_features(docs: DataFrame, buckets: int,
                     text_col: str = "text",
                     keep_cols: tuple = ()) -> DataFrame:
    """(doc_id, b[, *keep_cols]) — one row per token FEATURE (unigrams
    + adjacent bigrams, multiplicity kept: DSIR is a bag model), ``b``
    the portable 60-bit hash modulo ``buckets``. ``keep_cols`` rides
    extra per-doc columns through (e.g. a target-membership flag, so
    one featurization pass can serve both sides of an importance
    ratio — see `dsir_log_weights_gate`)."""
    # NO healing spread HERE: this is a shared primitive, and healing
    # belongs to the caller's shape. One-shot scoring scans win from it
    # (quality_classifier_score heals its input — 2.50 → 1.50 s at
    # sf0.1), but the TRAINING loop measured 1.8× WORSE with a spread
    # in this function (x_quality_train_score 6.6 → 11.8, interleaved
    # A/B, r11): the design frame is persisted once and iterated 40×,
    # so the healed lineage only adds partitions/tasks to every epoch's
    # stages while the one-core scan cost is paid once. DSIR's gate
    # caches one featurization pass and measured neutral either way.
    words = docs.select("doc_id", *keep_cols,
                        _spark_words(F.col(text_col)).alias("ws"))
    n = F.size("ws")
    bigrams = F.when(n >= 2, F.zip_with(
        F.slice("ws", 1, n - 1), F.slice("ws", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b))) \
        .otherwise(F.array().cast("array<string>"))
    return (words
            .select("doc_id", *keep_cols,
                    F.explode(F.concat(F.col("ws"), bigrams)).alias("g"))
            .select("doc_id", *keep_cols,
                    (_spark_hash60(F.col("g")) % buckets).alias("b")))


def hashed_bucket_logprobs(docs: DataFrame,
                           buckets: int = _DEFAULT_BUCKETS,
                           text_col: str = "text",
                           feats: DataFrame | None = None) -> DataFrame:
    """DENSE (b, logp) over all ``buckets`` buckets with add-one
    smoothing: ``p(b) = (c_b + 1) / (T + B)`` — every bucket has
    positive probability and the distribution sums to exactly 1, so
    log-ratios are always finite. One count shuffle + a B-row densify
    join; the output is a bounded broadcastable artifact (persist it to
    reuse a raw-corpus distribution across many target domains).
    ``feats``: pass a precomputed `_hashed_features` frame (same
    ``buckets``!) to skip the tokenize+hash pass — the caller owns the
    bucket-count consistency."""
    if feats is None:
        feats = _hashed_features(docs, buckets, text_col)
    counts = feats.groupBy("b").agg(F.count("*").alias("c"))
    spark = docs.sparkSession
    dense = (spark.range(buckets).toDF("b")
             .join(counts, "b", "left")
             .select("b", F.coalesce("c", F.lit(0)).alias("c")))
    tot = dense.agg(F.sum("c").alias("t"))
    return (dense.crossJoin(F.broadcast(tot))
            .select("b", F.log((F.col("c") + 1).cast("double") /
                               (F.col("t") + buckets)).alias("logp")))


def dsir_log_weights(raw_docs: DataFrame, target_docs: DataFrame,
                     buckets: int = _DEFAULT_BUCKETS,
                     text_col: str = "text",
                     per_token: bool = False,
                     raw_feats: DataFrame | None = None,
                     target_feats: DataFrame | None = None) -> DataFrame:
    """One row per raw document: ``(doc_id, n_feats, log_weight)`` with
    ``log_weight = Σ_features [ log p_target(b) − log p_raw(b) ]``
    (rounded to 6; the paper's importance log-ratio). Documents with no
    features (null text) score 0 — indistinguishable from either
    distribution. ``per_token=True`` divides by the feature count,
    scoring density instead of total evidence (long documents otherwise
    dominate both tails).

    Scale: the log-ratio table is B rows → broadcast; the raw corpus is
    scanned once; the only corpus-sized shuffle is the per-doc sum."""
    from .dedup import _scoped_cache
    # the raw corpus is featurized for BOTH its bucket distribution and
    # the per-doc scoring — cache the (doc_id, b) frame so the
    # tokenize+explode pass runs once (measured 3.07 s → one scan of
    # the two at sf0.1; the cache is feature rows, not text)
    # ``raw_feats``/``target_feats``: precomputed (and ideally cached)
    # `_hashed_features` frames at the SAME bucket count — when the
    # target is a subset of the raw pool, one tagged featurization pass
    # serves both sides (see the gate) instead of re-tokenizing the
    # target subset.
    feats = (_scoped_cache(_hashed_features(raw_docs, buckets, text_col))
             if raw_feats is None else raw_feats)
    pt = hashed_bucket_logprobs(target_docs, buckets, text_col,
                                feats=target_feats) \
        .withColumnRenamed("logp", "lp_t")
    raw_counts = feats.groupBy("b").agg(F.count("*").alias("c"))
    spark = raw_docs.sparkSession
    dense = (spark.range(buckets).toDF("b")
             .join(raw_counts, "b", "left")
             .select("b", F.coalesce("c", F.lit(0)).alias("c")))
    tot = dense.agg(F.sum("c").alias("t"))
    pr = (dense.crossJoin(F.broadcast(tot))
          .select("b", F.log((F.col("c") + 1).cast("double") /
                             (F.col("t") + buckets)).alias("lp_r")))
    table = pt.join(pr, "b").select(
        "b", (F.col("lp_t") - F.col("lp_r")).alias("lr"))
    total = F.sum("lr")
    score = (total / F.count("*")) if per_token else total
    agg = (feats.join(F.broadcast(table), "b")
           .groupBy("doc_id")
           .agg(F.count("*").alias("n_feats"),
                F.round(score, 6).alias("log_weight")))
    return (raw_docs.select("doc_id")
            .join(agg, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
                    F.coalesce("log_weight", F.lit(0.0))
                     .alias("log_weight")))


def dsir_sample(raw_docs: DataFrame, target_docs: DataFrame, k: int,
                buckets: int = _DEFAULT_BUCKETS,
                text_col: str = "text",
                per_token: bool = False) -> DataFrame:
    """The selection step: ``k`` raw documents sampled WITHOUT
    replacement with probability ∝ ``exp(log_weight)`` via the
    Gumbel-top-k trick — key = ``log_weight + g`` with
    ``g = −ln(−ln(u))`` and ``u ∈ (0,1]`` a pure hash of doc_id (salt
    ``'dsir:'``), take the k largest keys. Working in the log domain
    sidesteps the overflow `corpus.weighted_sample`'s ``ln(u)/w``
    priority would hit when ``w = exp(log_weight)`` spans hundreds of
    nats; the two are the same Plackett-Luce draw. Returns the selected
    rows of ``raw_docs`` with ``n_feats``/``log_weight`` attached.

    Scale: scoring as in `dsir_log_weights`; selection is a global
    top-k (TakeOrderedAndProject — per-partition heaps, no full
    sort)."""
    lw = dsir_log_weights(raw_docs, target_docs, buckets, text_col,
                          per_token)
    from .corpus import _salted_u60
    u = _salted_u60("dsir:")
    gumbel = -F.log(-F.log(u))
    return (raw_docs.join(lw, "doc_id")
            .withColumn("__key", F.col("log_weight") + gumbel)
            .orderBy(F.col("__key").desc(), "doc_id")
            .limit(k)
            .drop("__key"))


from .registry import make_registry

QUERIES, ORACLES, query = make_registry()


_GATE_B = 4096

from .dedup import _SQL_HASH60, _SQL_WORDS  # noqa: E402

_FEATS_SQL = f"""
        SELECT doc_id, unnest(list_concat(words,
            CASE WHEN len(words) >= 2 THEN list_transform(
                generate_series(1, len(words) - 1),
                i -> words[i] || ' ' || words[i+1])
            ELSE [] END)) AS shingle
        FROM (SELECT doc_id, {_SQL_WORDS} AS words FROM {{t}})"""


@query("dsir_log_weights", oracle=f"""
    WITH rawd AS (SELECT doc_id, text FROM documents),
    targ AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
    rf AS (SELECT doc_id, ({_SQL_HASH60}) % {_GATE_B} AS b
           FROM ({_FEATS_SQL.format(t='rawd')})),
    tf AS (SELECT doc_id, ({_SQL_HASH60}) % {_GATE_B} AS b
           FROM ({_FEATS_SQL.format(t='targ')})),
    cr AS (SELECT b, count(*) AS c FROM rf GROUP BY b),
    ct AS (SELECT b, count(*) AS c FROM tf GROUP BY b),
    tr AS (SELECT count(*) AS t FROM rf),
    tt AS (SELECT count(*) AS t FROM tf),
    lr AS (
        SELECT cr.b,
               ln((coalesce(ct.c, 0) + 1.0) / (tt.t + {_GATE_B}))
               - ln((cr.c + 1.0) / (tr.t + {_GATE_B})) AS lr
        FROM cr LEFT JOIN ct USING (b) CROSS JOIN tr CROSS JOIN tt),
    per AS (
        SELECT rf.doc_id, count(*) AS n_feats, round(sum(lr.lr), 6) AS lw
        FROM rf JOIN lr USING (b) GROUP BY rf.doc_id)
    SELECT d.doc_id,
           CAST(coalesce(per.n_feats, 0) AS BIGINT) AS n_feats,
           coalesce(per.lw, 0.0)                    AS log_weight
    FROM rawd d LEFT JOIN per ON d.doc_id = per.doc_id
""")
def dsir_log_weights_gate(spark, sf_dir):
    """Gate form of `dsir_log_weights` over the testdata corpus: the
    English subset is the target domain, the whole corpus is the raw
    pool — every document's importance log-weight toward
    'looks like the en slice' is value-pinned against the exact DuckDB
    replay of the hashed-bigram bag model."""
    from pyspark.sql import functions as F
    from .dedup import _scoped_cache
    from .tables import load_tables
    t = load_tables(spark, sf_dir, ("documents",))
    docs = t["documents"].select("doc_id", "text", "lang")
    # ONE tokenize+hash pass tagged with lang serves BOTH the raw pool
    # and the en target subset (the target re-tokenized its slice
    # before — r11); the cache is feature rows, not text
    feats_all = _scoped_cache(
        _hashed_features(docs, _GATE_B, keep_cols=("lang",)))
    return dsir_log_weights(docs.select("doc_id", "text"),
                            docs.where(F.col("lang") == "en")
                                .select("doc_id", "text"),
                            buckets=_GATE_B,
                            raw_feats=feats_all.select("doc_id", "b"),
                            target_feats=feats_all
                            .where(F.col("lang") == "en")
                            .select("doc_id", "b"))

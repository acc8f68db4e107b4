"""Unigram language-model quality scoring (the CCNet recipe,
Wenzek et al. 2020, arXiv:1911.00359: score each document by LM
negative-log-likelihood per token and bucket the corpus into
head/middle/tail quality terciles — CCNet uses a KenLM 5-gram; the
engine ships the unigram form whose statistics are exactly computable
and cross-engine checkable, with the same scoring/bucketing plumbing).

Model (fully deterministic, engine-portable):

- tokenize with the corpus-wide whitespace rule (`dedup._spark_words`);
- keep the ``vocab_size`` most frequent words (ties broken
  lexicographically) over a training frame;
- add-one smoothing against the KEPT vocab: ``p(w) = (c_w + 1) /
  (T + V + 1)`` for in-vocab words, ``p(oov) = 1 / (T + V + 1)`` where
  ``T`` is the total token count of the training frame and ``V`` the
  kept-vocab size — every probability is positive and the model sums to
  ≤ 1 over vocab ∪ {oov};
- a document's score is the mean negative log-likelihood of its tokens
  (lower = more "in-distribution"), empty docs score the OOV nll;
- buckets: head/middle/tail at the exact NLL terciles of the scored
  corpus (CCNet's split), computed with interpolated percentiles.

Scale shape: training is one word-count shuffle with map-side partial
aggregation plus a top-V ``TakeOrderedAndProject`` (the vocab is
driver-small by construction); scoring broadcasts the V-row vocab and
needs one (doc_id)-keyed shuffle for the per-doc mean; the tercile
boundaries are a 1-row aggregate broadcast back over the scores. No
Python in any hot path. At 100 TB the vocab table is still tiny (V is
a knob), so the score stage stays a single broadcast-join pass.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas-UDF type hints are strings
from pyspark.sql import DataFrame  # under future-annotations and must
from pyspark.sql import functions as F  # resolve in module globals

from .dedup import _spark_words

_DEFAULT_VOCAB = 30_000


def train_unigram_lm(docs: DataFrame, text_col: str = "text",
                     vocab_size: int = _DEFAULT_VOCAB) -> DataFrame:
    """Train the unigram model; returns a small frame of
    ``(word, nll)`` with ONE extra row ``(NULL, oov_nll)`` carrying the
    out-of-vocabulary cost, so the whole model is a single broadcastable
    artifact (persist it as parquet to reuse across scoring runs)."""
    words = (docs.select(F.explode(_spark_words(F.col(text_col)))
                         .alias("word"))
             .groupBy("word").agg(F.count("*").alias("c")))
    top = (words.orderBy(F.col("c").desc(), "word").limit(vocab_size))
    # T counts EVERY token (in- and out-of-vocab); V counts kept words.
    totals = top.agg(F.sum("c").alias("kept")).crossJoin(
        words.agg(F.sum("c").alias("t"), F.count("*").alias("n_words")))
    stats = totals.select(
        "t", F.least(F.lit(vocab_size), F.col("n_words")).alias("v"))
    scored = (top.crossJoin(F.broadcast(stats))
              .select("word",
                      (-F.log((F.col("c") + 1) /
                              (F.col("t") + F.col("v") + 1))).alias("nll")))
    oov = stats.select(F.lit(None).cast("string").alias("word"),
                       (-F.log(1 / (F.col("t") + F.col("v") + 1)))
                       .alias("nll"))
    return scored.unionAll(oov)


def perplexity_score(docs: DataFrame, model: DataFrame,
                     text_col: str = "text") -> DataFrame:
    """Score ``docs`` (needs ``doc_id``) against a trained model frame:
    returns ``(doc_id, n_tokens, avg_nll, bucket)`` with ``avg_nll``
    rounded to 6 and ``bucket`` ∈ head|middle|tail at the exact NLL
    terciles of this scored set (head = lowest NLL, the CCNet keep
    set).

    Cache retention: the narrow per-doc scoring frame is cached in
    the CALLING THREAD's scoped registry (`dedup._scoped_cache_add`)
    and is reclaimed only by that thread's next dedup-family query
    or an explicit ``dedup.clear_scoped_caches()`` — a long-lived
    thread that scores once should call that after its final
    action, or the (doc_id, n_tokens, avg_nll) frame stays
    persisted for the session.
    """
    oov = model.where(F.col("word").isNull()) \
               .select(F.col("nll").alias("oov_nll"))
    vocab = model.where(F.col("word").isNotNull())
    toks = docs.select("doc_id",
                       F.explode_outer(_spark_words(F.col(text_col)))
                       .alias("word"))
    per_doc = (toks.join(F.broadcast(vocab), "word", "left")
               .crossJoin(F.broadcast(oov))
               .groupBy("doc_id")
               .agg(F.count("word").alias("n_tokens"),
                    F.round(F.coalesce(F.avg(F.coalesce("nll", "oov_nll")),
                                       F.first("oov_nll")), 6)
                     .alias("avg_nll")))
    # boundaries round to the same 6dp grid as the scores: interpolated
    # percentiles differ by 1 ulp across engines (a+(b-a)*f vs
    # a*(1-f)+b*f), and a doc sitting exactly ON a boundary would
    # otherwise flip buckets between engines
    return _bucketize(per_doc)


def _bucketize(per_doc: DataFrame) -> DataFrame:
    # per_doc is read twice (tercile bounds + the bucket projection) and
    # its lineage is the caller's whole scoring DAG — cache the narrow
    # (doc_id, n_tokens, avg_nll) frame so the second read is ~24 bytes
    # a row instead of a corpus re-scan. Thread-scoped: reclaimed by the
    # caller's next dedup-family query.
    from .dedup import _scoped_cache_add
    per_doc = _scoped_cache_add(per_doc)
    bounds = per_doc.agg(
        F.round(F.expr("percentile(avg_nll, 1.0/3.0)"), 6).alias("b1"),
        F.round(F.expr("percentile(avg_nll, 2.0/3.0)"), 6).alias("b2"))
    return (per_doc.crossJoin(F.broadcast(bounds))
            .select("doc_id", "n_tokens", "avg_nll",
                    F.when(F.col("avg_nll") <= F.col("b1"), "head")
                     .when(F.col("avg_nll") <= F.col("b2"), "middle")
                     .otherwise("tail").alias("bucket")))


def train_bigram_lm(docs: DataFrame, text_col: str = "text",
                    vocab_size: int = _DEFAULT_VOCAB,
                    max_bigrams: int = 200_000) -> DataFrame:
    """Interpolated bigram model — one step toward CCNet's KenLM 5-gram
    while staying exactly computable cross-engine. The artifact is ONE
    frame of three row kinds (broadcastable, like the unigram model):

    - ``(prev=NULL, word, p)``   — add-one unigram probability;
    - ``(prev=NULL, NULL, p)``   — the OOV unigram probability;
    - ``(prev, word, p)``        — raw conditional ``c(prev,word) /
      c(prev,·)`` for the ``max_bigrams`` most frequent bigrams (ties:
      lexicographic) — unstored bigrams contribute 0 and interpolation
      (see :func:`bigram_perplexity_score`) absorbs them.

    Training is two count shuffles (words; adjacent pairs) plus a
    top-M ``TakeOrderedAndProject``; the bigram table is bounded by the
    knob, not the corpus, so scoring stays a broadcast join at 100 TB."""
    words = docs.select(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
                        .alias("ws"))
    n = F.size("ws")
    pairs = (words.where(n >= 2)
             .select(F.explode(F.zip_with(
                 F.slice("ws", 1, n - 1), F.slice("ws", 2, n - 1),
                 lambda a, b: F.struct(a.alias("prev"), b.alias("word"))))
                 .alias("pw"))
             .select("pw.prev", "pw.word"))
    big = pairs.groupBy("prev", "word").agg(F.count("*").alias("c"))
    prev_tot = big.groupBy("prev").agg(F.sum("c").alias("ct"))
    top_big = (big.orderBy(F.col("c").desc(), "prev", "word")
               .limit(max_bigrams)
               .join(prev_tot, "prev")
               .select("prev", "word", (F.col("c") / F.col("ct"))
                       .alias("p")))
    uni = train_unigram_lm(docs, text_col, vocab_size) \
        .select(F.lit(None).cast("string").alias("prev"), "word",
                F.exp(-F.col("nll")).alias("p"))
    return uni.unionByName(top_big)


def bigram_perplexity_score(docs: DataFrame, model: DataFrame,
                            lam: float = 0.7,
                            text_col: str = "text") -> DataFrame:
    """Score with the interpolated model: token 1 costs
    ``-ln(p_uni)``; token i>1 costs ``-ln(lam*p_bi + (1-lam)*p_uni)``
    (``p_bi = 0`` when the bigram is not stored — interpolation keeps
    every probability positive). Same output contract and tercile
    buckets as :func:`perplexity_score`.

    Cache retention: the narrow per-doc scoring frame is cached in
    the CALLING THREAD's scoped registry (`dedup._scoped_cache_add`)
    and is reclaimed only by that thread's next dedup-family query
    or an explicit ``dedup.clear_scoped_caches()`` — a long-lived
    thread that scores once should call that after its final
    action, or the (doc_id, n_tokens, avg_nll) frame stays
    persisted for the session.
    """
    uni = (model.where(F.col("prev").isNull() & F.col("word").isNotNull())
           .select("word", F.col("p").alias("pu")))
    oov = (model.where(F.col("prev").isNull() & F.col("word").isNull())
           .select(F.col("p").alias("poov")))
    big = (model.where(F.col("prev").isNotNull())
           .select("prev", "word", F.col("p").alias("pb")))

    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size("ws")
    toks = (docs.select("doc_id", ws.alias("ws"))
            .select("doc_id", F.posexplode_outer(F.zip_with(
                F.col("ws"),
                F.concat(F.array(F.lit(None).cast("string")),
                         F.slice("ws", 1, n - 1)),
                lambda w, p: F.struct(w.alias("word"), p.alias("prev"))))
                .alias("i", "pw"))
            .select("doc_id", "pw.word", "pw.prev"))
    pu = F.coalesce("pu", "poov")
    p_tok = F.when(F.col("prev").isNull(), pu) \
             .otherwise(lam * F.coalesce("pb", F.lit(0.0)) +
                        (1 - lam) * pu)
    per_doc = (toks
               .join(F.broadcast(uni), "word", "left")
               .join(F.broadcast(big), ["prev", "word"], "left")
               .crossJoin(F.broadcast(oov))
               .groupBy("doc_id")
               .agg(F.count("word").alias("n_tokens"),
                    F.round(F.coalesce(F.avg(-F.log(p_tok)),
                                       F.first(-F.log("poov"))), 6)
                     .alias("avg_nll")))
    return _bucketize(per_doc)


def perplexity_score_rowwise(docs: DataFrame, model: DataFrame,
                             text_col: str = "text") -> DataFrame:
    """Stream-safe scorer: the batch form explodes tokens and groups by
    doc — illegal on an unbounded stream without watermark machinery the
    semantics don't need. This form scores each document IN ITS ROW via
    an Arrow-batched kernel holding the collected model (a bounded
    artifact — top-V rows, same class as the IVF codebook and the shard
    map), so it runs identically on static frames and readStream sources
    (test_lm.py proves batch parity and drives a real stream).

    Returns ``(doc_id, n_tokens, avg_nll)`` — no buckets: terciles are a
    corpus-level statistic, which IS a batch concept; bucket a stream by
    broadcasting boundaries trained on a reference corpus."""
    import re

    from pyspark.sql.functions import pandas_udf

    rows = model.collect()
    oov = next(float(r.nll) for r in rows if r.word is None)
    nll = {r.word: float(r.nll) for r in rows if r.word is not None}
    # mirror the JVM tokenizer EXACTLY: Java \s is the ASCII class
    # [ \t\n\x0b\f\r] (Python re's \s is Unicode-aware and would split
    # on NBSP etc., breaking batch/stream parity), and Spark trim()
    # strips only the space character — not Python str.strip()'s
    # Unicode whitespace set
    ws = re.compile(r"[ \t\n\x0b\f\r]+")

    @pandas_udf("struct<n_tokens:bigint, avg_nll:double>")
    def score(col: pd.Series) -> pd.DataFrame:
        ns, avgs = [], []
        for text in col:
            if text is None:
                # batch form: explode_outer of a null array yields one
                # null word → count("word") = 0, avg coalesces to oov
                ns.append(0)
                avgs.append(round(oov, 6))
                continue
            words = ws.split(text.strip(" ").lower())
            total = sum(nll.get(w, oov) for w in words)
            ns.append(len(words))
            avgs.append(round(total / len(words), 6))
        return pd.DataFrame({"n_tokens": ns, "avg_nll": avgs})

    return (docs.withColumn("_s", score(F.col(text_col)))
            .select("doc_id", F.col("_s.n_tokens").alias("n_tokens"),
                    F.col("_s.avg_nll").alias("avg_nll")))


def train_trigram_lm(docs: DataFrame, text_col: str = "text",
                     vocab_size: int = _DEFAULT_VOCAB,
                     max_bigrams: int = 200_000,
                     max_trigrams: int = 200_000) -> DataFrame:
    """Interpolated trigram model — one more zip-shift past
    :func:`train_bigram_lm`, materially closer to CCNet's KenLM-5
    behavior at the same bounded-artifact shape. ONE broadcastable frame
    of four row kinds ``(prev2, prev, word, p)``:

    - ``(NULL, NULL, word, p)``  — add-one unigram probability;
    - ``(NULL, NULL, NULL, p)``  — the OOV unigram probability;
    - ``(NULL, prev, word, p)``  — bigram conditional (top
      ``max_bigrams``);
    - ``(prev2, prev, word, p)`` — raw conditional ``c(prev2,prev,word)
      / c(prev2,prev,·)`` for the ``max_trigrams`` most frequent
      trigrams (ties: lexicographic) — unstored trigrams contribute 0
      and interpolation absorbs them.

    Training adds one count shuffle (adjacent triples) plus a top-M
    ``TakeOrderedAndProject`` on top of the bigram pipeline; the
    artifact stays bounded by the knobs, so scoring remains a broadcast
    join at 100 TB."""
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size("ws")
    words = docs.select(ws.alias("ws"))
    triples = (words.where(n >= 3)
               .select(F.explode(F.zip_with(
                   F.zip_with(F.slice("ws", 1, n - 2),
                              F.slice("ws", 2, n - 2),
                              lambda a, b: F.struct(a.alias("prev2"),
                                                    b.alias("prev"))),
                   F.slice("ws", 3, n - 2),
                   lambda ab, c: F.struct(ab["prev2"].alias("prev2"),
                                          ab["prev"].alias("prev"),
                                          c.alias("word")))).alias("t"))
               .select("t.prev2", "t.prev", "t.word"))
    tri = triples.groupBy("prev2", "prev", "word") \
        .agg(F.count("*").alias("c"))
    ctx_tot = tri.groupBy("prev2", "prev").agg(F.sum("c").alias("ct"))
    top_tri = (tri.orderBy(F.col("c").desc(), "prev2", "prev", "word")
               .limit(max_trigrams)
               .join(ctx_tot, ["prev2", "prev"])
               .select("prev2", "prev", "word",
                       (F.col("c") / F.col("ct")).alias("p")))
    bi = train_bigram_lm(docs, text_col, vocab_size, max_bigrams) \
        .select(F.lit(None).cast("string").alias("prev2"), "prev",
                "word", "p")
    return bi.unionByName(top_tri)


def trigram_perplexity_score(docs: DataFrame, model: DataFrame,
                             lam3: float = 0.5, lam2: float = 0.3,
                             text_col: str = "text") -> DataFrame:
    """Score with the interpolated trigram model; the unavailable-order
    mass folds onto the highest available lower order so every position
    mixes to exactly 1:

    - token 1: ``-ln(p_uni)``;
    - token 2: ``-ln((lam3+lam2)·p_bi + lam1·p_uni)``;
    - token ≥3: ``-ln(lam3·p_tri + lam2·p_bi + lam1·p_uni)``

    with ``lam1 = 1 - lam3 - lam2`` and unstored n-grams contributing 0
    (interpolation keeps every probability positive). Same output
    contract and tercile buckets as :func:`perplexity_score`.

    Cache retention: the narrow per-doc scoring frame is cached in
    the CALLING THREAD's scoped registry (`dedup._scoped_cache_add`)
    and is reclaimed only by that thread's next dedup-family query
    or an explicit ``dedup.clear_scoped_caches()`` — a long-lived
    thread that scores once should call that after its final
    action, or the (doc_id, n_tokens, avg_nll) frame stays
    persisted for the session.
    """
    lam1 = 1 - lam3 - lam2
    uni = (model.where(F.col("prev2").isNull() & F.col("prev").isNull() &
                       F.col("word").isNotNull())
           .select("word", F.col("p").alias("pu")))
    oov = (model.where(F.col("prev2").isNull() & F.col("prev").isNull() &
                       F.col("word").isNull())
           .select(F.col("p").alias("poov")))
    big = (model.where(F.col("prev2").isNull() & F.col("prev").isNotNull())
           .select("prev", "word", F.col("p").alias("pb")))
    tri = (model.where(F.col("prev2").isNotNull())
           .select("prev2", "prev", "word", F.col("p").alias("pt")))

    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size("ws")
    null_s = F.lit(None).cast("string")
    # Both shift arrays are built pad-then-TRUNCATE to exactly n
    # elements: a 1-token doc (incl. empty text, which splits to [''])
    # would otherwise leave prev2_arr at length 2 and arrays_zip would
    # pad a phantom null-word row that joins nothing and silently adds
    # -ln(p_oov) to the average.
    prev_arr = F.slice(F.concat(F.array(null_s), F.col("ws")), 1, n)
    prev2_arr = F.slice(F.concat(F.array(null_s, null_s), F.col("ws")),
                        1, n)
    toks = (docs.select("doc_id", ws.alias("ws"))
            .select("doc_id",
                    F.explode_outer(F.arrays_zip(
                        F.col("ws").alias("word"),
                        prev_arr.alias("prev"),
                        prev2_arr.alias("prev2"))).alias("t"))
            .select("doc_id", "t.word", "t.prev", "t.prev2"))
    pu = F.coalesce("pu", "poov")
    p_tok = (F.when(F.col("prev").isNull(), pu)
             .when(F.col("prev2").isNull(),
                   (lam3 + lam2) * F.coalesce("pb", F.lit(0.0)) + lam1 * pu)
             .otherwise(lam3 * F.coalesce("pt", F.lit(0.0)) +
                        lam2 * F.coalesce("pb", F.lit(0.0)) + lam1 * pu))
    per_doc = (toks
               .join(F.broadcast(uni), "word", "left")
               .join(F.broadcast(big), ["prev", "word"], "left")
               .join(F.broadcast(tri), ["prev2", "prev", "word"], "left")
               .crossJoin(F.broadcast(oov))
               .groupBy("doc_id")
               .agg(F.count("word").alias("n_tokens"),
                    F.round(F.coalesce(F.avg(-F.log(p_tok)),
                                       F.first(-F.log("poov"))), 6)
                     .alias("avg_nll")))
    return _bucketize(per_doc)

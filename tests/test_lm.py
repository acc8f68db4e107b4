"""Unigram-LM perplexity scoring: DuckDB cross-engine parity of the full
train+score pipeline, plus the semantic properties the parity check can't
state (in-distribution text scores lower, OOV text lands in tail, the
smoothed model is a proper sub-distribution)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.lm import (  # noqa: E402
    perplexity_score, train_unigram_lm)

# A corpus with a clear "in-distribution" register (common words, many
# repeats) and two off-register docs: one rare-word, one gibberish.
DOCS = [
    (1, "the cat sat on the mat and the dog sat on the rug"),
    (2, "the dog and the cat ran to the mat near the rug"),
    (3, "a cat and a dog sat near the mat on a rug"),
    (4, "the the the cat cat dog dog mat mat rug rug and and"),
    (5, "sat ran near the cat dog mat rug on and a to the"),
    (6, "the perspicacious cat pondered zygomorphic phantasmagoria "
        "on the mat"),                                             # mixed
    (7, "xqzt vvkpl wjrn mmtb qqos zzli ffgh aauu"),               # oov
    (8, "the cat"),
    (9, "dog on rug"),
    (10, "and the dog ran to the cat on the mat near a rug"),
]
VOCAB = 12


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _spark_scores(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_unigram_lm(df, vocab_size=VOCAB)
    return {r.doc_id: (r.n_tokens, r.avg_nll, r.bucket)
            for r in perplexity_score(df, model).collect()}


def _duck_scores():
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    rows = con.execute(f"""
        WITH words_t AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+'))
                       AS word
            FROM d),
        counts AS (SELECT word, count(*) AS c FROM words_t GROUP BY word),
        top AS (SELECT word, c FROM counts
                ORDER BY c DESC, word LIMIT {VOCAB}),
        stats AS (SELECT (SELECT sum(c) FROM counts) AS t,
                         (SELECT least({VOCAB}, count(*)) FROM counts) AS v),
        vocab AS (SELECT word, -ln((c + 1.0) / (t + v + 1)) AS nll
                  FROM top CROSS JOIN stats),
        oov AS (SELECT -ln(1.0 / (t + v + 1)) AS oov_nll FROM stats),
        perdoc AS (
            SELECT w.doc_id, count(w.word) AS n_tokens,
                   round(avg(coalesce(vb.nll, o.oov_nll)), 6) AS avg_nll
            FROM words_t w
            LEFT JOIN vocab vb USING (word) CROSS JOIN oov o
            GROUP BY w.doc_id),
        bounds AS (SELECT round(quantile_cont(avg_nll, 1.0/3.0), 6) AS b1,
                          round(quantile_cont(avg_nll, 2.0/3.0), 6) AS b2
                   FROM perdoc)
        SELECT doc_id, n_tokens, avg_nll,
               CASE WHEN avg_nll <= b1 THEN 'head'
                    WHEN avg_nll <= b2 THEN 'middle'
                    ELSE 'tail' END AS bucket
        FROM perdoc CROSS JOIN bounds
    """).fetchall()
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


def test_cross_engine_parity(spark):
    got, want = _spark_scores(spark), _duck_scores()
    assert set(got) == set(want)
    for doc_id in want:
        g, w = got[doc_id], want[doc_id]
        assert g[0] == w[0], f"n_tokens mismatch doc {doc_id}"
        assert abs(g[1] - w[1]) <= 1e-6, f"avg_nll mismatch doc {doc_id}"
        assert g[2] == w[2], f"bucket mismatch doc {doc_id}: {g} vs {w}"


def test_off_register_docs_score_worse(spark):
    s = _spark_scores(spark)
    in_dist = max(s[d][1] for d in (1, 2, 3, 10))
    assert s[6][1] > in_dist, "rare-word doc must score above in-dist docs"
    assert s[7][1] > s[6][1], "pure-OOV doc must score worst of all"
    assert s[7][2] == "tail"


def test_buckets_are_terciles(spark):
    s = _spark_scores(spark)
    from collections import Counter
    c = Counter(v[2] for v in s.values())
    # 10 docs -> no bucket may dominate; each tercile is populated
    assert set(c) == {"head", "middle", "tail"}
    assert max(c.values()) <= 5


def test_model_is_sub_distribution(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_unigram_lm(df, vocab_size=VOCAB).collect()
    oov = [r for r in model if r.word is None]
    assert len(oov) == 1
    total = sum(math.exp(-r.nll) for r in model)
    assert 0.0 < total <= 1.0 + 1e-9
    # every kept word is strictly cheaper than OOV
    assert all(r.nll < oov[0].nll for r in model if r.word is not None)


BIGRAM_V, BIGRAM_M, LAM = 12, 50, 0.7


def _duck_bigram_scores(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    rows = con.execute(f"""
        WITH base AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS ws
            FROM d),
        toks AS (
            SELECT doc_id, i, ws[i] AS word,
                   CASE WHEN i = 1 THEN NULL ELSE ws[i-1] END AS prev
            FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws))) AS i
                  FROM base)),
        counts AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
        top AS (SELECT word, c FROM counts
                ORDER BY c DESC, word LIMIT {BIGRAM_V}),
        stats AS (SELECT (SELECT sum(c) FROM counts) AS t,
                         (SELECT least({BIGRAM_V}, count(*)) FROM counts)
                             AS v),
        uni AS (SELECT word, (c + 1.0) / (t + v + 1) AS pu
                FROM top CROSS JOIN stats),
        oov AS (SELECT 1.0 / (t + v + 1) AS poov FROM stats),
        big_all AS (
            SELECT prev, word, count(*) AS c FROM toks
            WHERE prev IS NOT NULL GROUP BY prev, word),
        prev_tot AS (SELECT prev, sum(c) AS ct FROM big_all GROUP BY prev),
        big AS (
            SELECT b.prev, b.word, b.c / pt.ct AS pb
            FROM (SELECT * FROM big_all
                  ORDER BY c DESC, prev, word LIMIT {BIGRAM_M}) b
            JOIN prev_tot pt USING (prev)),
        scored AS (
            SELECT t.doc_id,
                   CASE WHEN t.prev IS NULL
                        THEN coalesce(u.pu, o.poov)
                        ELSE {LAM} * coalesce(bg.pb, 0.0)
                             + (1 - {LAM}) * coalesce(u.pu, o.poov)
                   END AS p
            FROM toks t
            LEFT JOIN uni u USING (word)
            LEFT JOIN big bg ON bg.prev = t.prev AND bg.word = t.word
            CROSS JOIN oov o),
        perdoc AS (
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(-ln(p)), 6) AS avg_nll
            FROM scored GROUP BY doc_id),
        bounds AS (SELECT round(quantile_cont(avg_nll, 1.0/3.0), 6) AS b1,
                          round(quantile_cont(avg_nll, 2.0/3.0), 6) AS b2
                   FROM perdoc)
        SELECT doc_id, n_tokens, avg_nll,
               CASE WHEN avg_nll <= b1 THEN 'head'
                    WHEN avg_nll <= b2 THEN 'middle'
                    ELSE 'tail' END
        FROM perdoc CROSS JOIN bounds
    """).fetchall()
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


def test_bigram_cross_engine_parity(spark):
    from agnostic_blockchain_etl_spark.operators.lm import (
        bigram_perplexity_score, train_bigram_lm)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_bigram_lm(df, vocab_size=BIGRAM_V,
                            max_bigrams=BIGRAM_M)
    got = {r.doc_id: (r.n_tokens, r.avg_nll, r.bucket)
           for r in bigram_perplexity_score(df, model, lam=LAM).collect()}
    want = _duck_bigram_scores(DOCS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) <= 1e-6, d
        assert got[d][2] == want[d][2], d


def test_bigram_model_punishes_scrambling(spark):
    """Scrambling a document preserves its unigram distribution but
    destroys its bigrams — the interpolated model must score the
    scrambled copy strictly worse, while the pure unigram model cannot
    tell them apart."""
    import random
    from agnostic_blockchain_etl_spark.operators.lm import (
        bigram_perplexity_score, perplexity_score, train_bigram_lm,
        train_unigram_lm)
    rng = random.Random(7)
    train = [(i, t) for i, t in DOCS]
    orig = "the cat sat on the mat and the dog sat on the rug"
    words = orig.split()
    while True:   # a scramble that breaks every original bigram start
        rng.shuffle(words)
        scrambled = " ".join(words)
        if scrambled != orig:
            break
    score_docs = [(100, orig), (101, scrambled)]
    df_train = spark.createDataFrame(train, "doc_id long, text string")
    df_score = spark.createDataFrame(score_docs,
                                     "doc_id long, text string")
    bmodel = train_bigram_lm(df_train, vocab_size=BIGRAM_V,
                             max_bigrams=BIGRAM_M)
    bs = {r.doc_id: r.avg_nll
          for r in bigram_perplexity_score(df_score, bmodel,
                                           lam=LAM).collect()}
    assert bs[101] > bs[100], "scrambled must cost more under bigrams"
    umodel = train_unigram_lm(df_train, vocab_size=BIGRAM_V)
    us = {r.doc_id: r.avg_nll
          for r in perplexity_score(df_score, umodel).collect()}
    assert abs(us[100] - us[101]) <= 1e-6, "unigrams are order-blind"


def test_rowwise_scorer_matches_batch_and_runs_on_stream(spark, tmp_path):
    """The stream-safe kernel scorer must agree with the batch
    explode+group scorer on every doc, and actually execute on a
    readStream source (the batch form cannot)."""
    from agnostic_blockchain_etl_spark.operators.lm import (
        perplexity_score_rowwise)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_unigram_lm(df, vocab_size=VOCAB)
    batch = {r.doc_id: (r.n_tokens, r.avg_nll)
             for r in perplexity_score(df, model).collect()}
    roww = {r.doc_id: (r.n_tokens, r.avg_nll)
            for r in perplexity_score_rowwise(df, model).collect()}
    assert set(batch) == set(roww)
    for d in batch:
        assert batch[d][0] == roww[d][0], d
        assert abs(batch[d][1] - roww[d][1]) <= 1e-6, d

    src = str(tmp_path / "lmsrc")
    df.coalesce(1).write.parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    sink = str(tmp_path / "lmsink")
    q = (perplexity_score_rowwise(stream, model)
         .writeStream.outputMode("append").format("parquet")
         .option("path", sink)
         .option("checkpointLocation", str(tmp_path / "lmckpt")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = {r.doc_id: (r.n_tokens, r.avg_nll)
                for r in spark.read.parquet(sink).collect()}
    assert streamed == roww


def test_rowwise_scorer_parity_on_hostile_whitespace_and_nulls(spark):
    """Batch/stream parity must hold on the inputs that distinguish the
    tokenizers: Unicode whitespace (Java \\s is ASCII-only; Python re's
    \\s is not), non-space ASCII whitespace at the edges (Spark trim()
    strips only ' '), and null documents (explode_outer yields
    n_tokens=0 + the OOV nll)."""
    from agnostic_blockchain_etl_spark.operators.lm import (
        perplexity_score_rowwise)
    hostile = [
        (1, "the cat sat"),        # NBSP: one JVM token, not two
        (2, "\tthe cat\n"),             # edge tab/newline survive trim
        (3, None),                      # null doc
        (4, ""),                        # empty doc
        (5, "  the   cat  "),           # space runs
        (6, "the cat"),            # EM space
    ]
    df = spark.createDataFrame(hostile, "doc_id long, text string")
    train = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_unigram_lm(train, vocab_size=VOCAB)
    batch = {r.doc_id: (r.n_tokens, r.avg_nll)
             for r in perplexity_score(df, model)
             .select("doc_id", "n_tokens", "avg_nll").collect()}
    roww = {r.doc_id: (r.n_tokens, r.avg_nll)
            for r in perplexity_score_rowwise(df, model).collect()}
    assert set(batch) == set(roww)
    for d in batch:
        assert batch[d][0] == roww[d][0], (d, batch[d], roww[d])
        assert abs(batch[d][1] - roww[d][1]) <= 1e-6, d
    assert batch[3][0] == 0   # null doc scores 0 tokens in BOTH forms


TRI_V, TRI_M, TRI_T = 12, 50, 60
L3, L2 = 0.5, 0.3
L1 = 1 - L3 - L2          # interpolated into SQL verbatim so both
                          # engines mix with the IDENTICAL double


def _duck_trigram_scores(docs):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    rows = con.execute(f"""
        WITH base AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS ws
            FROM d),
        toks AS (
            SELECT doc_id, i, ws[i] AS word,
                   CASE WHEN i = 1 THEN NULL ELSE ws[i-1] END AS prev,
                   CASE WHEN i <= 2 THEN NULL ELSE ws[i-2] END AS prev2
            FROM (SELECT doc_id, ws,
                         unnest(generate_series(1, len(ws))) AS i
                  FROM base)),
        counts AS (SELECT word, count(*) AS c FROM toks GROUP BY word),
        top AS (SELECT word, c FROM counts
                ORDER BY c DESC, word LIMIT {TRI_V}),
        stats AS (SELECT (SELECT sum(c) FROM counts) AS t,
                         (SELECT least({TRI_V}, count(*)) FROM counts)
                             AS v),
        uni AS (SELECT word, (c + 1.0) / (t + v + 1) AS pu
                FROM top CROSS JOIN stats),
        oov AS (SELECT 1.0 / (t + v + 1) AS poov FROM stats),
        big_all AS (
            SELECT prev, word, count(*) AS c FROM toks
            WHERE prev IS NOT NULL GROUP BY prev, word),
        prev_tot AS (SELECT prev, sum(c) AS ct FROM big_all GROUP BY prev),
        big AS (
            SELECT b.prev, b.word, b.c / pt.ct AS pb
            FROM (SELECT * FROM big_all
                  ORDER BY c DESC, prev, word LIMIT {TRI_M}) b
            JOIN prev_tot pt USING (prev)),
        tri_all AS (
            SELECT prev2, prev, word, count(*) AS c FROM toks
            WHERE prev2 IS NOT NULL GROUP BY prev2, prev, word),
        ctx_tot AS (SELECT prev2, prev, sum(c) AS ct FROM tri_all
                    GROUP BY prev2, prev),
        tri AS (
            SELECT s.prev2, s.prev, s.word, s.c / ct.ct AS pt
            FROM (SELECT * FROM tri_all
                  ORDER BY c DESC, prev2, prev, word LIMIT {TRI_T}) s
            JOIN ctx_tot ct USING (prev2, prev)),
        scored AS (
            SELECT t.doc_id,
                   CASE WHEN t.prev IS NULL
                        THEN coalesce(u.pu, o.poov)
                        WHEN t.prev2 IS NULL
                        THEN ({L3} + {L2}) * coalesce(bg.pb, 0.0)
                             + {L1!r} * coalesce(u.pu, o.poov)
                        ELSE {L3} * coalesce(tg.pt, 0.0)
                             + {L2} * coalesce(bg.pb, 0.0)
                             + {L1!r} * coalesce(u.pu, o.poov)
                   END AS p
            FROM toks t
            LEFT JOIN uni u USING (word)
            LEFT JOIN big bg ON bg.prev = t.prev AND bg.word = t.word
            LEFT JOIN tri tg ON tg.prev2 = t.prev2 AND tg.prev = t.prev
                            AND tg.word = t.word
            CROSS JOIN oov o),
        perdoc AS (
            SELECT doc_id, count(*) AS n_tokens,
                   round(avg(-ln(p)), 6) AS avg_nll
            FROM scored GROUP BY doc_id),
        bounds AS (SELECT round(quantile_cont(avg_nll, 1.0/3.0), 6) AS b1,
                          round(quantile_cont(avg_nll, 2.0/3.0), 6) AS b2
                   FROM perdoc)
        SELECT doc_id, n_tokens, avg_nll,
               CASE WHEN avg_nll <= b1 THEN 'head'
                    WHEN avg_nll <= b2 THEN 'middle'
                    ELSE 'tail' END
        FROM perdoc CROSS JOIN bounds
    """).fetchall()
    return {r[0]: (r[1], r[2], r[3]) for r in rows}


def test_trigram_cross_engine_parity(spark):
    from agnostic_blockchain_etl_spark.operators.lm import (
        train_trigram_lm, trigram_perplexity_score)
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    model = train_trigram_lm(df, vocab_size=TRI_V, max_bigrams=TRI_M,
                             max_trigrams=TRI_T)
    got = {r.doc_id: (r.n_tokens, r.avg_nll, r.bucket)
           for r in trigram_perplexity_score(df, model, lam3=L3,
                                             lam2=L2).collect()}
    want = _duck_trigram_scores(DOCS)
    assert set(got) == set(want)
    for d in want:
        assert got[d][0] == want[d][0], d
        assert abs(got[d][1] - want[d][1]) <= 1e-6, d
        assert got[d][2] == want[d][2], d


def test_trigram_scores_short_docs_exactly(spark):
    """1- and 2-token documents (and empty text, which splits to [''])
    must score WITHOUT phantom positions: the shift arrays are truncated
    to exactly n, so arrays_zip never pads a null-word row that adds
    -ln(p_oov) to the average. Parity against the DuckDB oracle plus the
    closed-form check: a 1-token in-vocab doc scores exactly -ln(p_uni)."""
    from agnostic_blockchain_etl_spark.operators.lm import (
        train_trigram_lm, trigram_perplexity_score)
    short = [(200, "the"), (201, "the cat"), (202, ""), (203, "zzz-oov")]
    corpus = DOCS + short
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    model = train_trigram_lm(df, vocab_size=TRI_V, max_bigrams=TRI_M,
                             max_trigrams=TRI_T)
    got = {r.doc_id: (r.n_tokens, r.avg_nll)
           for r in trigram_perplexity_score(df, model, lam3=L3,
                                             lam2=L2).collect()}
    want = _duck_trigram_scores(corpus)
    for d, _ in short:
        assert got[d][0] == want[d][0], (d, got[d], want[d])
        assert abs(got[d][1] - want[d][1]) <= 1e-6, (d, got[d], want[d])
    # closed form: p_uni('the') from the model frame itself
    p_the = {r.word: r.p for r in model.where(
        "prev2 IS NULL AND prev IS NULL AND word = 'the'").collect()}["the"]
    assert abs(got[200][1] - round(-math.log(p_the), 6)) <= 1e-6


def test_trigram_punishes_scrambling_harder_than_bigram(spark):
    """Scrambling preserves unigrams, destroys most bigrams, and
    destroys trigrams at least as hard — the trigram model's NLL
    penalty for the scramble must EXCEED the bigram model's (the
    order-sensitivity property, strengthened one order)."""
    import random
    from agnostic_blockchain_etl_spark.operators.lm import (
        bigram_perplexity_score, train_bigram_lm, train_trigram_lm,
        trigram_perplexity_score)
    rng = random.Random(11)
    orig = "the cat sat on the mat and the dog sat on the rug"
    words = orig.split()
    while True:
        rng.shuffle(words)
        scrambled = " ".join(words)
        if scrambled != orig:
            break
    df_train = spark.createDataFrame(DOCS, "doc_id long, text string")
    df_score = spark.createDataFrame([(100, orig), (101, scrambled)],
                                     "doc_id long, text string")
    tmodel = train_trigram_lm(df_train, vocab_size=TRI_V,
                              max_bigrams=TRI_M, max_trigrams=TRI_T)
    ts = {r.doc_id: r.avg_nll
          for r in trigram_perplexity_score(df_score, tmodel, lam3=L3,
                                            lam2=L2).collect()}
    bmodel = train_bigram_lm(df_train, vocab_size=TRI_V,
                             max_bigrams=TRI_M)
    bs = {r.doc_id: r.avg_nll
          for r in bigram_perplexity_score(df_score, bmodel,
                                           lam=LAM).collect()}
    assert ts[101] > ts[100], "scramble must cost more under trigrams"
    assert (ts[101] - ts[100]) > (bs[101] - bs[100]), \
        "trigram penalty must exceed the bigram penalty"

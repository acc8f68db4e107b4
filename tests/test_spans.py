"""Exact-substring span dedup: hand-checkable semantics on crafted docs,
a DuckDB cross-engine parity check of the full span output, and the
"all k-grams of a duplicated run merge back into one maximal span"
invariant on generated text."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.spans import (  # noqa: E402
    duplicate_spans, span_dedup_stats)

K = 4
BOILER = "this license text is identical on every single page"   # 9 words
DOCS = [
    (1, f"alpha bravo charlie delta {BOILER} echo foxtrot"),
    (2, f"unrelated words here {BOILER} and a different tail entirely"),
    (3, "no duplication in this document at all whatsoever"),
    (4, f"{BOILER}"),                       # the whole doc is the boilerplate
    (5, "tiny doc"),                        # shorter than k: no grams
]


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _spark_spans_k(spark, docs, k):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return sorted((r["doc_id"], r["span_start"], r["span_end"])
                  for r in duplicate_spans(df, k).collect())


def _spark_spans(spark, docs):
    return _spark_spans_k(spark, docs, K)


def test_first_occurrence_kept_later_copies_spanned(spark):
    spans = _spark_spans(spark, DOCS)
    by_doc = {}
    for d, s, e in spans:
        by_doc.setdefault(d, []).append((s, e))
    # doc 1 holds the first occurrence -> nothing reported there
    assert 1 not in by_doc and 3 not in by_doc and 5 not in by_doc
    # doc 2: boilerplate occupies words 4..12 -> one merged maximal span
    assert by_doc[2] == [(4, 12)]
    # doc 4: the entire 9-word doc is duplicated
    assert by_doc[4] == [(1, 9)]


def test_stats_fractions(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in span_dedup_stats(df, K).collect()}
    assert rows[3]["n_dup_spans"] == 0 and rows[3]["dup_word_frac"] == 0.0
    assert rows[4]["dup_word_frac"] == 1.0
    assert rows[2]["n_dup_words"] == 9 and rows[2]["n_words"] == 17


def test_cross_engine_parity(spark):
    got = _spark_spans(spark, DOCS)
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", DOCS)
    want = sorted(map(tuple, con.execute(f"""
        WITH base AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS words
            FROM d),
        positions AS (
            SELECT doc_id, words,
                   unnest(generate_series(1, len(words) - {K - 1})) AS pos
            FROM base WHERE len(words) >= {K}),
        grams AS (
            SELECT doc_id, pos,
                   md5(array_to_string(words[pos:pos+{K - 1}], ' ')) AS h
            FROM positions),
        dups AS (
            SELECT h, min(doc_id * 100000000 + pos) AS first_key
            FROM grams GROUP BY h HAVING count(*) > 1),
        marked AS (
            SELECT DISTINCT g.doc_id, g.pos
            FROM grams g JOIN dups USING (h)
            WHERE g.doc_id * 100000000 + g.pos <> dups.first_key),
        lagged AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                        (PARTITION BY doc_id ORDER BY pos) <= {K}
                        THEN 0 ELSE 1 END AS brk
            FROM marked),
        grouped AS (
            SELECT doc_id, pos,
                   sum(brk) OVER
                       (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM lagged)
        SELECT doc_id, min(pos) AS span_start,
               max(pos) + {K - 1} AS span_end
        FROM grouped GROUP BY doc_id, grp
        ORDER BY doc_id, span_start""").fetchall()))
    assert got == want


def test_long_duplicated_run_merges_to_one_span(spark):
    # a 30-word run duplicated into another doc: its 30-K+1 duplicated
    # k-grams must merge into exactly ONE maximal span covering the run
    run = " ".join(f"w{i}" for i in range(30))
    docs = [(1, f"prefix one two {run}"),
            (2, f"{run} suffix three four five")]
    spans = _spark_spans(spark, docs)
    assert spans == [(2, 1, 30)]


# ---------------------------------------------------------------------------
# Differential fuzz: random corpora, Spark spans vs the DuckDB formulation
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_WORDS = ["aa", "bb", "cc", "dd"]   # tiny alphabet -> dense accidental dups
_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=18) \
    .map(" ".join)
_corpus = st.lists(_doc, min_size=1, max_size=5)


def _duckdb_spans(docs, k):
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    return sorted(map(tuple, con.execute(f"""
        WITH base AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\\s+') AS words
            FROM d),
        positions AS (
            SELECT doc_id, words,
                   unnest(generate_series(1, len(words) - {k - 1})) AS pos
            FROM base WHERE len(words) >= {k}),
        grams AS (
            SELECT doc_id, pos,
                   md5(array_to_string(words[pos:pos+{k - 1}], ' ')) AS h
            FROM positions),
        dups AS (
            SELECT h, min(doc_id * 100000000 + pos) AS first_key
            FROM grams GROUP BY h HAVING count(*) > 1),
        marked AS (
            SELECT DISTINCT g.doc_id, g.pos
            FROM grams g JOIN dups USING (h)
            WHERE g.doc_id * 100000000 + g.pos <> dups.first_key),
        lagged AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos) OVER
                        (PARTITION BY doc_id ORDER BY pos) <= {k}
                        THEN 0 ELSE 1 END AS brk
            FROM marked),
        grouped AS (
            SELECT doc_id, pos,
                   sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM lagged)
        SELECT doc_id, min(pos), max(pos) + {k - 1}
        FROM grouped GROUP BY doc_id, grp""").fetchall()))


@given(corpus=_corpus, k=st.integers(2, 5))
@settings(max_examples=12, deadline=None)
def test_spans_match_duckdb_on_random_corpora(spark, corpus, k):
    docs = [(i + 1, t) for i, t in enumerate(corpus)]
    assert _spark_spans_k(spark, docs, k) == _duckdb_spans(docs, k)


class TestSpansDifferential:
    """Randomized differential check against an independent brute-force
    reference: mark every k-gram position whose digest-equal gram occurs
    elsewhere and is not the corpus-first occurrence (by (doc, pos)
    order), merge marked positions with gap <= k, extend span ends by
    k-1. Corpora are generated from a tiny vocabulary so duplicated
    k-grams arise by chance in shapes no hand-written fixture contains
    (overlapping runs, within-doc repeats, triple occurrences)."""

    @staticmethod
    def _expected(docs, k):
        from collections import defaultdict
        grams = defaultdict(list)  # gram -> [(doc, pos)]
        words_of = {}
        for doc_id, text in docs:
            ws = text.lower().split()
            words_of[doc_id] = ws
            for i in range(len(ws) - k + 1):
                grams[tuple(ws[i:i + k])].append((doc_id, i + 1))
        marked = defaultdict(list)  # doc -> [pos]
        for occs in grams.values():
            if len(occs) > 1:
                for doc_id, pos in sorted(occs)[1:]:
                    marked[doc_id].append(pos)
        out = []
        for doc_id, positions in marked.items():
            positions = sorted(set(positions))
            start = prev = positions[0]
            for p in positions[1:]:
                if p - prev <= k:
                    prev = p
                else:
                    out.append((doc_id, start, prev + k - 1))
                    start = prev = p
            out.append((doc_id, start, prev + k - 1))
        return sorted(out)

    @pytest.mark.parametrize("seed", range(3))
    def test_matches_bruteforce(self, spark, seed):
        import random
        rng = random.Random(seed)
        vocab = [f"w{i}" for i in range(12)]  # tiny vocab => many repeats
        docs = [(d, " ".join(rng.choice(vocab)
                             for _ in range(rng.randint(2, 60))))
                for d in range(1, 15)]
        k = 3 + (seed % 2)
        assert _spark_spans_k(spark, docs, k) == self._expected(docs, k)


def test_remove_duplicate_spans(spark):
    """The cleaned corpus keeps the first occurrence of the boilerplate
    verbatim and excises every later copy; untouched docs pass through
    byte-identical (modulo the shared lowercase tokenizer)."""
    from agnostic_blockchain_etl_spark.operators.spans import (
        remove_duplicate_spans)
    out = {r.doc_id: r for r in
           remove_duplicate_spans(
               spark.createDataFrame(DOCS, "doc_id long, text string"),
               K).collect()}
    assert out[1].text == DOCS[0][1].lower() and out[1].n_removed == 0
    assert out[3].text == DOCS[2][1].lower()
    # doc 2: boilerplate words 4..12 removed, head and tail survive
    assert out[2].text == "unrelated words here and a different tail entirely"
    assert out[2].n_removed == 9
    # doc 4 was ENTIRELY boilerplate -> empty text, all words removed
    assert out[4].text == "" and out[4].n_removed == 9
    # word accounting is exact
    for d, t in DOCS:
        assert out[d].n_words + out[d].n_removed == len(t.split())


def test_removal_leaves_no_duplicate_spans_behind(spark):
    """Fixpoint: running the detector on the CLEANED corpus finds
    nothing (the definition of successful span dedup)."""
    from agnostic_blockchain_etl_spark.operators.spans import (
        remove_duplicate_spans)
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    cleaned = remove_duplicate_spans(docs, K).select("doc_id", "text")
    assert duplicate_spans(cleaned, K).count() == 0


class TestDecontaminateSpans:
    K = 5

    def _frames(self, spark):
        eval_passage = " ".join(f"e{i}" for i in range(15))
        train = [
            # planted: the 15-word eval passage verbatim, mid-document
            (1, "alpha beta gamma " + eval_passage + " delta epsilon"),
            # clean document, no overlap at all
            (2, " ".join(f"c{i}" for i in range(20))),
            # whole document IS eval content
            (3, eval_passage),
            # shorter than k: can never match
            (4, "tiny doc"),
        ]
        evals = [(100, "header text " + eval_passage + " footer words")]
        return (spark.createDataFrame(train, "doc_id long, text string"),
                spark.createDataFrame(evals, "doc_id long, text string"))

    def test_excises_planted_overlap_keeps_remainder(self, spark):
        from agnostic_blockchain_etl_spark.operators.spans import (
            decontaminate_spans)
        train, evals = self._frames(spark)
        got = {r.doc_id: r for r in
               decontaminate_spans(train, evals, k=self.K).collect()}
        assert set(got) == {1, 2, 3, 4}
        # doc 1: exactly the 15 planted words removed, remainder intact
        assert got[1].text == "alpha beta gamma delta epsilon"
        assert got[1].n_removed == 15 and got[1].n_words == 5
        # doc 2: untouched
        assert got[2].n_removed == 0
        assert got[2].text == " ".join(f"c{i}" for i in range(20))
        # doc 3: fully excised
        assert got[3].text == "" and got[3].n_words == 0 \
            and got[3].n_removed == 15
        # doc 4: below k, untouched
        assert got[4].n_removed == 0 and got[4].text == "tiny doc"

    def test_no_first_occurrence_keeper(self, spark):
        """Unlike span DEDUP, the eval passage must not survive in ANY
        train doc — two train docs carrying the same eval run both lose
        it."""
        from agnostic_blockchain_etl_spark.operators.spans import (
            decontaminate_spans)
        passage = " ".join(f"p{i}" for i in range(8))
        train = spark.createDataFrame(
            [(1, "lead " + passage), (2, passage + " tail")],
            "doc_id long, text string")
        evals = spark.createDataFrame([(9, passage)],
                                      "doc_id long, text string")
        got = {r.doc_id: r for r in
               decontaminate_spans(train, evals, k=self.K).collect()}
        assert got[1].text == "lead" and got[1].n_removed == 8
        assert got[2].text == "tail" and got[2].n_removed == 8


def test_null_text_word_count_zero_not_negative(spark):
    """Round-8 review: size(split(NULL)) = -1 reported n_words = -1
    (and a -0.0 duplicated fraction) for null-text documents in the
    corpus-health stats."""
    from agnostic_blockchain_etl_spark.operators.spans import (
        span_dedup_stats)
    docs = spark.createDataFrame(
        [(1, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9 w0 w1 w2 w3 w4 w5 w6 w7 "
             "w8 w9"),
         (2, None)], "doc_id long, text string")
    got = {r.doc_id: r for r in span_dedup_stats(docs, k=10).collect()}
    assert got[2].n_words == 0 and got[2].n_dup_spans == 0
    assert got[2].dup_word_frac is None
    assert got[1].n_words == 20

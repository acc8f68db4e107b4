"""One-call corpus curation: every stage's verdict lands as a column,
the final keep is their conjunction, planted bad documents die for the
right reason, and the report is consistent with the flags."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.curate import (  # noqa: E402
    curate_corpus)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def corpus(spark):
    """Real corpus plus planted offenders: an exact duplicate (doc_id
    900001 copies the corpus's min doc), a PII doc, and a too-short doc."""
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text", "lang"))
    victim = docs.orderBy("doc_id").limit(1).collect()[0]
    filler = " ".join(f"token{i}" for i in range(40))
    planted = spark.createDataFrame(
        [(900001, victim.text, victim.lang),
         (900002, f"{filler} write to alice@example.com today", "en"),
         (900003, "way too short", "en")],
        "doc_id long, text string, lang string")
    return docs.unionByName(planted), victim.doc_id


@pytest.fixture(scope="module")
def curated(spark, corpus):
    docs, victim_id = corpus
    annotated, report = curate_corpus(docs, vocab_size=5000)
    rows = {r.doc_id: r for r in annotated.collect()}
    return rows, report.collect()[0], victim_id, docs.count()


def test_every_doc_annotated_once(curated):
    rows, report, _, n = curated
    assert len(rows) == n == report.n_docs


def test_keep_is_conjunction_of_flags(curated):
    rows, _, _, _ = curated
    for r in rows.values():
        assert r.keep == (r.pii_clean * r.quality_keep * r.exact_keep
                          * r.neardup_keep * r.decontam_keep * r.clf_keep
                          * r.lm_keep)
        assert r.clf_keep == 1 and r.q_score is None   # no model passed


def test_planted_offenders_die_for_the_right_reason(curated):
    rows, _, victim_id, _ = curated
    dup = rows[900001]
    assert dup.exact_keep == 0 and dup.keep == 0
    assert rows[victim_id].exact_keep == 1, "first occurrence survives"
    pii = rows[900002]
    assert pii.pii_clean == 0 and pii.keep == 0
    assert "alice@example.com" not in pii.text, "output text is redacted"
    assert "<EMAIL>" in pii.text
    short = rows[900003]
    assert short.quality_keep == 0 and short.keep == 0


def test_report_matches_flags(curated):
    rows, report, _, _ = curated
    assert report.n_kept == sum(r.keep for r in rows.values())
    assert report.n_exact == sum(r.exact_keep for r in rows.values())
    assert report.kept_tokens == sum(r.n_words for r in rows.values()
                                     if r.keep)
    assert 0 < report.n_kept < report.n_docs


def test_lm_buckets_cover_terciles(curated):
    rows, _, _, _ = curated
    buckets = {r.bucket for r in rows.values()}
    assert buckets == {"head", "middle", "tail"}
    # drop_tail: every tail doc is lm-dropped, every head doc lm-kept
    for r in rows.values():
        assert r.lm_keep == (0 if r.bucket == "tail" else 1)


def test_decontamination_flag(spark, corpus):
    """Using a slice of the corpus as the 'benchmark' must flag exactly
    those documents as contaminated."""
    docs, _ = corpus
    eval_docs = docs.orderBy("doc_id").limit(5)
    eval_ids = {r.doc_id for r in eval_docs.select("doc_id").collect()}
    annotated, _ = curate_corpus(docs, eval_docs=eval_docs,
                                 vocab_size=5000)
    flags = {r.doc_id: r.decontam_keep for r in annotated.collect()}
    for d in eval_ids:
        assert flags[d] == 0, f"doc {d} is verbatim in the eval set"
    clean = [d for d in flags if d not in eval_ids and d != 900001]
    assert sum(flags[d] for d in clean) > len(clean) * 0.9


def test_curate_without_lang_column(spark):
    """lang only feeds the language-ID facet; a corpus without it curates
    with an 'und' default instead of failing."""
    filler = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, filler), (2, filler + " tail"), (3, filler)],
        "doc_id long, text string")
    annotated, report = curate_corpus(docs, vocab_size=100)
    rows = {r.doc_id: r for r in annotated.collect()}
    assert len(rows) == 3
    assert rows[3].exact_keep == 0          # dup of doc 1 still caught
    assert report.collect()[0].n_docs == 3


def test_null_text_docs_stay_annotated(spark):
    """Review finding: md5(NULL) keys never equi-join, so the exact-flag
    inner join silently DROPPED null-text docs from the annotated frame
    — filtered, not flagged. Every input doc must keep its row; distinct
    null-text docs are nobody's exact duplicates (the streaming null
    rule)."""
    filler = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, filler), (2, None), (3, filler), (4, None)],
        "doc_id long, text string")
    annotated, report = curate_corpus(docs, vocab_size=100)
    rows = {r.doc_id: r for r in annotated.collect()}
    assert set(rows) == {1, 2, 3, 4}        # one row per input, always
    assert report.collect()[0].n_docs == 4
    assert rows[3].exact_keep == 0          # real dup still caught
    # null-text docs are not duplicates of each other
    assert rows[2].exact_keep == 1 and rows[4].exact_keep == 1


@pytest.mark.heavy
def test_bigram_lm_option(spark, corpus):
    docs, _ = corpus
    annotated, report = curate_corpus(docs, vocab_size=2000, lm="bigram")
    r = report.collect()[0]
    assert r.n_docs == docs.count() and 0 < r.n_kept < r.n_docs
    import pytest as _pytest
    with _pytest.raises(ValueError, match="lm must be"):
        curate_corpus(docs, lm="trigram")


def test_corpus_datacard(spark, curated):
    from agnostic_blockchain_etl_spark.operators.curate import (
        corpus_datacard)
    rows, report, _, n = curated
    # rebuild a small annotated frame from the collected rows
    import pandas as pd
    ann = spark.createDataFrame(pd.DataFrame([r.asDict() for r in
                                              rows.values()]))
    card = {(r.section, r.key): r.value
            for r in corpus_datacard(ann).collect()}
    assert card[("size", "docs_in")] == n
    assert card[("size", "docs_kept")] == report.n_kept
    assert card[("size", "tokens_kept")] == report.kept_tokens
    assert card[("attrition", "exact_keep")] == n - report.n_exact
    kept_buckets = sum(v for (s, k), v in card.items() if s == "quality")
    assert kept_buckets == report.n_kept
    lang_docs = sum(v for (s, k), v in card.items()
                    if s == "language" and k.endswith("_docs"))
    assert lang_docs == report.n_kept


@pytest.mark.heavy
def test_gopher_stage_opt_in(spark, corpus):
    """gopher=True adds the document-shape conjunction to the keep rule;
    the synthetic corpus's short docs fail the 50-word floor, so the
    flag must actually bite."""
    docs, _ = corpus
    annotated, report = curate_corpus(docs, vocab_size=2000, gopher=True)
    r = report.collect()[0]
    assert r.n_gopher < r.n_docs, "short docs must fail the wc floor"
    for row in annotated.collect():
        expect = (row.pii_clean * row.quality_keep * row.exact_keep
                  * row.neardup_keep * row.decontam_keep
                  * row.gopher_keep * row.lm_keep)
        assert row.keep == expect


@pytest.mark.heavy
def test_paragraphs_stage_opt_in(spark):
    """paragraphs=True excises corpus-duplicated boilerplate paragraphs
    before any content-keyed stage: two docs identical except for the
    shared footer become exact duplicates AFTER the excision."""
    footer = "(c) 2026 example corp - navigation home about contact"
    docs = spark.createDataFrame(
        [(1, "These words form the first unique body.\n" + footer),
         (2, "A second entirely different body follows.\n" + footer),
         (3, "The third body shares nothing but the footer.\n" + footer)],
        "doc_id long, text string")
    annotated, report = curate_corpus(docs, vocab_size=500,
                                      paragraphs=True)
    rows = {r.doc_id: r for r in annotated.collect()}
    # doc 1 (smallest id) keeps the footer; 2 and 3 lose it
    assert rows[1].para_removed == 0
    assert rows[2].para_removed == 1 and rows[3].para_removed == 1
    assert footer in rows[1].text
    assert footer not in rows[2].text and footer not in rows[3].text
    assert report.collect()[0].n_paras_removed == 2
    # off by default: same corpus, no excision
    ann2, _ = curate_corpus(docs, vocab_size=500)
    assert all(r.para_removed == 0 for r in ann2.collect())
    assert all(footer in r.text for r in ann2.collect())


def test_c4_stage_opt_in(spark):
    """c4=True rewrites text from kept lines and the page verdict joins
    the keep conjunction; later stages (dedup keys included) see the
    CLEANED text."""
    good_line = "This is a proper sentence with enough words to pass."
    page = "\n".join([good_line] * 4)
    docs = spark.createDataFrame(
        [(1, page + "\nnoise line without punct"),
         (2, page),                 # exact dup of 1 AFTER cleaning
         (3, "bare words only\nno punctuation anywhere here")],
        "doc_id long, text string")
    annotated, report = curate_corpus(docs, vocab_size=500, c4=True)
    rows = {r.doc_id: r for r in annotated.collect()}
    assert rows[3].c4_keep == 0 and rows[3].keep == 0
    assert rows[1].c4_keep == 1 and rows[2].c4_keep == 1
    # after line surgery docs 1 and 2 are byte-identical -> exact dedup
    # must catch what the RAW texts would have missed
    assert rows[1].exact_keep == 1 and rows[2].exact_keep == 0
    assert report.collect()[0].n_c4 == 2


@pytest.mark.heavy
def test_quality_model_stage_opt_in(spark):
    """quality_model=<trained frame> scores every doc and joins the
    Pareto keep into the conjunction; best_duplicate=True re-picks each
    near-dup cluster's survivor as the argmax q_score."""
    from agnostic_blockchain_etl_spark.operators.quality import (
        train_quality_classifier)
    import random
    rng = random.Random(3)
    hi = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog"]
    lo = ["buy", "cheap", "pills", "click", "here", "now", "win", "cash"]

    def doc(vocab, n):
        return " ".join(rng.choice(vocab) for _ in range(n))

    model = train_quality_classifier(
        spark.createDataFrame([(i, doc(hi, 25)) for i in range(25)],
                              "doc_id long, text string"),
        spark.createDataFrame([(i, doc(lo, 25)) for i in range(25)],
                              "doc_id long, text string"),
        buckets=256, iters=20)

    # two near-duplicates: doc 11 is doc 10 with spammy filler appended,
    # so the classifier scores 11 LOWER; first-seen would keep 10 anyway
    # — make the LOW-quality one first-seen to prove best_duplicate wins.
    body = doc(hi, 60)
    docs = spark.createDataFrame(
        [(10, body + " buy cheap pills click here now win cash " * 3, "en"),
         (11, body, "en"),
         (20, doc(hi, 60), "en"),
         (30, doc(lo, 60), "en")],
        "doc_id long, text string, lang string")

    ann, report = curate_corpus(docs, vocab_size=500, quality_model=model,
                                best_duplicate=True)
    rows = {r.doc_id: r for r in ann.collect()}
    assert all(r.q_score is not None for r in rows.values())
    assert rows[11].q_score > rows[10].q_score
    # best_duplicate: the higher-scored near-dup survives, not doc 10
    assert rows[11].neardup_keep == 1 and rows[10].neardup_keep == 0
    assert report.collect()[0].n_clf == sum(
        r.clf_keep for r in rows.values())
    # conjunction includes clf_keep
    for r in rows.values():
        assert r.keep == (r.pii_clean * r.quality_keep * r.exact_keep
                          * r.neardup_keep * r.decontam_keep * r.clf_keep
                          * r.lm_keep)
    # first-seen default keeps doc 10 on the same corpus
    ann2, _ = curate_corpus(docs, vocab_size=500, quality_model=model)
    rows2 = {r.doc_id: r for r in ann2.collect()}
    assert rows2[10].neardup_keep == 1 and rows2[11].neardup_keep == 0
    # guard: best_duplicate without a model is an error
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curate_corpus(docs, best_duplicate=True)


@pytest.mark.heavy
def test_source_cap_stage_opt_in(spark):
    """source_cap=<n> joins the exact per-source frequency cap into the
    conjunction; sources under the cap keep everything."""
    filler = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, f"{filler} doc {i}", "en", "hot") for i in range(12)] +
        [(100 + i, f"{filler} other {i}", "en", "cold") for i in range(3)],
        "doc_id long, text string, lang string, source string")
    ann, report = curate_corpus(docs, vocab_size=200, source_cap=5)
    rows = {r.doc_id: r for r in ann.collect()}
    r = report.collect()[0]
    hot = [rows[i].cap_keep for i in range(12)]
    cold = [rows[100 + i].cap_keep for i in range(3)]
    assert sum(hot) == 5 and sum(cold) == 3
    assert r.n_cap == 8
    for row in rows.values():
        assert row.keep <= row.cap_keep      # cap joins the conjunction
    # neutral without the knob
    ann2, _ = curate_corpus(docs, vocab_size=200)
    assert all(r.cap_keep == 1 for r in ann2.collect())
    # missing source column is an error
    import pytest as _pytest
    with _pytest.raises(ValueError, match="source"):
        curate_corpus(docs.drop("source"), source_cap=5)


@pytest.mark.heavy
def test_all_stages_compose(spark):
    """Every opt-in stage enabled at once: the keep flag is still the
    full conjunction and each verdict column is present — the seams
    between stages (text surgery ordering, score joins, cap joins)
    compose without column collisions."""
    from agnostic_blockchain_etl_spark.operators.quality import (
        train_quality_classifier)
    long_doc = " ".join(f"token{i} word prose line" for i in range(30))
    docs = spark.createDataFrame(
        [(i, f"{long_doc} unique tail {i}\nshared footer line", "en",
          f"src{i % 2}") for i in range(8)],
        "doc_id long, text string, lang string, source string")
    model = train_quality_classifier(
        docs.select("doc_id", "text").limit(4),
        spark.createDataFrame([(100 + i, "buy cheap pills now " * 10)
                               for i in range(4)],
                              "doc_id long, text string"),
        buckets=128, iters=5)
    ann, report = curate_corpus(
        docs, vocab_size=300, c4=True, gopher=True, paragraphs=True,
        quality_model=model, best_duplicate=True, source_cap=3)
    rows = ann.collect()
    assert len(rows) == 8
    r = report.collect()[0]
    assert r.n_cap == 6                      # 2 sources x cap 3
    for row in rows:
        assert row.keep == (row.pii_clean * row.quality_keep
                            * row.exact_keep * row.neardup_keep
                            * row.decontam_keep * row.gopher_keep
                            * row.c4_keep * row.clf_keep * row.cap_keep
                            * row.lm_keep)


@pytest.mark.heavy
def test_persist_flag_caches_the_annotated_frame(spark):
    """persist=True materializes the curation once: the returned frame
    is cached and report + annotated actions reuse it (values equal the
    uncached run)."""
    filler = " ".join(f"word{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(i, f"{filler} tail {i}", "en") for i in range(6)],
        "doc_id long, text string, lang string")
    ann, report = curate_corpus(docs, vocab_size=100, persist=True)
    try:
        assert ann.storageLevel.useMemory       # actually persisted
        r = report.collect()[0]
        rows = {x.doc_id: x.keep for x in ann.collect()}
        ann2, report2 = curate_corpus(docs, vocab_size=100)
        assert {x.doc_id: x.keep for x in ann2.collect()} == rows
        assert report2.collect()[0].n_kept == r.n_kept
    finally:
        ann.unpersist()

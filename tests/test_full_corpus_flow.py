"""Capstone: the WHOLE corpus engine end-to-end on real testdata —
curate (scrub/quality/dedup/LM) → compose (mix + budgets) → exact
heldout split → reproducible training order → chunk → pack →
token-balanced shard write → datacard — asserting the global
invariants that hold across stage boundaries (token conservation,
shard balance, id coverage, permutation exactness, manifest
consistency)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"


pytestmark = pytest.mark.heavy  # builder-side e2e/fuzz; driver gate covers families via the fast tests

@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def test_full_flow(spark, tmp_path):
    from agnostic_blockchain_etl_spark.operators import (
        chunk, corpus_datacard, curate_corpus, load_tables, pack_sequences,
        write_training_shards)

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"] \
        .select("doc_id", "text", "lang")
    n_in = docs.count()

    annotated, report = curate_corpus(docs, vocab_size=10_000)
    rep = report.collect()[0]
    assert rep.n_docs == n_in and 0 < rep.n_kept < n_in

    # composition phase (round 9): mix over the curated survivors +
    # absolute token budgets, one call — the capstone now exercises
    # the full curate -> compose -> pack -> shard chain
    from agnostic_blockchain_etl_spark.operators import compose_corpus_mix
    composed, comp_rep = compose_corpus_mix(
        annotated, target={"en": 2, "zh": 1, "de": 1, "fr": 1},
        token_budgets={"en": 4000, "zh": 2000, "de": 2000, "fr": 2000},
        persist=True)   # three actions below: one materialization
    assert composed.count() == n_in                     # no row loss
    comp = {r.stratum: r for r in comp_rep.collect()}
    assert comp["en"].final_tokens <= 4000              # budgets exact
    assert comp["es"].n_final == 0                      # untargeted
    n_final = composed.where("final_keep = 1").count()
    assert 0 < n_final < rep.n_kept

    # post-composition phase (round 10): exact heldout carving +
    # reproducible training order over the final corpus — the stages a
    # loader consumes after composition decides WHAT trains
    from agnostic_blockchain_etl_spark.operators import (
        global_order_index, interleaved_order_index,
        stratified_split_exact)
    final = composed.where("final_keep = 1")
    split = stratified_split_exact(final.select("doc_id", "lang"),
                                   {"val": 5}, strat_col="lang")
    assert split.count() == n_final                     # no row loss
    per = {r.lang: r.c for r in split.where("split = 'val'")
           .groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert all(v <= 5 for v in per.values()) and per   # exact carve
    train = split.where("split = 'train'") \
        .join(final.select("doc_id", "lang"), ["doc_id", "lang"])
    ordered = interleaved_order_index(
        global_order_index(train, salt="cap-epoch0:"),
        group_col="lang")
    n_train = train.count()
    got = ordered.agg(F.countDistinct("ord"), F.max("ord"),
                      F.countDistinct("ord_ilv")).collect()[0]
    assert tuple(got) == (n_train, n_train, n_train)   # permutations
    # interleave: the first full round covers every live language once
    langs = train.select("lang").distinct().count()
    head = [r.lang for r in
            ordered.orderBy("ord_ilv").limit(langs).collect()]
    assert len(set(head)) == langs

    # retrieval phase (round 10): leakage hunt + store-path QA over the
    # FINAL corpus — BM25 eval queries rank the trained-on docs, and
    # the day-N statistics-store path must reproduce the one-shot
    # scores bit-for-bit on the same corpus (the operator contract,
    # here exercised at a real phase boundary)
    from agnostic_blockchain_etl_spark.operators import (
        bm25_scores, bm25_scores_from_stats, bm25_stats, bm25_topk)
    final_docs = composed.where("final_keep = 1").select("doc_id", "text")
    evalq = {0: "hash join scan", 1: "window batch merge"}
    leak = bm25_topk(final_docs, evalq, k=5).collect()
    assert leak, "eval queries must hit the final corpus"
    per_q: dict = {}
    for r in leak:
        per_q.setdefault(r.query_id, []).append(r)
    for rs in per_q.values():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert all(a.score >= b.score for a, b in zip(rs, rs[1:]))
    one_shot = {(r.query_id, r.doc_id): r.score
                for r in bm25_scores(final_docs, evalq).collect()}
    via_store = {(r.query_id, r.doc_id): r.score
                 for r in bm25_scores_from_stats(
                     final_docs, evalq, bm25_stats(final_docs)).collect()}
    assert via_store == one_shot            # bit-identical, post-compose

    kept = annotated.where("keep = 1").select("doc_id", "text")
    # pack's `shard` is its packing-stream id, a different concept from
    # the writer's output shard — rename to compose (the writer raises
    # on the collision rather than silently overwriting, tested below)
    chunks = pack_sequences(chunk(kept)) \
        .withColumnRenamed("shard", "pack_stream")
    # every kept doc chunks; chunk text reassembles under the packer
    assert chunks.select("doc_id").distinct().count() == rep.n_kept
    tok_total = chunks.agg(F.sum("n_tokens")).collect()[0][0]

    path = str(tmp_path / "shards")
    manifest = write_training_shards(
        chunks, path, "n_tokens", 4,
        key_col="doc_id", order_cols=("doc_id", "chunk_id")).collect()
    assert sum(r.n_rows for r in manifest) == chunks.count()
    assert sum(r.total_weight for r in manifest) == tok_total
    ws = [r.total_weight for r in manifest]
    assert max(ws) / min(ws) < 1.3, "shards must be token-balanced"

    back = spark.read.parquet(path)
    assert back.count() == chunks.count()
    assert back.select("doc_id").distinct().count() == rep.n_kept

    card = {(r.section, r.key): r.value
            for r in corpus_datacard(annotated).collect()}
    assert card[("size", "docs_kept")] == rep.n_kept
    assert card[("size", "tokens_kept")] == rep.kept_tokens
    # chunk tokens exceed document tokens: the 32/24 sliding windows
    # overlap by 8, re-counting the overlap region of every window
    assert tok_total >= card[("size", "tokens_kept")]
    assert tok_total <= card[("size", "tokens_kept")] * 32 / 24 + \
        32 * rep.n_kept


def test_shard_column_collision_is_an_error(spark):
    from agnostic_blockchain_etl_spark.operators import (
        balanced_shard_assign)
    df = spark.createDataFrame([(1, 10, 0)],
                               "doc_id long, n_tokens long, shard int")
    with pytest.raises(ValueError, match="shard"):
        balanced_shard_assign(df, "n_tokens", 2)


def test_full_flow_round4_recipe(spark, tmp_path):
    """The round-4 recipe end-to-end on real testdata: train a quality
    classifier on corpus extremes → curate with the trained filter,
    best-duplicate keeper, paragraph excision and per-source caps →
    DSIR-select toward the English slice → shuffled token-balanced
    shard write. Asserts the cross-stage invariants (every stage's
    verdict is a column, selection ⊆ kept, shards cover the selection,
    same-salt writes replay identically)."""
    from agnostic_blockchain_etl_spark.operators import (
        chunk, curate_corpus, dsir_sample, load_tables,
        train_quality_classifier, write_training_shards)

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"] \
        .select("doc_id", "text", "lang", "source", "n_chars")
    n_in = docs.count()

    # bounded training sample: long docs as 'reference', short as crawl
    pos = docs.where(F.col("n_chars") > 400).limit(80) \
        .select("doc_id", "text")
    neg = docs.where(F.col("n_chars") <= 400).limit(80) \
        .select("doc_id", "text")
    model = train_quality_classifier(pos, neg, buckets=1024, iters=8)

    annotated, report = curate_corpus(
        docs.select("doc_id", "text", "lang", "source"),
        vocab_size=10_000, paragraphs=True, quality_model=model,
        best_duplicate=True, source_cap=20)
    # materialize the phase boundary: every later action would
    # otherwise re-execute the whole curate DAG (~20 s a pop)
    annotated = annotated.cache()
    rep = report.collect()[0]
    assert rep.n_docs == n_in
    assert 0 < rep.n_kept < n_in
    assert rep.n_cap < n_in           # 25-doc sources, cap 20: must bite
    assert rep.n_clf <= n_in
    rows = annotated.collect()
    for r in rows:                     # conjunction over ALL stages
        assert r.keep == (r.pii_clean * r.quality_keep * r.exact_keep
                          * r.neardup_keep * r.decontam_keep
                          * r.gopher_keep * r.c4_keep * r.clf_keep
                          * r.cap_keep * r.lm_keep)
        assert r.q_score is not None

    # DSIR selection toward the en slice, restricted to kept docs
    kept = annotated.where("keep = 1").select("doc_id", "text")
    n_kept = kept.count()
    k = max(10, n_kept // 2)
    target = annotated.where("keep = 1 AND lang = 'en'") \
        .select("doc_id", "text")
    selected = dsir_sample(kept, target, k=k, buckets=2048).cache()
    assert selected.count() == k
    kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert {r.doc_id for r in selected.select("doc_id").collect()} \
        <= kept_ids

    # shuffled shard write over the selection's chunks
    chunks = chunk(selected.select("doc_id", "text")).cache()
    p1, p2 = str(tmp_path / "sh1"), str(tmp_path / "sh2")
    m1 = write_training_shards(chunks, p1, "n_tokens", 4,
                               shuffle_salt="round4").collect()
    write_training_shards(chunks, p2, "n_tokens", 4,
                          shuffle_salt="round4")
    assert sum(r.n_rows for r in m1) == chunks.count()
    a = [r.doc_id for r in spark.read.parquet(p1).collect()]
    b = [r.doc_id for r in spark.read.parquet(p2).collect()]
    assert sorted(a) == sorted(b)
    assert spark.read.parquet(p1).select("doc_id").distinct().count() \
        == selected.count()


def test_last_mile_flow(spark, tmp_path):
    """The r11 last mile (r10 verdict asks #3/#4): curate →
    budget-capped compose → UNIFIED epoch mix (`allow_epochs` routing,
    rates straddling 1) → chunk → pack → pack_manifest → interleaved
    training order → composite-key shard write, graded by the
    retrieval family (BM25 hard negatives off the final corpus,
    recall@k + nDCG@k over the corpus embeddings) — with row/token
    conservation asserted at every stage boundary."""
    from agnostic_blockchain_etl_spark.operators import (
        ann_recall, bm25_hard_negatives, chunk, compose_corpus_mix,
        curate_corpus, global_order_index, interleaved_order_index,
        load_tables, pack_manifest, pack_sequences, write_training_shards)
    from agnostic_blockchain_etl_spark.operators.mixture import _n_tokens

    docs = load_tables(spark, SF_DIR, ("documents",))["documents"] \
        .select("doc_id", "text", "lang")
    n_in = docs.count()
    annotated, report = curate_corpus(docs, vocab_size=10_000)
    assert report.collect()[0].n_docs == n_in          # stage 1 conserves

    # stage 2 — budget cap (epoch repetition must be the LAST pass, so
    # budgets run in their own compose call first)
    budgets = {"en": 5000, "zh": 2500, "de": 2000, "fr": 2000, "es": 2000}
    capped, cap_rep = compose_corpus_mix(annotated, token_budgets=budgets)
    assert capped.count() == n_in                      # flag-don't-drop
    for r in cap_rep.collect():
        assert r.final_tokens <= budgets[r.stratum]    # budgets exact

    survivors = capped.where("final_keep = 1") \
        .select("doc_id", "text", "lang") \
        .withColumn("keep", F.lit(1)).cache()
    n_surv = survivors.count()
    surv_tokens = survivors.agg(
        F.sum(_n_tokens("text"))).collect()[0][0]

    # stage 3 — the unified mixed regime: one call, rates straddle 1
    target = {"en": 0.25, "zh": 0.375, "de": 0.1875, "fr": 0.1875}
    mixed, mix_rep = compose_corpus_mix(survivors, target=target,
                                        allow_epochs=True)
    plan = {r.stratum: r.rate for r in mix_rep.collect()
            if r.rate is not None}
    assert any(v > 1.0 for v in plan.values())         # epochs planned
    assert any(0.0 < v < 1.0 for v in plan.values())   # and downsampling
    emitted = mixed.where("final_keep = 1").cache()
    emit_tokens = emitted.agg(F.sum(_n_tokens("text"))).collect()[0][0]
    # token preservation is the anchor's contract: the emitted total
    # matches the survivor total within the fractional-draw noise
    assert emit_tokens == pytest.approx(surv_tokens, rel=0.10)
    # per-row conservation: every survivor appears; epochs 1..n each
    per_doc = {r.doc_id: r.n for r in emitted.groupBy("doc_id")
               .agg(F.count("*").alias("n")).collect()}
    dropped = mixed.where("final_keep = 0").select("doc_id").distinct()
    assert len(per_doc) + dropped.count() == n_surv

    # stage 4 — composite (doc, epoch) identity, chunk, pack, manifest
    rep_docs = emitted.select(
        (F.col("doc_id") * 100 + F.col("epoch")).alias("doc_id"),
        "text", "lang").cache()
    n_rep = rep_docs.count()
    chunks = pack_sequences(chunk(rep_docs.select("doc_id", "text"))) \
        .withColumnRenamed("shard", "pack_stream").cache()
    n_chunkable = rep_docs.where(_n_tokens("text") > 0).count()
    assert chunks.select("doc_id").distinct().count() == n_chunkable
    tok_total = chunks.agg(F.sum("n_tokens")).collect()[0][0]
    man = pack_manifest(
        chunks.withColumnRenamed("pack_stream", "shard")).cache()
    assert man.agg(F.sum("n_tokens")).collect()[0][0] == tok_total
    bad = man.where(F.size("members") != F.col("n_chunks")).count()
    assert bad == 0 and man.where("spill_tokens < 0").count() == 0

    # stage 5 — reproducible interleaved training order over the
    # REPEATED corpus (composite ids keep the permutation total)
    ordered = interleaved_order_index(
        global_order_index(rep_docs, salt="lastmile:"), group_col="lang")
    got = ordered.agg(F.countDistinct("ord"), F.max("ord"),
                      F.countDistinct("ord_ilv")).collect()[0]
    assert tuple(got) == (n_rep, n_rep, n_rep)

    # stage 6 — shard write keyed by the composite id: copies of one
    # document must SCATTER, not cluster
    path = str(tmp_path / "lastmile")
    shard_man = write_training_shards(
        chunks, path, "n_tokens", 4,
        key_col="doc_id", order_cols=("doc_id", "chunk_id")).collect()
    assert sum(r.n_rows for r in shard_man) == chunks.count()
    assert sum(r.total_weight for r in shard_man) == tok_total
    back = spark.read.parquet(path) \
        .select((F.col("doc_id") / 100).cast("long").alias("orig"),
                "shard").distinct()
    multi = (back.groupBy("orig")
             .agg(F.countDistinct("shard").alias("s")).where("s > 1"))
    assert multi.count() > 0, "epoch copies must spread across shards"

    # stage 7 — retrieval grading of the final corpus: hard negatives
    # exclude the labeled positive and rank contiguously; the ANN
    # grader scores the corpus embeddings sanely
    uniq = survivors.select("doc_id", "text")
    top = bm25_hard_negatives(
        uniq, {0: "hash join scan"},
        spark.createDataFrame([(0, -1)], "query_id int, doc_id long"),
        k=5).collect()
    assert top and [r.rank for r in sorted(top, key=lambda r: r.rank)] \
        == list(range(1, len(top) + 1))
    pos_id = top[0].doc_id
    neg = bm25_hard_negatives(
        uniq, {0: "hash join scan"},
        spark.createDataFrame([(0, int(pos_id))],
                              "query_id int, doc_id long"), k=5).collect()
    assert pos_id not in {r.doc_id for r in neg}
    from agnostic_blockchain_etl_spark.operators.similarity import (
        emb_cosine_topk, emb_lsh_bucketed_search)
    rec = ann_recall(emb_cosine_topk(spark, SF_DIR),
                     emb_lsh_bucketed_search(spark, SF_DIR), 5).collect()
    assert len(rec) == 8 and all(0.0 <= r.recall <= 1.0 for r in rec)
    from agnostic_blockchain_etl_spark.operators.retrieval import \
        ndcg_label_lsh
    nd = ndcg_label_lsh(spark, SF_DIR).collect()
    assert len(nd) == 8 and all(0.0 <= r.ndcg <= 1.0 for r in nd)

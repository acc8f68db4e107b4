"""BM25 retrieval + ANN recall (`operators/retrieval.py`): score
exactness against a pure-Python Okapi BM25 reference, ranking
determinism, the flag-don't-drop N convention, and the recall metric's
missed-query semantics. Cross-engine value parity is pinned by the
registered `bm25_topk_search` / `ann_recall_at_k` oracle pairs."""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.retrieval import (  # noqa: E402
    _GATE_QUERIES, _tokenize, ann_recall, bm25_hard_negatives, bm25_scores,
    bm25_scores_from_stats, bm25_stats, bm25_topk, merge_bm25_stats,
    ndcg_at_k, rrf_fuse)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

_K1, _B = 1.2, 0.75


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


_DOCS = [(1, "hash join hash"),
         (2, "hash join window"),
         (3, "merge sort the window"),
         (4, None),
         (5, "scan scan scan scan")]
_QUERIES = {0: "hash join", 1: "window"}


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(_DOCS, "doc_id long, text string")


def _py_bm25(docs, queries, k1=_K1, b=_B):
    """Independent reference: same formula, pure Python floats."""
    toks = {d: (t.strip().lower().split() if t is not None else None)
            for d, t in docs}
    dls = [len(w) for w in toks.values() if w is not None]
    n_docs = float(len(docs))          # NULL text still counts toward N
    avgdl = sum(dls) / len(dls)
    out = {}
    for qid, qtext in queries.items():
        for term in set(_tokenize(qtext)):
            dfreq = sum(1 for w in toks.values() if w and term in w)
            if dfreq == 0:
                continue
            idf = math.log(1.0 + (n_docs - dfreq + 0.5) / (dfreq + 0.5))
            for d, w in toks.items():
                if not w or term not in w:
                    continue
                tf, dl = float(w.count(term)), float(len(w))
                c = (idf * (tf * (k1 + 1.0))
                     / (tf + k1 * (1.0 - b + b * dl / avgdl)))
                out[(qid, d)] = out.get((qid, d), 0.0) + c
    return {k: round(v, 4) for k, v in out.items()}


class TestBm25Scores:
    def test_matches_python_reference(self, spark, docs):
        got = {(r.query_id, r.doc_id): r.score
               for r in bm25_scores(docs, _QUERIES).collect()}
        want = _py_bm25(_DOCS, _QUERIES)
        assert set(got) == set(want)
        for key in want:
            assert got[key] == pytest.approx(want[key], abs=1e-6), key

    def test_tf_saturation_and_length_penalty(self, spark, docs):
        got = {(r.query_id, r.doc_id): r.score
               for r in bm25_scores(docs, _QUERIES).collect()}
        # doc 1 has tf(hash)=2 vs doc 2's 1 at equal dl -> higher score
        assert got[(0, 1)] > got[(0, 2)] > 0
        # 'window': doc 2 (dl=3) beats doc 3 (dl=4) at equal tf=1
        assert got[(1, 2)] > got[(1, 3)]

    def test_null_text_never_scores_but_counts_toward_n(self, spark, docs):
        scored = bm25_scores(docs, _QUERIES).collect()
        assert all(r.doc_id != 4 for r in scored)
        # the python reference (which counts doc 4 in N) agrees exactly,
        # so N=5 is what the engine used; with N=4 idf shifts by >1e-3
        want = _py_bm25(_DOCS, _QUERIES)
        got = {(r.query_id, r.doc_id): r.score for r in scored}
        assert got == pytest.approx(want, abs=1e-6)

    def test_duplicate_query_terms_count_once(self, spark, docs):
        once = {(r.query_id, r.doc_id): r.score
                for r in bm25_scores(docs, {0: "hash"}).collect()}
        twice = {(r.query_id, r.doc_id): r.score
                 for r in bm25_scores(docs, {0: "hash hash"}).collect()}
        assert once == twice

    def test_unmatched_query_produces_no_rows(self, spark, docs):
        scored = bm25_scores(docs, {0: "hash", 7: "zzz_absent"}).collect()
        assert {r.query_id for r in scored} == {0}

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError):
            bm25_scores(docs, {})
        with pytest.raises(ValueError):
            bm25_scores(docs, {0: "   "})
        with pytest.raises(ValueError):
            bm25_topk(docs, {0: "hash"}, k=0)


class TestBm25TopK:
    def test_rank_contiguous_and_cut(self, spark, docs):
        rows = bm25_topk(docs, _QUERIES, k=2).collect()
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for qid, rs in by_q.items():
            ranks = sorted(r.rank for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            assert len(rs) <= 2
            srt = sorted(rs, key=lambda r: (-r.score, r.doc_id))
            assert [r.rank for r in srt] == ranks

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            bm25_topk_search
        rows = bm25_topk_search(spark, SF_DIR).collect()
        assert rows, "gate workload found no matches"
        assert {r.query_id for r in rows} <= set(_GATE_QUERIES)
        assert all(r.score > 0 and 1 <= r.rank <= 10 for r in rows)

    def test_scan_reads_only_id_and_text(self, spark):
        import contextlib
        import io
        import re
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            bm25_topk_search
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            bm25_topk_search(spark, SF_DIR).explain("formatted")
        for m in re.finditer(r"ReadSchema: struct<([^>]*)>", buf.getvalue()):
            cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
            assert cols <= {"doc_id", "text"}, cols


class TestAnnRecall:
    def test_metric(self, spark):
        exact = spark.createDataFrame(
            [(0, 10), (0, 11), (1, 20), (1, 21)],
            "query_id long, neighbor_id long")
        approx = spark.createDataFrame(
            [(0, 10), (0, 12)], "query_id long, neighbor_id long")
        got = {r.query_id: r for r in ann_recall(exact, approx, 2).collect()}
        assert got[0].n_hit == 1 and got[0].n_candidates == 2
        assert got[0].recall == pytest.approx(0.5)
        # query 1 missed entirely by the index: present, zero — not absent
        assert got[1].n_hit == 0 and got[1].n_candidates == 0
        assert got[1].recall == 0.0

    def test_perfect_index_scores_one(self, spark):
        exact = spark.createDataFrame(
            [(0, 10), (0, 11)], "query_id long, neighbor_id long")
        got = ann_recall(exact, exact, 2).collect()
        assert len(got) == 1 and got[0].recall == pytest.approx(1.0)

    def test_validation(self, spark):
        exact = spark.createDataFrame(
            [(0, 10)], "query_id long, neighbor_id long")
        with pytest.raises(ValueError):
            ann_recall(exact, exact, 0)

    def test_short_exact_list_reaches_recall_one(self, spark):
        # r10 ADVICE: a query whose truth list has FEWER than k rows
        # must still score 1.0 when the index surfaces all of them —
        # the denominator is min(k, |exact_q|), not the constant k
        exact = spark.createDataFrame(
            [(0, 10)], "query_id long, neighbor_id long")
        approx = spark.createDataFrame(
            [(0, 10), (0, 11), (0, 12)], "query_id long, neighbor_id long")
        got = ann_recall(exact, approx, 5).collect()
        assert len(got) == 1 and got[0].recall == pytest.approx(1.0)
        assert got[0].n_hit == 1

    def test_duplicate_input_rows_collapse(self, spark):
        # inputs are sets: duplicated (query, neighbor) pairs must not
        # inflate n_hit / n_candidates past the set semantics
        exact = spark.createDataFrame(
            [(0, 10), (0, 10), (0, 11)], "query_id long, neighbor_id long")
        approx = spark.createDataFrame(
            [(0, 10), (0, 10)], "query_id long, neighbor_id long")
        got = ann_recall(exact, approx, 2).collect()[0]
        assert got.n_hit == 1 and got.n_candidates == 1
        assert got.recall == pytest.approx(0.5)

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            ann_recall_at_k
        rows = ann_recall_at_k(spark, SF_DIR).collect()
        assert len(rows) == 8          # one row per query vector
        for r in rows:
            assert 0 <= r.n_hit <= 5 and 0.0 <= r.recall <= 1.0
            assert r.n_hit <= r.n_candidates


class TestRrfFuse:
    def test_both_lists_beat_single_list(self, spark):
        a = spark.createDataFrame([(0, 10, 1), (0, 11, 2)],
                                  "query_id long, neighbor_id long, rank int")
        b = spark.createDataFrame([(0, 10, 2), (0, 12, 1)],
                                  "query_id long, neighbor_id long, rank int")
        got = {r.neighbor_id: r for r in rrf_fuse([a, b]).collect()}
        # item 10 appears in both lists: 1/61 + 1/62 > any single 1/61
        assert got[10].fused_rank == 1
        assert got[10].rrf_score == pytest.approx(
            round(1 / 61 + 1 / 62, 6))
        assert got[12].rrf_score == pytest.approx(round(1 / 61, 6))
        # 12 (rank 1) beats 11 (rank 2) among single-list items
        assert got[12].fused_rank == 2 and got[11].fused_rank == 3

    def test_topn_cut_and_validation(self, spark):
        a = spark.createDataFrame([(0, 10, 1), (0, 11, 2), (0, 12, 3)],
                                  "query_id long, neighbor_id long, rank int")
        assert rrf_fuse([a], topn=2).count() == 2
        with pytest.raises(ValueError):
            rrf_fuse([])
        with pytest.raises(ValueError):
            rrf_fuse([a], k=0)

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            rrf_fuse_rankings
        rows = rrf_fuse_rankings(spark, SF_DIR).collect()
        assert rows
        by_q = {}
        for r in rows:
            by_q.setdefault(r.query_id, []).append(r)
        for rs in by_q.values():
            assert sorted(r.fused_rank for r in rs) == \
                list(range(1, len(rs) + 1))


class TestHardNegatives:
    def test_positives_excluded_ranks_contiguous(self, spark, docs):
        pos = spark.createDataFrame([(0, 1)], "query_id int, doc_id long")
        neg = bm25_hard_negatives(docs, _QUERIES, pos, k=5).collect()
        assert (0, 1) not in {(r.query_id, r.doc_id) for r in neg}
        q0 = sorted(r.rank for r in neg if r.query_id == 0)
        assert q0 == list(range(1, len(q0) + 1))
        # the non-positive docs keep their relative BM25 order
        full = {(r.query_id, r.doc_id): r.score
                for r in bm25_scores(docs, _QUERIES).collect()}
        for r in neg:
            assert r.score == pytest.approx(full[(r.query_id, r.doc_id)])

    def test_positives_of_other_queries_unaffected(self, spark, docs):
        pos = spark.createDataFrame([(0, 2)], "query_id int, doc_id long")
        neg = bm25_hard_negatives(docs, _QUERIES, pos, k=5).collect()
        pairs = {(r.query_id, r.doc_id) for r in neg}
        assert (0, 2) not in pairs
        assert (1, 2) in pairs          # doc 2 only excluded for query 0


def _stats_map(df):
    return {r.term: (r.df, r.n_docs, r.n_dl, r.sum_dl)
            for r in df.collect()}


class TestBm25Store:
    def test_merge_equals_one_shot(self, spark, docs):
        a = docs.where("doc_id <= 2")
        b = docs.where("doc_id > 2")
        merged = merge_bm25_stats(bm25_stats(a), bm25_stats(b))
        assert _stats_map(merged) == _stats_map(bm25_stats(docs))

    def test_store_scoring_equals_naive(self, spark, docs):
        store = bm25_stats(docs)
        got = {(r.query_id, r.doc_id): r.score
               for r in bm25_scores_from_stats(docs, _QUERIES,
                                               store).collect()}
        want = {(r.query_id, r.doc_id): r.score
                for r in bm25_scores(docs, _QUERIES).collect()}
        assert got == want          # bit-identical, not approx

    def test_day2_batch_scores_match_global(self, spark, docs):
        # scoring ONLY the new batch against the cumulative store gives
        # the same per-doc scores as one-shot over the full corpus
        day1 = docs.where("doc_id <= 2")
        day2 = docs.where("doc_id > 2")
        store = merge_bm25_stats(bm25_stats(day1), bm25_stats(day2))
        got = {(r.query_id, r.doc_id): r.score
               for r in bm25_scores_from_stats(day2, _QUERIES,
                                               store).collect()}
        full = {(r.query_id, r.doc_id): r.score
                for r in bm25_scores(docs, _QUERIES).collect()}
        assert got == {k: v for k, v in full.items() if k[1] > 2}

    def test_terms_restricted_store(self, spark, docs):
        store = bm25_stats(docs, terms=["hash", "join"])
        m = _stats_map(store)
        assert set(m) == {"hash", "join", None}
        # N counts the NULL-text doc; n_dl and sum_dl skip it
        assert m[None] == (0, 5, 4, 14)
        assert m["hash"][0] == 2       # docs 1 and 2

    def test_null_text_counts_in_corpus_row_only(self, spark):
        nulls = spark.createDataFrame([(1, None), (2, "hash")],
                                      "doc_id long, text string")
        m = _stats_map(bm25_stats(nulls))
        assert m[None] == (0, 2, 1, 1)
        assert m["hash"] == (1, 0, 0, 0)

    def test_unseen_term_contributes_zero(self, spark, docs):
        day1 = docs.where("doc_id <= 2")   # no 'scan' in days 1-2
        store = bm25_stats(day1)
        day3 = docs.where("doc_id = 5")    # 'scan scan scan scan'
        got = bm25_scores_from_stats(day3, {0: "scan"}, store).collect()
        assert got == []                   # dropped, per the contract

    def test_validation(self, spark, docs):
        with pytest.raises(ValueError):
            merge_bm25_stats()
        with pytest.raises(ValueError):
            bm25_stats(docs, terms=[])
        with pytest.raises(ValueError):
            bm25_scores_from_stats(docs, {}, bm25_stats(docs))
        pos = spark.createDataFrame([(0, 1)], "query_id int, doc_id long")
        with pytest.raises(ValueError):
            bm25_hard_negatives(docs, _QUERIES, pos, k=0)

    def test_gate_query_matches_one_shot_topk(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import (
            _STORE_QUERIES, bm25_store_scoring)
        from agnostic_blockchain_etl_spark.operators.tables import \
            load_tables
        got = {(r.query_id, r.doc_id): (r.score, r.rank)
               for r in bm25_store_scoring(spark, SF_DIR).collect()}
        d = load_tables(spark, SF_DIR, ("documents",))["documents"]
        want = {(r.query_id, r.doc_id): (r.score, r.rank)
                for r in bm25_topk(d, _STORE_QUERIES).collect()}
        assert got == want


class TestBm25StatsStream:
    """`streaming.dedup.bm25_stats_stream`: scores emitted per batch
    equal the one-shot BM25 over the cumulative corpus as of that
    batch; the store stays vocabulary-sized; snapshot compaction and
    pruning follow the family rules."""

    _Q = {0: "hash join"}

    @staticmethod
    def _drain(spark, src, store, out, ckpt, **kw):
        from agnostic_blockchain_etl_spark.streaming.dedup import \
            bm25_stats_stream
        stream = (spark.readStream.schema("doc_id LONG, text STRING")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = bm25_stats_stream(stream, store, out, ckpt,
                              queries=TestBm25StatsStream._Q, **kw)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    @staticmethod
    def _write(spark, src, rows):
        spark.createDataFrame(rows, "doc_id long, text string") \
            .coalesce(1).write.mode("append").parquet(src)

    @pytest.mark.heavy
    def test_scores_match_one_shot_as_of_each_batch(self, spark,
                                                    tmp_path):
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("src", "out", "store",
                                           "ckpt"))
        batches = [
            [(1, "hash join hash"), (2, "join window")],
            [(3, "hash table scan"), (4, None)],
            [(5, "join join hash")],
        ]
        for b in batches:
            self._write(spark, src, b)
        self._drain(spark, src, store, out, ckpt)
        cumulative = []
        for i, b in enumerate(batches):
            cumulative.extend(b)
            cum = spark.createDataFrame(cumulative,
                                        "doc_id long, text string")
            batch_ids = {d for d, _ in b}
            want = {(r.query_id, r.doc_id): r.score
                    for r in bm25_scores(cum, self._Q).collect()
                    if r.doc_id in batch_ids}
            got = {(r.query_id, r.doc_id): r.score
                   for r in spark.read.parquet(
                       f"{out}/batch_id={i}").collect()}
            assert got == want, f"batch {i}"   # bit-identical

    @pytest.mark.heavy
    def test_restart_compaction_and_prune(self, spark, tmp_path):
        import os
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("rsrc", "rout", "rstore",
                                           "rckpt"))
        batches = [[(10 * b + i, f"hash doc{b} w{i}") for i in range(3)]
                   for b in range(4)]
        for b in batches[:3]:
            self._write(spark, src, b)
        self._drain(spark, src, store, out, ckpt,
                    compact_every=2, prune_after_compact=True)
        # restart on the same checkpoint + store: history persists
        self._write(spark, src, batches[3])
        self._drain(spark, src, store, out, ckpt,
                    compact_every=2, prune_after_compact=True)
        snaps = os.listdir(f"{store}_compact")
        assert any(s.startswith("upto=") for s in snaps)
        deltas = [d for d in os.listdir(store)
                  if d.startswith("batch_id=")]
        assert len(deltas) <= 4                # pruning bounded raws
        # the LAST batch's scores equal one-shot over all 12 docs
        cum = spark.createDataFrame(
            [r for b in batches for r in b], "doc_id long, text string")
        want = {(r.query_id, r.doc_id): r.score
                for r in bm25_scores(cum, self._Q).collect()
                if r.doc_id >= 30}
        got = {(r.query_id, r.doc_id): r.score
               for r in spark.read.parquet(
                   f"{out}/batch_id=3").collect()}
        assert got == want

    def test_all_null_batch_is_harmless(self, spark, tmp_path):
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("nsrc", "nout", "nstore",
                                           "nckpt"))
        self._write(spark, src, [(1, None), (2, None)])
        self._write(spark, src, [(3, "hash join")])
        self._drain(spark, src, store, out, ckpt)
        assert spark.read.parquet(f"{out}/batch_id=0").count() == 0
        got = spark.read.parquet(f"{out}/batch_id=1").collect()
        assert len(got) == 1 and got[0].doc_id == 3
        # N=3 reached the scorer: match one-shot over all three docs
        cum = spark.createDataFrame(
            [(1, None), (2, None), (3, "hash join")],
            "doc_id long, text string")
        want = bm25_scores(cum, self._Q).collect()
        assert got[0].score == want[0].score


class TestNdcg:
    def test_perfect_ranking_scores_one(self, spark):
        ranked = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2)],
            "query_id long, neighbor_id long, rank int")
        rel = spark.createDataFrame(
            [(0, 10), (0, 11)], "query_id long, neighbor_id long")
        got = ndcg_at_k(ranked, rel, k=2).collect()
        assert len(got) == 1 and got[0].ndcg == pytest.approx(1.0)

    def test_hand_computed(self, spark):
        # relevant item at rank 2 of 2, R=3 (idcg uses min(R,k)=2 terms)
        ranked = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2)],
            "query_id long, neighbor_id long, rank int")
        rel = spark.createDataFrame(
            [(0, 11), (0, 20), (0, 21)], "query_id long, neighbor_id long")
        got = ndcg_at_k(ranked, rel, k=2).collect()[0]
        dcg = 1.0 / (math.log(3.0) / math.log(2.0))
        idcg = 1.0 / (math.log(2.0) / math.log(2.0)) + dcg
        assert got.n_relevant == 3
        assert got.dcg == pytest.approx(round(dcg, 6))
        assert got.ndcg == pytest.approx(round(dcg / idcg, 6))

    def test_no_relevant_scores_zero_not_absent(self, spark):
        ranked = spark.createDataFrame(
            [(0, 10, 1)], "query_id long, neighbor_id long, rank int")
        rel = spark.createDataFrame(
            [(1, 99)], "query_id long, neighbor_id long")
        qs = spark.createDataFrame([(0,), (1,)], "query_id long")
        got = {r.query_id: r
               for r in ndcg_at_k(ranked, rel, k=1, queries=qs).collect()}
        assert got[0].n_relevant == 0 and got[0].ndcg == 0.0
        assert got[1].n_relevant == 1 and got[1].ndcg == 0.0  # lost query

    def test_duplicate_relevant_rows_collapse(self, spark):
        # r10 ADVICE: a non-deduplicated label frame must not multiply
        # DCG terms or inflate n_relevant/IDCG (ndcg stayed > 1 before)
        ranked = spark.createDataFrame(
            [(0, 10, 1), (0, 11, 2)],
            "query_id long, neighbor_id long, rank int")
        rel_dup = spark.createDataFrame(
            [(0, 10), (0, 10), (0, 10), (0, 11)],
            "query_id long, neighbor_id long")
        rel_set = spark.createDataFrame(
            [(0, 10), (0, 11)], "query_id long, neighbor_id long")
        got_dup = ndcg_at_k(ranked, rel_dup, k=2).collect()[0]
        got_set = ndcg_at_k(ranked, rel_set, k=2).collect()[0]
        assert got_dup == got_set
        assert got_dup.n_relevant == 2
        assert got_dup.ndcg == pytest.approx(1.0)

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            ndcg_label_lsh
        rows = ndcg_label_lsh(spark, SF_DIR).collect()
        assert len(rows) == 8
        assert all(0.0 <= r.ndcg <= 1.0 for r in rows)


class TestOracleSqlHygiene:
    def test_apostrophe_terms_generate_valid_sql(self, spark):
        # r10 ADVICE: a workload term containing a single quote must
        # produce parseable oracle SQL (escaped, not broken literals)
        import duckdb
        import pandas as pd
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            _sql_bm25_body
        sql = _sql_bm25_body({0: "don't stop"}, 5, _K1, _B)
        assert "'don''t'" in sql
        con = duckdb.connect()
        con.register("documents", pd.DataFrame(
            {"doc_id": [1, 2, 3],
             "text": ["don't look back", "stop the scan", None]}))
        got = {(r[0], r[1]): r[2] for r in con.execute(sql).fetchall()}
        assert (0, 1) in got and (0, 2) in got     # both terms matched

    def test_stream_workload_validated_eagerly(self, spark):
        # r10 ADVICE: an empty / whitespace-only workload must fail at
        # definition time, not start a stream that dies in batch 0
        from agnostic_blockchain_etl_spark.streaming.dedup import \
            bm25_stats_stream
        docs = spark.readStream.format("rate").load()
        for bad in ({}, {0: "   "}):
            with pytest.raises(ValueError):
                bm25_stats_stream(docs, "/tmp/x-store", "/tmp/x-out",
                                  "/tmp/x-ckpt", queries=bad)


class TestMinmaxFuse:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "query_id long, neighbor_id long, score double")

    def test_normalization_and_weighted_sum(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            minmax_fuse
        a = self._df(spark, [(0, 10, 0.9), (0, 11, 0.5), (0, 12, 0.1)])
        b = self._df(spark, [(0, 11, 3.0), (0, 13, 1.0)])
        got = {r.neighbor_id: r for r in
               minmax_fuse([a, b], [0.7, 0.3]).collect()}
        # a normalizes to 1.0/0.5/0.0; b to 1.0/0.0
        assert got[10].fused_score == pytest.approx(0.7)
        assert got[11].fused_score == pytest.approx(
            0.7 * 0.5 + 0.3 * 1.0)
        assert got[12].fused_score == pytest.approx(0.0)
        assert got[13].fused_score == pytest.approx(0.0)
        assert got[10].fused_rank == 1 and got[11].fused_rank == 2
        # the margin property RRF can't express: 11's big dense margin
        # over 12 survives into the fused score
        assert got[11].fused_score - got[12].fused_score > 0.3

    def test_degenerate_single_candidate_list(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            minmax_fuse
        a = self._df(spark, [(0, 10, 0.42)])
        got = minmax_fuse([a]).collect()
        assert len(got) == 1
        assert got[0].fused_score == pytest.approx(1.0)

    def test_validation_and_topn(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            minmax_fuse
        a = self._df(spark, [(0, 10, 1.0), (0, 11, 0.5), (0, 12, 0.2)])
        assert minmax_fuse([a], topn=2).count() == 2
        with pytest.raises(ValueError, match="non-empty"):
            minmax_fuse([])
        with pytest.raises(ValueError, match="weights"):
            minmax_fuse([a], [0.5, 0.5])

    def test_gate_query_runs(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import \
            hybrid_minmax_fusion
        rows = hybrid_minmax_fusion(spark, SF_DIR).collect()
        assert rows
        for r in rows:
            assert 0.0 <= r.fused_score <= 1.0 + 1e-9
            assert r.fused_rank >= 1

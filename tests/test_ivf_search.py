"""Kernel IVF search: at nprobe = nlist the result must EQUAL exact
brute-force top-k (the recall dial's endpoint — pins assignment, probe,
scoring, and ranking in one assertion); at lower nprobe it returns a
subset of probed-list neighbors with correct internal ranking."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
K, NLIST = 5, 8


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def setting(spark):
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_train
    from agnostic_blockchain_etl_spark.operators.tables import load_tables
    emb = load_tables(spark, SF_DIR, ("embeddings",))["embeddings"]
    corpus = emb.where("vec_id >= 8")
    queries = emb.where("vec_id < 8")
    cb = ivf_train(spark, corpus, NLIST, iters=1)
    return corpus, queries, cb


def _brute_force(corpus_rows, query_rows, k):
    C = np.array([list(r.embedding) for r in corpus_rows], dtype=np.float64)
    cn = np.linalg.norm(C, axis=1)
    cids = np.array([r.vec_id for r in corpus_rows])
    out = {}
    for q in query_rows:
        qv = np.array(list(q.embedding), dtype=np.float64)
        cos = np.round(C @ qv / (cn * np.linalg.norm(qv)), 6)
        order = sorted(range(len(cids)), key=lambda i: (-cos[i], cids[i]))
        out[q.vec_id] = [(int(cids[i]), float(cos[i]))
                         for i in order[:k]]
    return out


def test_full_probe_equals_brute_force(spark, setting):
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_search
    corpus, queries, cb = setting
    got = {}
    for r in ivf_search(corpus, queries.select("vec_id", "embedding"),
                        cb, k=K, nprobe=NLIST).collect():
        got.setdefault(r.query_id, []).append(
            (r.rank, r.neighbor_id, r.cosine))
    want = _brute_force(corpus.collect(), queries.collect(), K)
    assert set(got) == set(want)
    for qid in want:
        mine = [(n, c) for _, n, c in sorted(got[qid])]
        assert len(mine) == K
        for (gn, gc), (wn, wc) in zip(mine, want[qid]):
            assert abs(gc - wc) <= 2e-6, (qid, gn, wn)
            # ids must match except where cosines tie at the boundary
            if abs(gc - wc) == 0:
                assert gn == wn, (qid, mine, want[qid])


def test_partial_probe_is_subset_with_valid_ranks(spark, setting):
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_search
    corpus, queries, cb = setting
    res = ivf_search(corpus, queries.select("vec_id", "embedding"),
                     cb, k=K, nprobe=2).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {r.vec_id for r in queries.collect()}
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
        cosines = [r.cosine for r in rows]
        assert cosines == sorted(cosines, reverse=True)
        assert all(r.neighbor_id != qid for r in rows)
        assert len(rows) <= K


def test_tied_cosines_cut_deterministically(spark):
    """Review finding: the kernel's per-list k+1 cut used to order ties
    by pandas-group row order — with k+2 duplicate vectors tied at the
    cut, which neighbor survived was nondeterministic. The cut now
    orders by (rounded cosine DESC, neighbor_id ASC), the same key as
    the final window, so the LOWEST-id tied neighbors always win."""
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_search
    base = [1.0, 0.0, 0.0, 0.0]
    other = [0.0, 1.0, 0.0, 0.0]
    # 9 identical corpus vectors (ids 10..18, deliberately inserted in
    # descending id order) + one distinct, k=5 < 9 ties
    rows = [(18 - i, base) for i in range(9)] + [(30, other)]
    corpus = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<double>") \
        .repartition(8)
    queries = spark.createDataFrame([(100, base)],
                                    "vec_id long, embedding array<double>")
    cb = spark.createDataFrame([(1, base), (2, other)],
                               "list_id int, centroid array<double>")
    for _ in range(3):   # stable across repeated runs
        got = sorted(r.neighbor_id for r in
                     ivf_search(corpus, queries, cb, k=5,
                                nprobe=2).collect())
        assert got == [10, 11, 12, 13, 14], got


def test_query_id_bound_by_name_not_position(spark):
    """Review finding: the query id used to bind positionally to
    columns[0]; reversed column order mis-bound the embedding as the
    id. Both orders must now work, and a frame without an embedding
    column raises a named error."""
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_search
    base = [1.0, 0.0]
    corpus = spark.createDataFrame(
        [(1, base), (2, [0.0, 1.0])], "vec_id long, embedding array<double>")
    cb = spark.createDataFrame([(1, base)],
                               "list_id int, centroid array<double>")
    q_rev = spark.createDataFrame(
        [([1.0, 0.0], 7)], "embedding array<double>, qid long")
    got = ivf_search(corpus, q_rev, cb, k=1, nprobe=1).collect()
    assert got[0].query_id == 7 and got[0].neighbor_id == 1
    with pytest.raises(ValueError, match="embedding"):
        ivf_search(corpus, q_rev.select("qid"), cb)
    # several metadata columns, none conventionally named → refuse
    # rather than silently binding an arbitrary one (advice finding)
    from pyspark.sql import functions as F
    q_multi = q_rev.withColumn("source", F.lit("web"))
    with pytest.raises(ValueError, match="query_id/vec_id/doc_id"):
        ivf_search(corpus, q_multi, cb, k=1, nprobe=1)
    # ...but a conventional id name wins over extra metadata columns
    q_named = q_multi.withColumnRenamed("qid", "query_id")
    got = ivf_search(corpus, q_named, cb, k=1, nprobe=1).collect()
    assert got[0].query_id == 7 and got[0].neighbor_id == 1


def test_ivf_train_keeps_empty_lists(spark):
    """Review finding: a list receiving zero members in an assign pass
    emitted no recenter row, silently shrinking the codebook below
    nlist. Duplicate vectors in the seed prefix tie-assign to the
    first seed, starving the second — the codebook must still come
    back with all nlist entries (starved lists keep their previous
    centroid)."""
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_train
    dup = [1.0, 0.0, 0.0]
    rows = [(0, dup), (1, dup),          # identical seed prefix
            (2, [0.0, 1.0, 0.0]), (3, [0.0, 0.0, 1.0])]
    emb = spark.createDataFrame(rows,
                                "vec_id long, embedding array<double>")
    cb = ivf_train(spark, emb, nlist=2, iters=2)
    got = {r.list_id: r.centroid for r in cb.collect()}
    assert set(got) == {1, 2}, got       # no silent shrink
    # the starved list keeps its seed vector verbatim
    assert got[2] == dup


def test_in_corpus_queries_keep_their_true_kth_neighbor(spark, setting):
    """A query vector that is ALSO in the corpus scores 1.0 against
    itself; the kernel must take k+1 candidates per list so the
    self-match filter cannot cost the true k-th neighbor (the
    nprobe=nlist == brute-force guarantee must hold for in-corpus
    queries too)."""
    from agnostic_blockchain_etl_spark.operators.similarity import ivf_search
    corpus, _, cb = setting
    # query with corpus members themselves
    queries = corpus.where("vec_id < 20").select("vec_id", "embedding")
    got = {}
    for r in ivf_search(corpus, queries, cb, k=K, nprobe=NLIST).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.neighbor_id, r.cosine))
    corpus_rows = corpus.collect()
    want = _brute_force([c for c in corpus_rows],
                        [q for q in corpus_rows if q.vec_id < 20], K + 1)
    # brute force with k+1 then drop self gives the true top-k sans self
    for qid, rows in got.items():
        expect = [(n, c) for n, c in want[qid] if n != qid][:K]
        mine = [(n, c) for _, n, c in sorted(rows)]
        assert len(mine) == K, qid
        assert all(n != qid for n, _ in mine), qid
        for (gn, gc), (wn, wc) in zip(mine, expect):
            assert abs(gc - wc) <= 2e-6, (qid, gn, wn)
            if abs(gc - wc) == 0:
                assert gn == wn, (qid, mine, expect)

"""Adversarial skew guards: the three documented 100 TB hot-key hazards
(boilerplate shingles, degenerate LSH buckets, oversized semantic
clusters) must be BOUNDED by their knobs, not just documented — each
test plants a corpus-scale hot key and asserts (a) candidate work stays
bounded, (b) true near-dups away from the hot key are still found, and
(c) what was dropped is logged, never silent.

All knobs default OFF: the driver gate and bench run the uncapped forms
unchanged (gate corpora are far below any sensible cap)."""

from __future__ import annotations

import logging
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.dedup import (  # noqa: E402
    cap_group_size, doc_shingles, drop_hot_keys, minhash_lsh_pairs,
    ngram_jaccard_pairs)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _near_dup_pair_docs(base_id: int):
    """Two documents sharing ~97% of their 30 shingles."""
    words = [f"p{i}" for i in range(32)]
    a = " ".join(words)
    b = " ".join(words[:-1] + ["changed"])
    return [(base_id, a), (base_id + 1, b)]


def test_hot_shingle_cap_bounds_candidates_and_logs(spark, caplog):
    """A boilerplate 3-gram shared by every document must not create a
    quadratic candidate term: with max_shingle_df on, the hot shingle is
    dropped (and logged), boilerplate-only pairs vanish, and a genuine
    near-dup pair elsewhere in the corpus is still found."""
    flood = [(i, f"common boiler plate x{i} y{i} z{i} w{i}")
             for i in range(1500)]
    docs = spark.createDataFrame(flood + _near_dup_pair_docs(2000),
                                 "doc_id long, text string")

    # the guard itself: no retained key exceeds the cap
    capped = drop_hot_keys(doc_shingles(docs).select("doc_id", "h"),
                           "h", 100, "test")
    max_df = capped.groupBy("h").count().agg(F.max("count")).first()[0]
    assert max_df <= 100

    with caplog.at_level(logging.WARNING,
                         logger="agnostic_blockchain_etl_spark"):
        got = ngram_jaccard_pairs(docs, threshold=0.10,
                                  max_shingle_df=100).collect()
    assert {(r.doc_a, r.doc_b) for r in got} == {(2000, 2001)}
    assert got[0].jaccard >= 0.8
    assert any("dropping" in rec.message and "hot" in rec.message
               for rec in caplog.records), caplog.records


def test_lsh_bucket_cap_drops_degenerate_buckets_and_logs(spark, caplog):
    """An identical-document flood collapses every one of its (band,
    bucket) groups to corpus size; the cap drops those groups (bounding
    the candidate self-join) while a small genuine near-dup bucket
    elsewhere still pairs up."""
    flood = [(i, "the exact same document text repeated everywhere " * 3)
             for i in range(800)]
    docs = spark.createDataFrame(flood + _near_dup_pair_docs(5000),
                                 "doc_id long, text string")
    with caplog.at_level(logging.WARNING,
                         logger="agnostic_blockchain_etl_spark"):
        got = minhash_lsh_pairs(docs, max_bucket_size=100).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (5000, 5001) in pairs
    # no flood pair survived (every flood bucket was degenerate)
    assert all(a >= 5000 for a, _ in pairs), sorted(pairs)[:5]
    assert any("oversized groups" in rec.message for rec in caplog.records)


def test_cap_group_size_keeps_groups_at_or_below_cap(spark):
    df = spark.createDataFrame(
        [(k, i) for k in range(3) for i in range((k + 1) * 4)],
        "k int, i int")
    out = cap_group_size(df, ["k"], 8, "test")
    sizes = {r.k: r.n for r in
             out.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert sizes == {0: 4, 1: 8}          # the 12-row group was dropped


def test_incremental_bucket_cap_bounds_store_side(spark, caplog):
    """Day-2 hazard: the signature store has accumulated a degenerate
    bucket (one boilerplate template, thousands of retained docs). The
    capped incremental pass still catches a new doc's genuine history
    match while the flood bucket contributes nothing."""
    from agnostic_blockchain_etl_spark.operators.incremental import (
        incremental_neardup_pairs, signature_store)
    flood = [(i, "identical template body " * 8) for i in range(500)]
    base = [(9000, " ".join(f"p{i}" for i in range(32)))]
    store = signature_store(spark.createDataFrame(
        flood + base, "doc_id long, text string"))
    new_docs = spark.createDataFrame(
        [(10000, " ".join([f"p{i}" for i in range(31)] + ["changed"])),
         (10001, "identical template body " * 8),     # flood re-crawl
         (10002, " ".join(f"fresh{i}" for i in range(20)))],
        "doc_id long, text string")
    with caplog.at_level(logging.WARNING,
                         logger="agnostic_blockchain_etl_spark"):
        got = incremental_neardup_pairs(new_docs, store, threshold=0.25,
                                        max_bucket_size=50).collect()
    pairs = {(r.doc_a, r.doc_b) for r in got}
    assert (9000, 10000) in pairs          # genuine history match kept
    # the flood re-crawl generated NO candidates (its buckets are capped
    # away on the store side) — bounded compute, disclosed recall trade
    assert all(b != 10001 for _, b in pairs), sorted(pairs)[:5]
    assert any("oversized groups" in rec.message for rec in caplog.records)


class TestSemanticClusterSplit:
    DIM = 16

    @pytest.fixture(scope="class")
    def emb_df(self, spark):
        rng = np.random.RandomState(7)
        # base kept away from zero so jitter cannot flip coordinate
        # signs: the flood is sign-degenerate BY CONSTRUCTION (level-2
        # star fallback must engage, not just the subkey split)
        base = rng.uniform(0.1, 1.0, self.DIM) * \
            np.sign(rng.uniform(-1, 1, self.DIM))
        flood = [(i, (base + rng.normal(0, 1e-4, self.DIM)).tolist())
                 for i in range(400)]
        scatter = [(1000 + i, rng.normal(0, 1.0, self.DIM).tolist())
                   for i in range(80)]
        return spark.createDataFrame(flood + scatter,
                                     "vec_id long, embedding array<double>")

    def test_pair_count_is_bounded_by_star_fallback(self, spark, emb_df):
        """Uncapped, the 400-vector flood cluster emits C(400,2)=79 800
        pairs; capped, the sign-degenerate subgroup star-probes its
        pivot — at most m-1 edges."""
        from agnostic_blockchain_etl_spark.operators.similarity import (
            _cluster_pairs, _nearest_assign, ivf_train)
        cb = [(r.list_id, list(r.centroid)) for r in
              ivf_train(spark, emb_df, nlist=2, iters=1).collect()]
        vecs = emb_df.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e"))
        assigned = _nearest_assign(vecs, cb).select("list_id", "vec_id", "e")
        n_capped = _cluster_pairs(assigned, tau=0.99,
                                  max_cluster_size=50).count()
        assert 0 < n_capped <= 480, n_capped
        n_uncapped = _cluster_pairs(assigned, tau=0.99).count()
        assert n_uncapped >= 79_800

    def test_flood_still_collapses_to_one_group(self, spark, emb_df):
        """The star edges connect the whole flood through its pivot, so
        the dedup DECISION is unchanged: one group, one keep."""
        from agnostic_blockchain_etl_spark.operators.similarity import (
            semantic_dedup)
        out = semantic_dedup(emb_df, nlist=2, tau=0.99, iters=1,
                             max_cluster_size=50).collect()
        assert len(out) == 480
        flood_rows = [r for r in out if r.vec_id < 400]
        groups = {r.group_id for r in flood_rows}
        assert groups == {0}, groups
        assert sum(r.keep for r in flood_rows) == 1
        # scattered vectors are all singletons, all kept
        assert all(r.keep == 1 and r.group_id == r.vec_id
                   for r in out if r.vec_id >= 1000)

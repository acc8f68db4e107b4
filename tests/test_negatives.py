"""Negative sampling (`operators/retrieval.py` uniform/mixed family):
positive exclusion, per-query independence of the draw order,
bounded-pool semantics (fewer-than-k is flagged not refilled), the
hard-favored dedup + contiguous re-rank of the mix, and argument
validation. The cross-engine pool/pair-hash/mix algebra is pinned by
the registered `negatives_mix_plan` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.retrieval import (  # noqa: E402
    mixed_negatives, uniform_negatives)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def docs(spark):
    from agnostic_blockchain_etl_spark.operators.tables import load_tables
    return load_tables(spark, SF_DIR, ("documents",))["documents"] \
        .select("doc_id")


def _pos(spark, rows):
    return spark.createDataFrame(rows, "query_id int, doc_id long")


class TestUniform:
    def test_positives_never_sampled(self, spark, docs):
        ids = [r["doc_id"] for r in docs.limit(5).collect()]
        pos = _pos(spark, [(0, i) for i in ids])
        out = uniform_negatives(docs, [0, 1], pos, k=20).collect()
        q0 = {r["doc_id"] for r in out if r["query_id"] == 0}
        assert q0.isdisjoint(ids)
        # query 1 has no positives: its draw is unconstrained
        assert len([r for r in out if r["query_id"] == 1]) == 20

    def test_queries_draw_independent_orders(self, spark, docs):
        pos = _pos(spark, [])
        out = uniform_negatives(docs, [0, 1], pos, k=10).collect()
        order = {q: [r["doc_id"] for r in sorted(
            out, key=lambda r: r["rank"]) if r["query_id"] == q]
            for q in (0, 1)}
        assert order[0] != order[1]          # pair-salted, not shared

    def test_deterministic_across_runs(self, spark, docs):
        pos = _pos(spark, [])
        a = uniform_negatives(docs, [3], pos, k=10).collect()
        b = uniform_negatives(docs, [3], pos, k=10).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))

    def test_small_pool_underfills(self, spark, docs):
        """Exclusions beyond the pool emit FEWER rows, never refill."""
        pool3 = uniform_negatives(docs, [0], _pos(spark, []), k=10,
                                  n_pool=3)
        assert pool3.count() == 3

    def test_validation(self, spark, docs):
        pos = _pos(spark, [])
        with pytest.raises(ValueError, match="positive"):
            uniform_negatives(docs, [0], pos, k=0)
        with pytest.raises(ValueError, match="non-empty"):
            uniform_negatives(docs, [], pos, k=5)


class TestMixed:
    @pytest.fixture()
    def hard(self, spark):
        rows = [(0, d, 10.0 - d, d) for d in range(1, 6)]
        return spark.createDataFrame(
            rows, "query_id int, doc_id long, score double, rank int")

    @pytest.fixture()
    def uniform(self, spark):
        rows = [(0, d, r + 1) for r, d in enumerate([3, 7, 1, 9, 11])]
        return spark.createDataFrame(
            rows, "query_id int, doc_id long, rank int")

    def test_dedup_favors_hard_and_backfills(self, spark, hard, uniform):
        out = sorted(mixed_negatives(hard, uniform, n_hard=3,
                                     n_uniform=2).collect(),
                     key=lambda r: r["rank"])
        assert [r["src"] for r in out] == ["hard"] * 3 + ["uniform"] * 2
        assert [r["doc_id"] for r in out] == [1, 2, 3, 7, 9]
        # docs 3 and 1 collide with the hard cut: uniform backfills
        # past them in its own order (7 then 9), ranks contiguous 1..5
        assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
        assert out[0]["score"] == 9.0 and out[3]["score"] is None

    def test_zero_hard_slots(self, spark, hard, uniform):
        out = mixed_negatives(hard, uniform, n_hard=0, n_uniform=3)
        assert {r["src"] for r in out.collect()} == {"uniform"}

    def test_validation(self, spark, hard, uniform):
        with pytest.raises(ValueError, match="at least one"):
            mixed_negatives(hard, uniform, n_hard=0, n_uniform=0)


class TestGateShape:
    def test_facets(self, spark):
        from agnostic_blockchain_etl_spark.operators.retrieval import (
            _MIX_HARD, _MIX_UNI, negatives_mix_plan)
        out = negatives_mix_plan(spark, SF_DIR).collect()
        mixed = [r for r in out if r["facet"] == "mixed"]
        per_q = {}
        for r in mixed:
            per_q.setdefault(r["query_id"], []).append(r)
        for q, rows in per_q.items():
            assert len(rows) == _MIX_HARD + _MIX_UNI
            assert sorted(r["rank"] for r in rows) == list(
                range(1, _MIX_HARD + _MIX_UNI + 1))
            assert sum(r["src"] == "hard" for r in rows) == _MIX_HARD
            # no duplicate docs within one query's mix
            assert len({r["doc_id"] for r in rows}) == len(rows)

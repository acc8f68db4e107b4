"""Exact-arithmetic PageRank (`operators/graph.py`): hand-computed
fixed-point ranks on planted graphs (cycle stays uniform, star with
dangling leaves), mass conservation up to documented truncation
dust, multi-edge collapse, and validation. Cross-engine bit-equality
is pinned by the registered `pagerank_supplier_part` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.graph import (  # noqa: E402
    pagerank)

SCALE = 10 ** 12


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


class TestPagerank:
    def test_cycle_stays_uniform(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
        out = {r["node"]: r["rank_int"]
               for r in pagerank(e, iters=3).collect()}
        # uniform in = uniform out: tele + 17·(scale div 3) div 20
        assert len(set(out.values())) == 1
        assert out["a"] == 333333333333

    def test_star_with_dangling_leaves(self, spark):
        # a -> {b, c}: a's rank splits in two, b and c are dangling so
        # their whole mass redistributes uniformly. Hand-computed
        # fixed-point values after ONE iteration:
        #   tele      = 3·10¹² div 60           =  50 000 000 000
        #   r1(a)     = tele + 17·(666666666666 div 3) div 20
        #   r1(b,c)   = tele + 17·(166666666666 + 222222222222) div 20
        e = _edges(spark, [("a", "b"), ("a", "c")])
        out = {r["node"]: r["rank_int"]
               for r in pagerank(e, iters=1).collect()}
        assert out["a"] == 238_888_888_888
        assert out["b"] == out["c"] == 380_555_555_554
        # mass conserved up to truncation dust
        assert SCALE - sum(out.values()) in range(0, 100)

    def test_multi_edges_collapse(self, spark):
        e1 = _edges(spark, [("a", "b"), ("a", "b"), ("b", "a")])
        e2 = _edges(spark, [("a", "b"), ("b", "a")])
        r1 = sorted(pagerank(e1, iters=2).collect())
        r2 = sorted(pagerank(e2, iters=2).collect())
        assert r1 == r2

    def test_rank_double_reads_fixed_point(self, spark):
        e = _edges(spark, [("a", "b"), ("b", "a")])
        for r in pagerank(e, iters=1).collect():
            assert r["rank"] == round(r["rank_int"] / SCALE, 12)

    def test_validation(self, spark):
        e = _edges(spark, [("a", "b")])
        with pytest.raises(ValueError, match="iters"):
            pagerank(e, iters=0)
        with pytest.raises(ValueError, match="scale"):
            pagerank(e, scale=1000)


@pytest.mark.heavy
def test_long_key_encoding_is_rank_isomorphic(spark):
    """r11 optimization pin for the gate's long-key encoding: running
    the iterations over an injective long relabeling (k·2 / k·2+1, the
    supplier/part scheme) yields BIT-IDENTICAL rank_int values per
    node as the string-keyed graph — ranks depend only on structure,
    never on the key representation the shuffles carry."""
    from pyspark.sql import functions as F

    pairs = [("s:1", "p:10"), ("s:1", "p:11"), ("s:2", "p:10"),
             ("s:3", "p:12"), ("s:2", "p:12"), ("s:1", "p:10")]
    str_ranks = {r.node: r.rank_int
                 for r in pagerank(_edges(spark, pairs),
                                   iters=2).collect()}
    longs = [(int(a.split(":")[1]) * 2, int(b.split(":")[1]) * 2 + 1)
             for a, b in pairs]
    ldf = spark.createDataFrame(longs, "src long, dst long")
    out = pagerank(ldf, iters=2)
    node = F.when(F.col("node") % 2 == 0,
                  F.concat(F.lit("s:"), F.shiftright(F.col("node"), 1))) \
            .otherwise(F.concat(F.lit("p:"),
                                F.shiftright(F.col("node"), 1)))
    long_ranks = {r.node: r.rank_int
                  for r in out.select(node.alias("node"),
                                      "rank_int").collect()}
    assert str_ranks == long_ranks

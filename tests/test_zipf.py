"""Zipf corpus diagnostics (`operators/zipf.py`): exact ranks vs a
within-Spark naive window, the regression against a pure-Python least
squares, degenerate-corpus NULLs, and a shaped-vs-flat corpus
discrimination check. Cross-engine values are pinned by the registered
`corpus_zipf_stats` oracle pair (two-level rank vs naive window)."""

from __future__ import annotations

import math
import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.zipf import (  # noqa: E402
    corpus_zipf_stats, zipf_rank_frequencies)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


class TestRanks:
    def test_two_level_equals_naive_window(self, spark):
        from agnostic_blockchain_etl_spark.operators.tables import \
            load_tables
        docs = load_tables(spark, SF_DIR, ("documents",))["documents"]
        rf = zipf_rank_frequencies(docs)
        naive = rf.select(
            "term", "freq",
            F.row_number().over(
                Window.orderBy(F.col("freq").desc(), "term"))
            .cast("long").alias("nrank"))
        diff = (rf.join(naive, ["term", "freq"])
                .where("rank != nrank").count())
        assert diff == 0

    def test_ranks_are_a_permutation(self, spark):
        rf = zipf_rank_frequencies(_docs(spark, ["a a a b b c", "b c d"]))
        rows = {r.term: (r.freq, r.rank) for r in rf.collect()}
        assert rows == {"a": (3, 1), "b": (3, 2),   # tie: term asc
                        "c": (2, 3), "d": (1, 4)}


class TestFit:
    def test_matches_python_least_squares(self, spark):
        texts = ["the the the the quick quick brown fox",
                 "the quick fox fox jumps over over over a dog"]
        got = corpus_zipf_stats(_docs(spark, texts)).collect()[0]
        # independent reference
        from collections import Counter
        c = Counter(w for t in texts for w in t.lower().split())
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        xs = [math.log(i + 1.0) for i in range(len(ranked))]
        ys = [math.log(float(f)) for _, f in ranked]
        n = float(len(xs))
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        r2 = ((n * sxy - sx * sy) ** 2
              / ((n * sxx - sx * sx) * (n * syy - sy * sy)))
        assert got.vocab == len(ranked)
        assert got.n_tokens == sum(c.values())
        assert got.slope == pytest.approx(round(slope, 6), abs=1e-6)
        assert got.r2 == pytest.approx(round(r2, 6), abs=1e-6)
        assert got.ttr == pytest.approx(
            round(len(ranked) / sum(c.values()), 6))

    def test_zipfian_text_beats_flat_text(self, spark):
        # a zipf-shaped corpus: term i appears ~N/i times
        zipfy = " ".join(f"w{i}" for i in range(1, 21)
                         for _ in range(40 // i))
        flat = " ".join(f"u{i}" for i in range(1, 21) for _ in range(4))
        z = corpus_zipf_stats(_docs(spark, [zipfy])).collect()[0]
        f_ = corpus_zipf_stats(_docs(spark, [flat])).collect()[0]
        assert z.slope < -0.8 and z.r2 > 0.9       # looks like language
        assert f_.slope is None or abs(f_.slope) < 0.1  # flat spectrum

    def test_degenerate_corpora_null_not_error(self, spark):
        one = corpus_zipf_stats(_docs(spark, ["same same same"])) \
            .collect()[0]
        assert one.vocab == 1 and one.slope is None and one.r2 is None
        assert one.ttr == pytest.approx(round(1 / 3, 6))
        # all-equal frequencies: slope defined (x varies), r2 NULL
        eq = corpus_zipf_stats(_docs(spark, ["a b c d"])).collect()[0]
        assert eq.slope == 0.0 and eq.r2 is None

    def test_gate_query_shape(self, spark):
        from agnostic_blockchain_etl_spark.operators.zipf import \
            corpus_zipf_stats_gate
        rows = corpus_zipf_stats_gate(spark, SF_DIR).collect()
        stats = [r for r in rows if r.facet == "stats"]
        head = [r for r in rows if r.facet == "head"]
        assert len(stats) == 1 and len(head) == 10
        assert stats[0].slope < 0                   # frequencies decay
        assert sorted(r.rank for r in head) == list(range(1, 11))

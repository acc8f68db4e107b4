"""Count-min sketch family (`operators/cms.py`): the one-sided bound
(estimate never below truth), exactness at generous width, weighted
counts, mergeability, NULL-key sentinel, geometry validation, and the
zero-shuffle plan claim. The cross-engine cell algebra itself is
pinned by the registered `cms_frequency_estimate` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.cms import (  # noqa: E402
    cms_build, cms_counters, cms_estimate, cms_merge)

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
        .select("doc_id", "source", "n_chars")


def _est_vs_exact(docs, width, depth, weight_col=None):
    sk = cms_build(docs, "source", width=width, depth=depth,
                   weight_col=weight_col)
    arr = cms_counters(sk, width, depth)
    est = cms_estimate(docs.select("source").distinct(), arr,
                       key_col="source", width=width, depth=depth)
    agg = (F.sum(weight_col) if weight_col else F.count("*"))
    exact = docs.groupBy("source").agg(agg.cast("long").alias("x"))
    return est.join(exact, "source")


class TestCmsContract:
    def test_never_underestimates(self, spark, docs):
        """The CMS bound on a deliberately tiny sketch (collisions
        everywhere): est ≥ exact on every key, and at this width the
        overestimates really occur (the test bites)."""
        j = _est_vs_exact(docs, width=4, depth=2)
        assert j.where(F.col("est") < F.col("x")).count() == 0
        assert j.where(F.col("est") > F.col("x")).count() > 0

    @pytest.mark.heavy
    def test_exact_at_generous_width(self, spark, docs):
        """Width far above the key cardinality: no collisions, the
        sketch IS the exact count on every key."""
        j = _est_vs_exact(docs, width=1 << 14, depth=4)
        assert j.where(F.col("est") != F.col("x")).count() == 0

    @pytest.mark.heavy
    def test_weighted_counts(self, spark, docs):
        """weight_col: the sketch sums weights (here n_chars — 'how
        many CHARS has this source contributed'), same bound."""
        j = _est_vs_exact(docs, width=1 << 14, depth=4,
                          weight_col="n_chars")
        assert j.where(F.col("est") != F.col("x")).count() == 0

    def test_merge_equals_joint_build(self, spark, docs):
        a = docs.where(F.col("doc_id") % 2 == 0)
        b = docs.where(F.col("doc_id") % 2 == 1)
        merged = cms_merge(cms_build(a, "source", width=64, depth=3),
                           cms_build(b, "source", width=64, depth=3))
        joint = cms_build(docs, "source", width=64, depth=3)
        assert merged.exceptAll(joint).count() == 0
        assert joint.exceptAll(merged).count() == 0

    def test_null_keys_share_one_bucket(self, spark):
        d = spark.createDataFrame(
            [(1, None), (2, None), (3, "a")],
            "doc_id long, source string")
        sk = cms_build(d, "source", width=1 << 10, depth=4)
        arr = cms_counters(sk, 1 << 10, 4)
        out = {r["doc_id"]: r["est"] for r in
               cms_estimate(d, arr, key_col="source",
                            width=1 << 10, depth=4).collect()}
        assert out[1] == out[2] == 2 and out[3] == 1

    def test_geometry_validation(self, spark, docs):
        with pytest.raises(ValueError):
            cms_build(docs, "source", width=0, depth=3)
        sk = cms_build(docs, "source", width=64, depth=3)
        with pytest.raises(ValueError):
            cms_estimate(docs, cms_counters(sk, 64, 3),
                         key_col="source", width=128, depth=3)
        with pytest.raises(ValueError):
            cms_counters(sk, 32, 3)    # cells out of claimed range

    def test_estimate_is_scan_local(self, spark, docs):
        sk = cms_build(docs, "source", width=64, depth=3)
        arr = cms_counters(sk, 64, 3)
        plan = (cms_estimate(docs, arr, key_col="source",
                             width=64, depth=3)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan, plan
        assert "Join" not in plan, plan

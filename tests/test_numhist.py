"""Numeric histogram family (`operators/numhist.py`): binning
(clamping, the NULL bin), merge-equals-one-shot, quantile
interpolation against exact order statistics on dense data, per-group
reads, empty-group absence, and geometry validation. The cross-engine
bin/interpolation algebra is pinned by the registered
`numeric_quantile_report` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.numhist import (  # noqa: E402
    histogram_quantiles, merge_numeric_histograms, numeric_histogram)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _hist_dict(h):
    return {r["bin"]: r["n"] for r in h.collect()}


class TestBinning:
    def test_clamp_and_null_bin(self, spark):
        d = spark.createDataFrame(
            [(None,), (-5.0,), (0.0,), (9.9,), (10.0,), (99.0,), (100.0,),
             (1e9,)], "x double")
        h = _hist_dict(numeric_histogram(d, "x", lo=0, hi=100, n_bins=10))
        assert h[-1] == 1            # NULL
        assert h[0] == 3             # -5 (clamped), 0, 9.9
        assert h[1] == 1             # 10.0
        assert h[9] == 3             # 99, 100 (clamped), 1e9 (clamped)

    def test_merge_equals_one_shot(self, spark):
        d = spark.range(1000).select((F.col("id") % 97).alias("x"))
        one = _hist_dict(numeric_histogram(d, "x", lo=0, hi=100, n_bins=20))
        a = numeric_histogram(d.where(F.col("id") % 2 == 0), "x",
                              lo=0, hi=100, n_bins=20)
        b = numeric_histogram(d.where(F.col("id") % 2 == 1), "x",
                              lo=0, hi=100, n_bins=20)
        assert _hist_dict(merge_numeric_histograms(a, b)) == one

    def test_geometry_validation(self, spark):
        d = spark.range(3).select(F.col("id").cast("double").alias("x"))
        with pytest.raises(ValueError, match="hi > lo"):
            numeric_histogram(d, "x", lo=5, hi=5, n_bins=4)
        with pytest.raises(ValueError, match="n_bins"):
            numeric_histogram(d, "x", lo=0, hi=1, n_bins=0)


class TestQuantiles:
    def test_tracks_exact_order_statistics(self, spark):
        """Uniform 0..9999 in 1000 bins of width 10: the interpolated
        read lands within one bin width of the exact quantile."""
        d = spark.range(10_000).select(F.col("id").cast("double").alias("x"))
        h = numeric_histogram(d, "x", lo=0, hi=10_000, n_bins=1000)
        got = {r["q"]: r["est"] for r in histogram_quantiles(
            h, [0.5, 0.9, 0.99], lo=0, hi=10_000, n_bins=1000).collect()}
        for q, est in got.items():
            assert abs(est - q * 10_000) <= 10.0, (q, est)

    def test_null_bin_excluded(self, spark):
        d = spark.createDataFrame(
            [(None,)] * 90 + [(5.0,)] * 10, "x double")
        h = numeric_histogram(d, "x", lo=0, hi=10, n_bins=10)
        got = histogram_quantiles(h, [0.5], lo=0, hi=10, n_bins=10) \
            .collect()
        # all non-null mass sits in bin 5: the read interpolates
        # within [5, 6), never into the NULL bin
        assert len(got) == 1 and 5.0 <= got[0]["est"] < 6.0

    def test_group_reads_and_empty_group_absent(self, spark):
        d = spark.createDataFrame(
            [("a", float(i)) for i in range(100)]
            + [("b", None)], "g string, x double")
        h = numeric_histogram(d, "x", lo=0, hi=100, n_bins=10,
                              group_cols=["g"])
        got = histogram_quantiles(h, [0.5], lo=0, hi=100, n_bins=10,
                                  group_cols=["g"]).collect()
        # group b has only NULLs: absent from the quantile frame
        assert {r["g"] for r in got} == {"a"}
        assert 40.0 <= got[0]["est"] <= 60.0

    def test_q_validation(self, spark):
        d = spark.range(5).select(F.col("id").cast("double").alias("x"))
        h = numeric_histogram(d, "x", lo=0, hi=10, n_bins=5)
        for bad in ([], [0.0], [1.5]):
            with pytest.raises(ValueError, match="quantiles"):
                histogram_quantiles(h, bad, lo=0, hi=10, n_bins=5)


class TestGateShape:
    def test_facets_consistent(self, spark):
        from agnostic_blockchain_etl_spark.operators.numhist import (
            numeric_quantile_report)
        out = numeric_quantile_report(spark, SF_DIR).collect()
        assert {r["facet"] for r in out} == {"hist", "quantile", "group"}
        hist_n = sum(r["n"] for r in out if r["facet"] == "hist")
        from agnostic_blockchain_etl_spark.operators.tables import (
            load_tables)
        n_docs = load_tables(spark, SF_DIR, ("documents",))[
            "documents"].count()
        assert hist_n == n_docs
        qs = sorted(r["q"] for r in out if r["facet"] == "quantile")
        assert qs == [0.5, 0.9, 0.99]
        ests = {r["q"]: r["est"] for r in out if r["facet"] == "quantile"}
        assert ests[0.5] <= ests[0.9] <= ests[0.99]

"""profile_table: per-column stats correct, nested columns degrade
gracefully, one-scan plan."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.profile import (  # noqa: E402
    merge_profile_sketches, profile_sketch, profile_table)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def test_profile_values(spark):
    df = spark.createDataFrame(
        [(1, "a", 10.0, ["x"]), (2, "b", None, ["y", "z"]),
         (3, None, 30.0, None), (4, "b", 20.0, [])],
        "id long, s string, v double, arr array<string>")
    prof = {r["column"]: r for r in profile_table(df).collect()}

    assert prof["id"]["n_rows"] == 4 and prof["id"]["n_nulls"] == 0
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"
    assert prof["id"]["mean_value"] == 2.5
    assert prof["s"]["n_nulls"] == 1 and prof["s"]["null_frac"] == 0.25
    assert prof["s"]["approx_distinct"] == 2      # 'a', 'b'
    assert prof["s"]["mean_value"] is None        # not numeric
    assert prof["v"]["mean_value"] == 20.0
    # nested column: null counting still works, value stats degrade
    assert prof["arr"]["n_nulls"] == 1
    assert prof["arr"]["min_value"] is None
    assert prof["arr"]["approx_distinct"] is None


def test_profile_is_single_scan(spark):
    import contextlib
    import io
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"),
        F.col("id").cast("string").alias("s"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        profile_table(df).explain("formatted")
    plan = buf.getvalue()
    assert plan.count("Scan ") <= 2               # one source (tree+detail)
    assert "Join" not in plan


def test_profile_real_table(spark):
    from agnostic_blockchain_etl_spark.operators.tables import load_tables
    docs = load_tables(spark, "/root/testdata/sf0.001",
                       ("documents",))["documents"]
    prof = {r["column"]: r for r in profile_table(docs).collect()}
    assert prof["doc_id"]["n_nulls"] == 0
    assert prof["lang"]["approx_distinct"] >= 2
    assert all(r["n_rows"] == prof["doc_id"]["n_rows"]
               for r in prof.values())


def test_incremental_profile_matches_one_shot(spark):
    """Profile the corpus in 3 disjoint batches via mergeable sketches;
    the merged result must match profiling the union in one shot — exact
    fields exactly, distinct estimates within HLL error of the truth."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    batches = [docs.where(F.col("doc_id") % 3 == i) for i in range(3)]
    sketches = batches[0].transform(profile_sketch)
    for b in batches[1:]:
        sketches = sketches.unionByName(profile_sketch(b))
    merged = {r["column"]: r for r in
              merge_profile_sketches(sketches).collect()}
    oneshot = {r["column"]: r for r in profile_table(docs).collect()}

    assert set(merged) == set(oneshot)
    for col in oneshot:
        m, o = merged[col], oneshot[col]
        assert m["n_rows"] == o["n_rows"], col
        assert m["n_nulls"] == o["n_nulls"], col
        assert m["min_value"] == o["min_value"], col
        assert m["max_value"] == o["max_value"], col
        if o["mean_value"] is not None:
            assert abs(m["mean_value"] - o["mean_value"]) <= 1e-5, col
        if m["approx_distinct"] is not None:
            exact = docs.select(col).where(F.col(col).isNotNull()) \
                .distinct().count()
            assert abs(m["approx_distinct"] - exact) <= max(2, exact * 0.05), col


def test_sketch_merge_is_order_and_split_invariant(spark):
    """Merging [A,B] and [B,A] and a different split of the same rows all
    yield identical profiles (the mergeability contract)."""
    df = spark.createDataFrame(
        [(i, f"s{i % 7}", float(i % 11)) for i in range(200)],
        "id long, s string, v double")
    a, b = df.where("id < 120"), df.where("id >= 120")
    c, d = df.where("id % 2 = 0"), df.where("id % 2 = 1")

    def profile_of(*parts):
        sk = profile_sketch(parts[0])
        for p in parts[1:]:
            sk = sk.unionByName(profile_sketch(p))
        return sorted(map(tuple, merge_profile_sketches(sk).collect()))

    assert profile_of(a, b) == profile_of(b, a) == profile_of(c, d)

"""profile_table: per-column stats correct, nested columns degrade
gracefully, one-scan plan."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.profile import (  # noqa: E402
    profile_table)


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

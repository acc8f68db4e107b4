"""Cross-engine hash canary for the 60-bit shingle hash (dedup._SQL_HASH60 /
_spark_hash60).

Round 2's driver gate hash-mismatched `dedup_signatures` — the one query
exposing ABSOLUTE hash-derived values — while every within-engine hash
join passed, implicating a version-sensitive hex-literal cast in the
DuckDB oracle. These canaries pin the hash of five fixed strings to
literal expected values in BOTH engines, so any future engine-version
drift localizes here instantly instead of surfacing as an opaque
hash_match=false on a 500-row signature matrix.

Expected values are md5-derived and engine-independent by construction:
int(hashlib.md5(s.encode()).hexdigest()[:15], 16).
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANARY = ["hello", "a b c", "", "the quick brown", "étoile unicode"]
EXPECTED = {s: int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            for s in CANARY}


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[2]",
                      conf={"spark.sql.shuffle.partitions": "2"})


def test_duckdb_hash60_matches_md5_prefix():
    from agnostic_blockchain_etl_spark.operators.dedup import _SQL_HASH60
    rows = duckdb.sql(
        "SELECT shingle, " + _SQL_HASH60 + " AS h FROM (VALUES "
        + ", ".join("(?)" for _ in CANARY) + ") t(shingle)",
        params=list(CANARY)).fetchall()
    got = dict(rows)
    assert got == EXPECTED


def test_spark_hash60_matches_md5_prefix(spark):
    from agnostic_blockchain_etl_spark.operators.dedup import _spark_hash60
    df = spark.createDataFrame([(s,) for s in CANARY], "shingle string")
    got = {r["shingle"]: r["h"]
           for r in df.select("shingle",
                              _spark_hash60(F.col("shingle")).alias("h"))
                      .collect()}
    assert got == EXPECTED

"""Per-source frequency caps: exact DuckDB twin, salt-bucket
invariance of the exact form, expectation behavior of the rate form,
and flag-don't-filter contract."""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.sourcecap import (  # noqa: E402
    source_cap, source_cap_rate, source_doc_counts)

SF_DIR = "/root/testdata/sf0.001"
CAP = 20


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "source"))


def _duckdb_cap(cap):
    """The oracle: k smallest portable hashes per source."""
    con = duckdb.connect()
    con.execute(f"""
        CREATE VIEW documents AS
        SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')""")
    return dict(con.execute(f"""
        WITH h AS (
          SELECT doc_id, source,
                 'sourcecap:' || CAST(doc_id AS VARCHAR) AS shingle
          FROM documents),
        r AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(list_sum(list_transform(
                     generate_series(1, 15),
                     i -> (strpos('0123456789abcdef',
                                  substr(md5(shingle), i, 1)) - 1)::BIGINT
                     << (4 * (15 - i)))) AS BIGINT), doc_id) AS rk
          FROM h)
        SELECT doc_id, CASE WHEN rk <= {cap} THEN 1 ELSE 0 END
        FROM r""").fetchall())


def test_exact_matches_duckdb(spark, docs):
    got = {r.doc_id: r.cap_keep for r in source_cap(docs, CAP).collect()}
    want = _duckdb_cap(CAP)
    assert got == want
    counts = {r.source: r.n_docs
              for r in source_doc_counts(docs).collect()}
    kept_by_src = (source_cap(docs, CAP)
                   .groupBy("source").sum("cap_keep").collect())
    for r in kept_by_src:
        assert r["sum(cap_keep)"] == min(CAP, counts[r.source])


def test_salt_buckets_do_not_change_the_kept_set(spark, docs):
    base = {r.doc_id: r.cap_keep for r in source_cap(docs, CAP).collect()}
    for sb in (4, 32):
        salted = {r.doc_id: r.cap_keep
                  for r in source_cap(docs, CAP,
                                      salt_buckets=sb).collect()}
        assert salted == base, sb
    # and layout independence
    again = {r.doc_id: r.cap_keep
             for r in source_cap(docs.repartition(13), CAP,
                                 salt_buckets=4).collect()}
    assert again == base


def test_under_cap_sources_keep_everything(spark):
    docs = spark.createDataFrame(
        [(i, "tiny") for i in range(5)] +
        [(100 + i, "big") for i in range(50)],
        "doc_id long, source string")
    got = source_cap(docs, 10).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r.source, []).append(r.cap_keep)
    assert sum(by_src["tiny"]) == 5      # under cap: all kept
    assert sum(by_src["big"]) == 10      # over cap: exactly cap
    assert len(got) == 55                # flag, don't filter
    # rate form keeps ALL of an under-cap source (p=1 branch is exact)
    rate = {r.doc_id: r.cap_keep for r in source_cap_rate(docs, 10).collect()}
    assert all(rate[i] == 1 for i in range(5))


def test_rate_form_tracks_the_cap_in_expectation(spark):
    docs = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(3000)],
        "doc_id long, source string")
    kept = (source_cap_rate(docs, 100)
            .groupBy("source").sum("cap_keep").collect())
    for r in kept:   # 1000 docs/source, p=0.1 → ~100; bind at ±50%
        assert 50 <= r["sum(cap_keep)"] <= 150, (r.source,
                                                 r["sum(cap_keep)"])
    # deterministic across runs and layouts
    a = {r.doc_id: r.cap_keep for r in source_cap_rate(docs, 100).collect()}
    b = {r.doc_id: r.cap_keep
         for r in source_cap_rate(docs.repartition(7), 100).collect()}
    assert a == b


def test_cap_zero_and_negative(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    assert source_cap(docs, 0).first().cap_keep == 0
    assert source_cap_rate(docs, 0).first().cap_keep == 0
    with pytest.raises(ValueError):
        source_cap(docs, -1)
    with pytest.raises(ValueError):
        source_cap_rate(docs, -1)


def test_one_giant_source_bounded_sort_partitions(spark):
    """Adversarial skew: ONE source owns the whole corpus. The default
    salt_buckets=64 must keep every level-one window partition near
    n/64 rows (the bound on what any task sorts), and the kept set must
    still be exactly the cap smallest hashes."""
    from pyspark.sql import functions as F
    from agnostic_blockchain_etl_spark.operators.sourcecap import (
        _cap_hash, source_cap)
    n, cap, buckets = 20_000, 50, 64
    docs = spark.range(n).select(F.col("id").alias("doc_id"),
                                 F.lit("megadomain").alias("source"))
    # the level-one partition key is (source, pmod(hash, 64)); its max
    # group size bounds the biggest sort any task performs
    sizes = (docs.withColumn("_h", _cap_hash(F.col("doc_id")))
             .groupBy(F.pmod("_h", F.lit(buckets)).alias("b"))
             .count().agg(F.max("count")).first()[0])
    assert sizes <= 3 * n // buckets, sizes   # ~312 expected, never ~n
    got = source_cap(docs, cap)
    assert got.agg(F.sum("cap_keep")).first()[0] == cap
    # kept set == the cap smallest (hash, doc_id) — brute-forced
    brute = (docs.withColumn("_h", _cap_hash(F.col("doc_id")))
             .orderBy("_h", "doc_id").limit(cap)
             .select("doc_id").collect())
    kept = {r.doc_id for r in got.where(F.col("cap_keep") == 1)
            .select("doc_id").collect()}
    assert kept == {r.doc_id for r in brute}

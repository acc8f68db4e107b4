"""Balanced shard writer: token-balance bound, determinism, coverage,
key co-location, skew behavior, and the on-disk layout contract
(partition dirs, sorted rows, overwrite idempotence)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.shards import (  # noqa: E402
    balanced_shard_assign, write_training_shards)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _corpus(spark, n=2000):
    """Heavy-tailed weights: doc i carries 10 + (i % 97)**2 tokens plus a
    few whales — the shape plain hash-mod sharding balances badly."""
    return (spark.range(n)
            .select(F.col("id").alias("doc_id"),
                    (10 + F.pow(F.col("id") % 97, 2) +
                     F.when(F.col("id") % 500 == 0, 20000).otherwise(0))
                    .cast("long").alias("n_tokens")))


class TestAssignment:
    def test_coverage_and_range(self, spark):
        df = _corpus(spark)
        out = balanced_shard_assign(df, "n_tokens", 8).collect()
        assert len(out) == df.count()
        assert len({r.doc_id for r in out}) == len(out)
        assert {r.shard for r in out} <= set(range(8))

    def test_balance_beats_lpt_bound(self, spark):
        df = _corpus(spark)
        out = balanced_shard_assign(df, "n_tokens", 8, n_buckets=256)
        loads = {r.shard: r.w for r in
                 out.groupBy("shard").agg(F.sum("n_tokens").alias("w"))
                    .collect()}
        assert len(loads) == 8
        mean = sum(loads.values()) / 8
        max_bucket = max(
            r.w for r in out.withColumn(
                "b", F.pmod(F.xxhash64("doc_id"), F.lit(256)))
            .groupBy("b").agg(F.sum("n_tokens").alias("w")).collect())
        # LPT guarantee: no shard exceeds the mean by more than the
        # heaviest single bucket
        assert max(loads.values()) <= mean + max_bucket + 1e-9
        # and in practice it is far tighter than naive hash-mod
        assert max(loads.values()) / min(loads.values()) < 1.25

    def test_deterministic(self, spark):
        df = _corpus(spark, n=500)
        a = {r.doc_id: r.shard
             for r in balanced_shard_assign(df, "n_tokens", 4).collect()}
        b = {r.doc_id: r.shard
             for r in balanced_shard_assign(df, "n_tokens", 4).collect()}
        assert a == b

    def test_key_colocation(self, spark):
        """Rows sharing the key (a doc's chunks) stay in one shard."""
        chunks = (spark.range(300)
                  .select((F.col("id") % 60).alias("doc_id"),
                          F.col("id").alias("chunk_id"),
                          F.lit(50).alias("n_tokens")))
        out = balanced_shard_assign(chunks, "n_tokens", 4).collect()
        shard_of = {}
        for r in out:
            assert shard_of.setdefault(r.doc_id, r.shard) == r.shard

    def test_rejects_fewer_buckets_than_shards(self, spark):
        with pytest.raises(ValueError, match="n_buckets"):
            balanced_shard_assign(_corpus(spark, 10), "n_tokens", 8,
                                  n_buckets=4)


class TestRangeStrategy:
    """strategy='range' (round-8 gate row): cumulative packing — fully
    distributed (no collect) and closed-form SQL-expressible, with the
    same balance-bound class as LPT (max shard ≤ mean + heaviest
    bucket... for cumulative packing the bound is bin width + heaviest
    bucket, asserted below)."""

    def test_balance_bound_and_coverage(self, spark):
        df = _corpus(spark)
        out = balanced_shard_assign(df, "n_tokens", 8, n_buckets=256,
                                    strategy="range")
        assert out.count() == df.count()
        loads = {r.shard: r.w for r in
                 out.groupBy("shard").agg(F.sum("n_tokens").alias("w"))
                    .collect()}
        assert set(loads) <= set(range(8))
        total = sum(loads.values())
        max_bucket = max(
            r.w for r in out.withColumn(
                "b", F.pmod(F.xxhash64("doc_id"), F.lit(256)))
            .groupBy("b").agg(F.sum("n_tokens").alias("w")).collect())
        # cumulative packing: a shard holds buckets whose cum-before
        # falls in one bin → load ≤ bin width + heaviest single bucket
        assert max(loads.values()) <= total / 8 + max_bucket + 1e-9

    def test_matches_lpt_on_colocation_and_determinism(self, spark):
        df = _corpus(spark, n=500)
        a = {r.doc_id: r.shard for r in balanced_shard_assign(
            df, "n_tokens", 4, strategy="range").collect()}
        b = {r.doc_id: r.shard for r in balanced_shard_assign(
            df, "n_tokens", 4, strategy="range").collect()}
        assert a == b

    def test_caller_bucket_col_survives_and_drives_assignment(self, spark):
        df = _corpus(spark, n=300).withColumn(
            "my_bucket", (F.col("doc_id") % 16).cast("int"))
        out = balanced_shard_assign(df, "n_tokens", 4, n_buckets=16,
                                    strategy="range",
                                    bucket_col="my_bucket")
        rows = out.collect()
        assert "my_bucket" in out.columns
        shard_of_bucket = {}
        for r in rows:   # same bucket -> same shard, bucket col intact
            assert r.my_bucket == r.doc_id % 16
            assert shard_of_bucket.setdefault(r.my_bucket,
                                              r.shard) == r.shard

    def test_non_integral_weight_raises(self, spark):
        df = _corpus(spark, 20).withColumn(
            "w", F.col("n_tokens").cast("double"))
        with pytest.raises(ValueError, match="integral"):
            balanced_shard_assign(df, "w", 4, strategy="range")

    def test_unknown_strategy_raises(self, spark):
        with pytest.raises(ValueError, match="strategy"):
            balanced_shard_assign(_corpus(spark, 10), "n_tokens", 2,
                                  strategy="greedy")


class TestWriter:
    @pytest.mark.parametrize("strategy", ["lpt", "range"])
    def test_layout_summary_and_idempotent_overwrite(self, spark,
                                                     tmp_path, strategy):
        df = _corpus(spark, n=800)
        path = str(tmp_path / f"shards_{strategy}")
        summary = write_training_shards(df, path, "n_tokens", 4,
                                        strategy=strategy).collect()
        assert [r.shard for r in summary] == [0, 1, 2, 3]
        assert sum(r.n_rows for r in summary) == 800
        total = df.agg(F.sum("n_tokens")).collect()[0][0]
        assert sum(r.total_weight for r in summary) == total
        dirs = {d for d in os.listdir(path) if d.startswith("shard=")}
        assert dirs == {f"shard={i}" for i in range(4)}
        # replay: same input -> identical shard totals
        again = write_training_shards(df, path, "n_tokens", 4,
                                      strategy=strategy).collect()
        assert [(r.shard, r.n_rows, r.total_weight) for r in again] == \
               [(r.shard, r.n_rows, r.total_weight) for r in summary]

    def test_rows_sorted_within_shard(self, spark, tmp_path):
        df = _corpus(spark, n=400)
        path = str(tmp_path / "sorted")
        write_training_shards(df, path, "n_tokens", 2,
                              order_cols=("doc_id",))
        for shard in (0, 1):
            ids = [r.doc_id for r in
                   spark.read.parquet(f"{path}/shard={shard}").collect()]
            assert ids == sorted(ids)


def test_shuffle_salt_orders_deterministically(spark, tmp_path):
    """shuffle_salt materializes a write-time shuffle: same salt ->
    identical file bytes order, different salt -> a different
    permutation, and within each shard rows follow the salted hash."""
    import hashlib
    from agnostic_blockchain_etl_spark.operators.shards import (
        write_training_shards)
    df = spark.createDataFrame(
        [(i, f"doc {i}", 10 + (i % 7)) for i in range(200)],
        "doc_id long, text string, n_tokens long")

    def read_order(path):
        rows = spark.read.parquet(path).collect()
        by_shard = {}
        # parquet preserves within-file row order; collect per shard by
        # re-reading each partition directory in order
        import glob
        order = {}
        for d in sorted(glob.glob(f"{path}/shard=*")):
            shard = int(d.rsplit("=", 1)[1])
            order[shard] = [r.doc_id for r in
                            spark.read.parquet(d).collect()]
        return order

    p1, p2, p3 = (str(tmp_path / n) for n in ("s1", "s2", "s3"))
    write_training_shards(df, p1, "n_tokens", 4, shuffle_salt="epoch0")
    write_training_shards(df, p2, "n_tokens", 4, shuffle_salt="epoch0")
    write_training_shards(df, p3, "n_tokens", 4, shuffle_salt="epoch1")
    o1, o2, o3 = read_order(p1), read_order(p2), read_order(p3)
    assert o1 == o2                      # same salt replays identically
    assert o1 != o3                      # new salt = fresh permutation
    assert {d for v in o1.values() for d in v} \
        == {d for v in o3.values() for d in v}  # same membership
    for shard, ids in o1.items():
        keys = [hashlib.md5(f"epoch0{d}".encode()).hexdigest()
                for d in ids]
        assert keys == sorted(keys), shard   # salted-hash order inside


def test_epoch_copies_spread_with_composite_key(spark):
    """The epoch_upsample -> shard-write recipe: keyed by bare doc_id
    the writer CLUSTERS every copy of a document into one shard (both
    the assignment and the shuffle order hash key_col); keyed by the
    documented (doc_id, epoch) composite the copies spread."""
    from agnostic_blockchain_etl_spark.operators.mixture import (
        epoch_upsample)
    from agnostic_blockchain_etl_spark.operators.shards import (
        balanced_shard_assign)
    docs = spark.createDataFrame(
        [(i, "en") for i in range(100)], "doc_id long, lang string")
    rep = epoch_upsample(docs, {"en": 4.0}) \
        .withColumn("n_tokens", F.lit(10)) \
        .withColumn("rep_key", F.concat_ws(":", "doc_id", "epoch"))
    assert rep.count() == 400                      # x4.0 exact
    # bare doc_id: every doc's 4 copies land in ONE shard (the hazard)
    bare = balanced_shard_assign(rep, "n_tokens", 8, key_col="doc_id")
    per = bare.groupBy("doc_id") \
        .agg(F.countDistinct("shard").alias("k")).collect()
    assert all(r.k == 1 for r in per)
    # composite key: most docs spread over several shards
    comp = balanced_shard_assign(rep, "n_tokens", 8, key_col="rep_key")
    kdist = comp.groupBy("doc_id") \
        .agg(F.countDistinct("shard").alias("k")).collect()
    assert sum(1 for r in kdist if r.k > 1) > 80

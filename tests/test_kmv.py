"""KMV distinct-count sketch family (`operators/kmv.py`): the exact
path when the sketch is under-full, the merge-equals-one-shot
property, the banded per-group cutoff vs a naive per-group window,
NULL handling (keys under the sentinel, NULL groups kept), estimator
accuracy on a known cardinality, and argument validation. The
cross-engine hash/order/estimate algebra itself is pinned by the
registered `kmv_distinct_estimate` oracle pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.kmv import (  # noqa: E402
    kmv_build, kmv_estimate, kmv_group_build, kmv_group_estimate,
    kmv_merge, kmv_set_estimates)

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def events(spark):
    from agnostic_blockchain_etl_spark.operators.tables import load_tables
    return load_tables(spark, SF_DIR, ("events",))["events"] \
        .select("event_id", "user_id", "event_type")


def _hashes(sketch):
    return [r["h"] for r in sketch.orderBy("h").collect()]


class TestBuildAndEstimate:
    def test_underfull_sketch_is_exact(self, spark, events):
        """Fewer distinct keys than k -> the sketch IS the distinct
        set and the estimate equals the exact count."""
        exact = events.select("user_id").distinct().count()
        k = exact + 10
        sk = kmv_build(events, "user_id", k=k)
        assert sk.count() == exact
        row = kmv_estimate(sk, k=k).collect()[0]
        assert row["n_kept"] == exact
        assert row["est"] == float(exact)

    def test_estimator_tracks_known_cardinality(self, spark):
        """2000 synthetic keys, k=256: the Bar-Yossef estimator lands
        within 25% of truth (its relative error concentrates around
        1/sqrt(k) ~ 6%; the wide tolerance keeps the test about the
        algebra, not the luck of one salt)."""
        n, k = 2000, 256
        d = spark.range(n).select(
            F.concat(F.lit("key-"), F.col("id")).alias("u"))
        est = kmv_estimate(kmv_build(d, "u", k=k), k=k).collect()[0]
        assert est["n_kept"] == k
        assert abs(est["est"] - n) / n < 0.25

    def test_null_keys_count_once_under_sentinel(self, spark):
        d = spark.range(6).select(
            F.when(F.col("id") < 3, F.col("id")).alias("u"))
        sk = kmv_build(d, "u", k=16)        # 0,1,2,NULL -> 4 distinct
        assert sk.count() == 4

    def test_k_must_exceed_one(self, spark, events):
        with pytest.raises(ValueError, match="k must be > 1"):
            kmv_build(events, "user_id", k=1)
        with pytest.raises(ValueError, match="k must be > 1"):
            kmv_estimate(events.limit(0), k=0)


class TestMerge:
    def test_merge_equals_one_shot(self, spark, events):
        """The KMV closure property, bit-exact: merging per-half
        sketches equals building once over everything — for an even
        split AND a skewed one."""
        k = 8
        one = _hashes(kmv_build(events, "user_id", k=k))
        for split in (F.col("event_id") % 2 == 0,
                      F.col("event_id") % 10 == 0):
            a = kmv_build(events.where(split), "user_id", k=k)
            b = kmv_build(events.where(~split), "user_id", k=k)
            assert _hashes(kmv_merge(a, b, k=k)) == one

    def test_merge_is_idempotent(self, spark, events):
        k = 8
        sk = kmv_build(events, "user_id", k=k)
        assert _hashes(kmv_merge(sk, sk, k=k)) == _hashes(sk)

    def test_merge_requires_an_input(self):
        with pytest.raises(ValueError, match="at least one sketch"):
            kmv_merge(k=8)


class TestGroupBuild:
    def test_banded_cutoff_equals_naive_window(self, spark, events):
        """The scale path (banded cutoff before the window) must equal
        the naive per-group rank value-for-value — k both under and
        over the per-group cardinality."""
        from agnostic_blockchain_etl_spark.operators.kmv import _kmv_hash
        for k in (5, 500):
            got = kmv_group_build(events, "event_type", "user_id", k=k)
            naive = (events.select(F.col("event_type").alias("grp"),
                                   _kmv_hash("user_id", "kmv:").alias("h"))
                     .distinct()
                     .withColumn("__r", F.row_number().over(
                         Window.partitionBy("grp").orderBy("h")))
                     .where(F.col("__r") <= k).drop("__r"))
            assert sorted(map(tuple, got.collect())) \
                == sorted(map(tuple, naive.collect()))

    def test_null_group_is_kept(self, spark):
        d = spark.range(10).select(
            F.when(F.col("id") < 5, F.lit("a")).alias("g"),
            F.col("id").alias("u"))
        gs = kmv_group_build(d, "g", "u", k=16)
        grps = {r["grp"] for r in gs.select("grp").distinct().collect()}
        assert grps == {"a", None}
        est = kmv_group_estimate(gs, k=16)
        by_grp = {r["grp"]: r["est"] for r in est.collect()}
        assert by_grp == {"a": 5.0, None: 5.0}

    def test_group_windows_are_pruned_before_rank(self, spark, events):
        """The plan-shape claim: rows reaching the ranked window carry
        the band filter (band <= cutoff), so no window partition holds
        a whole hot group. Asserted on the optimized plan text."""
        plan = kmv_group_build(events, "event_type", "user_id", k=5) \
            ._jdf.queryExecution().optimizedPlan().toString()
        assert "__band" in plan and "__cut" in plan


class TestGateShape:
    def test_gate_facets_and_exact_rows(self, spark):
        from agnostic_blockchain_etl_spark.operators.kmv import (
            kmv_distinct_estimate)
        out = kmv_distinct_estimate(spark, SF_DIR).collect()
        facets = {r["facet"] for r in out}
        assert facets == {"global", "head", "group"}
        glob = [r for r in out if r["facet"] == "global"]
        assert len(glob) == 1
        # sf0.001 has 15 users < k=32: exact path on every facet row
        assert glob[0]["est"] == float(glob[0]["exact_n"])
        for r in out:
            if r["facet"] == "group":
                assert r["est"] == float(r["exact_n"])


class TestKmvStream:
    """`streaming.dedup.kmv_cardinality_stream`: the cardinality
    member of the foreachBatch store family — cumulative estimates
    bit-equal to one-shot builds, restart continuation, bounded
    store, snapshot compaction + pruning."""

    @staticmethod
    def _drain(spark, src, store, out, ckpt, **kw):
        from agnostic_blockchain_etl_spark.streaming.dedup import (
            kmv_cardinality_stream)
        stream = (spark.readStream.schema("doc_id LONG, text STRING")
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = kmv_cardinality_stream(stream, store, out, ckpt,
                                   k=8, **kw)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def test_cumulative_equals_one_shot_and_restart(self, spark,
                                                    tmp_path):
        from agnostic_blockchain_etl_spark.operators.kmv import (
            kmv_build, kmv_estimate)
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("src", "out", "store",
                                           "ckpt"))
        batches = [[(i, f"doc-{i}") for i in range(0, 6)],
                   [(i, f"doc-{i}") for i in range(3, 12)],   # overlap
                   [(i, f"doc-{i % 4}") for i in range(50, 64)]]  # dups

        def write(rows):
            spark.createDataFrame(rows, "doc_id long, text string") \
                .coalesce(1).write.mode("append").parquet(src)

        write(batches[0]); write(batches[1])
        self._drain(spark, src, store, out, ckpt)
        write(batches[2])                     # restart continuation
        self._drain(spark, src, store, out, ckpt)

        seen: list = []
        for b, rows in enumerate(batches):
            seen.extend(rows)
            got = spark.read.parquet(f"{out}/batch_id={b}").collect()[0]
            oneshot = kmv_estimate(kmv_build(
                spark.createDataFrame(seen, "doc_id long, text string"),
                "text", k=8), k=8).collect()[0]
            assert (got["n_kept"], got["est"]) \
                == (oneshot["n_kept"], oneshot["est"]), f"batch {b}"
        # store stays sketch-sized: ≤ k rows per delta
        assert spark.read.parquet(store).count() <= 3 * 8

    def test_compacts_and_prunes(self, spark, tmp_path):
        import os
        src, out, store, ckpt = (str(tmp_path / d)
                                 for d in ("csrc", "cout", "cstore",
                                           "cckpt"))

        def write(rows):
            spark.createDataFrame(rows, "doc_id long, text string") \
                .coalesce(1).write.mode("append").parquet(src)

        for b in range(4):
            write([(10 * b + i, f"t{b}-{i}") for i in range(3)])
        self._drain(spark, src, store, out, ckpt,
                    compact_every=2, prune_after_compact=True)
        assert any(s.startswith("upto=")
                   for s in os.listdir(f"{store}_compact"))
        deltas = [d for d in os.listdir(store)
                  if d.startswith("batch_id=")]
        assert len(deltas) <= 4
        # final cumulative count: 12 distinct keys, under-full sketch
        # regime would cap at k=8 kept rows
        last = spark.read.parquet(f"{out}/batch_id=3").collect()[0]
        assert last["n_kept"] == 8          # sketch full
        assert last["est"] > 0


class TestSetEstimates:
    def _keys(self, spark, lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("k"), F.col("id")).alias("u"))

    def test_under_full_sketches_are_exact(self, spark):
        # |A|=150, |B|=150, overlap 50, k=1024: every quantity exact
        a = kmv_build(self._keys(spark, 0, 150), "u", k=1024)
        b = kmv_build(self._keys(spark, 100, 250), "u", k=1024)
        r = kmv_set_estimates(a, b, k=1024).collect()[0]
        assert r["n_kept"] == 250
        assert r["rho"] == 50
        assert r["jaccard"] == 0.2           # 50/250 half-up 6dp
        assert r["union_est"] == 250.0
        assert r["inter_est"] == 50.0

    def test_disjoint_sets(self, spark):
        a = kmv_build(self._keys(spark, 0, 100), "u", k=256)
        b = kmv_build(self._keys(spark, 100, 200), "u", k=256)
        r = kmv_set_estimates(a, b, k=256).collect()[0]
        assert r["rho"] == 0
        assert r["jaccard"] == 0.0 and r["inter_est"] == 0.0

    def test_full_sketch_estimates_track_truth(self, spark):
        # |A|=|B|=4000, overlap 2000 -> J = 1/3, union 6000
        a = kmv_build(self._keys(spark, 0, 4000), "u", k=128)
        b = kmv_build(self._keys(spark, 2000, 6000), "u", k=128)
        r = kmv_set_estimates(a, b, k=128).collect()[0]
        assert r["n_kept"] == 128
        assert abs(r["jaccard"] - 1 / 3) < 0.15
        assert abs(r["union_est"] - 6000) / 6000 < 0.3
        assert r["inter_est"] == round(r["jaccard"] * r["union_est"], 6)

"""Training-order family (`operators/ordering.py`): rank exactness
beyond what the oracle pair pins (tiny-bucket stress, NULL groups),
the interleave's bounded-run-length guarantee, determinism across
partitionings, and the plan-level claim that no window partition ever
holds the whole corpus."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.ordering import (  # noqa: E402
    global_order_index, interleaved_order_index)

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
        .select("doc_id", "source")


class TestGlobalOrder:
    def test_is_permutation(self, spark, docs):
        n = docs.count()
        out = global_order_index(docs)
        got = out.agg(F.countDistinct("ord"), F.min("ord"),
                      F.max("ord")).collect()[0]
        assert tuple(got) == (n, 1, n)

    def test_bucket_knob_does_not_change_order(self, spark, docs):
        """Tiny buckets (stress: many rows per bucket boundary) and
        huge buckets (most empty) produce the identical permutation —
        the two-level decomposition is exact, not approximate."""
        a = global_order_index(docs, n_buckets=4).select("doc_id", "ord")
        b = global_order_index(docs, n_buckets=8192) \
            .select("doc_id", "ord")
        assert a.exceptAll(b).count() == 0

    def test_repartition_invariant(self, spark, docs):
        a = global_order_index(docs).select("doc_id", "ord")
        b = global_order_index(docs.repartition(17, "source")) \
            .select("doc_id", "ord")
        assert a.exceptAll(b).count() == 0

    def test_salt_is_the_epoch(self, spark, docs):
        """Different salt → a different (but still valid) permutation:
        new-epoch reshuffles come from the salt alone."""
        a = global_order_index(docs, salt="epoch1:")
        b = global_order_index(docs, salt="epoch2:")
        joined = a.select("doc_id", "ord").join(
            b.select("doc_id", F.col("ord").alias("ord2")), "doc_id")
        assert joined.where("ord != ord2").count() > 0

    def test_bucket_validation(self, spark, docs):
        with pytest.raises(ValueError):
            global_order_index(docs, n_buckets=100)

    def test_id_col_is_the_hash_key(self, spark, docs):
        """Review regression: the order hash was hardwired to a column
        literally named doc_id (only the tie-break honored id_col) —
        a frame with no doc_id column crashed, and one with an
        UNRELATED doc_id column silently ordered by the wrong key.
        Same ids under a different name must produce the identical
        permutation; an unrelated doc_id column must be ignored."""
        renamed = docs.withColumnRenamed("doc_id", "uid")
        a = global_order_index(docs).select(
            F.col("doc_id").alias("uid"), "ord")
        b = global_order_index(renamed, id_col="uid") \
            .select("uid", "ord")
        assert a.exceptAll(b).count() == 0
        # decoy doc_id present: the hash must still key on uid
        decoy = renamed.withColumn("doc_id", F.lit(0))
        c = global_order_index(decoy, id_col="uid").select("uid", "ord")
        assert c.exceptAll(b).count() == 0
        # grouped path too (interleave + split share _grouped_rank)
        g = interleaved_order_index(renamed, id_col="uid") \
            .select("uid", F.col("ord_ilv"))
        g2 = interleaved_order_index(docs).select(
            F.col("doc_id").alias("uid"), "ord_ilv")
        assert g.exceptAll(g2).count() == 0


class TestInterleavedOrder:
    def test_run_length_bounded_by_live_groups(self, spark, docs):
        """The guarantee the operator exists for: walk the interleaved
        order; a source never repeats within any window of
        min(live-group-count) positions. Checked exactly via rank
        algebra: within a source, consecutive src_ranks map to
        ord_ilv gaps >= number of groups still holding that rank."""
        out = interleaved_order_index(docs).orderBy("ord_ilv")
        rows = out.select("source", "ord_ilv").collect()
        seq = [r["source"] for r in rows]
        # adjacent duplicates would mean two docs of one source with
        # nothing interleaved between them — impossible unless only
        # one source is still live (tail of the order)
        n_sources = docs.select("source").distinct().count()
        sizes = {r["source"]: r["c"] for r in
                 docs.groupBy("source").agg(F.count("*").alias("c"))
                 .collect()}
        min_size = min(sizes.values())
        # during the first min_size full rounds every group is live:
        # the first min_size * n_sources positions are perfect rounds
        head = seq[:min_size * n_sources]
        for start in range(0, len(head), n_sources):
            rnd = head[start:start + n_sources]
            assert len(set(rnd)) == len(rnd), f"dup source in round {rnd}"

    def test_matches_naive_windows(self, spark, docs):
        from pyspark.sql import Window
        from agnostic_blockchain_etl_spark.operators.corpus import \
            _salted_h60
        d = docs.withColumn("__h", _salted_h60("ilv:"))
        naive_r = d.withColumn(
            "r", F.row_number().over(
                Window.partitionBy("source").orderBy("__h", "doc_id")))
        naive = naive_r.withColumn(
            "ilv", F.row_number().over(
                Window.orderBy("r", "source", "doc_id"))
            .cast("long")).select("doc_id", "ilv")
        ours = interleaved_order_index(docs, n_buckets=16) \
            .select("doc_id", F.col("ord_ilv").alias("ilv"))
        assert ours.exceptAll(naive).count() == 0

    def test_null_group_parity_with_duckdb(self, spark):
        """NULL-group tie-break is pinned NULLS FIRST on both engines
        (Spark's ASC default vs DuckDB's nulls-last default would
        silently diverge — review finding). Mini cross-engine run with
        a NULL source present, the case the registered gate's testdata
        never exercises."""
        import duckdb
        import pandas as pd
        from agnostic_blockchain_etl_spark.operators.hashing import \
            sql_keyed_h60
        rows = [(i, None if i % 3 == 0 else f"s{i % 2}")
                for i in range(30)]
        d = spark.createDataFrame(rows, "doc_id long, source string")
        ours = {r["doc_id"]: r["ord_ilv"]
                for r in interleaved_order_index(d).collect()}
        con = duckdb.connect()
        con.register("docs", pd.DataFrame(rows,
                                          columns=["doc_id", "source"]))
        h = sql_keyed_h60("'ilv:'", "CAST(doc_id AS VARCHAR)")
        naive = con.sql(f"""
            WITH r AS (
                SELECT doc_id, source,
                       row_number() OVER (PARTITION BY source
                                          ORDER BY {h}, doc_id) AS r
                FROM docs)
            SELECT doc_id,
                   row_number() OVER (ORDER BY r, source NULLS FIRST,
                                      doc_id) AS ilv
            FROM r""").df()
        theirs = dict(zip(naive["doc_id"], naive["ilv"]))
        assert ours == theirs

    def test_null_group_participates(self, spark):
        d = spark.createDataFrame(
            [(1, "a"), (2, None), (3, "a"), (4, None), (5, "b")],
            "doc_id long, source string")
        out = interleaved_order_index(d)
        assert out.count() == 5
        got = out.agg(F.countDistinct("ord_ilv"), F.min("ord_ilv"),
                      F.max("ord_ilv")).collect()[0]
        assert tuple(got) == (5, 1, 5)
        # NULL group got within-group ranks 1..2 like any other
        nulls = out.where(F.col("source").isNull()) \
                   .select("src_rank").collect()
        assert sorted(r["src_rank"] for r in nulls) == [1, 2]


class TestStratifiedSplitExact:
    def test_exact_counts_per_stratum(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            stratified_split_exact
        d = spark.range(300).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("l"), (F.col("id") % 3)).alias("lang"))
        out = stratified_split_exact(d, {"val": 20, "test": 10})
        got = {(r["lang"], r["split"]): r["c"] for r in
               out.groupBy("lang", "split").agg(F.count("*").alias("c"))
               .collect()}
        for lang in ("l0", "l1", "l2"):
            assert got[(lang, "val")] == 20
            assert got[(lang, "test")] == 10
            assert got[(lang, "train")] == 70

    def test_short_stratum_fills_in_order(self, spark):
        """A stratum smaller than the first threshold puts EVERYTHING
        in the first split; one straddling the second threshold leaves
        the later split short — never an error, never a loss."""
        from agnostic_blockchain_etl_spark.operators.ordering import \
            stratified_split_exact
        d = spark.createDataFrame(
            [(i, "tiny") for i in range(5)]
            + [(100 + i, "mid") for i in range(15)],
            "doc_id long, lang string")
        out = stratified_split_exact(d, {"val": 10, "test": 10})
        got = {(r["lang"], r["split"]): r["c"] for r in
               out.groupBy("lang", "split").agg(F.count("*").alias("c"))
               .collect()}
        assert got[("tiny", "val")] == 5 and ("tiny", "test") not in got
        assert got[("mid", "val")] == 10 and got[("mid", "test")] == 5

    def test_membership_is_rank_prefix(self, spark):
        """val IS the rank-1..n prefix (not just n arbitrary docs):
        every val rank < every test rank < every train rank, within
        each stratum."""
        from agnostic_blockchain_etl_spark.operators.ordering import \
            stratified_split_exact
        d = spark.range(120).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("s"), (F.col("id") % 2)).alias("lang"))
        out = stratified_split_exact(d, {"val": 15, "test": 15})
        bounds = (out.groupBy("lang", "split")
                  .agg(F.min("split_rank").alias("lo"),
                       F.max("split_rank").alias("hi")).collect())
        b = {(r["lang"], r["split"]): (r["lo"], r["hi"]) for r in bounds}
        for lang in ("s0", "s1"):
            assert b[(lang, "val")] == (1, 15)
            assert b[(lang, "test")] == (16, 30)
            assert b[(lang, "train")][0] == 31

    def test_validation(self, spark, docs):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            stratified_split_exact
        with pytest.raises(ValueError):
            stratified_split_exact(docs.withColumnRenamed(
                "source", "lang"), {})
        with pytest.raises(ValueError):
            stratified_split_exact(docs.withColumnRenamed(
                "source", "lang"), {"val": -1})


class TestOrderingPlanShape:
    def test_no_corpus_sized_window_partition(self, spark, docs):
        """The scale claim: every WindowExec in the plan either
        partitions by the bucket key or runs over the bounded offsets
        summary — never an unpartitioned window over the data frame.
        Pinned the same way test_plan_shapes does for token_budget_cap:
        the data-side window specs must all carry a partition key."""
        out = global_order_index(docs)
        plan = out._jdf.queryExecution().executedPlan().toString()
        # the only partition-less Window allowed is the one over the
        # grouped offsets summary (its child contains the HashAggregate
        # over __bk); the row-rank window must be partitioned
        import re
        specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
        partitioned = [s for s in specs if "__bk" in s]
        assert partitioned, plan  # row-rank window partitions on __bk


class TestCurriculumOrder:
    def _mk(self, spark, scores):
        return spark.createDataFrame(
            [(i, s) for i, s in enumerate(scores)],
            "doc_id long, score double")

    def test_stages_are_contiguous_rank_ranges(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        d = self._mk(spark, [float(x) for x in range(103, 0, -1)])
        out = curriculum_order_index(d, score_col="score",
                                     n_stages=4).collect()
        n = len(out)
        for r in out:
            assert r["stage"] == ((r["curr_rank"] - 1) * 4) // n
        # floor partition: stage sizes differ by at most 1
        sizes = {}
        for r in out:
            sizes[r["stage"]] = sizes.get(r["stage"], 0) + 1
        assert set(sizes) == {0, 1, 2, 3}
        assert max(sizes.values()) - min(sizes.values()) <= 1

    def test_easy_docs_first_hard_last(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        d = self._mk(spark, [float(x) for x in range(40)])
        out = curriculum_order_index(d, score_col="score",
                                     n_stages=2).collect()
        by_pos = sorted(out, key=lambda r: r["ord_curr"])
        first_half = {r["doc_id"] for r in by_pos[:20]}
        # scores ARE doc_ids here: the easy half is exactly ids 0..19
        assert first_half == set(range(20))
        # ... but within the stage the hash shuffle broke score order
        first_scores = [r["doc_id"] for r in by_pos[:20]]
        assert first_scores != sorted(first_scores)

    def test_null_scores_fill_the_last_stage(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        rows = [(i, float(i)) for i in range(30)] + \
            [(100 + i, None) for i in range(10)]
        d = spark.createDataFrame(rows, "doc_id long, score double")
        out = curriculum_order_index(d, score_col="score",
                                     n_stages=4).collect()
        nulls = [r for r in out if r["doc_id"] >= 100]
        assert all(r["stage"] == 3 for r in nulls)
        assert {r["curr_rank"] for r in nulls} == set(range(31, 41))

    def test_degenerate_all_equal_scores(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        d = self._mk(spark, [5.0] * 17)
        out = curriculum_order_index(d, score_col="score",
                                     n_stages=3).collect()
        assert {r["curr_rank"] for r in out} == set(range(1, 18))
        assert {r["ord_curr"] for r in out} == set(range(1, 18))

    def test_bucket_knob_does_not_change_positions(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        d = self._mk(spark, [float((7 * x) % 53) for x in range(53)])
        a = {(r["doc_id"], r["ord_curr"]) for r in
             curriculum_order_index(d, score_col="score",
                                    n_buckets=8).collect()}
        b = {(r["doc_id"], r["ord_curr"]) for r in
             curriculum_order_index(d, score_col="score",
                                    n_buckets=1024).collect()}
        assert a == b

    def test_salt_reshuffles_within_stage_only(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        d = self._mk(spark, [float(x) for x in range(60)])
        a = curriculum_order_index(d, score_col="score",
                                   salt="epoch1:").collect()
        b = curriculum_order_index(d, score_col="score",
                                   salt="epoch2:").collect()
        sa = {r["doc_id"]: r["stage"] for r in a}
        sb = {r["doc_id"]: r["stage"] for r in b}
        assert sa == sb                       # stages are salt-free
        oa = {r["doc_id"]: r["ord_curr"] for r in a}
        ob = {r["doc_id"]: r["ord_curr"] for r in b}
        assert oa != ob                       # positions reshuffled

    def test_validation(self, spark):
        from agnostic_blockchain_etl_spark.operators.ordering import \
            curriculum_order_index
        d = self._mk(spark, [1.0])
        with pytest.raises(ValueError, match="n_stages"):
            curriculum_order_index(d, score_col="score", n_stages=0)
        with pytest.raises(ValueError, match="power of two"):
            curriculum_order_index(d, score_col="score", n_buckets=3)

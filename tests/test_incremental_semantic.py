"""incremental_semantic_dedup: the day-2 contract for the semantic
family (mirrors test_incremental.py's story for MinHash)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from agnostic_blockchain_etl_spark.operators.similarity import (
    compact_semantic_store, incremental_semantic_dedup,
    semantic_member_store)


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _vec(rng, dim=16):
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).tolist()


def _jitter(v, rng, eps=1e-3):
    w = np.array(v) + eps * rng.standard_normal(len(v))
    return (w / np.linalg.norm(w)).tolist()


@pytest.fixture(scope="module")
def setting(spark):
    rng = np.random.default_rng(7)
    base = [_vec(rng) for _ in range(6)]
    hist_rows = [(i, base[i]) for i in range(4)]          # history: 0-3
    batch_rows = [
        (100, _jitter(base[0], rng)),    # dup of history vec 0
        (101, _vec(rng)),                # novel
        (102, _vec(rng)),                # novel, dup-pair with 103
        (103, None),                     # filled below
        (104, _vec(rng)),                # novel singleton
    ]
    batch_rows[3] = (103, _jitter(batch_rows[2][1], rng))
    hist = spark.createDataFrame(
        hist_rows, "vec_id long, embedding array<double>")
    batch = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<double>")
    # deterministic codebook: 2 centroids from history
    codebook = spark.createDataFrame(
        [(0, base[0]), (1, base[2])],
        "list_id int, centroid array<double>")
    store = semantic_member_store(hist, codebook)
    return hist, batch, store, codebook


def test_store_one_row_per_vector(setting):
    _, _, store, _ = setting
    rows = store.collect()
    assert len(rows) == 4
    assert {r.vec_id for r in rows} == {0, 1, 2, 3}
    assert all(r.list_id in (0, 1) for r in rows)


def test_day2_contract(spark, setting):
    _, batch, store, codebook = setting
    ann, updated = incremental_semantic_dedup(batch, store, codebook,
                                              tau=0.99)
    rows = {r.vec_id: r for r in ann.collect()}
    assert set(rows) == {100, 101, 102, 103, 104}
    # 100 is a jittered copy of stored vec 0 -> history dup, dropped
    assert rows[100].dup_of_history == 0 and rows[100].keep == 0
    # 102/103 are a within-batch pair -> one group, min id kept
    assert rows[102].batch_group == rows[103].batch_group == 102
    assert rows[102].keep == 1 and rows[103].keep == 0
    # novel singletons kept
    assert rows[101].keep == 1 and rows[104].keep == 1
    # store grows by exactly the kept vectors
    got = {r.vec_id for r in updated.collect()}
    assert got == {0, 1, 2, 3, 101, 102, 104}


def test_replay_adds_nothing(spark, setting):
    _, batch, store, codebook = setting
    ann, updated = incremental_semantic_dedup(batch, store, codebook,
                                              tau=0.99)
    replay = batch.withColumn("vec_id", F.col("vec_id") + 1_000_000)
    ann2, updated2 = incremental_semantic_dedup(replay, updated,
                                                codebook, tau=0.99)
    assert ann2.where(F.col("keep") == 1).count() == 0
    assert updated2.count() == updated.count()


def test_max_list_size_guard(spark, setting):
    """A degenerate STORE cluster (many near-identical stored members)
    is dropped-and-logged when over the cap — bounded work, lost
    history matches for that cluster only — while BATCH vectors are
    never dropped: every new vector keeps its annotated row (the
    one-row-per-new-vector contract a streaming caller relies on)."""
    rng = np.random.default_rng(11)
    pivot = _vec(rng)
    flood = [(1000 + i, _jitter(pivot, rng)) for i in range(50)]
    other = _vec(rng)
    hist = spark.createDataFrame(
        flood + [(1, other)], "vec_id long, embedding array<double>")
    codebook = spark.createDataFrame(
        [(0, pivot), (1, other)], "list_id int, centroid array<double>")
    store = semantic_member_store(hist, codebook)
    batch = spark.createDataFrame(
        [(2000, _jitter(pivot, rng)), (2001, _jitter(other, rng))],
        "vec_id long, embedding array<double>")
    ann, _ = incremental_semantic_dedup(batch, store, codebook,
                                        tau=0.99, max_list_size=10)
    rows = {r.vec_id: r for r in ann.collect()}
    # full batch coverage — nothing vanishes under the cap
    assert set(rows) == {2000, 2001}
    # the healthy cluster still dedups against history
    assert rows[2001].dup_of_history == 1 and rows[2001].keep == 0
    # the flood cluster's history was dropped (logged): its batch probe
    # sees no history and is kept — the documented bounded-work trade
    assert rows[2000].dup_of_history is None and rows[2000].keep == 1


def test_batch_dag_materializes_once(spark):
    """The round-7 twin of the text-path recompute pin: `assigned`
    inside incremental_semantic_dedup feeds four consumers plus the
    component checkpoint; the scoped cache bounds the batch embedding
    DAG to one materialization. An accumulator UDF upstream ticks per
    source row: cached ≈ 1n, un-persisted was ~4-5n."""
    sc = spark.sparkContext
    acc = sc.accumulator(0)

    @F.udf("array<double>")
    def tick(e):
        acc.add(1)
        return e

    rng = np.random.default_rng(31)
    base = _vec(rng)
    n = 30
    batch = spark.createDataFrame(
        [(i, _vec(rng)) for i in range(n)],
        "vec_id long, embedding array<double>") \
        .withColumn("embedding", tick("embedding"))
    store = spark.createDataFrame(
        [(1000, 0, base)], "vec_id long, list_id int, e array<double>")
    codebook = spark.createDataFrame(
        [(0, base)], "list_id int, centroid array<double>")
    ann, updated = incremental_semantic_dedup(batch, store, codebook,
                                              tau=0.99)
    assert ann.count() == n
    assert acc.value <= 2 * n, (
        f"batch DAG recomputed: {acc.value} evaluations for {n} rows")


def test_compaction_keeps_matches_the_cap_drops(spark):
    """The day-N lifecycle (round-6 verdict ask): an append-heavy store
    whose flooded cluster would be amputated by ``max_list_size`` is
    instead COMPACTED — mutually-near members collapse to the oldest
    representative — so the list drops under the cap and the history
    match survives. Same flood, same cap, opposite outcome."""
    rng = np.random.default_rng(23)
    pivot = _vec(rng)
    flood = [(1000 + i, _jitter(pivot, rng, eps=1e-4)) for i in range(50)]
    other = _vec(rng)
    hist = spark.createDataFrame(
        flood + [(1, other)], "vec_id long, embedding array<double>")
    codebook = spark.createDataFrame(
        [(0, pivot), (1, other)], "list_id int, centroid array<double>")
    store = semantic_member_store(hist, codebook)

    compacted = compact_semantic_store(store, tau_compact=0.99)
    by_list = {r.list_id: r for r in compacted.collect()}
    # the flood collapsed to its OLDEST member; the singleton untouched
    assert len(by_list) == 2
    assert by_list[0].vec_id == 1000
    assert by_list[1].vec_id == 1

    batch = spark.createDataFrame(
        [(2000, _jitter(pivot, rng, eps=1e-4))],
        "vec_id long, embedding array<double>")
    # uncompacted + cap: history amputated, dup admitted (the r6 state)
    ann_cap, _ = incremental_semantic_dedup(batch, store, codebook,
                                            tau=0.99, max_list_size=10)
    assert ann_cap.collect()[0].keep == 1
    # compacted + same cap: the representative still rejects the dup
    ann_cmp, _ = incremental_semantic_dedup(batch, compacted, codebook,
                                            tau=0.99, max_list_size=10)
    row = ann_cmp.collect()[0]
    assert row.dup_of_history == 1000 and row.keep == 0


def test_compaction_idempotent_and_star_probe_bounded(spark):
    """compact(compact(s)) == compact(s) (representatives are mutually
    below tau_compact by construction), and a sign-degenerate flood
    far over ``max_cluster_size`` still collapses through the star
    probe (O(m) edges spanning the flood component)."""
    rng = np.random.default_rng(29)
    pivot = _vec(rng)
    flood = [(i, _jitter(pivot, rng, eps=1e-5)) for i in range(200)]
    hist = spark.createDataFrame(flood,
                                 "vec_id long, embedding array<double>")
    codebook = spark.createDataFrame([(0, pivot)],
                                     "list_id int, centroid array<double>")
    store = semantic_member_store(hist, codebook)
    once = compact_semantic_store(store, tau_compact=0.999,
                                  max_cluster_size=32)
    got = once.collect()
    assert len(got) == 1 and got[0].vec_id == 0   # star probe spans all
    twice = compact_semantic_store(once, tau_compact=0.999,
                                   max_cluster_size=32)
    assert [r.vec_id for r in twice.collect()] == [0]

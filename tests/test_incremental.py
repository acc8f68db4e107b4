"""Incremental dedup against a signature store: planted duplicates are
caught against history and within the batch, clean documents pass, the
store update is exactly the kept set, and replaying a batch is
idempotent. The estimator is sanity-checked against exact Jaccard on
the planted near-pair."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.operators.incremental import (  # noqa: E402
    incremental_dedup, incremental_neardup_pairs, signature_store)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


@pytest.fixture(scope="module")
def setting(spark):
    """History = corpus docs with even doc_id; batch = a disjoint slice
    of odd docs plus planted offenders: an exact copy of a history doc,
    a near copy (last 3 words dropped), and an exact within-batch dup."""
    docs = (spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select("doc_id", "text"))
    history = docs.where(F.col("doc_id") % 2 == 0)
    batch_base = docs.where((F.col("doc_id") % 2 == 1) &
                            (F.col("doc_id") < 100))
    victim = history.orderBy("doc_id").limit(1).collect()[0]
    near_text = " ".join(victim.text.split()[:-3])
    batch_doc = batch_base.orderBy("doc_id").limit(1).collect()[0]
    planted = spark.createDataFrame(
        [(910000, victim.text),          # exact dup of history
         (910001, near_text),            # near dup of history
         (910002, batch_doc.text)],      # exact dup WITHIN the batch
        "doc_id long, text string")
    batch = batch_base.unionByName(planted)
    store = signature_store(history)
    return history, batch, store, victim.doc_id, batch_doc.doc_id


def test_planted_dups_caught(spark, setting):
    _, batch, store, victim_id, batch_victim = setting
    ann = {r.doc_id: r for r in
           incremental_dedup(batch, store)[0].collect()}
    exact = ann[910000]
    assert exact.dup_of_history == victim_id and exact.keep == 0
    near = ann[910001]
    # the near copy may estimate-match any member of the victim's
    # near-dup family in history (the synthetic corpus plants families);
    # the contract is that a history match exists and the doc dies
    assert near.dup_of_history is not None and near.keep == 0
    within = ann[910002]
    assert within.dup_of_history is None
    assert within.batch_group == batch_victim and within.keep == 0
    assert ann[batch_victim].keep == 1, "canonical batch member survives"


def test_estimator_vs_exact_jaccard(spark, setting):
    """The MinHash estimate for the exact-copy pair must be 1.0, and the
    near-copy estimate must be within estimator noise (1/sqrt(K) ≈ 0.25)
    of the true shingle Jaccard."""
    from agnostic_blockchain_etl_spark.operators.dedup import doc_shingles
    history, batch, store, victim_id, _ = setting
    pairs = {(r.doc_a, r.doc_b): r.est_jaccard
             for r in incremental_neardup_pairs(batch, store,
                                                threshold=0.0).collect()}
    assert pairs[(victim_id, 910000)] == 1.0
    found = sorted((a, j) for (a, b), j in pairs.items() if b == 910001)
    assert found, "the near copy must band-match some history doc"
    a_id, est = found[0]
    both = doc_shingles(
        history.where(F.col("doc_id") == a_id)
        .unionByName(batch.where(F.col("doc_id") == 910001))) \
        .select("doc_id", "h").collect()
    a = {r.h for r in both if r.doc_id == a_id}
    b = {r.h for r in both if r.doc_id == 910001}
    true_j = len(a & b) / len(a | b)
    assert abs(est - true_j) <= 0.25


def test_store_update_is_kept_set_and_replay_idempotent(spark, setting):
    _, batch, store, _, _ = setting
    ann, updated = incremental_dedup(batch, store)
    kept = {r.doc_id for r in ann.where(F.col("keep") == 1).collect()}
    store_ids = {r.doc_id for r in store.select("doc_id").collect()}
    updated_ids = {r.doc_id for r in updated.select("doc_id").collect()}
    assert updated_ids == store_ids | kept
    # replaying the SAME batch against the updated store: every doc now
    # collides with its own stored signature -> nothing new is kept
    replay = batch.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    replay_ann, _ = incremental_dedup(replay, updated)
    replay_kept = replay_ann.where(F.col("keep") == 1).count()
    assert replay_kept == 0, "a replayed batch must add nothing"


def test_bucketed_store_tables_match_and_skip_store_shuffle(spark, setting,
                                                            tmp_path):
    """The persisted two-table store layout returns the same history
    pairs as the in-memory form, and the plan scans the store WITHOUT a
    store-side Exchange (the write paid the bucketing shuffle once)."""
    import contextlib
    import io
    import uuid
    from agnostic_blockchain_etl_spark.operators.incremental import (
        stored_neardup_pairs, write_signature_store_tables)

    _, batch, store, _, _ = setting
    name = f"sigstore_{uuid.uuid4().hex[:8]}"
    try:
        write_signature_store_tables(store, name, buckets=8)
        got = stored_neardup_pairs(batch, name)
        want = {(r.doc_a, r.doc_b, r.est_jaccard) for r in
                incremental_neardup_pairs(batch, store).collect()
                if r.against == "history"}
        assert {(r.doc_a, r.doc_b, r.est_jaccard)
                for r in got.collect()} == want

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            got.explain("formatted")
        plan = buf.getvalue()
        # the bands-table scan must feed its join bucketed, not through
        # an Exchange: every Exchange in the plan belongs to the NEW
        # side / aggregation, so one fewer than the in-memory form
        scan_lines = [ln for ln in plan.splitlines()
                      if f"{name}_bands" in ln and "Scan" in ln]
        assert scan_lines, plan
        assert "Bucketed: true" in plan, plan
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {name}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {name}_meta")


def test_stale_perms_store_refused(spark, setting):
    """A persisted store carries the MinHash permutation-family
    fingerprint; reading it under DIFFERENT constants must raise, not
    silently verify against noise (signatures from two families are
    uncorrelated, so est_jaccard would be coin flips)."""
    import uuid
    import pytest
    from agnostic_blockchain_etl_spark.operators.incremental import (
        stored_neardup_pairs, write_signature_store_tables)

    _, batch, store, _, _ = setting
    name = f"sigstore_{uuid.uuid4().hex[:8]}"
    try:
        write_signature_store_tables(store, name, buckets=4)
        # simulate a binary upgrade that changed the constants: corrupt
        # the recorded fingerprint (equivalent to running new code over
        # an old store)
        spark.createDataFrame([("perms-deadbeef",)],
                              "perms_fingerprint string") \
            .write.mode("overwrite").format("parquet") \
            .saveAsTable(f"{name}_meta")
        with pytest.raises(ValueError, match="permutation family"):
            stored_neardup_pairs(batch, name).collect()
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {name}_sigs")
        spark.sql(f"DROP TABLE IF EXISTS {name}_bands")
        spark.sql(f"DROP TABLE IF EXISTS {name}_meta")


def test_disjoint_batch_all_kept(spark):
    """A batch with no relation to history or itself keeps everything."""
    hist = spark.createDataFrame(
        [(1, " ".join(f"alpha{i}" for i in range(30)))],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(100, " ".join(f"beta{i}" for i in range(30))),
         (101, " ".join(f"gamma{i}" for i in range(30)))],
        "doc_id long, text string")
    ann, updated = incremental_dedup(batch, signature_store(hist))
    assert all(r.keep == 1 for r in ann.collect())
    assert updated.count() == 3


def test_incremental_exact_dedup(spark):
    from agnostic_blockchain_etl_spark.operators.incremental import (
        digest_store, incremental_exact_dedup)
    hist = spark.createDataFrame(
        [(1, "alpha text here"), (2, "beta text here")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha text here"),      # dup of history doc 1
         (11, "gamma fresh text"),
         (12, "gamma fresh text"),     # within-batch dup of 11
         (13, "delta fresh text")],
        "doc_id long, text string")
    ann, updated = incremental_exact_dedup(batch, digest_store(hist))
    rows = {r.doc_id: r for r in ann.collect()}
    assert rows[10].dup_of_history == 1 and rows[10].keep == 0
    assert rows[11].keep == 1 and rows[12].keep == 0
    assert rows[12].dup_of_history is None, "batch dup, not history dup"
    assert rows[13].keep == 1
    assert {r.doc_id for r in updated.collect()} == {1, 2, 11, 13}
    # replay: everything now collides with the stored digests
    replay = batch.withColumn("doc_id", F.col("doc_id") + 100)
    ann2, _ = incremental_exact_dedup(replay, updated)
    assert ann2.where(F.col("keep") == 1).count() == 0


def test_corpus_diff(spark):
    from agnostic_blockchain_etl_spark.operators.incremental import (
        corpus_diff)
    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma CHANGED"), (4, "delta")],
        "doc_id long, text string")
    ann, report = corpus_diff(old, new)
    got = {r.doc_id: r.status for r in ann.collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed",
                   4: "added"}
    r = report.collect()[0]
    assert (r.n_ids, r.n_added, r.n_removed, r.n_changed,
            r.n_unchanged) == (4, 1, 1, 1, 1)


def test_null_text_docs_survive_exact_dedup_and_diff(spark):
    """Round-9 review finding: md5(NULL) is NULL, and the NULL key
    poisoned both digest consumers — incremental_exact_dedup DROPPED
    null-text rows from its annotated output (NULL never equi-joins)
    and pooled in-batch null-text docs into one canonical, while
    corpus_diff classified a null-text doc present in both snapshots
    as 'added'. digest_store now keys null text per-doc (the streaming
    _null_safe_key rule): metadata-only rows are never duplicates of
    each other and diff as unchanged/changed honestly."""
    from agnostic_blockchain_etl_spark.operators.incremental import (
        corpus_diff, digest_store, incremental_exact_dedup)
    schema = "doc_id long, text string"
    hist = spark.createDataFrame([(1, "alpha"), (2, None)], schema)
    batch = spark.createDataFrame(
        [(3, None), (4, None), (5, "alpha"), (6, "beta")], schema)
    ann, updated = incremental_exact_dedup(batch, digest_store(hist))
    got = {r.doc_id: r for r in ann.collect()}
    assert set(got) == {3, 4, 5, 6}          # no row loss
    assert got[3].keep == 1 and got[4].keep == 1   # both null-text kept
    assert got[3].dup_of_history is None     # not a dup of hist's null
    assert got[5].keep == 0 and got[5].dup_of_history == 1
    assert got[6].keep == 1
    # diff: null-text doc present in both snapshots is unchanged;
    # null -> text is changed
    old = spark.createDataFrame([(1, None), (2, None), (3, "x")], schema)
    new = spark.createDataFrame([(1, None), (2, "now text"), (4, "y")],
                                schema)
    d, _ = corpus_diff(old, new)
    st = {r.doc_id: r.status for r in d.collect()}
    assert st == {1: "unchanged", 2: "changed", 3: "removed",
                  4: "added"}

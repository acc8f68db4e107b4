"""Streaming exact dedup: first-seen-wins across micro-batches, and the
dedup state must survive a checkpoint restart (a re-crawled document
arriving after a restart is still suppressed — the property batch dedup
cannot give an always-on ingest)."""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from agnostic_blockchain_etl_spark.streaming.dedup import (  # noqa: E402
    dedup_stream, dedup_stream_bounded)

SCHEMA = "doc_id LONG, text STRING"


@pytest.fixture(scope="module")
def spark():
    from agnostic_blockchain_etl_spark.session import get_session
    yield get_session(master="local[8]",
                      conf={"spark.sql.shuffle.partitions": "8"})


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(path)


def _drain(spark, src, sink, ckpt):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (dedup_stream(stream).writeStream.outputMode("append")
         .format("parquet").option("path", sink)
         .option("checkpointLocation", ckpt).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_first_seen_wins_across_batches_and_restart(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))

    _write_batch(spark, src, [(1, "alpha"), (2, "beta")])
    _write_batch(spark, src, [(3, "alpha"), (4, "gamma")])   # 3 re-crawls 1
    _drain(spark, src, sink, ckpt)

    got = spark.read.parquet(sink)
    assert got.count() == 3                                  # alpha once
    assert {r["text"] for r in got.collect()} == {"alpha", "beta", "gamma"}
    # first-seen doc wins: batch 1's alpha (doc 1), not batch 2's (doc 3)
    assert got.where(F.col("text") == "alpha").first()["doc_id"] == 1

    # restart with the same checkpoint: state remembers alpha/beta/gamma
    _write_batch(spark, src, [(5, "beta"), (6, "delta")])
    _drain(spark, src, sink, ckpt)
    got = spark.read.parquet(sink)
    assert got.count() == 4                                  # only delta new
    assert got.where(F.col("text") == "beta").first()["doc_id"] == 2


def test_null_text_docs_pass_through(spark, tmp_path):
    """Review finding: md5(NULL) is NULL and dropDuplicates treats NULL
    keys as equal, so every null-text doc after the first was silently
    swallowed. Distinct null-text docs (metadata-only rows) must all
    pass through; real duplicates still dedupe."""
    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    _write_batch(spark, src, [(1, None), (2, "alpha"), (3, None)])
    _write_batch(spark, src, [(4, None), (5, "alpha")])
    _drain(spark, src, sink, ckpt)
    got = spark.read.parquet(sink)
    nulls = got.where(F.col("text").isNull())
    assert {r.doc_id for r in nulls.collect()} == {1, 3, 4}
    assert got.where(F.col("text") == "alpha").count() == 1


def test_incremental_neardup_stream(spark, tmp_path):
    """Near-dup dedup over micro-batches via the signature store: an
    exact re-crawl AND a near-copy (few words changed) arriving in later
    batches are both suppressed — and the suppression survives a query
    restart because the state is the store table, not query memory."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        incremental_neardup_stream)

    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("nsrc", "nout", "nstore", "nckpt"))
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " changed tail"
    other = " ".join(f"z{i}" for i in range(40))

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = incremental_neardup_stream(stream, store, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_batch(spark, src, [(1, base), (2, other)])
    _write_batch(spark, src, [(3, base), (4, near)])     # exact + near dup
    drain()
    ann = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert ann[1].keep == 1 and ann[2].keep == 1
    assert ann[3].keep == 0 and ann[3].dup_of_history == 1
    assert ann[4].keep == 0 and ann[4].dup_of_history == 1

    # restart: a new query on the same checkpoint+store still remembers
    _write_batch(spark, src, [(5, base), (6, "fresh " * 30)])
    drain()
    ann = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert ann[5].keep == 0 and ann[5].dup_of_history == 1
    assert ann[6].keep == 1
    # store holds exactly the kept docs' signatures
    kept = {r.doc_id for r in spark.read.parquet(store).collect()}
    assert kept == {1, 2, 6}


def test_bounded_variant_evicts_state_beyond_horizon(spark, tmp_path):
    src, sink, ckpt = (str(tmp_path / d)
                       for d in ("bsrc", "bsink", "bckpt"))
    schema = "doc_id LONG, ts TIMESTAMP, text STRING"

    from datetime import datetime, timezone

    def dt(s):
        return datetime.fromtimestamp(s, tz=timezone.utc) \
            .replace(tzinfo=None)

    def rows(vals):
        spark.createDataFrame(vals, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    base = 1_700_000_000
    # one drain per write: the file source does not guarantee same-dir
    # files are consumed in write order, and the watermark sequence is
    # the whole point of this test
    batches = [
        [(1, dt(base), "x")],
        [(2, dt(base + 600), "x")],   # 10 min re-crawl: inside horizon
        # "x" state expires when the watermark passes first-seen +
        # horizon (base+3600); an unrelated doc at base+9000 advances
        # the watermark to base+5400 — eviction happens at batch END,
        # so it needs its own batch before the late re-crawl arrives
        [(9, dt(base + 9000), "y")],
        [(3, dt(base + 9100), "x")],  # 2.5 h re-crawl: state evicted
    ]
    os.makedirs(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    dd = dedup_stream_bounded(stream, "ts", "1 hour")
    for b in batches:
        rows(b)
        q = (dd.writeStream.outputMode("append").format("parquet")
             .option("path", sink).option("checkpointLocation", ckpt)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    got = spark.read.parquet(sink).collect()
    ids = sorted(r["doc_id"] for r in got)
    # doc 2 (10 min re-crawl) suppressed; doc 3 arrives after the
    # watermark evicted doc 1's state, so it is re-admitted
    assert 1 in ids and 2 not in ids
    assert 3 in ids


def test_quality_and_pii_layers_run_on_streams(spark, tmp_path):
    """text_stats and pii_scrub are stateless column work, so the whole
    quality/PII layer applies to a readStream unchanged — the corpus
    filter pipeline in continuous-ingest form (stream output equals the
    batch run on the same data)."""
    from agnostic_blockchain_etl_spark.operators.pii import pii_scrub
    from agnostic_blockchain_etl_spark.operators.textstats import text_stats

    filler = " ".join(f"w{i}" for i in range(30))
    rows = [(1, f"{filler} write to eve@example.org now", "en"),
            (2, f"{filler} perfectly clean prose", "en")]
    src = str(tmp_path / "qsrc")
    os.makedirs(src)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (spark.readStream
              .schema("doc_id LONG, text STRING, lang STRING").parquet(src))
    out = (text_stats(stream)
           .join(pii_scrub(stream).select("doc_id", "redacted"), "doc_id"))
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("quality_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"]: r for r in spark.table("quality_stream").collect()}
    batch = {r["doc_id"]: r for r in
             text_stats(spark.createDataFrame(
                 rows, "doc_id long, text string, lang string")).collect()}
    for d in (1, 2):
        assert got[d]["quality_score"] == batch[d]["quality_score"]
        assert got[d]["pii_clean"] == batch[d]["pii_clean"]
    assert "<EMAIL>" in got[1]["redacted"]
    assert got[2]["redacted"].endswith("perfectly clean prose")


def test_langid_and_bpe_encode_run_on_streams(spark, tmp_path):
    """The round-3 additions are stateless per-row stages too: language
    detection (pure projection over profile literals) and BPE encoding
    (Arrow-batched kernel) apply to a readStream unchanged, and the
    stream output equals the batch run on the same rows."""
    from agnostic_blockchain_etl_spark.operators.bpe import (
        bpe_encode, train_bpe_merges)
    from agnostic_blockchain_etl_spark.operators.langid import \
        detect_language

    rows = [(1, "kala pesu talo kala vesi kala pesu"),
            (2, "zorro grillo burro zorro torre grillo")]
    src = str(tmp_path / "lsrc")
    os.makedirs(src)
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)

    profiles = {"aa": ["kal", "ala", "pes"], "bb": ["zor", "orr", "gri"]}
    merges = train_bpe_merges([("kala", 3), ("zorro", 2)], 5)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = (detect_language(stream, profiles)
           .join(bpe_encode(stream, merges)
                 .select("doc_id", "n_bpe_tokens"), "doc_id"))
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("langid_stream").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = {r["doc_id"]: r for r in spark.table("langid_stream").collect()}
    assert got[1]["detected_lang"] == "aa"
    assert got[2]["detected_lang"] == "bb"
    batch_df = spark.createDataFrame(rows, SCHEMA)
    batch = {r["doc_id"]: r for r in
             bpe_encode(batch_df, merges).collect()}
    for d in (1, 2):
        assert got[d]["n_bpe_tokens"] == batch[d]["n_bpe_tokens"]


def test_neardup_stream_corrupt_store_fails_batch_not_history(spark,
                                                              tmp_path):
    """A store-read failure that is NOT path-not-found must fail the
    micro-batch (checkpoint replays it) — swallowing it would silently
    reset the dedup history and re-admit every historical duplicate."""
    import os

    from pyspark.errors import StreamingQueryException
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        incremental_neardup_stream)

    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("csrc", "cout", "cstore", "cckpt"))
    # a store path that EXISTS but is unreadable as parquet
    os.makedirs(store)
    with open(os.path.join(store, "garbage.parquet"), "wb") as f:
        f.write(b"this is not parquet")
    _write_batch(spark, src, [(1, "alpha beta gamma " * 10)])
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = incremental_neardup_stream(stream, store, out, ckpt)
    try:
        with pytest.raises(StreamingQueryException):
            q.processAllAvailable()
    finally:
        q.stop()
    # nothing was emitted: the batch failed instead of dropping history
    assert not os.path.exists(out) or not any(
        n.endswith(".parquet")
        for _, _, fs in os.walk(out) for n in fs)


def test_paragraph_dedup_stream(spark, tmp_path):
    """Boilerplate excision across micro-batches via the mergeable
    frequency store: a footer seen in batch 1 is excised from every
    later batch's documents, and the state survives a query restart."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        paragraph_dedup_stream)

    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("psrc", "pout", "pstore", "pckpt"))
    footer = "(c) streaming example corp all rights reserved"

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = paragraph_dedup_stream(stream, store, out, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_batch(spark, src, [(1, f"first body\n{footer}"),
                              (2, "second body")])
    _write_batch(spark, src, [(3, f"third body\n{footer}")])
    drain()
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert footer in rows[1].text            # owner keeps its copy
    assert footer not in rows[3].text        # later batch excised
    assert rows[3].n_removed_history == 1

    # restart on the same checkpoint+store: history still remembered
    _write_batch(spark, src, [(4, f"fourth body\n{footer}"),
                              (5, "fresh body")])
    drain()
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert footer not in rows[4].text and rows[4].n_removed_history == 1
    assert rows[5].text == "fresh body"
    # the merged store's df for the footer counts all three sightings
    merged = (spark.read.parquet(store).groupBy("h")
              .agg(F.sum("df").alias("df")).collect())
    assert max(r.df for r in merged) == 3


def test_source_cap_stream(spark, tmp_path):
    """First-come per-source admission across micro-batches: a hot
    source stops admitting once the cap is reached, history survives a
    restart, and under-cap sources admit everything."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        source_cap_stream)
    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("csrc", "cout", "cstore", "cckpt"))
    schema = "doc_id LONG, source STRING"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = source_cap_stream(stream, store, out, ckpt, cap=3)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    write([(1, "hot"), (2, "hot"), (3, "cold")])
    write([(4, "hot"), (5, "hot"), (6, "cold")])   # hot hits the cap at 4
    drain()
    ann = {r.doc_id: r.cap_keep for r in spark.read.parquet(out).collect()}
    assert ann == {1: 1, 2: 1, 3: 1, 4: 1, 5: 0, 6: 1}
    # restart on the same checkpoint+store: the cap is still exhausted
    write([(7, "hot"), (8, "cold")])
    drain()
    ann = {r.doc_id: r.cap_keep for r in spark.read.parquet(out).collect()}
    assert ann[7] == 0 and ann[8] == 1
    used = (spark.read.parquet(store).groupBy("source")
            .sum("n_admitted").collect())
    assert {r.source: r["sum(n_admitted)"] for r in used} \
        == {"hot": 3, "cold": 3}


def test_source_cap_stream_preserves_foreign_source_column(spark,
                                                           tmp_path):
    """Review finding: capping on source_col='domain' used to overwrite
    a pre-existing 'source' column with domain values in the annotated
    output — provenance corrupted with no error. Both columns must
    survive verbatim; the store keys on the CAP column's values."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        source_cap_stream)
    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("fsrc", "fout", "fstore", "fckpt"))
    schema = "doc_id LONG, source STRING, domain STRING"
    spark.createDataFrame(
        [(1, "crawlA", "x.com"), (2, "crawlB", "x.com"),
         (3, "crawlC", "y.com")], schema).coalesce(1) \
        .write.mode("append").parquet(src)
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = source_cap_stream(stream, store, out, ckpt, cap=1,
                          source_col="domain")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    # original provenance intact
    assert {got[i].source for i in (1, 2, 3)} \
        == {"crawlA", "crawlB", "crawlC"}
    assert got[1].domain == "x.com"
    # cap applied on domain: one admit per domain
    assert got[1].cap_keep + got[2].cap_keep == 1
    assert got[3].cap_keep == 1
    # store keyed by the cap column's values
    used = {r.source for r in spark.read.parquet(store).collect()}
    assert used == {"x.com", "y.com"}


@pytest.mark.heavy
def test_semantic_dedup_stream(spark, tmp_path):
    """Day-2 SEMANTIC dedup over micro-batches: a paraphrase (same
    vocabulary, shuffled order — invisible to exact and shingle dedup
    at high thresholds) arriving in a LATER batch is suppressed against
    the member store, and the suppression survives a query restart
    because the state is the store table, not query memory."""
    from agnostic_blockchain_etl_spark.operators.similarity import (
        fit_tfidf_stats, hashed_tfidf_vectors, ivf_train)
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        semantic_dedup_stream)

    src, out, store, ckpt, cbp, stp = (
        str(tmp_path / d) for d in ("ssrc", "sout", "sstore", "sckpt",
                                    "scb", "sstats"))
    base = "solar panels convert sunlight into electricity for homes"
    para = "electricity for homes convert sunlight into solar panels"
    other = "the stock market closed higher on strong earnings reports"
    third = "gardening requires patience water sunlight and good soil"

    # frozen codebook + frozen vocabulary stats, fitted once on a seed
    # sample (the contract: per-batch statistics drift with batch
    # composition and break cross-batch comparability)
    seed = spark.createDataFrame(
        [(900, base), (901, other), (902, third)], SCHEMA)
    stats = fit_tfidf_stats(seed)
    stats.write.parquet(stp)
    emb = hashed_tfidf_vectors(seed, dim=64, stats=stats) \
        .select("vec_id", "embedding")
    ivf_train(spark, emb, 2, iters=1).write.parquet(cbp)

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = semantic_dedup_stream(stream, cbp, stp, store, out, ckpt,
                                  tau=0.95, dim=64)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_batch(spark, src, [(1, base), (2, other)])
    _write_batch(spark, src, [(3, para), (7, "")])   # paraphrase + empty
    drain()
    ann = {r.vec_id: r for r in spark.read.parquet(out).collect()}
    assert ann[1].keep == 1 and ann[2].keep == 1
    assert ann[3].keep == 0 and ann[3].dup_of_history == 1
    # flag-don't-drop: the token-less doc is annotated, not lost
    assert ann[7].keep == 1 and ann[7].embedded == 0
    assert ann[3].embedded == 1

    # restart with a new query: the store still remembers doc 1; an
    # EXACT duplicate arriving in a differently-composed batch must
    # still be caught (this is what frozen stats buy — batch-local idf
    # would push an identical text below tau)
    _write_batch(spark, src, [(4, base), (5, third)])
    drain()
    ann = {r.vec_id: r for r in spark.read.parquet(out).collect()}
    assert ann[4].keep == 0 and ann[4].dup_of_history == 1
    assert ann[5].keep == 1
    kept = {r.vec_id for r in spark.read.parquet(store).collect()}
    assert kept == {1, 2, 5}


@pytest.mark.heavy
def test_semantic_dedup_stream_compacts_mid_stream(spark, tmp_path):
    """Round-8 lifecycle wiring: `compact_every` runs
    `compact_semantic_store` IN-stream under the snapshot rule — a
    planted flood (members admitted under a strict probe tau but
    mutually near at the looser compaction tau) collapses to its
    oldest representative mid-stream, a post-compaction batch (after a
    query restart) still dedups against the representative, and the
    dropped member is demonstrably GONE from the effective store (its
    exact re-send passes — reading the raw partitions instead of the
    snapshot would reject it)."""
    from agnostic_blockchain_etl_spark.operators.similarity import (
        fit_tfidf_stats, hashed_tfidf_vectors, ivf_train)
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        semantic_dedup_stream)

    src, out, store, ckpt, cbp, stp = (
        str(tmp_path / d) for d in ("csrc", "cout", "cstore", "cckpt",
                                    "ccb", "cstats"))
    base = ("solar panels convert bright sunlight into cheap "
            "electricity for suburban homes")
    variant = ("solar panels convert bright sunlight into cheap "
               "electricity for suburban turbines")   # one word off
    other = "the stock market closed higher on strong earnings reports"

    seed = spark.createDataFrame(
        [(900, base), (901, variant), (902, other)], SCHEMA)
    stats = fit_tfidf_stats(seed)
    stats.write.parquet(stp)
    emb = hashed_tfidf_vectors(seed, dim=64, stats=stats) \
        .select("vec_id", "embedding")
    ivf_train(spark, emb, 2, iters=1).write.parquet(cbp)

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        # tau_compact < tau is DELIBERATE here (allow_lossy_compaction
        # opts out of the recall-contract guard): the test proves the
        # dropped member is gone, which needs a lossy snapshot
        q = semantic_dedup_stream(stream, cbp, stp, store, out, ckpt,
                                  tau=0.995, dim=64, compact_every=2,
                                  tau_compact=0.8,
                                  allow_lossy_compaction=True)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # batch 0: base + unrelated; batch 1: the near-variant (below the
    # 0.995 probe bar -> ADMITTED; within 0.8 of base -> flood member).
    # (1+1) % compact_every == 0 -> snapshot upto=1 written in-stream.
    _write_batch(spark, src, [(1, base), (2, other)])
    _write_batch(spark, src, [(3, variant)])
    drain()
    ann = {r.vec_id: r for r in spark.read.parquet(out).collect()}
    assert ann[1].keep == 1 and ann[2].keep == 1 and ann[3].keep == 1
    import os as _os
    assert _os.path.isdir(f"{store}_compact/upto=1")
    snap = {r.vec_id for r in
            spark.read.parquet(f"{store}_compact/upto=1").collect()}
    # flood collapsed to the oldest representative; unrelated doc kept
    assert snap == {1, 2}
    # raw delta partitions untouched (replay safety does not depend on
    # them being rewritten)
    assert {r.vec_id for r in spark.read.parquet(store).collect()} \
        == {1, 2, 3}

    # restart (new query, same checkpoint): batch 2 re-sends the
    # representative exactly (must hit the snapshot) and the DROPPED
    # member exactly (must MISS -> proves the read is snapshot+tail,
    # not the raw partitions)
    _write_batch(spark, src, [(4, base), (5, variant)])
    drain()
    ann = {r.vec_id: r for r in spark.read.parquet(out).collect()}
    assert ann[4].keep == 0 and ann[4].dup_of_history == 1
    assert ann[5].keep == 1 and ann[5].dup_of_history is None

    # batch 3 (after the snapshot AND a post-snapshot delta): the
    # union path — representative still remembered, batch-2 member too
    _write_batch(spark, src, [(6, base), (7, variant)])
    drain()
    ann = {r.vec_id: r for r in spark.read.parquet(out).collect()}
    assert ann[6].keep == 0 and ann[6].dup_of_history == 1
    assert ann[7].keep == 0 and ann[7].dup_of_history == 5


def test_read_semantic_store_snapshot_selection(spark, tmp_path):
    """Unit pin for the snapshot rule: batch N reads newest snapshot
    with upto < N plus raw deltas in (upto, N) — and a REPLAY of the
    compacting batch itself (N == upto) must NOT see its own snapshot
    (exactly-once: it reads what its first attempt read and rewrites
    the snapshot deterministically)."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        _read_semantic_store)
    store = str(tmp_path / "mstore")
    schema = "vec_id long, list_id int, e array<double>"

    def member(i):
        return (i, 1, [float(i)])

    for b, ids in enumerate(([1], [2], [3])):
        spark.createDataFrame([member(i) for i in ids], schema) \
            .write.mode("overwrite").parquet(f"{store}/batch_id={b}")
    # snapshot at upto=1 collapses members {1, 2} -> {1}
    spark.createDataFrame([member(1)], schema) \
        .write.mode("overwrite").parquet(f"{store}_compact/upto=1")

    def ids_at(batch_id):
        return {r.vec_id for r in _read_semantic_store(
            spark, store, batch_id, schema).collect()}

    assert ids_at(3) == {1, 3}     # snapshot + tail delta (batch 2)
    assert ids_at(2) == {1}        # snapshot only, batch-2 delta excluded
    assert ids_at(1) == {1}        # REPLAY of the compacting batch:
    #                                own snapshot (upto=1) invisible ->
    #                                raw rule, batch 0 only
    assert ids_at(0) == set()      # first batch: nothing
    # no snapshot root at all -> pure raw rule
    store2 = str(tmp_path / "mstore2")
    spark.createDataFrame([member(9)], schema) \
        .write.mode("overwrite").parquet(f"{store2}/batch_id=0")
    assert {r.vec_id for r in _read_semantic_store(
        spark, store2, 1, schema).collect()} == {9}


def test_store_read_survives_first_write_crash_debris(spark, tmp_path):
    """Crash-recovery: a crash mid-write of the very FIRST store delta
    (or first compaction snapshot) leaves the root directory with zero
    committed parquet files — schema inference fails, and before the
    round-8 fix every replay failed forever (a recovery deadlock).
    Batch 0 must read that as empty; batch N>0 must still raise (an
    uninferable root after a committed batch means the store was wiped
    out-of-band — treating it as empty would silently discard dedup
    history). A debris-only snapshot root falls back to the raw rule
    at ANY batch id (raw partitions are a superset of any snapshot)."""
    import os as _os

    import pytest as _pytest
    from pyspark.errors import AnalysisException

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        _read_semantic_store, _read_store_or)
    schema = "vec_id long, list_id int, e array<double>"

    # raw store root with committer debris only
    store = str(tmp_path / "crashstore")
    _os.makedirs(f"{store}/batch_id=0/_temporary")
    assert _read_store_or(spark, store, 0, schema).count() == 0
    with _pytest.raises(AnalysisException):
        _read_store_or(spark, store, 1, schema)

    # healthy raw store + debris-only snapshot root -> raw fallback
    store2 = str(tmp_path / "crashstore2")
    spark.createDataFrame([(1, 1, [1.0])], schema) \
        .write.mode("overwrite").parquet(f"{store2}/batch_id=0")
    _os.makedirs(f"{store2}_compact/upto=0/_temporary")
    got = {r.vec_id for r in
           _read_semantic_store(spark, store2, 2, schema).collect()}
    assert got == {1}


def test_prune_semantic_store_deltas(spark, tmp_path):
    """Space-reclaim lifecycle: raw deltas at or below the newest
    COMMITTED snapshot (and superseded snapshots) are deleted; a
    debris-only (uncommitted) snapshot never authorizes pruning —
    doing so would lose the history reads fall back to. Post-prune
    reads are unchanged."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        _read_semantic_store, prune_semantic_store_deltas)
    store = str(tmp_path / "pstore")
    schema = "vec_id long, list_id int, e array<double>"
    for b, i in enumerate((1, 2, 3)):
        spark.createDataFrame([(i, 1, [float(i)])], schema) \
            .write.mode("overwrite").parquet(f"{store}/batch_id={b}")
    # committed snapshots at upto=0 and upto=1; debris at upto=2
    spark.createDataFrame([(1, 1, [1.0])], schema) \
        .write.mode("overwrite").parquet(f"{store}_compact/upto=0")
    spark.createDataFrame([(1, 1, [1.0]), (2, 1, [2.0])], schema) \
        .write.mode("overwrite").parquet(f"{store}_compact/upto=1")
    _os.makedirs(f"{store}_compact/upto=2/_temporary")

    before = {r.vec_id for r in _read_semantic_store(
        spark, store, 3, schema).collect()}
    got = prune_semantic_store_deltas(spark, store)
    # debris upto=2 did NOT authorize (and is named in the report);
    # newest committed (1) did
    assert got == {"upto": 1, "pruned_deltas": [0, 1],
                   "pruned_snapshots": [0],
                   "uncommitted_snapshots": [2]}
    assert not _os.path.exists(f"{store}/batch_id=0")
    assert not _os.path.exists(f"{store}/batch_id=1")
    assert _os.path.exists(f"{store}/batch_id=2")
    assert not _os.path.exists(f"{store}_compact/upto=0")
    after = {r.vec_id for r in _read_semantic_store(
        spark, store, 3, schema).collect()}
    assert after == before == {1, 2, 3}
    # idempotent: nothing left to prune
    again = prune_semantic_store_deltas(spark, store)
    assert again["pruned_deltas"] == [] and again["upto"] == 1
    # no snapshot root at all -> no-op
    assert prune_semantic_store_deltas(
        spark, str(tmp_path / "nosnaps"))["upto"] is None


def test_prune_requires_job_commit_marker(spark, tmp_path):
    """Round-8 advisory: a snapshot job that died mid-write under a
    direct-write/v2-style committer can leave a PARTIAL subset of
    task-committed part files — data files exist, so the old
    any-data-file test called it committed and let it authorize
    deleting raw history the partial snapshot cannot replace. The
    committed test is now the job-commit-atomic _SUCCESS marker:
    a snapshot with data files but no marker grants no authority."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        prune_store_deltas)
    store = str(tmp_path / "mstore")
    schema = "vec_id long, list_id int, e array<double>"
    for b in (0, 1):
        spark.createDataFrame([(b, 1, [1.0])], schema) \
            .write.mode("overwrite").parquet(f"{store}/batch_id={b}")
    # a "partial" snapshot: real part files, job commit never happened
    spark.createDataFrame([(0, 1, [1.0])], schema) \
        .write.mode("overwrite").parquet(f"{store}_compact/upto=1")
    _os.remove(f"{store}_compact/upto=1/_SUCCESS")
    with pytest.warns(UserWarning, match="_SUCCESS job-commit marker"):
        got = prune_store_deltas(spark, store)
    # the no-op is VISIBLE: the marker-less snapshot is reported (and
    # warned about above) instead of reading like "no snapshots exist"
    assert got == {"upto": None, "pruned_deltas": [],
                   "pruned_snapshots": [], "uncommitted_snapshots": [1]}
    assert _os.path.exists(f"{store}/batch_id=0")   # history intact


def test_prune_checkpoint_guard(spark, tmp_path):
    """--checkpoint verifies the docstring's safety precondition
    instead of trusting it: pruning refuses while the stream's commit
    log is behind the snapshot batch (a replay of the uncommitted
    batch would need the raw deltas), and proceeds once the log has
    sealed it."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        PruneRefusedError, last_committed_batch, prune_store_deltas)
    store, ckpt = str(tmp_path / "gstore"), str(tmp_path / "gckpt")
    schema = "source string, n_admitted long"
    for b in (0, 1, 2):
        spark.createDataFrame([("web", 1)], schema) \
            .write.mode("overwrite").parquet(f"{store}/batch_id={b}")
    spark.createDataFrame([("web", 2)], schema) \
        .write.mode("overwrite").parquet(f"{store}_compact/upto=1")
    # commit log sealed only batch 0 -> behind the snapshot's upto=1
    _os.makedirs(f"{ckpt}/commits")
    open(f"{ckpt}/commits/0", "w").write("v1")
    assert last_committed_batch(spark, ckpt) == 0
    # the refusal is the DEDICATED type (the CLI catches exactly it)
    with pytest.raises(PruneRefusedError, match="behind the newest"):
        prune_store_deltas(spark, store, checkpoint=ckpt)
    assert _os.path.exists(f"{store}/batch_id=0")   # refusal deleted nothing
    # dry-run is report-without-acting: the refusal comes back as a
    # field (plus what an unsafe prune WOULD delete), not a raise
    rep = prune_store_deltas(spark, store, checkpoint=ckpt, dry_run=True)
    assert "behind the newest snapshot" in rep["refused"]
    assert rep["upto"] == 1 and rep["pruned_deltas"] == [0, 1]
    assert _os.path.exists(f"{store}/batch_id=0")
    # missing commit log is equally a refusal, not a default-yes
    with pytest.raises(PruneRefusedError,
                       match="committed through batch None"):
        prune_store_deltas(spark, store,
                           checkpoint=str(tmp_path / "nockpt"))
    # a CORRUPTED store layout is NOT a refusal: a malformed
    # upto=<junk> snapshot dir propagates the plain ValueError (the
    # CLI must traceback on it, not print a clean one-line refusal)
    _os.makedirs(f"{store}_compact/upto=junk")
    with pytest.raises(ValueError) as exc_info:
        prune_store_deltas(spark, store, checkpoint=ckpt)
    assert not isinstance(exc_info.value, PruneRefusedError)
    _os.rmdir(f"{store}_compact/upto=junk")
    # sealed through the snapshot batch -> prune proceeds
    open(f"{ckpt}/commits/1", "w").write("v1")
    got = prune_store_deltas(spark, store, checkpoint=ckpt)
    assert got["upto"] == 1 and got["pruned_deltas"] == [0, 1]


def test_prune_before_batch_bounds_authority(spark, tmp_path):
    """The in-stream form (`prune_after_compact`) prunes on the
    authority of the PREVIOUS snapshot only: with before_batch=N the
    newest snapshot (upto=N-1, possibly half-written by the very batch
    that is still running) grants nothing, so the deltas a replay of
    batch N-1.. could still need survive."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        prune_store_deltas)
    import os as _os
    store = str(tmp_path / "bstore")
    schema = "source string, n_admitted long"
    for b in range(4):
        spark.createDataFrame([("web", 1)], schema) \
            .write.mode("overwrite").parquet(f"{store}/batch_id={b}")
    for k in (1, 3):
        spark.createDataFrame([("web", k + 1)], schema) \
            .write.mode("overwrite").parquet(f"{store}_compact/upto={k}")
    got = prune_store_deltas(spark, store, before_batch=3)
    assert got["upto"] == 1 and got["pruned_deltas"] == [0, 1]
    assert _os.path.exists(f"{store}/batch_id=2")
    assert _os.path.exists(f"{store}_compact/upto=1")   # the authority
    assert _os.path.exists(f"{store}_compact/upto=3")   # never touched


@pytest.mark.heavy
def test_source_cap_prune_after_compact_bounds_deltas(spark, tmp_path):
    """Round-8 verdict ask #2, the 'done' criterion: a stream running
    ≥3 compact cycles with prune_after_compact=True keeps its raw-delta
    directory count bounded (~2×compact_every) while producing results
    identical to the no-prune run — including across a restart."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        source_cap_stream)
    schema = "doc_id LONG, source STRING"
    batches = [[(10 * b + i, "web" if i < 2 else "books")
                for i in range(3)] for b in range(7)]

    def run(tag, prune):
        src, out, store, ckpt = (str(tmp_path / f"{tag}{d}")
                                 for d in ("src", "out", "store", "ckpt"))

        def drain():
            stream = (spark.readStream.schema(schema)
                      .option("maxFilesPerTrigger", 1).parquet(src))
            q = source_cap_stream(stream, store, out, ckpt, cap=5,
                                  compact_every=2,
                                  prune_after_compact=prune)
            try:
                q.processAllAvailable()
            finally:
                q.stop()

        for rows in batches[:4]:
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)
        drain()
        for rows in batches[4:]:            # restart mid-lifecycle
            spark.createDataFrame(rows, schema).coalesce(1) \
                .write.mode("append").parquet(src)
        drain()
        deltas = [d for d in _os.listdir(store)
                  if d.startswith("batch_id=")]
        res = {r.doc_id: r.cap_keep
               for r in spark.read.parquet(out).collect()}
        return deltas, res

    deltas_np, res_np = run("noprune", prune=False)
    deltas_pr, res_pr = run("pruned", prune=True)
    assert res_pr == res_np                  # identical admissions
    assert len(res_pr) == 21
    assert len(deltas_np) == 7               # one delta per batch
    # compacts after batches 1,3,5; in-stream prunes at 3 (<=1) and
    # 5 (<=3): batches 4,5,6 remain = bounded by 2*compact_every
    assert len(deltas_pr) <= 2 * 2
    assert sorted(deltas_pr) == [f"batch_id={b}" for b in (4, 5, 6)]


@pytest.mark.heavy
def test_neardup_prune_after_compact_keeps_history(spark, tmp_path):
    """prune_after_compact on the near-dup stream: after two compact
    cycles with in-stream pruning, a near-duplicate of a batch-0
    document is still rejected (the pruned deltas' content lives in
    the surviving snapshot) and the raw tail stays bounded."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        incremental_neardup_stream)
    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("npsrc", "npout", "npstore",
                                       "npckpt"))
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " changed tail"

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = incremental_neardup_stream(stream, store, out, ckpt,
                                       compact_every=2,
                                       prune_after_compact=True)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    for b, text in enumerate([base] + [" ".join(f"x{b}_{i}" for i in
                                                range(40))
                                       for b in range(4)]):
        _write_batch(spark, src, [(b + 1, text)])
    drain()                                  # batches 0..4, compacts at 1,3
    # in-stream prune at batch 3 deleted deltas <= 1 (authority upto=1)
    assert not _os.path.exists(f"{store}/batch_id=0")
    assert not _os.path.exists(f"{store}/batch_id=1")
    assert _os.path.exists(f"{store}/batch_id=2")
    _write_batch(spark, src, [(99, near)])   # near-dup of pruned batch 0
    drain()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert got[99].keep == 0 and got[99].dup_of_history == 1


@pytest.mark.heavy
def test_prune_crash_window_replay_is_exactly_once(spark, tmp_path):
    """THE crash window the in-stream prune design must survive: batch
    N compacted AND pruned, then the engine died before the checkpoint
    sealed batch N (simulated by deleting the commits/N marker). The
    restarted query replays batch N against a store whose deltas below
    the PREVIOUS snapshot are already gone — the before_batch authority
    rule guarantees the replay reads previous-snapshot + surviving
    tail, recomputes identical output, rewrites its own delta/snapshot
    deterministically, and re-runs the prune as a no-op."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        source_cap_stream)
    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("cwsrc", "cwout", "cwstore",
                                       "cwckpt"))
    schema = "doc_id LONG, source STRING"

    def wb(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = source_cap_stream(stream, store, out, ckpt, cap=3,
                              compact_every=2, prune_after_compact=True)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    for b in range(4):
        wb([(10 * b, "web"), (10 * b + 1, "books")])
    drain()              # batches 0..3; compact at 1,3; prune at 3 (<=1)
    assert not _os.path.exists(f"{store}/batch_id=1")
    assert _os.path.exists(f"{store}/batch_id=2")
    before = {r.doc_id: r.cap_keep
              for r in spark.read.parquet(out).collect()}

    # simulate the crash: batch 3's work is all on disk (delta,
    # snapshot upto=3, pruned history) but its checkpoint commit is not
    _os.remove(f"{ckpt}/commits/3")
    crc = f"{ckpt}/commits/.3.crc"
    if _os.path.exists(crc):
        _os.remove(crc)
    drain()              # restart -> engine replays batch 3
    after = {r.doc_id: r.cap_keep
             for r in spark.read.parquet(out).collect()}
    assert after == before                      # exactly-once output
    # the replayed batch re-sealed its own artifacts
    assert _os.path.exists(f"{store}/batch_id=3")
    assert _os.path.exists(f"{store}_compact/upto=3/_SUCCESS")
    # and the stream continues correctly: caps still enforced from the
    # (pruned) snapshot history
    wb([(100, "web"), (101, "books")])
    drain()
    got = {r.doc_id: r.cap_keep for r in spark.read.parquet(out).collect()}
    assert got[100] == 0 and got[101] == 0      # both sources at cap 3


def test_semantic_stream_rejects_lossy_tau_compact(spark, tmp_path):
    """Round-8 advisory: the tau_compact >= tau recall contract is
    enforced, not just documented — a lossier compaction threshold
    would silently absorb store members future batches still need."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        semantic_dedup_stream)
    _os.makedirs(str(tmp_path / "never"))
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(tmp_path / "never")))
    with pytest.raises(ValueError, match="tau_compact"):
        semantic_dedup_stream(stream, "cb", "st", "sp", "op",
                              str(tmp_path / "ck"), tau=0.999,
                              compact_every=2, tau_compact=0.99)


def test_paragraph_stream_compacts_and_survives_prune(spark, tmp_path):
    """compact_every on the paragraph stream: the sealed snapshot
    carries the cumulative df totals, a post-compaction (and post-
    restart) batch still excises the boilerplate seen before the
    snapshot, and after pruning the raw deltas the stream resumes on
    the snapshot alone."""
    import os as _os

    from agnostic_blockchain_etl_spark.streaming.dedup import (
        paragraph_dedup_stream, prune_store_deltas)

    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("pcsrc", "pcout", "pcstore",
                                       "pcckpt"))
    footer = "(c) compaction example corp all rights reserved"

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = paragraph_dedup_stream(stream, store, out, ckpt,
                                   compact_every=2)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_batch(spark, src, [(1, f"first body\n{footer}")])
    _write_batch(spark, src, [(2, f"second body\n{footer}")])
    drain()                                  # batches 0,1 -> snapshot
    assert _os.path.isdir(f"{store}_compact/upto=1")
    snap = {r.h: r.df for r in
            spark.read.parquet(f"{store}_compact/upto=1").collect()}
    assert max(snap.values()) == 2           # sealed cumulative df

    pr = prune_store_deltas(spark, store)
    assert pr["upto"] == 1 and pr["pruned_deltas"] == [0, 1]

    # restart AFTER prune: history must come from the snapshot
    _write_batch(spark, src, [(3, f"third body\n{footer}")])
    drain()
    rows = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert footer not in rows[3].text
    assert rows[3].n_removed_history == 1


def test_source_cap_stream_compacts_and_survives_prune(spark, tmp_path):
    """compact_every on the source-cap stream: admitted counts in the
    snapshot keep capping post-restart batches after the raw deltas
    are pruned."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        prune_store_deltas, source_cap_stream)

    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("sccsrc", "sccout", "sccstore",
                                       "sccckpt"))
    schema = "doc_id LONG, source STRING"

    def wb(rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("append").parquet(src)

    def drain():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = source_cap_stream(stream, store, out, ckpt, cap=2,
                              compact_every=2)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    wb([(1, "web")])
    wb([(2, "web"), (3, "books")])
    drain()                                  # batches 0,1 -> snapshot
    import os as _os
    assert _os.path.isdir(f"{store}_compact/upto=1")
    snap = {r.source: r.n_admitted for r in
            spark.read.parquet(f"{store}_compact/upto=1").collect()}
    assert snap == {"web": 2, "books": 1}
    pr = prune_store_deltas(spark, store)
    assert pr["pruned_deltas"] == [0, 1]

    # post-prune restart: web is at its cap (from the snapshot alone),
    # books has one admission left
    wb([(4, "web"), (5, "books"), (6, "books")])
    drain()
    got = {r.doc_id: r.cap_keep for r in
           spark.read.parquet(out).collect()}
    assert got[4] == 0
    assert got[5] == 1 and got[6] == 0


def test_neardup_stream_compacts_and_survives_prune(spark, tmp_path):
    """compact_every on the near-dup stream: the identity-rewrite
    snapshot preserves every kept signature, so a near-duplicate of a
    pre-snapshot document is still rejected after pruning the raw
    deltas."""
    from agnostic_blockchain_etl_spark.streaming.dedup import (
        incremental_neardup_stream, prune_store_deltas)

    src, out, store, ckpt = (str(tmp_path / d)
                             for d in ("nccsrc", "nccout", "nccstore",
                                       "nccckpt"))
    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(38)) + " changed tail"
    other = " ".join(f"z{i}" for i in range(40))

    def drain():
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", 1).parquet(src))
        q = incremental_neardup_stream(stream, store, out, ckpt,
                                       compact_every=2)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    _write_batch(spark, src, [(1, base)])
    _write_batch(spark, src, [(2, other)])
    drain()                                  # batches 0,1 -> snapshot
    import os as _os
    assert _os.path.isdir(f"{store}_compact/upto=1")
    snap_ids = {r.doc_id for r in
                spark.read.parquet(f"{store}_compact/upto=1").collect()}
    assert snap_ids == {1, 2}                # identity rewrite
    pr = prune_store_deltas(spark, store)
    assert pr["pruned_deltas"] == [0, 1]

    _write_batch(spark, src, [(3, near),
                              (4, " ".join(f"q{i}" for i in range(40)))])
    drain()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    assert got[3].keep == 0 and got[3].dup_of_history == 1
    assert got[4].keep == 1
